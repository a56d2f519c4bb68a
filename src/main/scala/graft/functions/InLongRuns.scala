package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Membership in a run-length-encoded set of longs: is `child` inside
  * any `[starts(i), ends(i))` interval? The deletion-vector read
  * filter's membership primitive (r17, VERDICT r16 #3): the r16
  * `InSet` over raw row indexes put O(hidden rows) literals in the
  * plan, capping vectors at plan-sized row counts; this carries two
  * primitive long arrays — O(runs) — and binary-searches them, inside
  * whole-stage codegen (the arrays ride along as referenced objects,
  * the search is a static call). A million clustered hidden rows is a
  * handful of runs; the plan doesn't notice.
  *
  * `starts` must be sorted ascending with non-overlapping intervals —
  * [[graft.load.DvVector]] normalizes; this expression trusts its
  * producer (it is internal to the DV read path, never user-facing).
  */
case class InLongRuns(child: Expression, starts: Array[Long],
                      ends: Array[Long])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${other.simpleString(10)}")
  }

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_in_runs"
  override def toString: String =
    s"graft_in_runs($child, runs=${starts.length})"

  override def nullSafeEval(v: Any): Any =
    InLongRuns.containsRun(starts, ends, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("dvStarts", starts, "long[]")
    val eRef = ctx.addReferenceObj("dvEnds", ends, "long[]")
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.InLongRuns.containsRun(
       |  $sRef, $eRef, $a);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): InLongRuns = copy(child = newChild)
}

object InLongRuns {
  /** Binary search: any i with starts(i) <= v < ends(i)? */
  def containsRun(starts: Array[Long], ends: Array[Long],
                  v: Long): Boolean = {
    var lo = 0
    var hi = starts.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (v < starts(mid)) hi = mid - 1
      else if (v >= ends(mid)) lo = mid + 1
      else return true
    }
    false
  }
}
