package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{codegen, Ascending, Attribute, Expression, GenericInternalRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{StructField, StructType}

/** Native as-of join — the whole-operator Catalyst extension rung
  * (custom LogicalPlan + SparkStrategy + SparkPlan), for the operator
  * class Spark genuinely lacks (SURVEY §2.4: as-of is absent from both
  * engines; q25 states it as a union + last-ignoreNulls window).
  *
  * Semantics (matching q25 / the LATERAL-limit oracle): for every LEFT
  * (target) row, append the single RIGHT (marker) row with the same
  * key and the greatest (time, tiebreak) ≤ the target's time — or
  * nulls if none. Left rows always survive (left-outer shape).
  *
  * The join expressions ride the logical node, so `references` is
  * honest and Catalyst's ColumnPruning does the RIGHT thing: unused
  * marker columns are pruned beneath the join while key/time/tiebreak
  * survive — exactly the behavior a built-in join gets.
  *
  * Physical contract — declared, not hand-scheduled: the exec only
  * REQUIRES a clustered distribution on the key and a per-partition
  * (key, time[, tiebreak]) ascending sort; EnsureRequirements plants
  * the exchanges and sorts exactly like it does for a sort-merge join,
  * AQE included. Per partition the merge is one forward scan of both
  * sorted streams — no window materialization of the padded union
  * relation, no per-row backward search: O(|left| + |right|) with one
  * retained marker row per key. At 100 TB this is the same shuffle
  * cost as the union-window formulation but half the sort payload
  * (each side sorts its own columns only) and a streaming,
  * spill-free probe. Keys and times are non-null LongType (the
  * DataFrame helper projects times to epoch micros).
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (the extension rung the operator ladder was missing:
  * expression → SQL function → strategy → exec → OPTIMIZER RULE):
  * limit pushdown through the as-of join's left side. The operator is
  * left-outer and exactly 1:1 — every target row produces exactly one
  * output row — so `LIMIT n` over the join can take ANY n target rows
  * before the join instead of joining everything and discarding:
  * `GlobalLimit(n, LocalLimit(n, Asof(l, r)))` rewrites to keep the
  * outer limits and plant `LocalLimit(n, l)` under the join. Spark's
  * own LimitPushDown does exactly this for left-outer joins; a custom
  * logical node has to bring its own rule. Registered idempotently via
  * the PUBLIC `spark.experimental.extraOptimizations` hook in
  * [[AsofJoin.join]]. */
object AsofLimitPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit}
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case g @ GlobalLimit(_, ll @ LocalLimit(n, a: AsofJoinPlan))
        if !a.left.isInstanceOf[LocalLimit] =>
      g.copy(child = ll.copy(child = a.copy(left = LocalLimit(n, a.left))))
  }
}

/** Filter pushdown through the as-of join: the operator decides each
  * left row independently (1:1, left-outer), so a DETERMINISTIC
  * predicate that references only left-side columns commutes with the
  * join — filter the targets first, join less. Right-side predicates
  * must NOT push (the null-extended non-match rows would change), so
  * the guard is a strict subset check against the left output. */
object AsofFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsofJoinPlan)
        if cond.deterministic && cond.references.subsetOf(a.left.outputSet) =>
      a.copy(left = Filter(cond, a.left))
  }
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lt, rk, rt, tie) =>
      AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression)
    extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = leftKey; val lt = leftTime; val rk = rightKey; val rt = rightTime
    val lOut = left.output; val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // Output assembly is the GENERATED bytewise row joiner Spark's
      // own joins compile (two memcpys + a bitset merge per row), not
      // a field-by-field interpreted projection — this was the
      // measured constant-factor gap vs the codegen'd window
      // formulation at 10M rows (SCALE.md round-9 batch 5).
      val joiner = codegen.GenerateUnsafeRowJoiner.create(
        StructType(lOut.map(a => StructField(a.name, a.dataType, a.nullable))),
        StructType(rOut.map(a => StructField(a.name, a.dataType, a.nullable))))
      val nullRight = UnsafeProjection.create(rOut.map(_.dataType).toArray)(
        new GenericInternalRow(rOut.length)).copy()
      // Sorted children deliver UnsafeRows; the converters only fire if
      // an exotic child plan hands back something else.
      val lConv = UnsafeProjection.create(lOut, lOut)
      val rConv = UnsafeProjection.create(rOut, rOut)
      val lKeys = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rKeys = UnsafeProjection.create(Seq(rk, rt), rOut)
      new Iterator[InternalRow] {
        private var rHead: InternalRow =
          if (rIt.hasNext) rIt.next() else null
        private var rHeadKey: Long = 0L
        private var rHeadTime: Long = 0L
        private def decodeHead(): Unit = if (rHead != null) {
          val ks = rKeys(rHead); rHeadKey = ks.getLong(0)
          rHeadTime = ks.getLong(1)
        }
        decodeHead()
        private var matched: UnsafeRow = null // copied; key == matchKey
        private var matchKey: Long = 0L
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l0 = lIt.next()
          val l = l0 match {
            case u: UnsafeRow => u
            case o => lConv(o)
          }
          val ks = lKeys(l)
          val lKey = ks.getLong(0)
          val lTime = ks.getLong(1)
          // advance the marker stream through everything ≤ (lKey, lTime);
          // the (key, time, tiebreak) sort makes the last retained row
          // the greatest qualifying marker
          while (rHead != null &&
            (rHeadKey < lKey || (rHeadKey == lKey && rHeadTime <= lTime))) {
            if (rHeadKey == lKey) {
              matched = (rHead match {
                case u: UnsafeRow => u
                case o => rConv(o)
              }).copy()
              matchKey = lKey
            }
            rHead = if (rIt.hasNext) rIt.next() else null
            decodeHead()
          }
          val r =
            if (matched != null && matchKey == lKey) matched else nullRight
          joiner.join(l, r)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** DataFrame-level entry: as-of join `targets` with `markers` on
    * `keyCol` (LongType both sides), target time `timeCol` vs marker
    * time `mTimeCol` (LongType — project timestamps to epoch micros
    * first), marker ties broken by greatest `mTieCol`. Registers the
    * planner strategy on the session idempotently via the PUBLIC
    * experimental-methods hook. */
  def join(targets: DataFrame, markers: DataFrame,
           keyCol: String, timeCol: String,
           mKeyCol: String, mTimeCol: String, mTieCol: String): DataFrame = {
    val spark: SparkSession = targets.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsofLimitPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofLimitPushdown
    }
    if (!spark.experimental.extraOptimizations.contains(AsofFilterPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofFilterPushdown
    }
    val lPlan = targets.queryExecution.analyzed
    val rPlan = markers.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    org.apache.spark.sql.graftshim.GraftSqlShims.ofRows(spark,
      AsofJoinPlan(lPlan, rPlan,
        attr(lPlan, keyCol), attr(lPlan, timeCol),
        attr(rPlan, mKeyCol), attr(rPlan, mTimeCol), attr(rPlan, mTieCol)))
  }
}
