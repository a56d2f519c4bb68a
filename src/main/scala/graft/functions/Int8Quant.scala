package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native one-pass int8 quantization statistics for an Array[Float]
  * embedding: struct(scale6, n_sat, max_err4, avg_err4) — the s08
  * operator's whole row-local computation in a single primitive loop.
  *
  * Semantically identical to the higher-order-function formulation it
  * replaced (scale = 127/max|v|; q_i = round(v_i·scale, 0); err_i =
  * round(|v_i − q_i/scale|, 4); scale6 = round(scale, 6); avg over a
  * DECIMAL(18,6) sum) — every rounding is Spark `round` HALF_UP
  * semantics via the same guarded fast path as [[QDotFloat.scaled6]],
  * with the exact BigDecimal fallback inside the midpoint band. The HOF
  * chain runs interpreted (zip_with/aggregate never enter codegen) and
  * walks the array five times with per-element Decimal allocations;
  * this walks it twice with longs.
  *
  * NULL for a zero/non-finite-scale vector (nothing to quantize).
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale6", DoubleType, nullable = false),
    StructField("n_sat", IntegerType, nullable = false),
    StructField("max_err4", DoubleType, nullable = false),
    StructField("avg_err4", DoubleType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_stats"

  override def nullSafeEval(a: Any): Any =
    Int8Quant.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.Int8Quant.compute($a);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object Int8Quant {

  /** HALF_UP round of `r` to `0` decimals, returned as long — Spark
    * `round(r, 0)` semantics (guarded fast path, exact fallback). */
  private def round0(r: Double): Long = {
    val a = Math.abs(r)
    if (a < 1.0e7) {
      val fl = Math.floor(a)
      val frac = a - fl
      if (Math.abs(frac - 0.5) > 1e-8) {
        val m = if (frac > 0.5) fl + 1.0 else fl
        if (r < 0) -m.toLong else m.toLong
      } else round0Exact(r)
    } else round0Exact(r)
  }

  private def round0Exact(r: Double): Long =
    java.math.BigDecimal.valueOf(r)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** HALF_UP round to 4 decimals as a scaled long (units of 1e-4). */
  private def scaled4(r: Double): Long = {
    val a = Math.abs(r) * 1e4
    if (a < 1.0e7) {
      val fl = Math.floor(a)
      val frac = a - fl
      if (Math.abs(frac - 0.5) > 1e-8) {
        val m = if (frac > 0.5) fl + 1.0 else fl
        if (r < 0) -m.toLong else m.toLong
      } else scaled4Exact(r)
    } else scaled4Exact(r)
  }

  private def scaled4Exact(r: Double): Long =
    java.math.BigDecimal.valueOf(r)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def toDouble4(l: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(l), 4).doubleValue()

  /** One pass over the vector: returns the s08 stats row, or null when
    * max|v| is zero / the scale is non-finite. Called from both the
    * interpreted eval and the generated code. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = Math.abs(arr.getFloat(i).toDouble)
      if (a > mx) mx = a
      i += 1
    }
    if (!(mx > 0.0)) return null
    val scale = 127.0 / mx
    if (java.lang.Double.isInfinite(scale)) return null
    var nSat = 0
    var maxErr = 0L // scaled by 1e4
    var sumErr6 = 0L // scaled by 1e6 (the DECIMAL(18,6) sum)
    i = 0
    while (i < n) {
      val v = arr.getFloat(i).toDouble
      val q = round0(v * scale)
      if (Math.abs(q) >= 127L) nSat += 1
      val err4 = scaled4(Math.abs(v - q.toDouble / scale))
      if (err4 > maxErr) maxErr = err4
      sumErr6 += err4 * 100L
      i += 1
    }
    new GenericInternalRow(Array[Any](
      QDotFloat.toDouble6(QDotFloat.scaled6(scale)),
      nSat,
      toDouble4(maxErr),
      QDotFloat.toDouble6(sumErr6) / n))
  }
}
