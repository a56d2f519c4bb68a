package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the quantized dot product used across
  * the similarity surface: Σ_i round6(a_i · b_i), summed exactly as
  * scaled-by-10⁶ longs, returned as double. Accepts array<float> or
  * array<double> on each side independently (doubles carry trained
  * centroids, s09); every element widens to double before the product.
  *
  * Semantically identical to the higher-order-function formulation
  *   cast(aggregate(zip_with(a, b, (x,y) -> cast(round(x*y, 6) as
  *   decimal(20,6))), 0, (acc,v) -> acc+v) as double)
  * (each term is HALF_UP-rounded exactly like Spark's `round`, decimal
  * addition is associative, and the final unscaled-long→double division
  * is the same correctly-rounded value as Decimal.toDouble) — but
  * whole-stage-codegen'd as one tight primitive loop: no per-element
  * Decimal allocations, no intermediate array from zip_with. Mismatched
  * array lengths yield NULL, matching zip_with's null-padding behavior
  * through the decimal cast.
  *
  * Bound: exact while Σ|round6(a_i·b_i)| ≤ 2⁶³/10⁶ ≈ 9.2e12 — holds for
  * any realistically-normalized embedding at any dimension.
  */
case class QDotFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  // Each side may independently be array<float> or array<double> (the
  // double case carries trained centroids, s09): every element is
  // widened to double before the product either way, so the quantized
  // sum is the same value the all-float path would produce on the same
  // doubles.
  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.simpleString(10)}, ${right.dataType.simpleString(10)})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qdot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fl, fr) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var sum = 0L
      var i = 0
      while (i < n) {
        val xv = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (fr) y.getFloat(i).toDouble else y.getDouble(i)
        sum += QDotFloat.scaled6(xv * yv)
        i += 1
      }
      QDotFloat.toDouble6(sum)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, isF: Boolean): String =
        if (isF) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += graft.functions.QDotFloat.scaled6(
         |      ${get(a, isFloat(left))} * ${get(b, isFloat(right))});
         |  }
         |  ${ev.value} = graft.functions.QDotFloat.toDouble6($sum);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDotFloat =
    copy(left = newLeft, right = newRight)
}

object QDotFloat {
  /** HALF_UP round to 6 decimal places, returned as the scaled long —
    * bit-compatible with Spark's `round(x, 6)` + decimal(20,6) cast.
    *
    * Fast path: plain floor(|r|·10⁶ + 0.5) — no allocation. That agrees
    * with the BigDecimal reference (which rounds the *shortest decimal
    * representation*, per Double.toString) everywhere except within a
    * ~1 ulp band around decimal midpoints (….5·10⁻⁶), where the
    * shortest repr can sit on the other side of the midpoint than the
    * binary value. Inside that band (|frac−0.5| < 1e-8, vastly wider
    * than the ~1.2e-10 ulp at 10⁶) we defer to the exact BigDecimal
    * path, so results are bit-identical while the hot loop drops ~all
    * of its BigDecimal allocations (~10× on dot-product microbench).
    */
  def scaled6(r: Double): Long = {
    val a = Math.abs(r) * 1e6
    // Fast path only while ulp(a) ≲ 1.2e-9 ≪ the 1e-8 guard band (the
    // ·1e6 product itself carries ≤ 1 ulp of error, which the band must
    // also absorb); beyond 1e7, fall through to the exact path.
    if (a < 1.0e7) {
      val fl = Math.floor(a)
      val frac = a - fl
      if (Math.abs(frac - 0.5) > 1e-8) {
        val m = if (frac > 0.5) fl + 1.0 else fl
        if (r < 0) -m.toLong else m.toLong
      } else scaled6Exact(r)
    } else scaled6Exact(r)
  }

  private[graft] def scaled6Exact(r: Double): Long =
    java.math.BigDecimal.valueOf(r)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Exact decimal(·,6) → double, as Decimal.toDouble would produce. */
  def toDouble6(sum: Long): Double =
    new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), 6).doubleValue()
}

/** Column-level and SQL-level entry points for the native expressions. */
object VectorExprs {
  /** Quantized dot product of two Array[Float|Double] columns (see
    * [[QDotFloat]]). */
  def qdot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      QDotFloat(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Quantized squared L2 norm. */
  def qnormsq(a: Column): Column = qdot(a, a)

  /** One-pass int8 quantization stats struct (see [[Int8QuantStats]]). */
  def int8Stats(a: Column): Column =
    GraftSqlBridge.column(Int8QuantStats(GraftSqlBridge.expression(a)))

  val FnName = "graft_qdot"

  private val info = new ExpressionInfo(
    classOf[QDotFloat].getName, FnName)

  private val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$FnName expects exactly 2 arguments")
    QDotFloat(args.head, args(1))
  }

  /** Register `graft_qdot` on an existing session's function registry
    * (idempotent), making it available to `expr`/`spark.sql`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftSqlBridge.registerFunction(spark, FnName, info, builder)
}

/** SparkSessionExtensions hook: add
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * to a session builder and every graft native expression resolves in
  * plain SQL — the idiomatic way to ship a library's expressions.
  *
  * Registered: `graft_qdot(a, b)`, `graft_shingles(text, n)`,
  * `graft_minhash_sig(shingles, numTables)`,
  * `graft_normalize_text(text)`, `graft_doc_pairs(docs)`,
  * `graft_int8_stats(vec)`, `graft_phash32(text)`,
  * `graft_milli_log10(x)`, `graft_cdc_cuts(text)`.
  * Integer parameters must be foldable literals (they parameterize the
  * generated code). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.intLit

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, clazz: Class[_],
               builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
         builder))
    inject("graft_qdot", classOf[QDotFloat], { args =>
      require(args.length == 2, "graft_qdot expects (array, array)")
      QDotFloat(args.head, args(1))
    })
    inject("graft_shingles", classOf[WordShingles], { args =>
      require(args.length == 2, "graft_shingles expects (text, n)")
      WordShingles(args.head, intLit(args(1), "graft_shingles n"))
    })
    inject("graft_minhash_sig", classOf[MinHashSig], { args =>
      require(args.length == 2,
        "graft_minhash_sig expects (shingles, numTables)")
      MinHashSig(args.head, intLit(args(1), "graft_minhash_sig numTables"))
    })
    inject("graft_normalize_text", classOf[NormalizeText], { args =>
      require(args.length == 1, "graft_normalize_text expects (text)")
      NormalizeText(args.head)
    })
    inject("graft_doc_pairs", classOf[DocPairs], { args =>
      require(args.length == 1, "graft_doc_pairs expects (docs)")
      DocPairs(args.head)
    })
    inject("graft_int8_stats", classOf[Int8QuantStats], { args =>
      require(args.length == 1, "graft_int8_stats expects (vec)")
      Int8QuantStats(args.head)
    })
    inject("graft_phash32", classOf[PHash32], { args =>
      require(args.length == 1, "graft_phash32 expects (text)")
      PHash32(args.head)
    })
    inject("graft_milli_log10", classOf[MilliLog10], { args =>
      require(args.length == 1, "graft_milli_log10 expects (bigint)")
      MilliLog10(args.head)
    })
    inject("graft_cdc_cuts", classOf[CdcCuts], { args =>
      require(args.length == 1, "graft_cdc_cuts expects (text)")
      CdcCuts(args.head)
    })
  }
}

object GraftExtensions {
  /** Shared with runtime registration helpers (TextExprs.register). */
  private[functions] def intLitArg(e: Expression, what: String): Int =
    intLit(e, what)

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other if other.foldable && other.dataType == IntegerType =>
      other.eval().asInstanceOf[Int]
    case _ => throw new IllegalArgumentException(
      s"$what must be an integer literal")
  }
}
