package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingling: distinct space-separated n-grams of a
  * document in one pass (hash-set dedup, first-occurrence order) —
  * semantically identical to the HOF chain
  *   array_distinct(transform(sequence(1, size(w)-n+1),
  *     i -> concat_ws(' ', w[i], …, w[i+n-1])))
  * over `split(text, ' ')`, but a single compiled function per row
  * instead of interpreted lambda evaluation (Catalyst higher-order
  * functions never enter whole-stage codegen, and the dedup pipelines
  * evaluate shingling several times per query). Documents with fewer
  * than n tokens yield an empty array.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def compute(text: UTF8String, n: Int): ArrayData = {
    // Same tokenization as split(text, ' '): single-space regex,
    // unlimited splits (trailing empties kept, like Spark's default).
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** MinHash signature of a shingle array: element t (t ∈ [0, numTables))
  * is min over shingles of xxhash64(shingle, seed = t) — the per-table
  * minimum of an independent hash family, computed in one compiled pass
  * over the array instead of numTables interpreted `transform` lambdas.
  * Empty input yields an empty signature (the document can never be an
  * LSH candidate).
  */
case class MinHashSig(child: Expression, numTables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $numTables);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def compute(arr: ArrayData, numTables: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mins = new Array[Long](numTables)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var t = 0
      while (t < numTables) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(s, t.toLong)
        if (h < mins(t)) mins(t) = h
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }
}

/** Fused text canonicalization — the first stage of any LLM-corpus
  * pipeline: Unicode NFC normalization (composed form, so visually
  * identical strings hash identically for dedup), Unicode default
  * lowercasing, whitespace-run collapse to single spaces, and trim, in
  * ONE compiled pass per row. The equivalent built-in chain
  * (`trim(regexp_replace(lower(...), ...))`) allocates three
  * intermediate strings per row and has no NFC step at all — Spark has
  * no built-in Unicode normalizer.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def compute(text: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer
      .normalize(text.toString, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    // Collapse whitespace runs and trim in one scan.
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var pendingSpace = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (Character.isWhitespace(c)) {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** All ordered pairs (a_i, a_j), i < j, from a sorted id array — the
  * pair-emission step of the inverted-index near-dup join (each posting
  * list emits its own candidate pairs). Semantically identical to the
  * nested-transform HOF chain
  *   flatten(transform(docs, (x, ix) -> transform(slice(docs, ix+2,
  *     size(docs)), y -> named_struct('i', x, 'j', y))))
  * but one compiled pass: Catalyst higher-order functions run
  * interpreted (never codegen), and this sits directly on the d03 hot
  * path with one evaluation per distinct shingle.
  */
case class DocPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_doc_pairs"

  override def nullSafeEval(input: Any): Any =
    DocPairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DocPairs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DocPairs =
    copy(child = newChild)
}

object DocPairs {
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All ordered pairs (a_i, a_j), i < j, from a sorted string array —
  * [[DocPairs]] for token co-occurrence: per-document pair emission
  * from bounded sorted token lists instead of a token-stream self-join
  * (same reasoning as the inverted-index dedup join). */
case class StrPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_str_pairs"

  override def nullSafeEval(input: Any): Any =
    StrPairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StrPairs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): StrPairs =
    copy(child = newChild)
}

object StrPairs {
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getUTF8String(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](a, arr.getUTF8String(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** 32-bit perceptual hash (aHash shape) of a media payload, with the
  * document text standing in for the decoded pixel stream (the same
  * stub convention as [[graft.multimodal.FakeCodec]]): code points are
  * the "pixel" intensities, interleaved into 32 buckets
  * (bucket = index % 32 — the stub's fixed sampling grid), and bit b is
  * set iff bucket b's mean intensity exceeds the global mean. The
  * comparison is exact integer cross-multiplication
  * (sum_b · n > total · cnt_b) — no floating point, so any engine
  * replays it bit-for-bit. One compiled pass per row; near-identical
  * payloads (a few changed "pixels") land in the same bucket means and
  * collide — the perceptual-dedup property. Empty input hashes to 0.
  */
case class PHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash32"

  override def nullSafeEval(input: Any): Any =
    PHash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PHash32.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PHash32 =
    copy(child = newChild)
}

object PHash32 {
  private val Buckets = 32

  def compute(text: UTF8String): Long = {
    val s = text.toString
    val sums = new Array[Long](Buckets)
    val cnts = new Array[Long](Buckets)
    var total = 0L
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val b = (n % Buckets).toInt
      sums(b) += cp
      cnts(b) += 1
      total += cp
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0L
    var hash = 0L
    var b = 0
    while (b < Buckets) {
      if (gt128(sums(b), n, total, cnts(b))) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** a·b > c·d over non-negative longs in exact 128-bit arithmetic.
    * The naive 64-bit products overflow once sum(codepoints)·n exceeds
    * 2^63 — reachable for documents past ~3M characters (sums ≈
    * n·~1e6/32 per bucket), i.e. real web-document sizes, and the
    * oracle's HUGEINT arithmetic would silently diverge from the
    * wrapped product. multiplyHigh + unsigned-low compare removes the
    * bound entirely (the true bucket sums cannot reach 2^64). */
  private[graft] def gt128(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(lo1, lo2) > 0
  }
}

/** Exact integer milli-log10 of a positive bigint — the quantization
  * point of the t19 Heaps-law fit, with ZERO libm anywhere:
  *   d   = decimal digit count − 1                (= floor(log10 x))
  *   y   = x·10^(16−d)  — fixed point at scale 10^16, y ∈ [10^16, 10^17)
  *   24×: t = y² div 10^16; bit = [t ≥ 10^17]; y = bit ? t div 10 : t
  *        (log10(y²) = 2·log10 y — each squaring emits one binary digit
  *         of the log10 fraction)
  *   out = 1000·d + (F·1000 + 2^23) div 2^24,   F = Σ bitᵢ·2^(24−i)
  * The DuckDB oracle states the IDENTICAL algorithm as a chain of
  * HUGEINT CTEs (Text.milliLog10Ctes), so the quantized value agrees
  * digit-for-digit across engines by construction — no rounding-margin
  * analysis, no libm. The 24-step loop runs over BigInteger (y² needs
  * 113 bits); it executes only on block-aggregate relations (docs/B
  * rows), so arithmetic cost is irrelevant — the native expression
  * exists to keep the PLAN one projection instead of a 48-Project
  * lateral chain (measured ~1.5 s of pure plan/codegen overhead on a
  * 200-row input). Domain: 0 < x < 10^17; out-of-domain input throws
  * (a count of zero reaching a log is a bug upstream, not a value). */
case class MilliLog10(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_milli_log10"

  override def nullSafeEval(input: Any): Any =
    MilliLog10.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MilliLog10.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): MilliLog10 =
    copy(child = newChild)
}

object MilliLog10 {
  import java.math.BigInteger
  private val Scale = BigInteger.TEN.pow(16)
  private val Ten17 = BigInteger.TEN.pow(17)
  private val Bits = 24

  def compute(x: Long): Long = {
    if (x <= 0L || x >= 100000000000000000L)
      throw new IllegalArgumentException(
        s"graft_milli_log10: input $x outside (0, 10^17)")
    var d = 0
    var t = x
    while (t >= 10L) { t /= 10L; d += 1 }
    var y = BigInteger.valueOf(x).multiply(BigInteger.TEN.pow(16 - d))
    var f = 0L
    var i = 0
    while (i < Bits) {
      val sq = y.multiply(y).divide(Scale)
      if (sq.compareTo(Ten17) >= 0) { y = sq.divide(BigInteger.TEN); f = f * 2 + 1 }
      else { y = sq; f = f * 2 }
      i += 1
    }
    d.toLong * 1000L + (f * 1000L + (1L << (Bits - 1))) / (1L << Bits)
  }
}

/** Content-defined-chunking cut positions (t28): 1-based character
  * positions i where the base-31 polynomial over the 4-code-point
  * window starting at i is ≡ 0 (mod 64) — one compiled pass over the
  * decoded code points instead of an interpreted
  * filter(sequence(...), 4× substr+ascii) lambda chain (the DocPairs
  * hot-path discipline; ~len×4 interpreted substring allocations
  * eliminated per document). Semantics match the SQL formulation both
  * engines share: substr indexes characters, ascii()/unicode() read
  * the code point. 32-bit wraparound only differs from the oracle for
  * code points large enough to overflow (≥ U+10000 territory) — the
  * corpus contract (and the oracle's) is BMP text.
  */
case class CdcCuts(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    CdcCuts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcCuts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val len = s.length
    if (len < 4) return Empty
    // Decode once: code points, character-indexed like substr/ascii.
    val cps = new Array[Int](s.codePointCount(0, len))
    var i = 0
    var k = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    val n = cps.length
    if (n < 4) return Empty
    val buf = new java.util.ArrayList[Any](n / 32)
    var p = 0
    while (p + 3 < n) {
      val h = ((cps(p) * 31 + cps(p + 1)) * 31 + cps(p + 2)) * 31 + cps(p + 3)
      if (h % 64 == 0) buf.add(p + 1)
      p += 1
    }
    new GenericArrayData(buf.toArray)
  }
}

/** Column-level entry points for native text expressions. */
object TextExprs {
  /** Exact integer milli-log10 (see [[MilliLog10]]). */
  def milliLog10(x: Column): Column =
    GraftSqlBridge.column(MilliLog10(GraftSqlBridge.expression(x)))

  /** Distinct word-n-gram shingles of a string column. */
  def shingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))

  /** MinHash signature (array of numTables per-table minima). */
  def minhashSig(shingles: Column, numTables: Int): Column =
    GraftSqlBridge.column(
      MinHashSig(GraftSqlBridge.expression(shingles), numTables))

  /** Fused NFC + lowercase + whitespace-collapse + trim. */
  def normalizeText(text: Column): Column =
    GraftSqlBridge.column(NormalizeText(GraftSqlBridge.expression(text)))

  /** All (i < j) pairs from a sorted array<long> (posting-list join). */
  def docPairs(docs: Column): Column =
    GraftSqlBridge.column(DocPairs(GraftSqlBridge.expression(docs)))

  /** All (i < j) pairs from a sorted array<string> (co-occurrence). */
  def strPairs(toks: Column): Column =
    GraftSqlBridge.column(StrPairs(GraftSqlBridge.expression(toks)))

  /** 32-bit perceptual hash (aHash) of a payload-stand-in string. */
  def phash32(text: Column): Column =
    GraftSqlBridge.column(PHash32(GraftSqlBridge.expression(text)))

  /** Content-defined-chunking cut positions (see [[CdcCuts]]). */
  def cdcCuts(text: Column): Column =
    GraftSqlBridge.column(CdcCuts(GraftSqlBridge.expression(text)))

  /** Register the text expressions on an EXISTING session's function
    * registry (idempotent) — the runtime alternative to wiring
    * [[GraftExtensions]] into the session builder. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    GraftSqlBridge.registerFunction(spark, "graft_normalize_text",
      new ExpressionInfo(classOf[NormalizeText].getName,
        "graft_normalize_text"),
      { args =>
        require(args.length == 1, "graft_normalize_text expects (text)")
        NormalizeText(args.head)
      })
    GraftSqlBridge.registerFunction(spark, "graft_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      { args =>
        require(args.length == 2, "graft_shingles expects (text, n)")
        WordShingles(args.head, GraftExtensions.intLitArg(args(1), "n"))
      })
    GraftSqlBridge.registerFunction(spark, "graft_phash32",
      new ExpressionInfo(classOf[PHash32].getName, "graft_phash32"),
      { args =>
        require(args.length == 1, "graft_phash32 expects (text)")
        PHash32(args.head)
      })
    GraftSqlBridge.registerFunction(spark, "graft_milli_log10",
      new ExpressionInfo(classOf[MilliLog10].getName, "graft_milli_log10"),
      { args =>
        require(args.length == 1, "graft_milli_log10 expects (bigint)")
        MilliLog10(args.head)
      })
    GraftSqlBridge.registerFunction(spark, "graft_cdc_cuts",
      new ExpressionInfo(classOf[CdcCuts].getName, "graft_cdc_cuts"),
      { args =>
        require(args.length == 1, "graft_cdc_cuts expects (text)")
        CdcCuts(args.head)
      })
  }
}
