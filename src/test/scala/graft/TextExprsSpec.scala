package graft

import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Edge cases of the native text expressions: shingle boundaries,
  * dedup order, and minhash signature shape/determinism.
  */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private def shingleOf(text: String): Seq[String] =
    Seq(text).toDF("t")
      .select(TextExprs.shingles(col("t"), 3).as("sh"))
      .collect().head.getSeq[String](0)

  test("shingles: fewer tokens than n yields empty; exact n yields one") {
    assert(shingleOf("a b").isEmpty)
    assert(shingleOf("a b c") == Seq("a b c"))
    assert(shingleOf("a b c d") == Seq("a b c", "b c d"))
  }

  test("shingles: duplicates dedup to first occurrence, order preserved") {
    assert(shingleOf("x y z x y z x y z") ==
      Seq("x y z", "y z x", "z x y"))
  }

  test("shingles match the HOF formulation on real documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val hof = expr(
      """array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
        |  i -> concat_ws(' ', element_at(split(text, ' '), i),
        |                 element_at(split(text, ' '), i + 1),
        |                 element_at(split(text, ' '), i + 2))))""".stripMargin)
    val n = docs.filter(size(split(col("text"), " ")) >= 3)
      .select(TextExprs.shingles(col("text"), 3).as("a"), hof.as("b"))
      .where(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("cdcCuts matches the HOF rolling-hash formulation on real documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val hof = expr(
      """filter(sequence(1, length(text) - 3),
        |  i -> ((((ascii(substr(text, i, 1)) * 31
        |        + ascii(substr(text, i + 1, 1))) * 31
        |        + ascii(substr(text, i + 2, 1))) * 31
        |        + ascii(substr(text, i + 3, 1))) % 64) = 0)""".stripMargin)
    val n = docs.filter(length(col("text")) >= 4)
      .select(TextExprs.cdcCuts(col("text")).as("a"), hof.as("b"))
      .where(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("cdcCuts edge cases: short strings empty, boundary position exact") {
    def cuts(t: String): Seq[Int] =
      Seq(t).toDF("t").select(TextExprs.cdcCuts(col("t")).as("c"))
        .collect().head.getSeq[Int](0)
    assert(cuts("") == Seq())
    assert(cuts("abc") == Seq())
    // "@@@@" = 64,64,64,64: ((64*31+64)*31+64)*31+64 = 1970176 = 64*30784
    // -> divisible by 64 -> position 1 is a cut.
    assert(cuts("@@@@") == Seq(1))
  }

  test("minhash signature: fixed width, deterministic, content-sensitive") {
    val df = Seq("p q r s t", "p q r s t", "entirely different words here")
      .toDF("t")
      .select(graft.functions.TextExprs.minhashSig(
        TextExprs.shingles(col("t"), 3), 8).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 8))
    assert(sigs(0) == sigs(1))     // same text → same signature
    assert(sigs(0) != sigs(2))     // different text → different signature
  }

  test("normalizeText: NFC composition, case, whitespace runs, trim") {
    val decomposed = "Café"            // e + combining acute
    val composed = "café"               // precomposed é, lowered
    val rows = Seq(
      decomposed,
      "  Hello\t\tWorld \n",
      "already normal",
      "").toDF("t")
      .select(TextExprs.normalizeText(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(rows(0) == composed)              // NFC + lowercase
    assert(rows(1) == "hello world")         // collapse + trim
    assert(rows(2) == "already normal")
    assert(rows(3) == "")
    // canonically-equal inputs hash equal after normalization
    assert(graft.functions.NormalizeText.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("CAFÉ")) ==
      graft.functions.NormalizeText.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("café")))
  }

  test("milliLog10: exact-algorithm reference match and log10 accuracy") {
    import graft.functions.MilliLog10
    // Independent restatement of the fixed-point-squaring definition
    // (the same CTE algorithm the oracle runs) over BigInt.
    def ref(x: Long): Long = {
      val d = x.toString.length - 1
      var y = BigInt(x) * BigInt(10).pow(16 - d)
      var f = 0L
      for (_ <- 1 to 24) {
        val sq = y * y / BigInt(10).pow(16)
        if (sq >= BigInt(10).pow(17)) { y = sq / 10; f = f * 2 + 1 }
        else { y = sq; f = f * 2 }
      }
      d.toLong * 1000L + (f * 1000L + (1L << 23)) / (1L << 24)
    }
    val fixtures = Seq(1L, 2L, 9L, 10L, 11L, 99L, 100L, 101L, 999L, 1000L,
      123456L, 999999L, 48232L, 86170L, 314159L,
      99999999999999999L /* 10^17 - 1: domain ceiling */)
    fixtures.foreach { x =>
      val got = MilliLog10.compute(x)
      assert(got == ref(x), s"x=$x: $got != ${ref(x)}")
      // the quantization must stay a faithful milli-log10 (within one
      // half-unit plus the 2^-24 fraction quantum)
      assert(math.abs(got - math.log10(x.toDouble) * 1000) <= 0.51,
        s"x=$x drifted from log10")
    }
    // out-of-domain input fails loudly, not numerically
    intercept[IllegalArgumentException](MilliLog10.compute(0L))
    intercept[IllegalArgumentException](MilliLog10.compute(-5L))
    intercept[IllegalArgumentException](MilliLog10.compute(100000000000000000L))
  }
}
