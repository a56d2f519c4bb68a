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
}
