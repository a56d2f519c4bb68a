package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.PHash32

/** Property checks for the native perceptual-hash expression: the
  * compiled one-pass loop must agree with an independently written
  * code-point reference on arbitrary strings — INCLUDING multi-byte
  * and surrogate-pair code points, which the ASCII fixtures never
  * exercise — and must honor the aHash invariants (32-bit range,
  * empty→0, concatenation-period stability).
  */
class PHashPropertySpec extends SparkSpec {

  /** Straight-line reference: bucket = code-point index mod 32, bit b
    * set iff bucket mean > global mean via integer cross-multiply. */
  private def reference(s: String): Long = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) return 0L
    val sums = new Array[Long](32)
    val cnts = new Array[Long](32)
    cps.zipWithIndex.foreach { case (cp, i) =>
      sums(i % 32) += cp; cnts(i % 32) += 1
    }
    val total = sums.sum
    val n = cps.length.toLong
    (0 until 32).foldLeft(0L) { (h, b) =>
      if (sums(b) * n > total * cnts(b)) h | (1L << b) else h
    }
  }

  private val genChar: Gen[String] = Gen.frequency(
    (6, Gen.alphaNumChar.map(_.toString)),
    (2, Gen.const(" ")),
    (1, Gen.oneOf("é", "ß", "汉", "字", "😀", "𝕊").map(identity)),
    (1, Gen.choose(0x20, 0x2FFF).map(i => new String(Character.toChars(i)))))

  private val genText: Gen[String] =
    Gen.listOf(genChar).map(_.mkString)

  test("PHash32 matches the code-point reference on arbitrary strings") {
    val prop = Prop.forAll(genText) { s =>
      val got = PHash32.compute(UTF8String.fromString(s))
      got == reference(s) && got >= 0L && got <= 0xFFFFFFFFL
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("PHash32 bucket-mean compare stays exact past 64-bit overflow") {
    // The quantities in the real loop: a = bucket codepoint sum,
    // b = total codepoints, c = global sum, d = bucket count. Past
    // ~60M high-code-point chars a·b wraps Long (a document size the
    // 100 TB corpus contains); the 128-bit compare must agree with
    // BigInt on exactly that regime, where the wrapped 64-bit product
    // flips the comparison.
    val gen = for {
      n <- Gen.choose(60000000L, 4000000000L)            // total codepoints
      meanCp <- Gen.choose(60000L, 1114111L)             // high planes
      skew <- Gen.choose(-500L, 500L)
    } yield {
      val d = n / 32
      val a = d * (meanCp + skew)                        // bucket sum
      val c = n * meanCp / 32 * 32                       // ~global sum
      (a, n, c, d)
    }
    val prop = Prop.forAll(gen) { case (a, b, c, d) =>
      graft.functions.PHash32.gt128(a, b, c, d) ==
        (BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
    // and the overflow regime is actually reached: a·b wraps for the
    // canonical worst case
    val (a0, b0) = (2000000000L / 32 * 1000000L, 2000000000L)
    assert(BigInt(a0) * BigInt(b0) > BigInt(Long.MaxValue))
  }

  test("PHash32 is stable under 32-aligned self-concatenation") {
    // repeating a 32-codepoint-aligned block leaves every bucket's
    // mean (and so the hash) unchanged — the property that makes the
    // hash perceptual for periodic/padded payloads
    val gen = for {
      base <- Gen.listOfN(32, Gen.alphaNumChar).map(_.mkString)
      k <- Gen.choose(1, 5)
    } yield (base, k)
    val prop = Prop.forAll(gen) { case (base, k) =>
      PHash32.compute(UTF8String.fromString(base * k)) ==
        PHash32.compute(UTF8String.fromString(base))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("PHash32: empty and single-codepoint strings hash to 0") {
    assert(PHash32.compute(UTF8String.fromString("")) == 0L)
    // one code point: its bucket mean EQUALS the global mean (strict >
    // fails), every other bucket is empty — all bits stay clear
    assert(PHash32.compute(UTF8String.fromString("x")) == 0L)
    assert(PHash32.compute(UTF8String.fromString("😀")) == 0L)
  }
}
