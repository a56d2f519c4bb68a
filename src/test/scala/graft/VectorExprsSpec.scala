package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** The native QDotFloat expression must be bit-identical to the
  * higher-order-function formulation it replaced (zip_with + round +
  * decimal aggregate) — that equivalence is what keeps the similarity
  * oracles valid — and must behave under codegen, interpreted eval,
  * nulls, and SQL registration.
  */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def hofQdot(a: String, b: String) = expr(
    s"""cast(aggregate(
       |  zip_with($a, $b, (x, y) ->
       |    cast(round(cast(x as double) * cast(y as double), 6) as decimal(20,6))),
       |  cast(0 as decimal(30,6)),
       |  (acc, v) -> cast(acc + v as decimal(30,6))) as double)""".stripMargin)

  test("native qdot equals the HOF decimal formulation on real data") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = e.limit(1).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(
        VectorExprs.qdot(col("embedding"), col("qe")).as("native"),
        hofQdot("embedding", "qe").as("hof"))
    assert(both.where(col("native") =!= col("hof") ||
      col("native").isNull =!= col("hof").isNull).count() == 0)
  }

  test("qdot handles negatives, zeros and rounding ties like round()") {
    val df = Seq(
      (Array(0.5f, -0.5f, 3.0f), Array(2.0f, 3.0f, 0.0f)),
      (Array(1.0000005f, -1.0000005f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
    val rows = df.select(VectorExprs.qdot(col("a"), col("b")).as("d"),
                         hofQdot("a", "b").as("h")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("mismatched lengths yield null (zip_with padding semantics)") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val r = df.select(VectorExprs.qdot(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("scaled6 fast path agrees with the exact BigDecimal reference") {
    import graft.functions.QDotFloat
    val rnd = new scala.util.Random(42)
    // random float-product-shaped values across magnitudes
    (1 to 200000).foreach { _ =>
      val r = (rnd.nextFloat() * 2 - 1).toDouble *
        (rnd.nextFloat() * 2 - 1).toDouble *
        math.pow(10, rnd.nextInt(7) - 3)
      assert(QDotFloat.scaled6(r) == QDotFloat.scaled6Exact(r), s"r=$r")
    }
    // adversarial: decimal midpoints and their neighborhoods, both signs
    val mids = Seq(0.0000005, 0.0000015, 1.0000005, 0.1234565, 12.9999995)
    for (m <- mids; eps <- Seq(-1e-13, -1e-10, 0.0, 1e-10, 1e-13);
         s <- Seq(1, -1)) {
      val r = s * (m + eps)
      assert(QDotFloat.scaled6(r) == QDotFloat.scaled6Exact(r), s"r=$r")
    }
    // large magnitudes (still within the documented ≤9.2e12 domain)
    // exercise the exact-path fallback
    Seq(1.23456789e7, 9.8765432101e9, 9.0e12).foreach { r =>
      assert(QDotFloat.scaled6(r) == QDotFloat.scaled6Exact(r), s"r=$r")
      assert(QDotFloat.scaled6(-r) == QDotFloat.scaled6Exact(-r), s"r=-$r")
    }
  }

  test("graft_qdot registers for SQL use") {
    VectorExprs.register(spark)
    val out = spark.sql(
      "SELECT graft_qdot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .collect().head.getDouble(0)
    assert(out == 11.0)
  }
}
