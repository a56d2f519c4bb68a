package graft

import org.apache.spark.sql.functions._
import graft.functions.{Int8Quant, VectorExprs}

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

  test("mixed float x double qdot equals the HOF formulation (s09's centroid shape)") {
    // left = real float embeddings, right = double centroids (per-label
    // means, exactly how s09 feeds trained codebook vectors in).
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cent = e
      .groupBy(col("label"))
      .agg(expr("transform(aggregate(collect_list(embedding)," +
        " cast(array() as array<double>)," +
        " (acc, v) -> if(size(acc) = 0, transform(v, x -> cast(x as double))," +
        "              zip_with(acc, v, (a2, x) -> a2 + cast(x as double))))," +
        " t -> t / count(1))").as("ce"))
    val both = e.join(cent, Seq("label"))
      .select(
        VectorExprs.qdot(col("embedding"), col("ce")).as("native"),
        hofQdot("embedding", "ce").as("hof"),
        VectorExprs.qdot(col("ce"), col("ce")).as("native_dd"),
        hofQdot("ce", "ce").as("hof_dd"))
    assert(both.where(col("native") =!= col("hof") ||
      col("native_dd") =!= col("hof_dd")).count() == 0)
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

  test("int8 stats expression equals the HOF formulation on real data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hof = e
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .filter(col("mx") > 0)
      .withColumn("scale", lit(127.0) / col("mx"))
      .withColumn("q", transform(col("v"), x => round(x * col("scale"), 0)))
      .withColumn("err", zip_with(col("v"), col("q"),
        (a, b) => round(abs(a - b / col("scale")), 4)))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale6"),
        size(filter(col("q"), x => abs(x) >= 127)).as("n_sat"),
        array_max(col("err")).as("max_err4"),
        (aggregate(col("err"), lit(0).cast(DecimalType(18, 6)),
          (acc, x) => (acc + x.cast(DecimalType(18, 6)))
            .cast(DecimalType(18, 6))).cast("double") / 64).as("avg_err4"))
    val native = e
      .withColumn("st", VectorExprs.int8Stats(col("embedding")))
      .filter(col("st").isNotNull)
      .select(col("vec_id"), col("st.scale6").as("scale6"),
        col("st.n_sat").as("n_sat"), col("st.max_err4").as("max_err4"),
        col("st.avg_err4").as("avg_err4"))
    val h = hof.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(h.keySet == n.keySet)
    h.foreach { case (k, v) => assert(v == n(k), s"vec $k: hof=$v native=${n(k)}") }
    assert(h.nonEmpty)
  }

  test("int8 stats match the BigDecimal reference on random vectors (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import java.math.{BigDecimal => JBD, RoundingMode}
    def r(x: Double, s: Int): Double =
      JBD.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()
    def ref(v: Array[Float]): Option[(Double, Int, Double, Double)] = {
      val d = v.map(_.toDouble)
      val mx = d.map(math.abs).foldLeft(0.0)(math.max)
      if (!(mx > 0.0)) None
      else {
        val scale = 127.0 / mx
        val q = d.map(x => r(x * scale, 0))
        val err = d.zip(q).map { case (x, qq) =>
          r(math.abs(x - qq / scale), 4) }
        val sum6 = err.foldLeft(JBD.ZERO)((acc, e) =>
          acc.add(JBD.valueOf(e).setScale(6, RoundingMode.UNNECESSARY)))
        Some((r(scale, 6), q.count(math.abs(_) >= 127.0),
          err.foldLeft(0.0)(math.max), sum6.doubleValue() / v.length))
      }
    }
    val genFloat = Gen.frequency(
      8 -> Gen.chooseNum(-100f, 100f),
      2 -> Gen.oneOf(0f, 1f, -1f, 0.5f, -0.5f, 63.5f, 0.25f, 1e-6f, 1e6f))
    val genVec = Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, genFloat).map(_.toArray))
    val prop = Prop.forAll(genVec) { v =>
      val got = Option(Int8Quant.compute(new GenericArrayData(v)))
        .map(row => (row.getDouble(0), row.getInt(1),
          row.getDouble(2), row.getDouble(3)))
      got == ref(v)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("graft_qdot registers for SQL use") {
    VectorExprs.register(spark)
    val out = spark.sql(
      "SELECT graft_qdot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .collect().head.getDouble(0)
    assert(out == 11.0)
  }
}
