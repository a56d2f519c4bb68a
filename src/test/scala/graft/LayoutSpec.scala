package graft

import org.apache.spark.sql.functions._
import graft.load.Layout

/** Z-order layout: per-file min-max ranges must be bounded in BOTH
  * clustered dimensions (that is the entire point — a linear sort
  * bounds one and leaves the other at full domain). Uses a
  * deterministic 256×256 key grid so the expected tiling is exact:
  * 16 balanced Z-ranges of an aligned 256×256 grid are 64×64 tiles;
  * sampled range boundaries may straddle a tile edge, so the assert
  * allows 2× slack (≤128 per dim) — still far below the 255 full-domain
  * range a linear layout leaves on its unsorted dimension. */
class LayoutSpec extends SparkSpec {

  private def perFileRanges(path: String, cols: Seq[String]) = {
    val df = spark.read.parquet(path)
      .withColumn("f", input_file_name())
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(col("f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => cols.map(c =>
        r.getAs[Long](s"max_$c") - r.getAs[Long](s"min_$c")))
  }

  test("zValue interleaves bits") {
    val df = spark.range(1).select(
      Layout.zValue(lit(0), lit(0)).as("z00"),
      Layout.zValue(lit(1), lit(0)).as("z10"),
      Layout.zValue(lit(0), lit(1)).as("z01"),
      Layout.zValue(lit(3), lit(3)).as("z33"),
      Layout.zValue(lit(255), lit(0)).as("za"),
      Layout.zValue(lit(0), lit(255)).as("zb"))
    val r = df.collect()(0)
    assert(r.getAs[Long]("z00") == 0L)
    assert(r.getAs[Long]("z10") == 1L)
    assert(r.getAs[Long]("z01") == 2L)
    assert(r.getAs[Long]("z33") == 15L)
    // disjoint dims interleave without overlap and recombine additively
    assert((r.getAs[Long]("za") & r.getAs[Long]("zb")) == 0L)
  }

  test("z-ordered files bound BOTH dims; linear sort leaves one unbounded") {
    import spark.implicits._
    val grid = spark.range(65536)
      .select((col("id") % 256).as("a"), expr("id div 256").as("b"))
    val zDir = tmpDir("graft-zorder-")
    val linDir = tmpDir("graft-linear-")
    Layout.writeZOrdered(grid.toDF(), "a", "b", zDir, 16, bits = 8)
    Layout.writeLinear(grid.toDF(), "a", linDir, 16)

    val zRanges = perFileRanges(zDir, Seq("a", "b"))
    assert(zRanges.length >= 8, s"expected ~16 files, got ${zRanges.length}")
    val avgA = zRanges.map(_(0)).sum.toDouble / zRanges.length
    val avgB = zRanges.map(_(1)).sum.toDouble / zRanges.length
    assert(avgA <= 128, s"z-order dim a avg range $avgA")
    assert(avgB <= 128, s"z-order dim b avg range $avgB")

    val linRanges = perFileRanges(linDir, Seq("a", "b"))
    val avgLinB = linRanges.map(_(1)).sum.toDouble / linRanges.length
    assert(avgLinB >= 200,
      s"linear layout should NOT bound dim b (got avg $avgLinB)")
    // and the data survives the layout intact
    assert(spark.read.parquet(zDir).count() == 65536L)
  }

  test("salted partitioned Z-write survives a MapType column (hash() rejects maps)") {
    // ADVICE r15: the salt key hashed EVERY column, and Spark's hash()
    // fails analysis on MapType — any sliced fold/Z-write over a table
    // with a map column threw. The salt now hashes only hash-safe
    // columns (distribution, not determinism, is all it needs).
    import spark.implicits._
    val df = spark.range(1000)
      .select((col("id") % 2).as("p"), (col("id") % 100).as("a"),
        expr("id div 10").as("b"),
        expr("map('k', cast(id as string))").as("props"))
    val dir = tmpDir("graft-zmap-")
    Layout.writeZOrderedPartitioned(df.toDF(), Seq("p"), "a", "b", dir,
      slices = 3)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000L)
    assert(back.select("props").head().getMap[String, String](0)
      .nonEmpty)
    // (no file-count assert: AQE legitimately coalesces a test-sized
    // salted shuffle back to one partition — the defect under test was
    // the ANALYSIS failure, which would have thrown above)
    assert(back.groupBy("p").count().count() == 2L)
  }

  test("all-map salt fallback is deterministic per row (no monotonic id)") {
    // ADVICE r16 #4: when NO column is hash-safe the old fallback
    // salted on monotonically_increasing_id — a nondeterministic
    // repartition key, so a task retry after a partial shuffle fetch
    // could duplicate or lose rows. The fallback now hashes the map
    // columns through to_json: same row content → same salt, always.
    import spark.implicits._
    val df = spark.range(100)
      .select(expr("map('k', cast(id as string))").as("props"))
    val s = Layout.saltKey(df.toDF(), 4)
    // deterministic: evaluating the salt twice over the same rows
    // yields identical assignments (a monotonic id would differ when
    // partitioning/order shifts — force a different layout for run 2)
    val once = df.select(expr("props['k']").as("k"), s.as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val twice = df.repartition(7).select(expr("props['k']").as("k"), s.as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(once == twice, "salt must depend on row content only")
    assert(once.values.toSet.size > 1, "salt must still distribute")
  }
}
