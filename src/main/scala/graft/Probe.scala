package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe: ad-hoc plan/timing experiments (contents vary per
  * investigation; not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm
    graft.queries.Dedup.d03(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    graft.queries.Dedup.d05(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .repartition(col("doc_id"))
      .withColumn("shingles", graft.functions.TextExprs.shingles(col("text"), 3))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("shingles"))
    val sig = docs.select(col("doc_id"),
      posexplode(graft.functions.TextExprs.minhashSig(col("shingles"), 16))
        .as(Seq("t", "v")))
    time("sig only")(sig.write.format("noop").mode("overwrite").save())
    val cand = sig.as("a").hint("shuffle_hash")
      .join(sig.as("b"),
        col("a.t") === col("b.t") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("nt")).select(col("i"), col("j"))
    val nc = time("cand")(cand.count())
    println(s"[probe] candidates: $nc")
    time("d04 full")(graft.queries.Dedup.d04(spark, d)
      .write.format("noop").mode("overwrite").save())
    time("d05")(graft.queries.Dedup.d05(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
