package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // posting-list d03 variant: invert once, emit pairs from each list
    def d03Posting(d: String): DataFrame = {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .repartition(col("doc_id"))
        .withColumn("shingles", graft.functions.TextExprs.shingles(col("text"), 3))
        .filter(size(col("shingles")) > 0)
      val sh0 = docs.select(col("doc_id"), explode(col("shingles")).as("s"))
      val counts = broadcast(
        sh0.groupBy(col("doc_id")).agg(count(lit(1)).as("n")))
      val inv = sh0.groupBy(col("s"))
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")).between(2, 50))
      val pairs = inv.select(explode(expr(
        """flatten(transform(docs, (x, ix) ->
          |  transform(slice(docs, ix + 2, size(docs)),
          |            y -> named_struct('i', x, 'j', y))))""".stripMargin)).as("p"))
        .select(col("p.i").as("i"), col("p.j").as("j"))
      val common = pairs.groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      common
        .join(counts.select(col("doc_id").as("i"), col("n").as("ni")), Seq("i"))
        .join(counts.select(col("doc_id").as("j"), col("n").as("nj")), Seq("j"))
        .withColumn("jaccard",
          col("c").cast("double") / (col("ni") + col("nj") - col("c")))
        .filter(col("jaccard") >= 0.5)
        .select(col("i"), col("j"), col("c"), col("ni"), col("nj"), col("jaccard"))
    }

    val big = "/tmp/graft_sfbig"
    // warm both at sf0.001
    graft.queries.Dedup.d03(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    d03Posting("/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    val tJoin = math.min(
      time(graft.queries.Dedup.d03(spark, big).write.format("noop").mode("overwrite").save()),
      time(graft.queries.Dedup.d03(spark, big).write.format("noop").mode("overwrite").save()))
    val tPost = math.min(
      time(d03Posting(big).write.format("noop").mode("overwrite").save()),
      time(d03Posting(big).write.format("noop").mode("overwrite").save()))
    println(f"[probe] d03 join-based @50k: $tJoin%.2f s")
    println(f"[probe] d03 posting   @50k: $tPost%.2f s")
    println(s"[probe] rows join=${graft.queries.Dedup.d03(spark, big).count()} posting=${d03Posting(big).count()}")
    spark.stop()
  }
}
