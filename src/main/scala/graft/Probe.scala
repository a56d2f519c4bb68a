package graft

import org.apache.spark.sql.SparkSession
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
    val d = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def d03Posting(dir: String) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(col("doc_id"))
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 3)
        .withColumn("shingles", expr(
          """array_distinct(transform(sequence(1, size(w) - 2),
            |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
            |                 element_at(w, i + 2))))""".stripMargin))
      val sh0 = docs.select(col("doc_id"), explode(col("shingles")).as("s"))
      val counts = broadcast(
        sh0.groupBy(col("doc_id")).agg(count(lit(1)).as("n")))
      val inv = sh0.groupBy(col("s"))
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")).between(2, 50))
      val pairs = inv.select(explode(expr(
        """flatten(transform(docs, (x, ix) ->
          |  transform(slice(docs, ix + 2, size(docs)),
          |            y -> named_struct('i', x, 'j', y))))""".stripMargin))
        .as("p"))
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

    // warm both variants at sf0.001
    d03Posting("/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    graft.queries.Dedup.d03(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    time("d03 current  r1")(graft.queries.Dedup.d03(spark, d)
      .write.format("noop").mode("overwrite").save())
    time("d03 current  r2")(graft.queries.Dedup.d03(spark, d)
      .write.format("noop").mode("overwrite").save())
    time("d03 posting  r1")(d03Posting(d)
      .write.format("noop").mode("overwrite").save())
    time("d03 posting  r2")(d03Posting(d)
      .write.format("noop").mode("overwrite").save())
    println(s"[probe] rows current=${graft.queries.Dedup.d03(spark, d).count()} posting=${d03Posting(d).count()}")
    spark.stop()
  }
}
