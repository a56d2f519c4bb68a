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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val qs = Seq("d01_dedup_exact", "d02_dedup_hash", "d03_dedup_jaccard",
      "d04_dedup_minhash_lsh", "d05_dedup_simhash", "d07_dedup_keep_best",
      "t02_quality_score", "t04_fingerprint", "t06_token_count_regex")
    val small = "/root/testdata/sf0.1"
    val big = "/tmp/graft_sfbig"
    // warm
    qs.foreach(q => SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save())
    qs.foreach { q =>
      val fn = SparkEntry.queries(q)
      def run(d: String) = {
        val r1 = time(fn(spark, d).write.format("noop").mode("overwrite").save())
        val r2 = time(fn(spark, d).write.format("noop").mode("overwrite").save())
        math.min(r1, r2)
      }
      val ts = run(small)
      val tb = run(big)
      val rows = fn(spark, big).count()
      println(f"[scale] $q%-24s 5k=${ts}%6.2fs  50k=${tb}%6.2fs  ratio=${tb / ts}%5.2f  rows50k=$rows")
    }
    spark.stop()
  }
}
