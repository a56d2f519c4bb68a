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
    val qs = Seq("q01_pricing_summary", "q03_join_broadcast", "q04_star_join",
      "q07_count_distinct", "q12_topk", "q22_left_outer", "q20_sessionize")
    val small = "/root/testdata/sf0.1"
    val big = "/tmp/graft_sfbig"
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
      println(f"[scale] $q%-22s 600k=${ts}%6.2fs  6M=${tb}%6.2fs  ratio=${tb / ts}%5.2f")
    }
    spark.stop()
  }
}
