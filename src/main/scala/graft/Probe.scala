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

    graft.queries.Dedup.d06(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    time("d06 warm r1")(graft.queries.Dedup.d06(spark, d)
      .write.format("noop").mode("overwrite").save())
    time("d06 warm r2")(graft.queries.Dedup.d06(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
