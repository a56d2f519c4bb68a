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

    val q = args.headOption.getOrElse("d08_dedup_clusters")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val df = SparkEntry.queries(q)(spark, d)
    df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*)
      .show(50, truncate = false)
    println(s"[probe] $q rows=${df.count()}")
    spark.stop()
  }
}
