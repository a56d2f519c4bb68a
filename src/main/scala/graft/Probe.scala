package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe: ad-hoc plan/timing experiments (contents vary per
  * investigation; not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- graft.sources.Tables.all) {
      try {
        val df = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", t)
        println(s"$t -> rows=${df.count()}")
      } catch {
        case e: Throwable => println(s"$t -> FAIL ${e.getMessage.take(200)}")
      }
    }
    spark.stop()
  }
}
