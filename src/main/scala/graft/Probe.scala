package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe: ad-hoc plan/timing experiments (contents vary per
  * investigation; not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.Streamed.queries("st03_stateful_session")(spark, d)
    println(s"[probe] st03 rows: ${out.count()}")
    val st02 = graft.queries.Streamed.queries("st02_stream_session")(spark, d)
    println(s"[probe] st02 rows: ${st02.count()}")
    spark.stop()
  }
}
