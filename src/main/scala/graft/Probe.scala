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

    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    args.headOption.getOrElse("s05_ivf_ann").split(",").foreach { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.001").write.format("noop")
        .mode("overwrite").save() // warm
      val times = (1 to 3).map(_ =>
        time(fn(spark, d).write.format("noop").mode("overwrite").save()))
      println(f"[probe] $q%-24s min=${times.min}%6.2fs  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
