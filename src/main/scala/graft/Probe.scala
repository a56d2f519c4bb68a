package graft
import org.apache.spark.sql.SparkSession

/** Dev-only micro-probe: time one registered query N times in a warm
  * session (SPARK_GRAFT_PROBE=name[,name...], SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_PROBE_N). Bench's min-of-two can hide warm-path
  * regressions; this prints every iteration. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "q01_pricing_summary")
      .split(",").toSeq
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // dev probe: streaming queries use a memory sink, whose collect
      // trips the 1g default at 100×-scale emission — not a finding
      .config("spark.driver.maxResultSize", "0")
    // SPARK_GRAFT_STREAM_LISTENER=graft.StateMetricsListener attaches
    // per-micro-batch state telemetry; cloned state sessions inherit it.
    sys.env.get("SPARK_GRAFT_STREAM_LISTENER").foreach(l =>
      builder.config("spark.sql.streaming.streamingQueryListeners", l))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[probe] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
