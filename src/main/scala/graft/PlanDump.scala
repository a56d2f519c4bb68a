package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev-only: print FormattedMode plans for the queries named in
  * SPARK_GRAFT_PROBE (comma-separated) at sf0.001. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = sys.env.getOrElse("SPARK_GRAFT_PROBE", "").split(",").toSeq
    names.filter(_.nonEmpty).foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
