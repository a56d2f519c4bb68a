package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val d = "/root/testdata/sf0.001"

    // does QDotFloat appear in generated code (vs interpreted fallback)?
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val q = e.limit(1).select(col("embedding").as("qe"))
    val df = e.crossJoin(broadcast(q))
      .select(graft.functions.VectorExprs.qdot(col("embedding"), col("qe")).as("dot"))
    val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    println("[probe] qdot in codegen: " + gen.contains("graft.functions.QDotFloat"))
    val simple = e.select(graft.functions.VectorExprs.qdot(col("embedding"), col("embedding")).as("nsq"))
    val gen3 = org.apache.spark.sql.execution.debug.codegenString(simple.queryExecution.executedPlan)
    println("[probe] qdot simple in codegen: " + gen3.contains("QDotFloat"))
    if (!gen3.contains("QDotFloat")) println("[probe] simple gen head: " + gen3.take(600).replace("\n"," | "))
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(graft.functions.TextExprs.shingles(col("text"), 3).as("sh"))
    val gen2 = org.apache.spark.sql.execution.debug.codegenString(docs.queryExecution.executedPlan)
    println("[probe] shingles in codegen: " + gen2.contains("graft.functions.WordShingles"))
    println("[probe] wholestage spans: " + gen.split("WholeStageCodegen").length)
    spark.stop()
  }
}
