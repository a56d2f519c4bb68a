package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.load.WarehouseLoad
import graft.sources.CsvSource
import graft.transform.Transcode

/** End-to-end pipeline — the reference's full topology collapsed into
  * one JVM (SURVEY.md §3): CSV lands → schema inference ("crawl") →
  * JSON transcode (the Glue job) → schema-aligned typed load (Snowpipe).
  *
  * Config is explicit (no hardcoded paths/table names — fixing the
  * reference quirks in SURVEY.md §2.11). The crawl-then-run race in the
  * reference's repo Lambda (§2.11 #3) is structurally impossible here:
  * stages are sequential function calls.
  */
object Pipeline {
  final case class Config(
    landingDir: String,
    stagingDir: String,
    warehouseDir: String,
    checkpointDir: String,
    target: StructType,
    catalogTable: String = "landing",
    strict: Boolean = false)

  /** Batch run: crawl → transcode → load. Returns the warehouse frame. */
  def run(spark: SparkSession, cfg: Config): DataFrame = {
    val inferred = CsvSource.infer(spark, cfg.landingDir, cfg.catalogTable)
    val df = CsvSource.read(spark, cfg.landingDir, inferred)
    Transcode.toJson(df, cfg.stagingDir)
    WarehouseLoad.batch(spark, cfg.stagingDir, cfg.target,
      cfg.warehouseDir, cfg.strict)
    spark.read.parquet(cfg.warehouseDir)
  }

  /** Continuous run: same stages, but the load leg is the checkpointed
    * streaming query — re-invocations only ingest unseen staged files
    * (Snowpipe load-history semantics). */
  def runContinuous(spark: SparkSession, cfg: Config): DataFrame = {
    val inferred = CsvSource.infer(spark, cfg.landingDir, cfg.catalogTable)
    val df = CsvSource.read(spark, cfg.landingDir, inferred)
    Transcode.toJson(df, cfg.stagingDir)
    val q = WarehouseLoad.continuous(spark, cfg.stagingDir, cfg.target,
      cfg.warehouseDir, cfg.checkpointDir)
    q.awaitTermination()
    spark.read.parquet(cfg.warehouseDir)
  }
}
