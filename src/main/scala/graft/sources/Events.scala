package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `events` table is written with parquet TIMESTAMP(NANOS) which the
  * vectorized Spark reader rejects ([PARQUET_TYPE_ILLEGAL]). We read the
  * raw nanosecond ticks as longs (`spark.sql.legacy.parquet.nanosAsLong`)
  * and convert with exact integer arithmetic (`ts div 1000` →
  * `timestamp_micros`), which is the same truncation every
  * microsecond-precision engine applies. No row-by-row UDF: the conversion
  * is a single codegen'd projection over the scan.
  */
object Events {
  /** The one place the nanos-compat conf is toggled (idempotent,
    * runtime-settable): every events read — batch here, streaming in
    * [[graft.queries.Streamed]] — routes through this, so no query
    * function mutates session state ad hoc. Sessions built by
    * Verify/Bench/specs also set it at build time; this covers
    * arbitrary caller sessions. */
  def ensureNanosCompat(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def read(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosCompat(spark)
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
