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
  def read(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
