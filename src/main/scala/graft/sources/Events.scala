package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `events` table's `ts` column has shipped under two physical
  * encodings across testdata generations: parquet TIMESTAMP(NANOS)
  * (which the vectorized reader only accepts as raw int64 ticks via
  * `spark.sql.legacy.parquet.nanosAsLong`) and plain `timestamp[us]`
  * (which Spark infers as TIMESTAMP_NTZ). Hard-coding either encoding
  * breaks — loudly or, worse, silently — when the producer switches, so
  * every events read routes through [[normalizeTs]], which branches on
  * the *scanned* schema and converts whatever arrived to session-zone
  * TimestampType. This is the same drift-tolerance contract the
  * reference implements with crawler re-inference + case-insensitive
  * COPY (reference: modules/glue.py:87-97, modules/snowflake.py:150):
  * re-derive the schema from the data on every read; never bake it in.
  */
object Events {
  /** The one place the nanos-compat conf is toggled (idempotent,
    * runtime-settable). Harmless for non-NANOS files — the conf only
    * affects TIMESTAMP(NANOS) columns — so it stays on unconditionally:
    * without it a legacy-encoded file fails the scan before we can even
    * inspect its schema. */
  def ensureNanosCompat(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Schema-adaptive `ts` normalization — the single conversion point
    * for batch and streaming reads alike (works on streaming frames:
    * it's one codegen'd projection, no action):
    *   - TimestampType: already an instant; pass through.
    *   - TimestampNTZType (modern `timestamp[us]` files): reinterpret
    *     the wall-clock in the session zone (UTC everywhere in this
    *     repo, matching DuckDB's naive read of the same file).
    *   - LongType (legacy NANOS files read via nanosAsLong): exact
    *     integer nanos→micros truncation, the same truncation every
    *     microsecond-precision engine applies.
    * Anything else is a loud error: an unrecognized encoding must fail
    * fast, not flow downstream as garbage. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case TimestampType    => df
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case DateType         => df.withColumn("ts", col("ts").cast(TimestampType))
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported physical type $other " +
      "(expected timestamp, timestamp_ntz, date, or int64 nanosecond ticks)")
  }

  def read(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosCompat(spark)
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }
}
