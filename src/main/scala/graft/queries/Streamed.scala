package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import Num._

/** Structured Streaming surface (SURVEY.md §2.8). The reference's
  * Snowpipe leg is an unbounded stream of files; its Spark-native shape
  * is `readStream` (file source) → event-time windowed aggregation →
  * sink, with the checkpoint playing the load-history role
  * (that exactly-once ingest leg lives in [[graft.load.WarehouseLoad]]).
  *
  * st01 runs the same tumbling-window aggregation as q19 but through a
  * real streaming query (`Trigger.AvailableNow`, complete mode): the
  * batch oracle therefore checks streaming semantics. The memory sink is
  * a test/verify device only — at scale the sink is parquet/Kafka and
  * output mode is append with a watermark.
  */
object Streamed {
  type Q = (SparkSession, String) => DataFrame

  /** events schema with ts as raw nanosecond ticks (see sources.Events). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming file source wants a *directory*; the testdata ships a
    * single parquet file. Stage a temp dir with a symlink to it (no data
    * copy — the same pattern as pointing the source at a landing dir). */
  private def stageDir(d: String): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-stream-")
    dir.toFile.deleteOnExit()
    Files.createSymbolicLink(dir.resolve("events.parquet"),
      Paths.get(s"$d/events.parquet"))
    dir.toString
  }

  // --------------------------------------------------------------- st01
  val st01: Q = (s, d) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val agg = s.readStream
      .schema(rawSchema)
      .parquet(stageDir(d))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    val name = "st01_mem"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
      .select(col("window.start").as("hour"), col("event_type"),
              col("n"), col("total_value"))
  }

  val st01Sql: String = s"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           COUNT(*) AS n, ${sqlDsum("value")} AS total_value
    FROM events GROUP BY 1, 2"""

  val queries: Map[String, Q] = Map("st01_stream_tumbling" -> st01)
  val oracle: Map[String, String] = Map("st01_stream_tumbling" -> st01Sql)
}
