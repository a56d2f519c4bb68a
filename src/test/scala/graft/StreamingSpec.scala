package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark semantics (SURVEY.md §2.8): append-mode session windows
  * must (a) withhold still-open sessions, (b) emit sessions once the
  * watermark passes their end, and (c) DROP late rows that arrive behind
  * the watermark — the part no batch query exhibits, tested here across
  * two checkpointed AvailableNow runs.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append-mode session_window drops late data behind the watermark") {
    val src = tmpDir("graft-late-src-")
    val out = tmpDir("graft-late-out-") + "/p"
    val cp = tmpDir("graft-late-cp-")

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("start"),
                col("user_id"), col("n_events"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // Run 1: events at 00:00 and 12:00 → watermark 11:00. The 00:00
    // session (ends 00:10) closes and is emitted; 12:00 stays open.
    Seq((1L, ts("2024-01-01 00:00:00"), 1.0),
        (1L, ts("2024-01-01 12:00:00"), 1.0))
      .toDF("user_id", "ts", "value").write.mode("append").parquet(src)
    runOnce()
    val r1 = spark.read.parquet(out).collect()
    assert(r1.map(_.getAs[Timestamp]("start")).toSet ==
      Set(ts("2024-01-01 00:00:00")), "open session leaked before close")

    // Run 2 (same checkpoint → watermark resumes at 11:00): a LATE event
    // at 00:30 — behind the watermark, must be dropped — plus a fresh
    // event at 14:00, which advances the watermark to 13:00 and closes
    // the 12:00 session.
    Seq((1L, ts("2024-01-01 00:30:00"), 1.0),
        (1L, ts("2024-01-01 14:00:00"), 1.0))
      .toDF("user_id", "ts", "value").write.mode("append").parquet(src)
    runOnce()
    val r2 = spark.read.parquet(out).collect()
    val starts = r2.map(_.getAs[Timestamp]("start")).toSet
    assert(starts ==
      Set(ts("2024-01-01 00:00:00"), ts("2024-01-01 12:00:00")),
      s"late event leaked or closed session not flushed: $starts")
    // One event per emitted session — the late 00:30 row joined nothing.
    assert(r2.map(_.getAs[Long]("n_events")).sum == 2)
  }
}
