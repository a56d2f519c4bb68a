package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Events

/** Guards against the round-8 failure mode: the testdata's `ts`
  * physical encoding changed (int64 TIMESTAMP(NANOS) → `timestamp[us]`)
  * under a read path that hard-coded one encoding, and the streaming
  * side silently returned 1000×-compressed timestamps (every event
  * collapsed into January 1970) — only the external oracle caught it.
  * These specs fail loudly on any future encoding drift:
  *   - the sanity-range test is encoding-agnostic (a mis-scaled epoch
  *     lands centuries away from the fixture's range);
  *   - the normalizeTs unit tests pin the conversion for each physical
  *     type the source has ever shipped, including the legacy
  *     nanos-as-long path no current fixture exercises.
  */
class EventsSpec extends SparkSpec {

  test("batch events read lands in a sane wall-clock range") {
    val mm = Events.read(spark, sf0001)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (mm.getInt(0), mm.getInt(1))
    assert(lo >= 1990 && hi <= 2100,
      s"events.ts outside [1990, 2100] (got years $lo..$hi) — " +
        "the physical-encoding normalization is mis-scaling timestamps")
  }

  test("batch events read yields TimestampType regardless of file encoding") {
    assert(Events.read(spark, sf0001).schema("ts").dataType === TimestampType)
  }

  test("normalizeTs converts legacy nanosecond longs exactly (micros truncation)") {
    import spark.implicits._
    // 2024-03-01T12:00:00.123456789Z as nanos since epoch: the 789
    // sub-microsecond tail must truncate, not round.
    val nanos = 1709294400L * 1000000000L + 123456789L
    val df = Seq(nanos).toDF("ts")
    val out = Events.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === nanos / 1000L)
  }

  test("normalizeTs reinterprets TIMESTAMP_NTZ wall-clock in the session zone") {
    import spark.implicits._
    val df = Seq("2024-03-01T12:00:00.123456").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    val out = Events.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    // Session zone is UTC: the instant equals the literal wall-clock.
    val got = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got === 1709294400L * 1000000L + 123456L)
  }

  test("normalizeTs passes TimestampType through untouched") {
    import spark.implicits._
    val df = Seq("2024-03-01 12:00:00").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"), lit(1).as("x"))
    assert(Events.normalizeTs(df) eq df)
  }

  test("normalizeTs rejects unrecognized encodings loudly") {
    import spark.implicits._
    val df = Seq("oops").toDF("ts")
    val e = intercept[IllegalArgumentException](Events.normalizeTs(df))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("streaming events read agrees with the batch read (no hard-coded schema)") {
    // The batch side is oracle-checked; the streaming side must see the
    // identical event set. st01's hourly rollup at sf0.001 is a cheap
    // full-content proxy: compare it against the same aggregation
    // stated over the batch read.
    val streamed = graft.queries.Streamed.st01(spark, sf0001)
      .orderBy("hour", "event_type").collect().toSeq
    val batch = Events.read(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           graft.queries.Num.dsum(col("value")).as("total_value"))
      .orderBy("hour", "event_type").collect().toSeq
    assert(streamed === batch)
  }
}
