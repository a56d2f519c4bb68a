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

  test("state-store provider auto-selects by expected state cardinality") {
    import graft.queries.Streamed
    // Below the measured crossover the default in-memory provider wins
    // (SCALE.md round-6 measurement) — no override is set.
    assert(Streamed.chooseStateStore(0L).isEmpty)
    assert(Streamed.chooseStateStore(Streamed.StateRowsCrossover).isEmpty)
    // Above it, corpus-keyed state must land in RocksDB: the in-memory
    // provider measured DNF at ~10M state rows.
    assert(Streamed.chooseStateStore(Streamed.StateRowsCrossover + 1)
      .contains("org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"))
    // The cardinality estimate reads parquet footers, no data scan —
    // it must agree with the real row count.
    val n = Streamed.parquetRowCount(spark, s"$sf0001/events.parquet")
    assert(n == spark.read.parquet(s"$sf0001/events.parquet").count())
    assert(n > 0)
  }

  test("SpaceSaving heavy hitters: eviction bounds the error, top keys exact") {
    import graft.streaming.HeavyHitters
    // Skewed fixture forcing the eviction path (capacity 4 < 12 keys):
    // user 1 ×50 and user 2 ×30 dominate; ten singletons churn the two
    // remaining counters. N = 90, capacity = 4 → over-count ≤ 22.
    val events = (Seq.fill(50)(1L) ++ Seq.fill(30)(2L) ++ (3L to 12L))
      .map(u => ("x", u)).toDF("event_type", "user_id").coalesce(1)
    val out = HeavyHitters.topK(events, capacity = 4, k = 3)
      .collect().sortBy(_.rank)
    assert(out.length == 3)
    // the dominant keys are never the minimum counter, so never evicted:
    // their counts are EXACT and they hold ranks 1–2
    assert(out(0).user_id == 1L && out(0).est_count == 50L)
    assert(out(1).user_id == 2L && out(1).est_count == 30L)
    // every estimate obeys the SpaceSaving bound: true ≤ est ≤ true + N/m
    val truth = Map(1L -> 50L, 2L -> 30L) ++ (3L to 12L).map(_ -> 1L)
    out.foreach { h =>
      val t = truth(h.user_id)
      assert(h.est_count >= t && h.est_count <= t + 90 / 4,
        s"user ${h.user_id}: est ${h.est_count} vs true $t")
    }
    // exact regime: capacity ≥ cardinality degenerates to exact counts
    val exact = HeavyHitters.topK(events, capacity = 64, k = 12)
      .collect()
    exact.foreach(h => assert(h.est_count == truth(h.user_id)))
    // sharded variant: disjoint user shards, so the union of per-shard
    // counter sets re-ranked must equal the unsharded exact top-k
    val sharded = HeavyHitters.topKSharded(events, capacity = 64, k = 12,
        shards = 4)
      .orderBy(col("est_count").desc, col("user_id").asc)
      .collect()
    assert(sharded.map(r => r.getAs[Long]("user_id") ->
      r.getAs[Long]("est_count")).toMap == truth)
  }

  test("st23 sketch capacity sizes from footer stats, scales with the fixture") {
    // VERDICT r11 #4: sizing must come from parquet footer metadata
    // (max user_id bounds distinct users for a dense non-negative id),
    // not a countDistinct job. Pin the formula at two fixture scales:
    // sf0.001 has ≤15 users (floor wins), sf0.01 has 150 (floor still
    // wins at 16 shards), sf0.1 has 1500 → 2*(1500/16+1) < 512 floor…
    // so also check monotonicity + exactness bound directly.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      assume(new java.io.File(s"$d/events.parquet").exists())
      val cap = graft.queries.Streamed.st23Capacity(spark, d)
      val users = graft.sources.Events.read(spark, d)
        .select(countDistinct(col("user_id"))).head().getLong(0)
      // exactness bound: per-(type, shard) users never exceed capacity
      assert(cap >= users / 16 + 1,
        s"$sf: capacity $cap under the exact-regime bound for $users users")
      assert(cap <= (1 << 16), s"$sf: capacity $cap exceeds the memory clamp")
      // the floor keeps small fixtures at 512; the formula only grows
      assert(cap >= 512)
    }
    // a synthetic high-cardinality fixture outgrows the floor
    val big = tmpDir("graft-st23cap-")
    spark.range(0, 200000).selectExpr("id AS user_id")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$big/events.parquet")
    val capBig = graft.queries.Streamed.st23Capacity(spark, big)
    assert(capBig == math.min(1 << 16, 2 * (200000 / 16 + 1)),
      s"footer-sized capacity mismatch: $capBig")
    // …and regenerating the fixture under the SAME path re-sizes
    // (stat cache keyed by mtime/len, ADVICE r11's staleness fix)
    Thread.sleep(1100) // local fs mtime granularity
    spark.range(0, 1000).selectExpr("id AS user_id")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$big/events.parquet")
    assert(graft.queries.Streamed.st23Capacity(spark, big) == 512,
      "stale capacity cache survived a fixture regeneration")
  }

  test("sharded heavy hitters: multi-batch run ranks only the latest generation") {
    import graft.streaming.HeavyHitters
    // Two staged files + maxFilesPerTrigger=1 → two micro-batches. The
    // update-mode sink then holds TWO counter generations for every
    // shard touched twice; rankLatest must discard the stale one or the
    // final ranking duplicates (type, user) rows with first-batch
    // counts (the exact hazard ADVICE r9 flagged in st23's finisher).
    val src = tmpDir("graft-hh-src-")
    Seq.fill(5)(1L).concat(Seq.fill(3)(2L)).map(("x", _))
      .toDF("event_type", "user_id").coalesce(1)
      .write.mode("append").parquet(src)
    Seq.fill(2)(1L).concat(Seq.fill(4)(3L)).map(("x", _))
      .toDF("event_type", "user_id").coalesce(1)
      .write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("event_type STRING, user_id LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    val counters = HeavyHitters.topKSharded(stream,
      capacity = 64, k = 3, shards = 2)
    val q = counters.writeStream.outputMode("update").format("memory")
      .queryName("hh_multi").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sink = spark.table("hh_multi")
    // the run really was multi-batch: a second generation was emitted
    assert(sink.select("gen").distinct().count() > 1,
      "expected at least two emission generations in the sink")
    val ranked = HeavyHitters.rankLatest(sink, 3)
      .collect().sortBy(r => r.getAs[Int]("rank"))
    // exactly one row per (type, user), totals across BOTH batches
    assert(ranked.length == 3)
    assert(ranked.map(r => r.getAs[Long]("user_id") ->
      r.getAs[Long]("est_count")).toSeq ==
      Seq(1L -> 7L, 3L -> 4L, 2L -> 3L),
      s"stale generation leaked into the ranking: ${ranked.toSeq}")
  }

  test("transformWithState sessions equal flatMapGroupsWithState sessions") {
    // Two state APIs, one contract: any divergence isolates to the
    // state/timer plumbing (the shared merge/emit logic is the same
    // code). The driver's oracle checks both against st02's SQL; this
    // pins them against each other directly.
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf0001)
        .orderBy("session_start", "user_id").collect().toSeq
    assert(rows("st16_tws_session") == rows("st03_stateful_session"),
      "transformWithState diverged from flatMapGroupsWithState")
  }

  test("stream-stream interval join matches across checkpointed restarts") {
    val src = tmpDir("graft-ssj-src-")
    val out = tmpDir("graft-ssj-out-") + "/p"
    val cp = tmpDir("graft-ssj-cp-")

    def runOnce(): Unit = {
      val evs = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, kind STRING")
        .parquet(src)
        .withWatermark("ts", "1 hour")
      val views = evs.filter(col("kind") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      val buys = evs.filter(col("kind") === "buy")
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      val q = buys.join(views,
          col("b_user") === col("v_user") &&
            col("v_ts") <= col("b_ts") &&
            col("v_ts") >= col("b_ts") - expr("INTERVAL 1 HOUR"))
        .select(col("b_user").as("user_id"), col("b_ts"), col("v_ts"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // Batch 1: a view at 10:00, a buy at 10:30 (joins), a view at 12:00.
    Seq((1L, ts("2024-01-01 10:00:00"), "view"),
        (1L, ts("2024-01-01 10:30:00"), "buy"),
        (1L, ts("2024-01-01 12:00:00"), "view"))
      .toDF("user_id", "ts", "kind").write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 1)

    // Batch 2 (same checkpoint): a buy at 12:20 must join the BUFFERED
    // 12:00 view from batch 1 — the join state survived the restart.
    Seq((1L, ts("2024-01-01 12:20:00"), "buy"))
      .toDF("user_id", "ts", "kind").write.mode("append").parquet(src)
    runOnce()
    val rows = spark.read.parquet(out)
      .select(col("b_ts"), col("v_ts")).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1))).toSet
    assert(rows == Set(
      (ts("2024-01-01 10:30:00"), ts("2024-01-01 10:00:00")),
      (ts("2024-01-01 12:20:00"), ts("2024-01-01 12:00:00"))),
      s"join state lost across restart or wrong matches: $rows")
  }
}
