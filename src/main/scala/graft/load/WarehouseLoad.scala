package graft.load

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructType}
import graft.schema.SchemaAlign

/** Typed warehouse load — the Snowpipe leg of the reference
  * (/root/reference/modules/snowflake.py:145-178): each new JSON file in
  * the staging dir is parsed, schema-aligned case-insensitively against
  * the declared DDL, coerced, and appended exactly once to the warehouse
  * table.
  *
  *  - [[batch]]: one-shot COPY of everything currently staged.
  *  - [[batchIdempotent]]: COPY with load history under an ATOMIC batch
  *    commit — crash anywhere and re-run; no row ever doubles.
  *  - [[batchQuarantine]]: `ON_ERROR = CONTINUE` + error table.
  *  - [[continuous]]: Structured Streaming file source with a checkpoint
  *    — the checkpoint's seen-files log IS Snowpipe's load history, so
  *    re-runs (Trigger.AvailableNow) load only unseen files, giving the
  *    per-file exactly-once semantics of `auto_ingest` pipes. Restart
  *    with the same checkpoint after a crash and no row is doubled.
  *
  * Failure policy: `strict = true` mirrors COPY's default
  * `ON_ERROR` (refuse the batch when any value fails coercion OR fails
  * to parse at all — a malformed line must abort, not load as nulls);
  * `strict = false` mirrors `ON_ERROR = CONTINUE` (nulls through).
  */
object WarehouseLoad {
  final class CoercionException(msg: String) extends RuntimeException(msg)

  /** Thrown when the load's coverage guard detects that a staged file
    * recorded as fresh contributed no rows to the written batch — the
    * silent-loss mode of a path-spelling divergence between the
    * directory listing and the scan's `_metadata.file_path`. The batch
    * is NOT committed (manifest untouched), so the load can be re-run
    * after diagnosis with zero data loss. */
  final class CoverageException(msg: String) extends RuntimeException(msg)

  private val StrictMarker = "GRAFT_COERCION_FAILURE"
  private val CorruptCol = "_graft_corrupt_record"
  private val FileCol = "_graft_file"
  private val CommitLog = "_COMMITTED"

  /** Canonical file-URI spelling, so paths from the independent
    * producers — `FileStatus.getPath` ("file:/tmp/x") and the
    * `_metadata.file_path` scan column ("file:///tmp/x") — compare
    * equal. Two normalizations, applied identically on both sides:
    * percent-decoding (a filename with a space/%/# character, or a
    * Spark upgrade changing `_metadata.file_path`'s encoding, must not
    * silently diverge the spellings — both sides decode to the same raw
    * form, or both fall back to the raw input when it is not valid
    * percent-encoding), then the `file:` slash count (only the
    * authority-less `file:` scheme is ambiguous; schemes with an
    * authority — hdfs://, s3a:// — already spell the `//` and pass
    * through untouched). [[loadAtomic]]'s coverage guard backstops the
    * normalization: a divergence it does NOT reconcile aborts the batch
    * instead of recording unread files as loaded. */
  private def norm(p: String): String = {
    val decoded =
      try java.net.URLDecoder.decode(p, "UTF-8")
      catch { case _: IllegalArgumentException => p }
    decoded.replaceFirst("^file:/+", "file:///")
  }

  private def normCol(c: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, regexp_replace, try_url_decode}
    regexp_replace(coalesce(try_url_decode(c), c), "^file:/+", "file:///")
  }

  /** One snapshot listing of the staging dir — data files only (no
    * `_SUCCESS`/dot files), canonical URIs + lengths, sorted for
    * determinism. This is the same metadata-only listing Spark's own
    * file index performs; nothing row-sized ever lands on the driver. */
  private def listStaged(spark: SparkSession, stagingDir: String):
      Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => (norm(st.getPath.toUri.toString), st.getLen)).sortBy(_._1)
  }

  /** Strict mode folds the failure check into the load's own scan as an
    * `assert_true` filter guard (throws from the executor on the first
    * bad row) instead of a separate counting pass — one read of the
    * batch, not two; at warehouse scale the second full scan is real
    * money. The guard is a filter, so column pruning cannot drop it.
    * A malformed line counts as a failure too when the frame carries
    * the corrupt-record column: COPY's default ON_ERROR aborts on parse
    * errors, and a permissive read would otherwise turn the line into
    * an all-null row that passes the cast check vacuously. */
  private def align(raw: DataFrame, target: StructType,
                    strict: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{assert_true, coalesce, col, lit, not}
    val guarded =
      if (strict) {
        val castBad = SchemaAlign.castFailure(raw, target)
        val bad =
          if (raw.columns.contains(CorruptCol))
            castBad || col(CorruptCol).isNotNull
          else castBad
        raw.filter(coalesce(
          assert_true(not(bad),
            lit(s"$StrictMarker: row failed coercion to the declared schema")),
          lit(true)))
      } else raw
    SchemaAlign(guarded, target)
  }

  private def rethrowStrict[T](f: => T): T =
    try f catch {
      case e: Throwable
          if Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
            .exists(c => c.getMessage != null &&
              c.getMessage.contains(StrictMarker)) =>
        throw new CoercionException(
          "batch refused: at least one row failed coercion to the declared schema")
    }

  /** Schema of the staged JSON *as the files spell it* (original key
    * casing), all primitives as strings so alignment — not the JSON
    * sampler — owns type coercion, exactly how COPY treats JSON text
    * values. A schema'd Spark JSON read matches keys case-sensitively,
    * so reading with lower-cased target names would null out every
    * CamelCase key; inferring the real keys and letting [[SchemaAlign]]
    * resolve them case-insensitively is the COPY semantic.
    *
    * Inference runs over the staging ROOT (one single-root metadata +
    * sample pass, constant-size plan at any file count) — the
    * operational contract is a BOUNDED, homogeneous staging root (point
    * it at the current arrival partition, archive drained ones), so the
    * key set is the batch's key set. At scale, set `samplingRatio` < 1
    * to pin the key set from a sample instead of a full inference
    * scan. */
  private def stagedSchema(spark: SparkSession, stagingDir: String,
                           samplingRatio: Double = 1.0): StructType =
    spark.read
      .option("primitivesAsString", "true")
      .option("samplingRatio", samplingRatio.toString)
      .json(stagingDir).schema

  /** One-shot load of the staged JSON into the parquet warehouse table.
    *
    * `partitionCols` hive-partitions the warehouse table (the Snowflake
    * micro-partition analog): downstream queries filtering on those
    * columns prune whole directories at the file-listing level before a
    * single byte is scanned — the difference between touching 1/n-th of
    * a 100 TB table and all of it. */
  def batch(spark: SparkSession, stagingDir: String, target: StructType,
            warehouseDir: String, strict: Boolean = false,
            partitionCols: Seq[String] = Nil): Unit = {
    val schema = stagedSchema(spark, stagingDir)
    require(!schema.fieldNames.contains(CorruptCol),
      s"staged data may not carry a '$CorruptCol' column")
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(stagingDir)
    rethrowStrict {
      align(raw, target, strict)
        .write.mode("append").partitionBy(partitionCols: _*)
        .parquet(warehouseDir)
    }
  }

  // ------------------------------------------------------------------
  // Idempotent batch load: atomic batch commit + load history
  // ------------------------------------------------------------------

  /** Batch ids committed so far, in commit order — the content of the
    * history dir's `_COMMITTED` manifest. Everything outside this list
    * (a data dir written by a crashed attempt, a half-staged history
    * snapshot) is invisible to readers and harmlessly overwritten by
    * the retry. */
  private[graft] def committedBatches(spark: SparkSession,
                                      historyDir: String): Seq[String] =
    AtomicManifest.read(spark, historyDir, CommitLog)
      .map(_.split("\n").toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  /** The committed warehouse relation: the union of the committed batch
    * data dirs. One scan root per committed batch — bounded by the
    * number of LOADS, not files (a million-file staging wave is still
    * one root); fold old batches with [[Compaction]] when the load
    * count itself grows large. `None` before the first commit. */
  def readWarehouse(spark: SparkSession, warehouseDir: String,
                    historyDir: String): Option[DataFrame] = {
    val dirs = committedBatches(spark, historyDir)
      .map(id => s"$warehouseDir/b$id")
      .filter { d =>
        // A batch of only-empty staged files writes no parquet parts;
        // skip its (fileless) dir so schema inference has real footers.
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.exists(p) && fs.listStatus(p).exists(st =>
          st.isFile && !st.getPath.getName.startsWith("_"))
      }
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** The committed load history — one row per loaded source file:
    * (file, batch). `None` before the first commit. */
  def loadedFiles(spark: SparkSession, historyDir: String):
      Option[DataFrame] = {
    import org.apache.spark.sql.functions.lit
    val ids = committedBatches(spark, historyDir)
    if (ids.isEmpty) None
    else Some(ids.map(id =>
      spark.read.parquet(s"$historyDir/b$id").withColumn("batch", lit(id)))
      .reduce(_ unionByName _))
  }

  /** Batch load with COPY's per-file load-history dedup: every staged
    * file loads at most once across re-runs — the batch analog of
    * Snowpipe's load history (the reference records loaded files and
    * skips them on the next COPY,
    * /root/reference/modules/snowflake.py:158-167).
    *
    * EXACTLY-ONCE UNDER CRASHES — the batch commit is atomic. A batch's
    * data files land under `warehouseDir/b<id>/`, its fresh-file list
    * under `historyDir/b<id>/`, and ONLY then does the history dir's
    * `_COMMITTED` manifest repoint (write-temp + atomic rename,
    * [[AtomicManifest]]). Readers ([[readWarehouse]], and the next
    * run's anti-join via [[loadedFiles]]) resolve the manifest first,
    * so a crash anywhere before the repoint leaves the warehouse
    * bit-for-bit unchanged; the retry recomputes the SAME fresh set
    * (history unchanged) and therefore the SAME deterministic batch id,
    * overwrites the orphaned dirs, and repoints. The old two-phase
    * append (data, then history, no manifest) re-loaded files when a
    * crash fell between the two writes — that window no longer exists.
    *
    * NO path list ever collects to the driver and NO path list is
    * spliced into the scan plan: the fresh-file set stays a DataFrame
    * end to end (listing snapshot anti-joined against history, both
    * distributed), the data read is ONE single-root scan of the staging
    * dir filtered by a broadcast semi-join on the `_metadata.file_path`
    * column, and the history snapshot writes that same DataFrame. The
    * plan is constant-size in the file count — a million-file staging
    * wave plans exactly like a two-file one (the vararg-path
    * alternative puts every path in the driver's plan AND resolves each
    * one individually). The trade: already-loaded files under the root
    * are re-scanned and their rows discarded by the semi-join, so the
    * operational contract at warehouse scale is a BOUNDED staging root —
    * point this at the current arrival partition (e.g. `stage/d=today`)
    * and archive drained partitions, exactly how Snowpipe stages are
    * drained. The steady-state alternative with no rescan at all is the
    * checkpointed [[continuous]] leg.
    *
    * COVERAGE GUARD: the write's own job observes (CollectMetrics — no
    * extra scan) the set of file-path hashes that actually contributed
    * rows; any non-empty fresh file absent from that set means the
    * listing and the scan disagree on a path's spelling, and the batch
    * ABORTS before the manifest repoint ([[CoverageException]]) instead
    * of recording a file as loaded without its data — the silent-loss
    * mode ADVICE r11 flagged. Hash-set membership (xxhash64, 8 B/file)
    * keeps the metric listing-sized even for very wide waves. */
  def batchIdempotent(spark: SparkSession, stagingDir: String,
                      target: StructType, warehouseDir: String,
                      historyDir: String, strict: Boolean = false): Unit =
    loadAtomic(spark, stagingDir, target, warehouseDir, historyDir, strict)

  /** [[batchIdempotent]] with a crash-injection seam: `failpoint` runs
    * after the data write ("data-written") and after the history
    * snapshot ("history-written"), BEFORE the manifest repoint — specs
    * throw from it to prove a crash between the phases re-runs to the
    * exact committed state with zero duplicate rows. */
  private[graft] def loadAtomic(spark: SparkSession, stagingDir: String,
      target: StructType, warehouseDir: String, historyDir: String,
      strict: Boolean = false,
      failpoint: String => Unit = _ => ()): Unit =
    idempotentBatch(spark, stagingDir, historyDir).foreach {
      case (freshFiles, data) =>
        import org.apache.spark.sql.functions.{bit_xor, col, collect_set, count, lit, when, xxhash64}
        // ONE listing-sized job yields the deterministic batch id (an
        // order-independent combine of the fresh set's path hashes
        // under two independent seeds — stable across retries of the
        // same logical batch; xor not sum, so ANSI mode can't overflow)
        // and the guard's expected-hash set (empty files legitimately
        // contribute no rows and are exempt).
        val parts = freshFiles.agg(
          bit_xor(xxhash64(col("file"))).as("x1"),
          bit_xor(xxhash64(col("file"), lit(1))).as("x2"),
          count(lit(1)).as("n"),
          collect_set(when(col("len") > 0, xxhash64(col("file"))))
            .as("expect")).head()
        val committed = committedBatches(spark, historyDir)
        var id = f"${parts.getAs[Long]("x1")}%016x-${parts.getAs[Long]("x2")}%016x-${parts.getAs[Long]("n")}"
        while (committed.contains(id)) id += "x" // hash-collision backstop
        val expect = parts.getAs[Seq[Long]]("expect").toSet

        val obs = new Observation()
        val observed = data.observe(obs,
          collect_set(xxhash64(col(FileCol))).as("seen"))
        rethrowStrict {
          align(observed, target, strict)
            .write.mode("overwrite").parquet(s"$warehouseDir/b$id")
        }
        val seen = obs.get("seen").asInstanceOf[Seq[Long]].toSet
        val missing = expect -- seen
        if (missing.nonEmpty)
          throw new CoverageException(
            s"batch aborted (nothing committed): ${missing.size} staged " +
            "file(s) recorded as fresh contributed no rows — listing vs " +
            "_metadata.file_path spelling divergence; fix the path " +
            "normalization and re-run")
        failpoint("data-written")
        freshFiles.select("file").write.mode("overwrite")
          .parquet(s"$historyDir/b$id")
        failpoint("history-written")
        AtomicManifest.write(spark, historyDir, CommitLog,
          (committed :+ id).mkString("\n"))
    }

  /** The idempotent load's two relations — (fresh-file set
    * `(file, len)`, their rows with the `_graft_file` provenance
    * column) — or None when nothing new is staged. Package-visible so
    * PlanSpec can assert the constant-size-plan contract directly. */
  private[graft] def idempotentBatch(spark: SparkSession, stagingDir: String,
      historyDir: String): Option[(DataFrame, DataFrame)] = {
    val staged = listStaged(spark, stagingDir)
    if (staged.isEmpty) return None
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    val stagedDf = staged.toDF("file", "len")
    val fresh = loadedFiles(spark, historyDir) match {
      case Some(hist) =>
        stagedDf.join(hist.select(normCol(col("file")).as("file")),
          Seq("file"), "left_anti")
      case None => stagedDf
    }
    // Materialize the fresh set once (it is listing-sized, not
    // data-sized): it feeds the batch id, the data filter, and the
    // history snapshot, so they can never disagree, and the anti-join
    // runs exactly once.
    val freshFiles = fresh.localCheckpoint()
    if (freshFiles.isEmpty) None
    else {
      // The corrupt-record column rides along so STRICT loads abort on
      // malformed lines (COPY's default ON_ERROR aborts on parse
      // errors, and a permissive read would load the line as an
      // all-null row that passes the cast check vacuously); permissive
      // loads keep the null-through contract. [[align]] drops it.
      val schema = stagedSchema(spark, stagingDir)
      require(!schema.fieldNames.contains(CorruptCol),
        s"staged data may not carry a '$CorruptCol' column")
      val raw = spark.read
        .schema(schema.add(CorruptCol, StringType))
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(stagingDir)
        .withColumn(FileCol, normCol(col("_metadata.file_path")))
      val data = raw
        .join(broadcast(freshFiles.select(col("file").as(FileCol))),
          Seq(FileCol), "left_semi")
      Some((freshFiles, data))
    }
  }

  // ------------------------------------------------------------------
  // Quarantine (dead-letter) load
  // ------------------------------------------------------------------

  /** Dead-letter load — the Snowpipe `ON_ERROR = CONTINUE` +
    * error-table pattern, completing the failure-policy family (strict
    * = abort-batch mirrors COPY's default; permissive = null-through;
    * this = quarantine): rows with at least one coercion failure are
    * routed WHOLE to an error table — original values preserved as the
    * JSON text they arrived as, plus the source file and the list of
    * failing columns (COPY validation's rejected-record reason) — and
    * only clean rows align and load. Nothing is silently nulled and
    * nothing aborts; the error table is the replay queue after a
    * schema fix.
    *
    * Two failure classes are quarantined, never silently nulled:
    * coercion failures (a parsed value that won't cast to the DDL type,
    * `failed_columns` naming the culprits) and MALFORMED JSON lines —
    * the read carries a corrupt-record column, and a row that failed to
    * parse at all is routed whole (the raw line as `raw_record`, reason
    * `_corrupt_record`), matching Snowflake's error table recording
    * parse failures under `ON_ERROR = CONTINUE`. Without this, a
    * half-written JSON line would parse to all-nulls, pass the
    * cast-failure check vacuously, and LOAD as a null row.
    *
    * The file list is snapshotted ONCE and drives both passes, so a
    * file landing mid-load is either fully processed (clean rows
    * loaded, dirty rows quarantined) or fully deferred to the next
    * batch — never split, which an independent per-pass directory scan
    * would allow (clean rows loaded by pass 2 of a file pass 1 never
    * saw, its dirty rows lost). Like the idempotent leg, the snapshot
    * is enforced by a SINGLE-ROOT scan + broadcast semi-join on
    * `_metadata.file_path` — no path list in the plan, constant-size
    * at any staging file count (the prior vararg-path form put every
    * path in the driver's plan).
    *
    * Cost shape: two narrow scans of the staged batch (diagnose+spill,
    * then align+load) — the same validate-then-load I/O COPY pays; both
    * passes are pure codegen'd projections with a row filter plus a
    * broadcast semi-join (no shuffle), so the split parallelizes with
    * file splits at any batch size. */
  def batchQuarantine(spark: SparkSession, stagingDir: String,
                      target: StructType, warehouseDir: String,
                      quarantineDir: String): Unit =
    quarantineRelation(spark, stagingDir).foreach { case (raw, fields) =>
      import org.apache.spark.sql.functions.{array, col, lit, not, struct, to_json, when}
      val malformed = col(CorruptCol).isNotNull
      val fail = SchemaAlign.castFailure(raw, target)
      raw.filter(malformed || fail)
        .select(
          col(FileCol).as("source_file"),
          when(malformed, col(CorruptCol))
            .otherwise(to_json(struct(fields.map(col): _*)))
            .as("raw_record"),
          when(malformed, array(lit("_corrupt_record")))
            .otherwise(SchemaAlign.failedColumns(raw, target))
            .as("failed_columns"))
        .write.mode("append").parquet(quarantineDir)
      SchemaAlign(raw.filter(not(malformed) && not(fail)), target)
        .write.mode("append").parquet(warehouseDir)
    }

  /** The quarantine load's staged relation — (rows with `_graft_file`
    * provenance + corrupt-record column, original field names) — or
    * None when nothing is staged. Package-visible so PlanSpec can
    * assert the constant-size-plan contract directly. */
  private[graft] def quarantineRelation(spark: SparkSession,
      stagingDir: String): Option[(DataFrame, Seq[String])] = {
    val staged = listStaged(spark, stagingDir)
    if (staged.isEmpty) return None
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    val snapshot = staged.toDF("file", "len").localCheckpoint()
    val schema = stagedSchema(spark, stagingDir)
    require(!schema.fieldNames.contains(CorruptCol),
      s"staged data may not carry a '$CorruptCol' column")
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(stagingDir)
      .withColumn(FileCol, normCol(col("_metadata.file_path")))
      .join(broadcast(snapshot.select(col("file").as(FileCol))),
        Seq(FileCol), "left_semi")
    Some((raw, schema.fieldNames.toIndexedSeq))
  }

  /** Continuous auto-ingest: checkpointed streaming file source over the
    * staging dir. `Trigger.AvailableNow` drains everything currently
    * staged then stops — call again later and only new files load.
    * Exactly-once across mid-batch crashes: the file-source checkpoint
    * AND the parquet sink's `_spark_metadata` log pair up, so a batch
    * killed between the sink commit and the checkpoint commit replays
    * without duplicating its files (StreamingSpec's kill/resume case). */
  def continuous(spark: SparkSession, stagingDir: String,
                 target: StructType, warehouseDir: String,
                 checkpointDir: String): StreamingQuery = {
    val raw = spark.readStream.schema(stagedSchema(spark, stagingDir))
      .json(stagingDir)
    val aligned = SchemaAlign(raw, target)
    aligned.writeStream
      .format("parquet")
      .option("path", warehouseDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
