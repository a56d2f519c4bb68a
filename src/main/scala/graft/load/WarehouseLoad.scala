package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.schema.SchemaAlign

/** Typed warehouse load — the Snowpipe leg of the reference
  * (/root/reference/modules/snowflake.py:145-178): each new JSON file in
  * the staging dir is parsed, schema-aligned case-insensitively against
  * the declared DDL, coerced, and appended exactly once to the warehouse
  * table.
  *
  *  - [[batch]]: one-shot COPY of everything currently staged.
  *  - [[continuous]]: Structured Streaming file source with a checkpoint
  *    — the checkpoint's seen-files log IS Snowpipe's load history, so
  *    re-runs (Trigger.AvailableNow) load only unseen files, giving the
  *    per-file exactly-once semantics of `auto_ingest` pipes. Restart
  *    with the same checkpoint after a crash and no row is doubled.
  *
  * Failure policy: `strict = true` mirrors COPY's default
  * `ON_ERROR` (refuse the batch when any value fails coercion);
  * `strict = false` mirrors `ON_ERROR = CONTINUE` (nulls through).
  */
object WarehouseLoad {
  final class CoercionException(msg: String) extends RuntimeException(msg)

  private val StrictMarker = "GRAFT_COERCION_FAILURE"
  private val CorruptCol = "_graft_corrupt_record"

  /** Canonical file-URI spelling, so paths from the three independent
    * producers — `FileStatus.getPath` ("file:/tmp/x"), the
    * `_metadata.file_path` scan column ("file:///tmp/x"), and history
    * rows written by older versions — compare equal. Only the
    * authority-less `file:` scheme is ambiguous; schemes with an
    * authority (hdfs://, s3a://) already spell the `//` and pass
    * through untouched. */
  private def canon(p: String): String =
    p.replaceFirst("^file:/+", "file:///")

  private def canonCol(c: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.regexp_replace
    regexp_replace(c, "^file:/+", "file:///")
  }

  /** One snapshot listing of the staging dir — data files only (no
    * `_SUCCESS`/dot files), canonical URIs, sorted for determinism.
    * This is the same metadata-only listing Spark's own file index
    * performs; nothing row-sized ever lands on the driver. */
  private def listStaged(spark: SparkSession, stagingDir: String):
      Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => canon(st.getPath.toUri.toString)).sorted
  }

  /** Strict mode folds the failure check into the load's own scan as an
    * `assert_true` filter guard (throws from the executor on the first
    * bad row) instead of a separate counting pass — one read of the
    * batch, not two; at warehouse scale the second full scan is real
    * money. The guard is a filter, so column pruning cannot drop it. */
  private def align(raw: DataFrame, target: StructType,
                    strict: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{assert_true, coalesce, lit, not}
    val guarded =
      if (strict)
        raw.filter(coalesce(
          assert_true(not(SchemaAlign.castFailure(raw, target)),
            lit(s"$StrictMarker: row failed coercion to the declared schema")),
          lit(true)))
      else raw
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
    * resolve them case-insensitively is the COPY semantic. At scale,
    * staged batches are homogeneous — set `samplingRatio` < 1 to pin the
    * key set from a sample instead of a full inference scan. */
  private def stagedSchema(spark: SparkSession, stagingDir: String,
                           samplingRatio: Double = 1.0): StructType =
    stagedSchemaOf(spark, Seq(stagingDir), samplingRatio)

  private def stagedSchemaOf(spark: SparkSession, paths: Seq[String],
                             samplingRatio: Double = 1.0): StructType =
    spark.read
      .option("primitivesAsString", "true")
      .option("samplingRatio", samplingRatio.toString)
      .json(paths: _*).schema

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
    val raw = spark.read.schema(stagedSchema(spark, stagingDir))
      .json(stagingDir)
    rethrowStrict {
      align(raw, target, strict)
        .write.mode("append").partitionBy(partitionCols: _*)
        .parquet(warehouseDir)
    }
  }

  /** Batch load with COPY's per-file load-history dedup: every staged
    * file loads at most once across re-runs — the batch analog of
    * Snowpipe's load history (the reference records loaded files and
    * skips them on the next COPY). History is a tiny parquet of file
    * paths beside the warehouse; new batches anti-join against it, so a
    * re-run over an unchanged staging dir appends nothing.
    *
    * The history append commits after the data write (two-phase,
    * best-effort): a crash between the two can re-load a file on retry.
    * The checkpointed [[continuous]] leg is the transactional
    * exactly-once path; this covers ad-hoc batch re-runs.
    *
    * The staging dir is listed exactly once, up front, and that snapshot
    * drives BOTH the data read and the history append — so history can
    * only ever contain files the loaded plan actually read. Deriving the
    * two from independent directory scans would let a file landing
    * mid-load be recorded as loaded without its data ever being read
    * (silent data loss on every future run).
    *
    * NO path list ever collects to the driver and NO path list is
    * spliced into the scan plan: the fresh-file set stays a DataFrame
    * end to end (listing snapshot anti-joined against history, both
    * distributed), the data read is ONE single-root scan of the staging
    * dir filtered by a broadcast semi-join on the `_metadata.file_path`
    * column, and the history append writes that same DataFrame. The
    * plan is constant-size in the file count — a million-file staging
    * wave plans exactly like a two-file one (the vararg-path
    * alternative puts every path in the driver's plan AND resolves each
    * one individually). The trade: already-loaded files under the root
    * are re-scanned and their rows discarded by the semi-join, so the
    * operational contract at warehouse scale is a BOUNDED staging root —
    * point this at the current arrival partition (e.g. `stage/d=today`)
    * and archive drained partitions, exactly how Snowpipe stages are
    * drained. The steady-state alternative with no rescan at all is the
    * checkpointed [[continuous]] leg. */
  def batchIdempotent(spark: SparkSession, stagingDir: String,
                      target: StructType, warehouseDir: String,
                      historyDir: String, strict: Boolean = false): Unit =
    idempotentBatch(spark, stagingDir, historyDir).foreach {
      case (freshFiles, data) =>
        rethrowStrict {
          align(data, target, strict)
            .write.mode("append").parquet(warehouseDir)
        }
        freshFiles.write.mode("append").parquet(historyDir)
    }

  /** The idempotent load's two relations — (fresh-file set, their rows)
    * — or None when nothing new is staged. Package-visible so PlanSpec
    * can assert the constant-size-plan contract directly. */
  private[graft] def idempotentBatch(spark: SparkSession, stagingDir: String,
      historyDir: String): Option[(DataFrame, DataFrame)] = {
    val hPath = new org.apache.hadoop.fs.Path(historyDir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = listStaged(spark, stagingDir)
    if (staged.isEmpty) return None
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    val stagedDf = staged.toDF("file")
    val fresh =
      if (fs.exists(hPath))
        stagedDf.join(
          spark.read.parquet(historyDir)
            .select(canonCol(col("file")).as("file")),
          Seq("file"), "left_anti")
      else stagedDf
    // Materialize the fresh set once (it is listing-sized, not
    // data-sized): it feeds both the data filter and the history
    // append, so the two can never disagree, and the anti-join runs
    // exactly once.
    val freshFiles = fresh.localCheckpoint()
    if (freshFiles.isEmpty) None
    else {
      val raw = spark.read.schema(stagedSchema(spark, stagingDir))
        .json(stagingDir)
        .withColumn("_graft_file", canonCol(col("_metadata.file_path")))
      val data = raw
        .join(broadcast(freshFiles.withColumnRenamed("file", "_graft_file")),
          Seq("_graft_file"), "left_semi")
        .drop("_graft_file")
      Some((freshFiles, data))
    }
  }

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
    * saw, its dirty rows lost).
    *
    * Cost shape: two narrow scans of the staged batch (diagnose+spill,
    * then align+load) — the same validate-then-load I/O COPY pays; both
    * passes are pure codegen'd projections with a row filter, no
    * shuffle, so the split parallelizes with file splits at any batch
    * size. */
  def batchQuarantine(spark: SparkSession, stagingDir: String,
                      target: StructType, warehouseDir: String,
                      quarantineDir: String): Unit = {
    import org.apache.spark.sql.functions.{array, col, input_file_name, lit, not, struct, to_json, when}
    val files = listStaged(spark, stagingDir)
    if (files.isEmpty) return
    val schema = stagedSchemaOf(spark, files)
    require(!schema.fieldNames.contains(CorruptCol),
      s"staged data may not carry a '$CorruptCol' column")
    val raw = spark.read
      .schema(schema.add(CorruptCol, org.apache.spark.sql.types.StringType))
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(files: _*)
    val malformed = col(CorruptCol).isNotNull
    val fail = SchemaAlign.castFailure(raw, target)
    raw.filter(malformed || fail)
      .select(
        input_file_name().as("source_file"),
        when(malformed, col(CorruptCol))
          .otherwise(to_json(struct(
            schema.fieldNames.toIndexedSeq.map(col): _*)))
          .as("raw_record"),
        when(malformed, array(lit("_corrupt_record")))
          .otherwise(SchemaAlign.failedColumns(raw, target))
          .as("failed_columns"))
      .write.mode("append").parquet(quarantineDir)
    SchemaAlign(raw.filter(not(malformed) && not(fail)), target)
      .write.mode("append").parquet(warehouseDir)
  }

  /** Continuous auto-ingest: checkpointed streaming file source over the
    * staging dir. `Trigger.AvailableNow` drains everything currently
    * staged then stops — call again later and only new files load. */
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
