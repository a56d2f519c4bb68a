package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.GraftSqlShims
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.load.WarehouseLoad

/** Structured Streaming source over the warehouse's versioned commit
  * log ([[graft.load.WarehouseLoad]]): **offsets are commit versions**,
  * and each micro-batch reads exactly the batch dirs ADDED in its
  * `(startVersion, endVersion]` window — the Delta/lakehouse streaming-
  * source model, which turns "poll the table" into "read the new
  * commits" with exactly-once delivery guaranteed by the version
  * offsets in the sink checkpoint. Rows are tagged with their
  * `_graft_batch` id.
  *
  * Rewrite commits (compaction / takedown replace batches) cannot be
  * represented as appends. By default the stream FAILS on one (the
  * [[WarehouseLoad.RewriteException]] contract, matching Delta's
  * default); with `skipRewrites=true` a rewrite commit is skipped
  * WHOLE — none of its batch ids are emitted, so a compaction's
  * folded batch never re-delivers rows the consumer already saw
  * (Delta's `skipChangeCommits` semantics).
  *
  * Scale shape: `getOffset` is one manifest read; each `getBatch`
  * plans one parquet scan root per ADDED batch (bounded by the loads
  * in the window, never table size) and the empty window is a
  * zero-task `WHERE false` scan. `maxVersionsPerTrigger` bounds the
  * window itself — a consumer restarting after long downtime drains
  * its lag as at-most-N-commit micro-batches instead of one giant
  * all-or-nothing epoch (the Delta `maxFilesPerTrigger` analog).
  * Vacuum retention must cover consumer lag: a window whose version
  * manifests were pruned fails with an explicit resync message rather
  * than silently skipping data.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.streaming.CommitLogStreamProvider")
  *   .schema(targetSchema)                  // optional once committed
  *   .option("warehouseDir", wh).option("historyDir", hist)
  *   .option("skipRewrites", "true")
  *   .option("maxVersionsPerTrigger", "16") // backlog admission bound
  *   .load()
  * }}}
  */
class CommitLogStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-commitlog"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      params: Map[String, String]): (String, StructType) = {
    // Register the table with ZonePrune HERE — `.load()` time, on the
    // ORIGINAL session — not first inside getBatch: StreamExecution
    // CLONES the session at stream start and the clone snapshots
    // `experimental.extraOptimizations`, so a rule registered only
    // after the first micro-batch began would never reach the
    // streaming optimizer (the streaming-zone-skip contract, st26).
    CommitLogSource.registerZonePrune(ctx.sparkSession, params)
    (shortName(), CommitLogSource.resolveSchema(
      ctx.sparkSession, schema, params))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source =
    new CommitLogSource(ctx.sparkSession,
      CommitLogSource.resolveSchema(ctx.sparkSession, schema, params),
      params, metadataPath)

  override def createSink(ctx: SQLContext, params: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      "graft-commitlog sink is append-only (each micro-batch commits " +
      s"as one immutable warehouse batch); got $outputMode")
    new CommitLogSink(ctx.sparkSession, params, partitionColumns)
  }
}

object CommitLogSource {
  val BatchCol = "_graft_batch"

  /** Best-effort ZonePrune registration from source options — must run
    * on the PRE-CLONE session (see the provider's sourceSchema note). */
  private[streaming] def registerZonePrune(spark: SparkSession,
      params: Map[String, String]): Unit =
    opt(params, "warehouseDir").zip(opt(params, "historyDir")).foreach {
      case (wh, hist) => graft.plans.ZonePrune.register(spark, wh, hist)
    }

  private[streaming] def opt(params: Map[String, String],
                             key: String): Option[String] =
    params.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  private def required(params: Map[String, String], key: String): String =
    opt(params, key).getOrElse(throw new IllegalArgumentException(
      s"graft-commitlog source requires option '$key'"))

  /** The user-declared schema (plus the batch-tag column if absent),
    * or — once the table has a first commit — the current committed
    * relation's schema. Pinned at stream start: columns added by a
    * later SchemaDrift.evolve surface after a restart, the standard
    * streaming-schema contract. */
  def resolveSchema(spark: SparkSession, schema: Option[StructType],
                    params: Map[String, String]): StructType = {
    val base = schema.getOrElse {
      WarehouseLoad.readWarehouse(spark,
          required(params, "warehouseDir"), required(params, "historyDir"))
        .map(_.schema)
        .getOrElse(throw new IllegalStateException(
          "cannot infer the commit-log stream schema before the first " +
          "commit — pass .schema(...) explicitly"))
    }
    if (base.fieldNames.exists(_.equalsIgnoreCase(BatchCol))) base
    else base.add(StructField(BatchCol, StringType, nullable = true))
  }
}

class CommitLogSource(spark: SparkSession, declared: StructType,
                      params: Map[String, String],
                      metadataPath: String = "") extends Source {
  import CommitLogSource._

  private val warehouseDir = opt(params, "warehouseDir").get
  private val historyDir = opt(params, "historyDir").get
  private val skipRewrites =
    opt(params, "skipRewrites").exists(_.trim.toBoolean)
  /** Backlog admission control (VERDICT r12 #1 — the Delta
    * `maxFilesPerTrigger` analog at version granularity): cap how far
    * `getOffset` advances past the last offset this source handed out,
    * so a consumer restarting after long downtime drains its version
    * lag as BOUNDED micro-batches (each a retryable unit of at most N
    * commits' scan roots) instead of one giant all-or-nothing epoch
    * spanning the entire lag. Unset = head immediately (the old
    * behavior, right for low-lag consumers). */
  private val maxVersionsPerTrigger =
    opt(params, "maxVersionsPerTrigger").map { v =>
      val n = v.trim.toLong
      require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
      n
    }
  /** Byte-based admission (r14, completing the r13 version-count
    * bound): cap each micro-batch window by the RECORDED data bytes of
    * its added batches — batch size is metadata-known from the commit
    * manifests ([[WarehouseLoad.batchBytes]]), so the walk costs one
    * cached manifest read per admitted batch, never a listing. An
    * operator sizes executors in bytes, not commit counts, and commit
    * sizes vary over a table's life (trickle loads vs compacted
    * folds) — the version bound alone cannot hold a memory envelope.
    * At least one version is always admitted per trigger (progress);
    * a batch with no recorded size (legacy manifest) conservatively
    * consumes the whole budget. Composes with `maxVersionsPerTrigger`
    * (both caps apply). */
  private val maxBytesPerTrigger =
    opt(params, "maxBytesPerTrigger").map { v =>
      val n = v.trim.toLong
      require(n > 0, s"maxBytesPerTrigger must be positive, got $n")
      n
    }

  /** The admission floor: the highest version this source has handed
    * out (offered via getOffset or recovered via getBatch). Persisted
    * under the source's own checkpoint metadata dir — the
    * FileStreamSource pattern — because the one restart case the
    * engine does NOT replay into getBatch is a CLEAN shutdown (last
    * batch committed): without the file, the first post-restart
    * getOffset could not know the committed offset and would either
    * unbound the batch or regress below it. The floor may run at most
    * one planned-but-uncommitted batch AHEAD of the engine's committed
    * offset (crash between getOffset and the offset-log write), so a
    * recovered batch spans at most 2N versions — still bounded. */
  private val FloorFile = "graft-admission-floor"
  private def admissionBounded: Boolean =
    maxVersionsPerTrigger.nonEmpty || maxBytesPerTrigger.nonEmpty
  private var floor: Long =
    if (!admissionBounded || metadataPath.isEmpty) 0L
    else graft.load.AtomicManifest.read(spark, metadataPath, FloorFile)
      .flatMap(_.toLongOption).getOrElse(0L)

  private def advanceFloor(v: Long): Unit =
    if (v > floor) {
      floor = v
      if (admissionBounded && metadataPath.nonEmpty)
        graft.load.AtomicManifest.write(spark, metadataPath, FloorFile,
          v.toString)
    }

  /** Version spans of the batches this source PLANNED, oldest first —
    * persisted as `graft-admission-spans` lines (`endVersion span`) in
    * the source's checkpoint metadata dir (VERDICT r13 #6). The
    * admission floor can run one planned-but-uncommitted batch AHEAD
    * of the engine's committed offset, so a crash-recovered batch
    * legitimately spans up to 2·maxVersionsPerTrigger versions; an
    * operator sizing the trigger bound against executor memory reads
    * the ACTUAL span distribution here instead of trusting the bound's
    * worst case. Bounded to the last [[SpansKeep]] batches; replays of
    * an already-recorded batch (same end version) don't duplicate. */
  private val SpansFile = "graft-admission-spans"
  private val SpansKeep = 64
  private var spanLog: Vector[(Long, Long)] =
    if (metadataPath.isEmpty) Vector.empty
    else graft.load.AtomicManifest.read(spark, metadataPath, SpansFile)
      .map(_.linesIterator.flatMap { line =>
        line.split(" ") match {
          case Array(e, s) => e.toLongOption.zip(s.toLongOption)
          case _ => None
        }
      }.toVector).getOrElse(Vector.empty)

  /** (endVersion, versionSpan) per planned batch, oldest first. */
  def admissionSpans: Seq[(Long, Long)] = spanLog

  private def recordSpan(from: Long, to: Long): Unit =
    if (!spanLog.lastOption.exists(_._1 >= to)) {
      spanLog = (spanLog :+ (to, to - from)).takeRight(SpansKeep)
      if (metadataPath.nonEmpty)
        graft.load.AtomicManifest.write(spark, metadataPath, SpansFile,
          spanLog.map { case (e, s) => s"$e $s" }.mkString("\n"))
    }

  override def schema: StructType = declared

  override def getOffset: Option[OffsetV1] = {
    val head = WarehouseLoad.currentVersion(spark, historyDir)
    if (head == 0) None
    else {
      val capped = maxVersionsPerTrigger
        .fold(head)(n => math.min(head, floor + n))
      val end = maxBytesPerTrigger match {
        case None => capped
        case Some(cap) => admitByBytes(capped, cap)
      }
      advanceFloor(end)
      Some(LongOffset(end))
    }
  }

  /** The largest end version in `(floor, capped]` whose window's
    * added-batch bytes fit `cap` — always at least `floor + 1` when
    * lag exists (one version per trigger is the progress floor, the
    * FileStreamSource convention for an over-cap single file). The
    * walk reads one (cached) version list + one (cached) manifest per
    * examined batch and stops at the first over-budget version — cost
    * bounded by the ADMITTED window, not the lag. */
  private def admitByBytes(capped: Long, cap: Long): Long = {
    def batches(v: Long): Seq[String] =
      WarehouseLoad.versionBatches(spark, historyDir, v).getOrElse(
        throw new IllegalStateException(
          s"commit-log stream cannot read version $v: pruned by vacuum " +
          "retention (consumer lag exceeded retainVersions) — resync " +
          "from a fresh stream over readWarehouseAt"))
    var v = floor
    var acc = 0L
    var over = false
    while (!over && v < capped) {
      val prev = batches(v).toSet
      // per-version bytes clamped to cap: keeps the accumulator
      // overflow-free and makes an unknown-size batch (legacy
      // manifest) consume exactly one whole budget
      val bytes = math.min(cap,
        batches(v + 1).filterNot(prev)
          .map(id => WarehouseLoad.batchBytes(spark, historyDir, id)
            .getOrElse(cap))
          .foldLeft(0L)((a, b) => math.min(cap, a + math.min(b, cap))))
      if (v == floor || acc + bytes <= cap) { acc += bytes; v += 1 }
      else over = true
    }
    v
  }

  /** Batch ids added across `(from, to]`, stepping version by version
    * so each commit's append/rewrite nature is judged on ITS OWN
    * predecessor (a single from→to diff would misread append-after-
    * compaction windows as partial rewrites). */
  private def addedBatches(from: Long, to: Long): Seq[String] = {
    def batches(v: Long): Seq[String] =
      WarehouseLoad.versionBatches(spark, historyDir, v).getOrElse(
        throw new IllegalStateException(
          s"commit-log stream cannot read version $v: pruned by vacuum " +
          "retention (consumer lag exceeded retainVersions) or beyond " +
          "the committed head — resync from a fresh stream over " +
          "readWarehouseAt"))
    (from + 1 to to).flatMap { v =>
      val prev = batches(v - 1).toSet
      val cur = batches(v)
      val removed = prev -- cur.toSet
      if (removed.isEmpty) cur.filterNot(prev)
      else if (skipRewrites) Nil // skip the rewrite commit WHOLE
      else throw new WarehouseLoad.RewriteException(
        s"commit $v is a rewrite (${removed.size} batch(es) replaced — " +
        "compaction or takedown); the append-only stream cannot " +
        "express it: restart from a fresh snapshot, or set " +
        "skipRewrites=true to pass over rewrite commits")
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(_.json.toLong).getOrElse(0L)
    val to = end.json.toLong
    advanceFloor(to) // restart recovery: resume admission from the
    recordSpan(from, to) // replayed batch's planned end
    // STREAMING ZONE SKIP (r14): with the table registered (provider
    // sourceSchema — pre-clone), a filter the consumer stacks on this
    // stream prunes whole ADDED batches at micro-batch OPTIMIZATION
    // time — IncrementalExecution runs the session optimizer
    // (including the ZonePrune rule), the filter pushes through the
    // conform-projection and the union to each single-root batch
    // relation, and a batch whose recorded stats prove the predicate
    // empty never schedules a scan task. An index maintainer consuming
    // only `source = 'web'` commits skips the other sources' epochs at
    // metadata cost. This re-register covers recovered sources whose
    // provider hook never ran in THIS session (a restart path) —
    // effective from the stream's next (re)start.
    graft.plans.ZonePrune.register(spark, warehouseDir, historyDir)
    val ids = addedBatches(from, to)
    val live = WarehouseLoad.liveBatchIds(spark, warehouseDir, ids)
    val base =
      if (live.nonEmpty)
        live.map { id =>
            // LOG-BUILT per-batch scan when the commit recorded its
            // file list (r16): zero listing/footer I/O per admitted
            // batch, and the relation is a ManifestFileIndex — so the
            // per-FILE stats tier prunes files inside the micro-batch
            // plan exactly as it does for batch reads (st26's root
            // skip, one granularity down). Discovery fallback for
            // legacy batches.
            val rel = WarehouseLoad.manifestGroupRelations(spark,
                warehouseDir, historyDir, Seq(id)) match {
              case Some(Some(Seq(r))) => r
              case _ => spark.read.parquet(s"$warehouseDir/b$id")
            }
            rel.withColumn(BatchCol, lit(id))
          }
          .reduce(_.unionByName(_, allowMissingColumns = true))
      else WarehouseLoad.liveBatchIds(spark, warehouseDir,
          WarehouseLoad.committedBatches(spark, historyDir))
        .headOption match {
          // empty window (e.g. a skipped rewrite commit): a zero-task
          // pruned scan keeps the plan a real (streamable) relation
          case Some(id) => spark.read.parquet(s"$warehouseDir/b$id")
            .withColumn(BatchCol, lit(id)).where(lit(false))
          case None => spark.createDataFrame(
            java.util.Collections.emptyList[Row](), declared)
        }
    // conform to the declared schema: case-insensitive resolution (the
    // warehouse CI-match semantic), missing columns as typed nulls
    val byName = base.columns.map(c => c.toLowerCase -> c).toMap
    val cols = declared.fields.map { f =>
      byName.get(f.name.toLowerCase)
        .map(c => col(c).cast(f.dataType).as(f.name))
        .getOrElse(lit(null).cast(f.dataType).as(f.name))
    }
    asStreaming(base.select(cols.toSeq: _*))
  }

  /** V1 `getBatch` contract: the returned plan must be flagged
    * streaming (MicroBatchExecution asserts it). The relation leaves a
    * batch read produces carry the flag as a field — flip it, the same
    * move FileStreamSource makes on its own batch reads. */
  private def asStreaming(df: DataFrame): DataFrame =
    GraftSqlShims.ofRows(spark, df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
      case lr: LocalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
    })

  override def stop(): Unit = ()
}

/** The write side: exactly-once streaming ingestion INTO the versioned
  * commit log. Each micro-batch commits as ONE immutable warehouse
  * batch under the EPOCH-DETERMINISTIC id `<sinkId>-<batchId>`, so a
  * replayed epoch (crash after the data write, before — or after — the
  * manifest repoint) either overwrites its own orphan dirs and commits
  * once, or is recognized as already committed and skipped: the same
  * idempotence contract the file loads get from content-derived batch
  * ids, keyed here by the checkpoint's epoch counter. Everything the
  * commit log offers downstream — time travel, the change feed, the
  * st24 streaming source, zone maps (recorded by this write's own
  * CollectMetrics observation), vacuum/compaction — applies to
  * streamed-in batches identically.
  *
  * `sinkId` namespaces epochs when several streams feed one table
  * (each stream's checkpoint numbers epochs independently). The
  * single-writer contract of the commit protocol still applies ACROSS
  * writers: one committer at a time (Spark runs `addBatch` serially
  * within a query).
  */
class CommitLogSink(spark: SparkSession, params: Map[String, String],
                    partitionCols: Seq[String]) extends Sink {
  import CommitLogSource.opt

  private val warehouseDir = params.collectFirst {
    case (k, v) if k.equalsIgnoreCase("warehouseDir") => v
  }.getOrElse(throw new IllegalArgumentException(
    "graft-commitlog sink requires option 'warehouseDir'"))
  private val historyDir = opt(params, "historyDir").getOrElse(
    throw new IllegalArgumentException(
      "graft-commitlog sink requires option 'historyDir'"))
  /** Epoch namespace. The DEFAULT derives from the checkpoint
    * location: epoch counters are only meaningful within one
    * checkpoint lineage, so a fixed default would let a NEW query
    * (fresh/deleted checkpoint, epochs renumbering from 0) collide
    * with a previous lineage's committed `stream-0` and silently drop
    * its first batches as "replays". Hashing the checkpoint path keeps
    * true replays (same checkpoint) dedupable while distinct lineages
    * get disjoint ids. Set `sinkId` explicitly to pin the namespace
    * across checkpoint moves. NO silent fallback when both are absent
    * (a query riding the session-level checkpoint conf, which Spark
    * does not pass into createSink params): a fixed default would
    * reintroduce the cross-lineage collision — fail loudly instead
    * (ADVICE r12). */
  private val sinkId = opt(params, "sinkId").getOrElse {
    opt(params, "checkpointLocation")
      .map(cp => "stream-" + java.util.UUID.nameUUIDFromBytes(
        cp.getBytes("UTF-8")).toString.take(8))
      .getOrElse(throw new IllegalArgumentException(
        "graft-commitlog sink requires option 'sinkId' (or a writer-" +
        "level 'checkpointLocation' option to derive one): epoch ids " +
        "namespace the exactly-once replay check, and a fixed default " +
        "would let a new query's epoch 0 collide with a previous " +
        "lineage's committed batch and silently drop data"))
  }
  require(!sinkId.contains("\n") && sinkId.nonEmpty,
    s"invalid sinkId '$sinkId'")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val id = s"$sinkId-$batchId"
    if (WarehouseLoad.committedBatches(spark, historyDir).contains(id))
      return // epoch replay after a post-commit crash: already visible
    // re-root the plan so the batch can be written like any batch
    // DataFrame: V1 sinks receive the FULL incremental plan — the
    // WriteToMicroBatchDataSourceV1 wrapper at the root (which only
    // IncrementalExecution knows how to strip) over the
    // batch-substituted source relations. Strip the wrapper, then drop
    // the streaming flag from the leaves (batch-only machinery — the
    // zone-map Observation — rejects streaming-flagged plans). Two
    // sequential transforms: transformDown skips re-visiting a node it
    // just substituted, so the wrapper's child needs its own pass.
    val stripped = data.queryExecution.analyzed.transform {
      case w: org.apache.spark.sql.execution.streaming.sources
          .WriteToMicroBatchDataSourceV1 => w.child
    }
    val replanned = GraftSqlShims.ofRows(spark, stripped.transform {
      case lr: LogicalRelation if lr.isStreaming =>
        lr.copy(isStreaming = false)
      case lr: LocalRelation if lr.isStreaming =>
        lr.copy(isStreaming = false)
    })
    // A leaf the flag-strip doesn't cover (a DSv2 streaming relation —
    // rate, Kafka) would make `.write` throw on the still-streaming
    // plan; fall back to the executed micro-batch's row RDD, which is
    // always a plain batch relation (zone maps work there too).
    val df =
      if (!replanned.isStreaming) replanned
      else GraftSqlShims.ofInternalRows(spark,
        data.queryExecution.toRdd, data.schema)
    WarehouseLoad.commitStreamedBatch(spark, df, warehouseDir, historyDir,
      id, partitionCols)
  }

  override def toString: String =
    s"CommitLogSink[$warehouseDir, sinkId=$sinkId]"
}
