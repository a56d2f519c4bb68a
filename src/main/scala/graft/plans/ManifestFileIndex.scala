package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex,
  PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] materialized from the commit log's recorded
  * per-batch file lists — ZERO filesystem listing or footer I/O at
  * plan time (r14; the Delta/Iceberg design: the LOG, not the store,
  * is the source of truth for which files a snapshot contains).
  *
  * Why it exists: `spark.read.parquet(dir1 … dirN)` eagerly builds an
  * `InMemoryFileIndex`, which LISTS every root — at 10,000 committed
  * loads the CommitScale harness measured ~20 s of pure metadata
  * calls per `readWarehouse` construction, on a local filesystem; on
  * an object store that is 10,000+ LIST requests per query. Every
  * batch's write job already knows exactly which files it produced,
  * so [[graft.load.WarehouseLoad]] records `(relative path, length)`
  * per file in the batch's `_ZONEMAP` manifest and this index serves
  * the scan from those records. Batch dirs are immutable once
  * committed (rewrites commit NEW dirs), so the recorded list can
  * never go stale — the same immutability argument the zone
  * intervals rely on.
  *
  * Partitioning is deliberately NOT supported (`partitionSchema` is
  * empty): hive-partitioned batches plan per-root relations via the
  * discovery path (see `readBatchDirs`), and this index only serves
  * the unpartitioned fast path. [[ZonePrune]] recognizes the type and
  * prunes it by rebuilding with the surviving roots' entries — still
  * zero I/O. */
final class ManifestFileIndex(
    val rootsWithFiles: Seq[(Path, Seq[FileStatus])]) extends FileIndex {

  override val rootPaths: Seq[Path] = rootsWithFiles.map(_._1)

  private val all: Array[FileStatus] = rootsWithFiles.flatMap(_._2).toArray

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, all))

  override def inputFiles: Array[String] = all.map(_.getPath.toString)

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = all.iterator.map(_.getLen).sum

  override def partitionSchema: StructType = new StructType()

  /** The index restricted to `keep` roots — [[ZonePrune]]'s rewrite,
    * still metadata-only. */
  def retain(keep: Set[Path]): ManifestFileIndex =
    new ManifestFileIndex(rootsWithFiles.filter(rf => keep(rf._1)))
}
