package graft.load

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction (the lake's OPTIMIZE): bin-pack a directory's
  * parquet files into ~`targetBytes` outputs and atomically swap the
  * directory contents.
  *
  * Streaming ingest (WarehouseLoad.continuous, StreamingMerge) lands one
  * file per micro-batch; a day of 1-minute batches is 1,440 files whose
  * per-file open/footer/seek overhead eventually dominates scans. The
  * compaction itself is pure metadata + one narrow rewrite job:
  *
  *  - the FILE LIST and bin-packing run on the driver — that is
  *    metadata (names + sizes), thousands of entries, not data;
  *  - each bin becomes one task reading its files and writing one
  *    output (`spark.read.parquet(bin: _*).coalesce(1)`), so the
  *    rewrite shuffles nothing and parallelizes across bins;
  *  - outputs land in a temp dir first, then replace the originals —
  *    readers see either the old or the new file set, never a mix of
  *    partial outputs and originals.
  *
  * First-fit-decreasing bin packing: deterministic, within 11/9·OPT+1
  * bins of optimal — file-count optimality is irrelevant next to the
  * constant factors here.
  */
object Compaction {

  /** Greedy first-fit-decreasing pack of (path, size) into bins of at
    * most `targetBytes` (a file larger than the target gets its own
    * bin). Exposed for the spec. */
  def pack(files: Seq[(String, Long)], targetBytes: Long): Seq[Seq[String]] = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[
      (scala.collection.mutable.ArrayBuffer[String], Long)]
    files.sortBy { case (p, sz) => (-sz, p) }.foreach { case (p, sz) =>
      bins.indexWhere { case (_, used) => used + sz <= targetBytes } match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(p), sz))
        case i =>
          val (b, used) = bins(i)
          b += p
          bins(i) = (b, used + sz)
      }
    }
    bins.map(_._1.toSeq).toSeq
  }

  /** Compact `dir`'s parquet files toward `targetBytes` outputs.
    * Returns (filesBefore, filesAfter). No-op (and no rewrite job) when
    * nothing would shrink. */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.toString -> f.getLen).toSeq
    val bins = pack(files, targetBytes)
    if (bins.length >= files.length) return (files.length, files.length)
    val tmp = new Path(dir, s"_compact_tmp")
    fs.delete(tmp, true)
    fs.mkdirs(tmp)
    // One independent coalesce(1) write per bin: no shuffle, bins run as
    // parallel jobs' tasks. (Each bin is bounded by targetBytes, so the
    // single output task per bin is bounded work by construction.)
    bins.zipWithIndex.foreach { case (bin, i) =>
      spark.read.parquet(bin: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(new Path(tmp, s"bin_$i").toString)
    }
    // Collect the rewritten parts, then swap: move new files in first
    // (fresh names — no collision), delete originals after.
    val newParts = fs.listStatus(tmp)
      .filter(_.isDirectory)
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .zipWithIndex
      .map { case (f, i) =>
        val dst = new Path(dir, f"compacted_$i%05d.parquet")
        require(fs.rename(f.getPath, dst), s"rename to $dst failed")
        dst
      }
    files.foreach { case (p, _) => fs.delete(new Path(p), false) }
    fs.delete(tmp, true)
    (files.length, newParts.length)
  }
}
