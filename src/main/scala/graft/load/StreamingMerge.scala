package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous dimension maintenance: a stream of update batches merged
  * into an SCD-2 dimension with `foreachBatch` — the standard
  * Structured Streaming MERGE pattern (file sinks have no native
  * upsert, so the merge runs inside the batch callback; the
  * checkpoint's file log makes each staged file participate in exactly
  * one merge, even across restarts).
  *
  * Snapshot storage is versioned-directory + manifest: each merge
  * writes a full new snapshot under `dim/v=<epoch>` and then atomically
  * repoints `dim/_LATEST` (write-temp + rename). Readers resolve the
  * manifest first, so they never observe a half-written snapshot —
  * the poor-man's table format (the same commit shape Delta/Iceberg
  * formalize with a transaction log).
  *
  * `batchTs` stamps versions from the batch id, keeping effective
  * timestamps deterministic and replayable; production callers pass
  * wall-clock or event-derived timestamps.
  */
object StreamingMerge {
  private val Manifest = "_LATEST"

  def snapshot(spark: SparkSession, dimDir: String): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(dimDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(dimDir, Manifest)
    if (!fs.exists(mf)) None
    else {
      val in = fs.open(mf)
      val v = try scala.io.Source.fromInputStream(in).mkString.trim
              finally in.close()
      Some(spark.read.parquet(s"$dimDir/$v"))
    }
  }

  private[load] def commit(spark: SparkSession, dimDir: String, df: DataFrame,
                           version: String): Unit = {
    df.write.mode("overwrite").parquet(s"$dimDir/$version")
    val fs = new org.apache.hadoop.fs.Path(dimDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dimDir, s".$Manifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    // FileSystem.rename refuses existing destinations (silently!);
    // FileContext supports the atomic-overwrite rename this commit needs.
    org.apache.hadoop.fs.FileContext
      .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(dimDir, Manifest),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Start the continuous merge over JSON update files in `stagingDir`.
    * Drains everything currently staged (Trigger.AvailableNow) and
    * stops; re-invoke later with the same checkpoint and only unseen
    * files merge. */
  def continuous(spark: SparkSession, stagingDir: String,
                 updateSchema: StructType, dimDir: String,
                 checkpointDir: String, keyCols: Seq[String],
                 trackedCols: Seq[String],
                 batchTs: Long => java.sql.Timestamp): StreamingQuery =
    spark.readStream.schema(updateSchema).json(stagingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val ts = batchTs(batchId)
          val merged = snapshot(spark, dimDir) match {
            case Some(current) =>
              ScdMerge.merge(current, batch, keyCols, trackedCols, ts)
            case None => ScdMerge.init(batch, ts)
          }
          commit(spark, dimDir, merged, f"v=$batchId%08d")
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
