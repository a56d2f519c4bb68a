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

  def snapshot(spark: SparkSession, dimDir: String): Option[DataFrame] =
    AtomicManifest.read(spark, dimDir, Manifest)
      .map(v => spark.read.parquet(s"$dimDir/$v"))

  /** Write the new snapshot, then atomically repoint. The version IS
    * the batch id (`v=<batchId>`), so a batch replayed after a crash
    * between the snapshot write and the repoint overwrites the SAME
    * orphaned dir (deterministically, from the still-committed previous
    * snapshot) and repoints — exactly-one observable merge per batch
    * (StreamingMergeSpec's kill/resume case). */
  private[load] def commit(spark: SparkSession, dimDir: String, df: DataFrame,
                           version: String): Unit = {
    df.write.mode("overwrite").parquet(s"$dimDir/$version")
    AtomicManifest.write(spark, dimDir, Manifest, version)
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
