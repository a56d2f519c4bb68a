package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Delete-by-key ("takedown") on a versioned warehouse snapshot —
  * opt-out / right-to-be-forgotten removal, the one mutation the
  * reference's COPY-append model has no analog for (its Snowpipe leg
  * only ever adds rows: /root/reference/modules/snowflake.py:145-178).
  *
  * Same commit discipline as [[StreamingMerge]]: write a complete new
  * snapshot under `dimDir/v=<version>`, then atomically repoint the
  * `_LATEST` manifest — readers resolve the manifest first, so they
  * observe either the pre- or post-takedown corpus, never a partial
  * delete. Idempotent by construction: when no current row matches the
  * key list, nothing is written and the manifest stays put, so
  * re-applying an already-served takedown is a pure no-op (no version
  * churn, no data rewrite).
  *
  * Scale shape: a takedown list is a bounded legal/ops artifact
  * (thousands of keys, not a data-scale table), so the probe side gets
  * a size-guarded broadcast and the snapshot is scanned, never
  * shuffled. Two scans total — one key-pruned semi-join count deciding
  * whether a commit is needed, one anti-join producing the surviving
  * snapshot.
  */
object Takedown {
  /** Commit `df` as the initial snapshot (version `v=00000000`). */
  def init(spark: SparkSession, dimDir: String, df: DataFrame): Unit =
    StreamingMerge.commit(spark, dimDir, df, "v=00000000")

  /** Remove every row whose `keyCols` tuple appears in `keys` from the
    * current snapshot at `dimDir`. Commits `v=<version>` only when at
    * least one row matches; returns the number of rows removed. */
  def apply(spark: SparkSession, dimDir: String, keys: DataFrame,
            keyCols: Seq[String], version: String): Long = {
    val current = StreamingMerge.snapshot(spark, dimDir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $dimDir"))
    // Pin the key set before using it twice (semi-join count, then
    // anti-join rewrite): if `keys` were non-deterministic or read
    // mutable input, re-evaluation could make the returned count
    // disagree with what the committed snapshot actually dropped.
    val k = graft.queries.Hints.broadcastIfSmall(
      keys.select(keyCols.map(col): _*).dropDuplicates(keyCols)
        .localCheckpoint(true))
    val hits = current.join(k, keyCols, "left_semi").count()
    if (hits > 0L) {
      StreamingMerge.commit(spark, dimDir,
        current.join(k, keyCols, "left_anti"), s"v=$version")
    }
    hits
  }
}
