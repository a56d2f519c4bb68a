package graft.queries

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded join hints.
  *
  * SURVEY §7.3's posture is "joins declare broadcast only for bounded
  * dims": `nation`/`region` are constant-size and may carry an
  * unconditional `broadcast(...)`, but tables that grow with scale
  * factor (`customer`, `supplier`) must not — a forced broadcast that
  * is 3 MB at sf0.1 is a 300 MB+ OOM at warehouse scale. The guard
  * consults the optimizer's own size estimate (file-size based for
  * parquet relations, after column pruning — the exact statistic
  * Spark's planner compares against `autoBroadcastJoinThreshold`), so
  * it costs no job:
  *
  *   - below the threshold → attach the hint (test/bench scale keeps
  *     the broadcast plans PlanSpec asserts);
  *   - above it → no hint; the join falls back to the planner's
  *     choice, and AQE can still elect a runtime broadcast if the
  *     built side's *actual* size qualifies after filtering.
  */
object Hints {
  /** Broadcast hint only if the plan's estimated size ≤ `maxBytes`
    * (default: the session's `spark.sql.autoBroadcastJoinThreshold`).
    */
  def broadcastIfSmall(df: DataFrame, maxBytes: Long = -1L): DataFrame = {
    val limit =
      if (maxBytes >= 0L) maxBytes
      else {
        // Conf value may be a bare byte count, a size string ("10MB"),
        // or "-1" (auto-broadcast disabled → never hint).
        val s = df.sparkSession.conf
          .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        try s.toLong catch { case _: NumberFormatException =>
          JavaUtils.byteStringAsBytes(s) }
      }
    if (limit >= 0L &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(limit))
      broadcast(df)
    else df
  }
}
