package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact trailing-24h sliding distinct-user counts — the comparator
  * relation q75 and st21 check their HLL estimates against, computed as
  * an interval DIFF ARRAY in O(pairs) instead of fanning every
  * (hour, user) pair onto its 24 target windows (measured r11: the 24×
  * explode comparator cost 3.5× the sketch side it exists to verify).
  *
  * A user counts at anchor A iff one of their maximal ≤23h-gap hour
  * runs covers A: a run [first, last] covers exactly the anchors
  * [first − shift, last + 23h − shift] (shift = 0 when the anchor is
  * the window's LAST hour, q75; shift = 23h when it is the window's
  * FIRST hour, st21's window_start), so each run contributes +1 at its
  * low anchor and −1 one hour past its high anchor, and the per-anchor
  * count is the running sum of deltas. The groupBy collapses deltas to
  * ≤ 2×hours timeline rows BEFORE the one global cumulative window, so
  * the single-task window is bounded by the corpus' TIME SPAN, not its
  * volume — the q73/m11 discipline (~9k hours/year; block-cumsum past
  * that).
  */
private[queries] object SlidingDistinct {
  /** @param pairs distinct (hour TIMESTAMP, user_id) relation
    * @param spine anchor hours to report, one column named `hour`
    * @param shiftHours 0 = anchor is window end; 23 = window start
    * @return (hour, n_exact) at exactly the spine's anchors */
  def exact24h(pairs: DataFrame, spine: DataFrame,
               shiftHours: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    val runs = pairs
      .withColumn("prev", lag(col("hour"), 1).over(w))
      .withColumn("next", lead(col("hour"), 1).over(w))
    val lo = s"INTERVAL $shiftHours HOURS"
    val hi = s"INTERVAL ${24 - shiftHours} HOURS"
    val deltas = runs
      .filter(col("prev").isNull ||
        col("hour") > col("prev") + expr("INTERVAL 23 HOURS"))
      .select((col("hour") - expr(lo)).as("h"), lit(1L).as("delta"))
      .unionAll(runs
        .filter(col("next").isNull ||
          col("next") > col("hour") + expr("INTERVAL 23 HOURS"))
        .select((col("hour") + expr(hi)).as("h"), lit(-1L).as("delta")))
    val timeline = deltas.groupBy(col("h"))
      .agg(sum(col("delta")).as("delta"))
      .withColumn("is_anchor", lit(false))
    // Deltas at hour H sort BEFORE the anchor row at H (false < true):
    // a run whose low anchor is exactly H counts toward H, and a run
    // whose −1 lands at H is already outside H's window.
    val anchors = spine.select(col("hour").as("h"))
      .withColumn("delta", lit(0L)).withColumn("is_anchor", lit(true))
    timeline.unionByName(anchors)
      .withColumn("n_exact",
        sum(col("delta")).over(Window.orderBy(col("h"), col("is_anchor"))))
      .filter(col("is_anchor"))
      .select(col("h").as("hour"), col("n_exact"))
  }
}
