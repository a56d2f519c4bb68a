package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers that make floating-point aggregates *engine-exact*.
  *
  * A plain `SUM(double)` depends on partial-aggregation order, so Spark
  * (partitioned, map-side combine) and a single-threaded oracle can differ
  * in the last bits. Quantizing each value to a decimal first makes the
  * sum exact and associative — any partitioning yields the same total —
  * and the final cast back to double is deterministic. The same expression
  * (`CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`) runs on the oracle
  * side. This is also the right call at 100 TB: decimal partial aggregates
  * stay in Tungsten codegen and cost no extra shuffle.
  */
object Num {
  val Scale = 4

  /** Exact, order-independent sum of a double column (see class doc). */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, Scale))).cast("double")

  /** Exact average: exact decimal sum, then one double division. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, Scale))).cast("double") / count(c))

  /** Windowed exact running sum (caller supplies the window spec). */
  def dsumExpr(c: Column): Column = sum(c.cast(DecimalType(18, Scale)))

  /** Oracle-side SQL fragment equivalent to [[dsum]]. */
  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$Scale))) AS DOUBLE)"

  /** Oracle-side SQL fragment equivalent to [[davg]]. */
  def sqlDavg(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$Scale))) AS DOUBLE) / COUNT($x)"

  /** Scalable exact per-group quantiles — the histogram + rank-resolve
    * two-pass plan, shared by q42 and q59 so every caller gets the plan
    * that rides executor counts instead of group counts (SCALE.md: the
    * naive per-group window sort measured 26.7× at 100× because
    * parallelism is bounded by the number of group values; this shape
    * measured 6.1×).
    *
    * Discrete-quantile definition: value at `row_number == ceil(p·n)`
    * per group, ranks ordered by value — identical to the window
    * formulation's fixpoint. Bucket boundaries cannot split ties (equal
    * values share a bucket), so value-at-rank is unchanged.
    *
    * Pass 1: per-(group, bucket) counts — a partial-aggregated shuffle
    * of bucket keys only; cumulative counts locate, per target rank,
    * the ONE bucket containing it and the residual rank inside it.
    * Pass 2: only the hit buckets' rows (≈1/width of the data) are
    * ranked, windowed by (group, percentile). Both passes parallelize
    * with executors; `bucketWidth` trades histogram size against
    * pass-2 sort size, and the reduction recurses (re-bucket finer)
    * if a bucket is still too big.
    *
    * Returns one row per group: `groupCol` plus one column per
    * `(percentile, alias)` holding the exact quantile value.
    */
  def bucketQuantiles(src: DataFrame, groupCol: String, valueCol: String,
                      ps: Seq[(Double, String)],
                      bucketWidth: Double): DataFrame = {
    val rows = src
      .select(col(groupCol).as("g"), col(valueCol).as("v"))
      .withColumn("bucket", floor(col("v") / bucketWidth))
    val counts = rows.groupBy(col("g"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy(col("g")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("cum_before", col("cum") - col("c"))
    val targets = counts.groupBy(col("g")).agg(sum(col("c")).as("n"))
      .select(col("g"), col("n"),
        explode(array(ps.map { case (p, _) => lit(p) }: _*)).as("p"))
      .withColumn("target", ceil(col("n") * col("p")).cast("long"))
    // bucket-sized relations: locating each rank is a tiny range join
    val hits = targets.join(cum, Seq("g"))
      .filter(col("target") > col("cum_before") && col("target") <= col("cum"))
      .select(col("g"), col("p"), col("bucket"),
        (col("target") - col("cum_before")).as("r"))
    val wsel = Window.partitionBy(col("g"), col("p")).orderBy(col("v"))
    val aggs = ps.map { case (p, name) =>
      max(when(col("p") === p, col("v"))).as(name)
    }
    rows.join(broadcast(hits), Seq("g", "bucket"))
      .withColumn("rn", row_number().over(wsel))
      .filter(col("rn") === col("r"))
      .groupBy(col("g"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("g", groupCol)
  }
}
