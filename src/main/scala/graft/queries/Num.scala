package graft.queries

import org.apache.spark.sql.Column
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
}
