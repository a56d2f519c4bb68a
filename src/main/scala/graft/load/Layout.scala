package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, ArrayType, MapType, StructType}

/** Multi-dimensional data layout (Z-order clustering) for scan pruning.
  *
  * A 100 TB table is pruned by file/row-group min-max statistics, and
  * those statistics are only selective if the writer clustered the data.
  * A linear sort clusters ONE dimension perfectly and leaves every other
  * dimension's per-file range at the full domain — a predicate on the
  * second column skips nothing. Interleaving the bits of both keys
  * (Morton / Z-value) and range-partitioning + sorting by that single
  * derived value tiles the key space into quadrants, so EVERY clustered
  * dimension gets bounded per-file ranges and predicates on any of them
  * skip most files.
  *
  * The Z-value is a pure bit-arithmetic Catalyst expression
  * (shift/and/or — whole-stage-codegen'd, no UDF), so the write plan is
  * scan → narrow map → range shuffle → local sort: exactly one shuffle,
  * identical to a plain sorted write. `repartitionByRange` samples the
  * Z-values to build balanced output files at any scale.
  */
object Layout {

  /** Does Spark's `hash()` accept this type? It rejects MapType at
    * ANY nesting depth (since 3.0) — a salt key hashing every column
    * would fail analysis on a table with a map column (ADVICE r15). */
  private def hashSafe(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case ArrayType(et, _) => hashSafe(et)
    case st: StructType => st.fields.forall(f => hashSafe(f.dataType))
    case _ => true
  }

  /** A `slices`-way salt expression over `df`'s rows: hash the
    * hash-safe columns when any exist (spreads even constant-row data
    * by value); when EVERY column contains a MapType, hash the maps
    * through `to_json` instead. The salt must be DETERMINISTIC per
    * row, not merely well-distributed (r17, ADVICE r16 #4): it is
    * used as a repartition key, and a nondeterministic key —
    * `monotonically_increasing_id`, the old fallback — re-deals rows
    * differently when a task retries after a partial shuffle fetch,
    * duplicating or losing rows (the round-robin-repartition hazard
    * Spark itself fixed with a local sort). `to_json` on a map is
    * deterministic within a run for identical upstream row content —
    * which is exactly the retry case. */
  private[graft] def saltKey(df: DataFrame, slices: Int): Column = {
    val safe = df.schema.fields.filter(f => hashSafe(f.dataType))
    if (safe.nonEmpty) pmod(hash(safe.map(f => col(f.name)): _*), lit(slices))
    else pmod(hash(df.schema.fields.map(f => to_json(col(f.name))): _*),
      lit(slices))
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. 16 bits each covers a 65536×65536 key grid
    * in one long; widen per column as domains require. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(
          shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(
          shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Write `df` as `numFiles` parquet files Z-clustered on `(a, b)`:
    * range-partition by Z-value (sampled balanced boundaries), sort each
    * partition by it, write. The helper value never materializes in the
    * output schema. */
  def writeZOrdered(df: DataFrame, a: String, b: String, path: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    val z = zValue(col(a), col(b), bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order COMPOSED with a hive-partitioned layout (r15): hash the
    * rows to their partition-column groups (so each output directory
    * is written by exactly one task — the bounded-fan-out shape the
    * partitioned fold uses), then sort each task's rows by (partition
    * cols, Z-value) so every directory's file(s) are Z-clustered on
    * `(a, b)` WITHIN the partition. The plan is scan → narrow map →
    * one hash shuffle → local sort — same single-shuffle cost as the
    * unpartitioned form; parquet row-group/file min-max stats become
    * selective on both residual dimensions inside each partition,
    * which is the layout a date-partitioned 100 TB table wants
    * (partition pruning first, Z-stat skipping within the day). */
  def writeZOrderedPartitioned(df: DataFrame, partitionCols: Seq[String],
                               a: String, b: String, path: String,
                               bits: Int = 16, slices: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "use writeZOrdered for flat layouts")
    val z = zValue(col(a), col(b), bits)
    // `slices` > 1 salts the shuffle key so a fat partition value
    // splits across up to that many tasks instead of serializing into
    // one (sized from fold bytes by the caller). Each salted file is
    // still Z-sorted over its random 1/slices sample, so contiguous
    // row-group slices keep tight envelopes (order statistics of a
    // sorted sample) — selectivity degrades ~slices×, never to the
    // full domain.
    val parts = partitionCols.map(col)
    val keys =
      if (slices <= 1) parts
      else parts :+ saltKey(df, slices)
    df.repartition(keys: _*)
      .sortWithinPartitions(parts :+ z: _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Comparison baseline: the same write linearly sorted on `a` only. */
  def writeLinear(df: DataFrame, a: String, path: String,
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(a))
      .sortWithinPartitions(col(a))
      .write.mode("overwrite").parquet(path)
}
