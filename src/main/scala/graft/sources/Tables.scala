package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-generated testdata tables
  * (`/root/testdata/sf*`, one parquet per table — see TESTDATA.md).
  *
  * All query entry points take the sf directory as a parameter so the
  * same plan runs unchanged at sf0.001 (smoke), sf0.01 (oracle) and
  * sf0.1+ (bench). Reads are plain parquet scans: Catalyst handles
  * column pruning and predicate pushdown, so no caching or collect
  * happens here — at 100 TB these would be the same scans over an
  * object store, partitioned by file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Analyzed base relation per (session, path) — metadata reuse only,
    * never data or results: `spark.read.parquet(path)` runs a footer
    * schema-inference job and builds a fresh file index EVERY call, so
    * a suite run re-reads the same static footers hundreds of times
    * (measured r17: ~35 ms job + ~100 ms planning gap per call inside
    * the lifecycle fixtures). The testdata files are immutable for a
    * session (the bench/verify contract), so the resolved relation —
    * schema + file listing, both metadata — is computed once. The
    * DataFrame stays lazy: every consumer still plans and scans its
    * own query from the parquet input. */
  private val relCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    relCache.getOrElseUpdate((spark, s"$sfDir/$name.parquet"),
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
