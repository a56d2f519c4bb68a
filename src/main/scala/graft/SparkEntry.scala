package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Corpus, Dedup, Graph, Load, Multimodal, Relational, Similarity, Streamed, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (relational + text + dedup +
  * similarity + multimodal + streaming); `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL for every oracle-checkable entry.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Text.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ Streamed.queries ++
      Corpus.queries ++ Graph.queries ++ Load.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every registered query has one:
    * hash-sketch ops are made checkable via portable hashing (d05),
    * candidates + exact verification (d04, d06), or contract checks
    * (q27's HLL tolerance). */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Text.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ Multimodal.oracle ++ Streamed.oracle ++
      Corpus.oracle ++ Graph.oracle ++ Load.oracle
}
