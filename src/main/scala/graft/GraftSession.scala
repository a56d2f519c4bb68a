package graft

import org.apache.spark.sql.SparkSession

/** Front door: a SparkSession configured the way this library expects.
  *
  *  - `spark.sql.extensions = GraftExtensions` — every native
  *    expression (`graft_qdot`, `graft_shingles`, `graft_minhash_sig`,
  *    `graft_normalize_text`, `graft_doc_pairs`) resolves in SQL.
  *  - UTC session timezone (timestamp arithmetic in the query surface
  *    assumes it).
  *  - Shuffle partitions sized by the caller — pass the cluster's
  *    total cores for CPU-bound local work; at warehouse scale this is
  *    2–3× total executor cores, NOT the default 200. Stateful
  *    streaming queries re-shard internally regardless (see
  *    queries/Streamed.stateSession).
  *
  * `attach` upgrades an EXISTING session in place (function
  * registration only — conf is left alone), for callers who already
  * own a session.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")

  def create(master: String = "local[*]",
             shufflePartitions: Int =
               Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(master, shufflePartitions).getOrCreate()

  /** Register graft functions on a session the caller already owns. */
  def attach(spark: SparkSession): SparkSession = {
    graft.functions.VectorExprs.register(spark)
    graft.functions.TextExprs.register(spark)
    spark
  }
}
