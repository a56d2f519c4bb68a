package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end corpus curation — the whole LLM training-data preparation
  * flow as ONE declarative plan, composing the operators the library
  * ships individually: canonicalize (native NormalizeText) → quality
  * gate (token stats) → language gate (stopword heuristic) → exact
  * dedup on the canonical hash (keep the smallest doc_id) → a
  * deterministic hash-bucket sample of the survivors.
  *
  * Plan shape at 100 TB: the normalize/gate stages are one narrow
  * codegen'd pass over the scan (no shuffle until dedup); dedup is one
  * hash aggregate on the 32-byte canonical hash; the sample is a filter.
  * Two shuffles total for the entire curation flow, both on compact
  * keys. The DuckDB oracle replays every stage.
  */
object Corpus {
  type Q = (SparkSession, String) => DataFrame

  private[queries] val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  // ---------------------------------------------------------------- c01
  val c01: Q = (s, d) => {
    val stopArr = array(stopwords.map(lit): _*)
    val canon = Tables.documents(s, d)
      .withColumn("norm", graft.functions.TextExprs.normalizeText(col("text")))
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_ratio",
        size(filter(col("toks"), t => array_contains(stopArr, t)))
          .cast("double") / size(col("toks")))
      .withColumn("distinct_ratio",
        size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
    val gated = canon
      .filter(col("n_tokens") >= 20 &&
        col("distinct_ratio") >= 0.3 &&
        col("stop_ratio") >= 0.08)          // language gate: en-like
    val deduped = gated
      .groupBy(sha2(col("norm"), 256).as("norm_hash"))
      .agg(min(col("doc_id")).as("doc_id"),
           count(lit(1)).as("n_copies"),
           min(col("n_tokens")).as("n_tokens"))
    deduped
      .filter(pmod(conv(substring(col("norm_hash"), 1, 8), 16, 10)
        .cast("long"), lit(100)) < 50)       // deterministic 50% sample
      .select(col("doc_id"), col("norm_hash"), col("n_copies"),
              col("n_tokens"))
  }

  val c01Sql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    raw"""
    WITH canon AS (
      SELECT doc_id,
             trim(regexp_replace(lower(nfc_normalize(text)),
                                 '\s+', ' ', 'g')) AS norm
      FROM documents),
    stats AS (
      SELECT doc_id, norm, string_split(norm, ' ') AS toks
      FROM canon),
    gated AS (
      SELECT doc_id, norm,
             CAST(len(toks) AS INTEGER) AS n_tokens
      FROM stats
      WHERE len(toks) >= 20
        AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3
        AND CAST(len(list_filter(toks, t -> list_contains($stopList, t)))
                 AS DOUBLE) / len(toks) >= 0.08),
    deduped AS (
      SELECT sha256(norm) AS norm_hash,
             MIN(doc_id) AS doc_id,
             COUNT(*) AS n_copies,
             MIN(n_tokens) AS n_tokens
      FROM gated GROUP BY 1)
    SELECT doc_id, norm_hash, n_copies, n_tokens
    FROM deduped
    WHERE ('0x' || substring(norm_hash, 1, 8))::BIGINT % 100 < 50"""
  }

  // ---------------------------------------------------------------- c02
  // The same curation flow through the SQL FRONT-END: a temp view plus
  // runtime-registered graft functions (TextExprs.register), everything
  // else plain Spark SQL — the proof that SQL-only users can run the
  // pipeline. Must produce byte-identical output to c01 (and shares its
  // oracle), so the two front-ends are checked against each other every
  // round.
  val c02: Q = (s, d) => {
    graft.functions.TextExprs.register(s)
    Tables.documents(s, d).createOrReplaceTempView("documents_v")
    val stopList = stopwords.map(w => s"'$w'").mkString("array(", ", ", ")")
    s.sql(s"""
      WITH canon AS (
        SELECT doc_id, graft_normalize_text(text) AS norm
        FROM documents_v),
      stats AS (
        SELECT doc_id, norm, split(norm, ' ') AS toks FROM canon),
      gated AS (
        SELECT doc_id, norm, CAST(size(toks) AS INT) AS n_tokens
        FROM stats
        WHERE size(toks) >= 20
          AND CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks) >= 0.3
          AND CAST(size(filter(toks, t -> array_contains($stopList, t)))
                   AS DOUBLE) / size(toks) >= 0.08),
      deduped AS (
        SELECT sha2(norm, 256) AS norm_hash,
               MIN(doc_id) AS doc_id,
               COUNT(*) AS n_copies,
               MIN(n_tokens) AS n_tokens
        FROM gated GROUP BY 1)
      SELECT doc_id, norm_hash, n_copies, n_tokens
      FROM deduped
      WHERE pmod(CAST(conv(substring(norm_hash, 1, 8), 16, 10) AS BIGINT),
                 100) < 50""")
  }

  // ---------------------------------------------------------------- c03
  // Domain-mixture sampling — the step that turns a curated corpus
  // into a training mixture: each source gets a target sampling rate
  // (here derived from the source id: 25/50/75%), membership is
  // decided by a portable cryptographic hash of the key (q40's
  // mechanism — reproducible across engines, runs and cluster
  // layouts), and the output is the per-source mixture audit
  // (target vs achieved). Scale shape: the keep-decision is a
  // row-local filter fused into the scan — no shuffle, no sort, no
  // rand(); the only exchange is the 20-key audit aggregate. At
  // 100 TB the same plan emits the sampled corpus by filtering
  // instead of auditing.
  val c03: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("target_pct",
        (lit(25) * (lit(1) + substring(col("source"), 4, 10).cast("int") % 3))
          .cast("int"))
    docs.groupBy(col("source"), col("target_pct"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(pmod(col("h"), lit(100)) < col("target_pct"), 1)
          .otherwise(0)).cast("bigint").as("n_kept"))
  }

  val c03Sql: String = """
    WITH h AS (SELECT source,
                      CAST(25 * (1 + CAST(substr(source, 4) AS INTEGER) % 3)
                           AS INTEGER) AS target_pct,
                      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        ::BIGINT % 100 AS hb
               FROM documents)
    SELECT source, target_pct, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN hb < target_pct THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM h GROUP BY source, target_pct"""

  val queries: Map[String, Q] = Map(
    "c01_curate" -> c01,
    "c02_curate_sql" -> c02,
    "c03_mixture_sample" -> c03)
  val oracle: Map[String, String] = Map(
    "c01_curate" -> c01Sql,
    "c02_curate_sql" -> c01Sql,
    "c03_mixture_sample" -> c03Sql)
}
