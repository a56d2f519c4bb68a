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
        // substring-to-end + try_cast on BOTH sides (oracle uses
        // TRY_CAST(substr(source, 4))) so the pair stays aligned on
        // long or non-numeric source suffixes, not just the current
        // short all-digit fixture shape.
        (lit(25) * (lit(1) +
          expr("substring(source, 4)").try_cast("int") % 3)).cast("int"))
    docs.groupBy(col("source"), col("target_pct"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(pmod(col("h"), lit(100)) < col("target_pct"), 1)
          .otherwise(0)).cast("bigint").as("n_kept"))
  }

  val c03Sql: String = """
    WITH h AS (SELECT source,
                      CAST(25 * (1 + TRY_CAST(substr(source, 4) AS INTEGER) % 3)
                           AS INTEGER) AS target_pct,
                      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        ::BIGINT % 100 AS hb
               FROM documents)
    SELECT source, target_pct, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN hb < target_pct THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM h GROUP BY source, target_pct"""

  // ---------------------------------------------------------------- c04
  // Sequence packing — concat-and-chunk documents into fixed-length
  // training sequences (the step between a curated corpus and a token
  // loader): documents in deterministic doc_id order are laid end to
  // end on a global token axis, and each doc reports which packed
  // sequence its tokens start/end in and at what offset.
  //
  // The global prefix sum is the scale hazard: a naive
  // `Window.orderBy(doc_id)` with no partition runs as ONE task over
  // the whole corpus. This plan computes it as a two-level distributed
  // prefix sum instead: (1) a per-block running sum — parallel windows
  // partitioned by `block` (doc_id DIV 64); (2) block totals, whose
  // running sum gives each block's global start — a window over a
  // 64×-smaller relation, joined back size-guarded. At 100 TB the
  // block-offset relation is corpus/64 rows of two longs; if even that
  // outgrows one task the same reduction applies recursively (blocks of
  // blocks) — each level shrinks the single-task window another 64×.
  /** Shared c04/c10 relation: each document's global token offset
    * (`st`) via the two-level distributed prefix sum — per-block local
    * windows plus a broadcast block-offset relation (see c04's scale
    * commentary). */
  private def packedOffsets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 64L // docs per prefix-sum block
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("block", expr(s"doc_id DIV $B"))
    val inBlock = Window.partitionBy(col("block")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = docs.withColumn("local_start",
      coalesce(sum(col("n_tokens")).over(inBlock), lit(0L)))
    val blockOffsets = docs.groupBy(col("block"))
      .agg(sum(col("n_tokens")).as("block_total"))
      .withColumn("block_start",
        coalesce(sum(col("block_total")).over(
          Window.orderBy(col("block"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("block"), col("block_start"))
    withLocal.join(Hints.broadcastIfSmall(blockOffsets), Seq("block"))
      .withColumn("st", col("block_start") + col("local_start"))
      .select(col("doc_id"), col("n_tokens"), col("st"))
  }

  val c04: Q = (s, d) => {
    val L = 512L // tokens per packed sequence
    packedOffsets(s, d)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"st DIV $L").as("seq_first"),
        expr(s"(st + n_tokens - 1) DIV $L").as("seq_last"),
        pmod(col("st"), lit(L)).as("seq_offset"))
  }

  val c04Sql: String = """
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS st
          FROM t)
    SELECT doc_id, n_tokens,
           st // 512 AS seq_first,
           (st + n_tokens - 1) // 512 AS seq_last,
           st % 512 AS seq_offset
    FROM c"""

  // ---------------------------------------------------------------- c05
  // Deterministic training shuffle + sharding — the "global shuffle"
  // that precedes sequence packing in a real run: each doc gets a
  // pseudorandom-but-reproducible order key (60-bit md5 prefix of its
  // id — portable across engines, runs and cluster layouts; no
  // rand()), shard = key mod 8, and the output is the per-shard
  // balance audit (doc count, token mass, key range). Scale shape:
  // shard assignment is a row-local expression fused into the scan,
  // the audit is one 8-group aggregate; writing the shuffled corpus
  // is `repartition(shard) + sortWithinPartitions(ord)` — per-shard
  // local sorts, never a global sort.
  val c05: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("ord",
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
    docs.groupBy(pmod(col("ord"), lit(8)).cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("ord")).as("first_key"),
        max(col("ord")).as("last_key"))
  }

  val c05Sql: String = """
    WITH h AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        ::BIGINT AS ord
               FROM documents)
    SELECT CAST(ord % 8 AS INTEGER) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(ord) AS first_key,
           MAX(ord) AS last_key
    FROM h GROUP BY 1"""

  // ---------------------------------------------------------------- c06
  // Tokenize-and-pack — the end-to-end fusion a training-data run
  // actually executes: c04's packing layout computed over TRAINED
  // subword counts (t16's merge table applied via t17's row-local
  // encode) instead of the whitespace proxy. The capacity numbers a
  // loader bills in are BPE tokens; packing on whitespace counts
  // mis-sizes every sequence boundary.
  //
  // Scale shape: training touches the corpus once and iterates on the
  // Heaps-law word dictionary (t16); the trained encode + token count
  // is ONE row-local expression fused into the scan (no shuffle, no
  // join — the merge table is K driver-side literals folded into the
  // plan); the packing layout is c04's two-level distributed prefix
  // sum (per-block windows + a 64×-smaller broadcast offset relation).
  // The whole pipeline adds zero shuffles beyond c04's.
  val c06: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val L = 512L // tokens per packed sequence
    val B = 64L  // docs per prefix-sum block
    val merges = Text.trainedMerges(s, d)
    val docs = Tables.documents(s, d)
      .withColumn("enc", Text.bpeEncodeCol(col("text"), merges))
      // symbols are wrapped in exactly two '~' each → count('~') / 2
      .select(col("doc_id"),
        expr("(length(enc) - length(replace(enc, '~', ''))) div 2")
          .cast("long").as("n_tokens"))
      .withColumn("block", expr(s"doc_id DIV $B"))
    val inBlock = Window.partitionBy(col("block")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = docs.withColumn("local_start",
      coalesce(sum(col("n_tokens")).over(inBlock), lit(0L)))
    val blockOffsets = docs.groupBy(col("block"))
      .agg(sum(col("n_tokens")).as("block_total"))
      .withColumn("block_start",
        coalesce(sum(col("block_total")).over(
          Window.orderBy(col("block"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("block"), col("block_start"))
    withLocal.join(Hints.broadcastIfSmall(blockOffsets), Seq("block"))
      .withColumn("st", col("block_start") + col("local_start"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"st DIV $L").as("seq_first"),
        expr(s"(st + n_tokens - 1) DIV $L").as("seq_last"),
        pmod(col("st"), lit(L)).as("seq_offset"))
  }

  val c06Sql: String = {
    val (chain, bs) = Text.bpeEncChainSql
    s"""${Text.bpeCtes},
    enc0 AS (SELECT doc_id,
                    array_to_string(list_transform(string_split(text, ' '),
                      w -> '~' || array_to_string(string_split(w, ''), '~~')
                           || '~'), ' ') AS enc
             FROM documents),
    encf AS (SELECT doc_id, $chain AS enc FROM enc0, $bs),
    t AS (SELECT doc_id,
                 CAST((length(enc) - length(replace(enc, '~', ''))) // 2
                      AS BIGINT) AS n_tokens
          FROM encf),
    c AS (SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS st
          FROM t)
    SELECT doc_id, n_tokens,
           st // 512 AS seq_first,
           (st + n_tokens - 1) // 512 AS seq_last,
           st % 512 AS seq_offset
    FROM c"""
  }

  // ---------------------------------------------------------------- c07
  // Contamination-safe split — the train/val/test partition an LLM run
  // needs WITH the audit that makes it safe: membership is a portable
  // hash of the doc id (80/10/10, rand()-free and reproducible — c03's
  // mechanism), and the leakage audit reports how many val/test docs
  // have a NEAR-DUPLICATE (d03's banded Jaccard pairs, threshold 0.5)
  // inside train — the split-level contamination document-level random
  // splitting silently ships (a val doc whose near-copy was trained on
  // measures nothing).
  //
  // Scale shape: the split decision is row-local arithmetic on the id,
  // so BOTH endpoints of every near-dup pair get their split assignment
  // inside the pair relation itself — the corpus is never joined for
  // the audit; the only non-d03 work is one aggregate over the
  // true-pair-sized leak set and the 3-key split census.
  val c07: Q = (s, d) => {
    def splitOf(id: org.apache.spark.sql.Column) = {
      val hb = pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(10))
      when(hb < 8, "train").when(hb === 8, "val").otherwise("test")
    }
    val pairs = Dedup.jaccardPairs(s, d).select(col("i"), col("j"))
    val sym = pairs.union(pairs.select(col("j"), col("i")))
      .toDF("k", "other")
    val leaked = sym
      .withColumn("ksplit", splitOf(col("k")))
      .withColumn("osplit", splitOf(col("other")))
      .filter(col("ksplit") =!= "train" && col("osplit") === "train")
      .select(col("k")).distinct()
    Tables.documents(s, d)
      .select(col("doc_id"), splitOf(col("doc_id")).as("split"))
      .join(Hints.broadcastIfSmall(
        leaked.withColumn("is_leaked", lit(1L))),
        col("doc_id") === col("k"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_leaked"), lit(0L))).as("n_leaked"),
        (sum(coalesce(col("is_leaked"), lit(0L))).cast("double") /
          count(lit(1))).as("leak_frac"))
  }

  val c07Sql: String = s"""
    WITH ${Dedup.JaccardPairsCte},
    sym AS (SELECT i AS k, j AS other FROM pairs
            UNION ALL
            SELECT j AS k, i AS other FROM pairs),
    sp AS (SELECT k, other,
                  ('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 8))
                    ::BIGINT % 10 AS kb,
                  ('0x' || substring(md5(CAST(other AS VARCHAR)), 1, 8))
                    ::BIGINT % 10 AS ob
           FROM sym),
    leaked AS (SELECT DISTINCT k FROM sp
               WHERE kb >= 8 AND ob < 8),
    census AS (SELECT doc_id,
                      CASE WHEN hb < 8 THEN 'train'
                           WHEN hb = 8 THEN 'val'
                           ELSE 'test' END AS split
               FROM (SELECT doc_id,
                            ('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                               1, 8))::BIGINT % 10 AS hb
                     FROM documents) x)
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN l.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaked,
           CAST(SUM(CASE WHEN l.k IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS leak_frac
    FROM census LEFT JOIN leaked l ON census.doc_id = l.k
    GROUP BY split"""

  // ---------------------------------------------------------------- c08
  // Quality-binned curriculum sampling — the data-mixing stage that
  // turns a scored corpus into a quality-weighted training mix (the
  // DoReMi/phi-style "sample good data more" recipe, with c03's
  // reproducible hash membership instead of rand()). Documents are
  // scored by lexical diversity (distinct-token ratio — an
  // integer-exact proxy; any per-doc score slots in), split into
  // quartile bins at EXACT corpus quantiles, and each bin keeps a
  // curriculum rate (10/25/50/90% — rarer low-quality data, most of
  // the high tail).
  // Scale shape: the quartile cutoffs come from Num.bucketQuantiles —
  // the histogram + rank-resolve two-pass q59 proved at 100× —
  // never a global sort or single-task window; the 3-value cutoff row
  // is a broadcast; bin assignment + hash membership are row-local
  // scan expressions; one final 4-group aggregate. Two bounded
  // shuffles at any corpus size.
  val c08: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks"))).as("q"))
      .withColumn("g", lit(1))
    val cuts = Num.bucketQuantiles(scored, "g", "q",
      Seq((0.25, "q1"), (0.5, "q2"), (0.75, "q3")), 0.01).drop("g")
    scored.crossJoin(broadcast(cuts))
      .withColumn("bin",
        when(col("q") <= col("q1"), 1)
          .when(col("q") <= col("q2"), 2)
          .when(col("q") <= col("q3"), 3).otherwise(4))
      .withColumn("rate",
        element_at(array(lit(10), lit(25), lit(50), lit(90)), col("bin")))
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .groupBy(col("bin"), col("rate"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(pmod(col("h"), lit(100)) < col("rate"), 1).otherwise(0))
          .cast("long").as("n_kept"),
        Num.davg(col("q")).as("avg_quality"))
  }

  val c08Sql: String = s"""
    WITH sc AS (SELECT doc_id,
                       CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE) / len(string_split(text, ' ')) AS q
                FROM documents),
    rk AS (SELECT doc_id, q, ROW_NUMBER() OVER (ORDER BY q) AS rn,
                  COUNT(*) OVER () AS n
           FROM sc),
    cut AS (SELECT
              MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN q END)
                AS q1,
              MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN q END)
                AS q2,
              MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN q END)
                AS q3
            FROM rk),
    b AS (SELECT doc_id, q,
                 CASE WHEN q <= q1 THEN 1 WHEN q <= q2 THEN 2
                      WHEN q <= q3 THEN 3 ELSE 4 END AS bin,
                 CASE WHEN q <= q1 THEN 10 WHEN q <= q2 THEN 25
                      WHEN q <= q3 THEN 50 ELSE 90 END AS rate,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 100 AS hb
          FROM sc CROSS JOIN cut)
    SELECT bin, rate, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN hb < rate THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           ${Num.sqlDavg("q")} AS avg_quality
    FROM b GROUP BY bin, rate"""

  // ---------------------------------------------------------------- c09
  // Token-budget epoch planning — the arithmetic between "here is the
  // curated corpus" and "here is the training run": given a total
  // token budget and per-source mixture weights (c03's deterministic
  // rate rule), compute what the run actually consumes per source —
  // target tokens, epochs over the source's unique tokens (the repeat
  // factor data-constrained scaling work warns about), and whether
  // the source is repeated (>1 epoch) or subsampled (<1). Pure
  // integer/rational arithmetic end to end: budget and weights are
  // exact, epochs is one double division per source — bit-portable.
  // Scale shape: ONE token-count aggregate over the corpus (t01's
  // shuffle, source-keyed) and a ~|sources|-row projection after it.
  // The planning math is free at any corpus size; the corpus is
  // scanned once.
  private val C09Budget = 10_000_000L // total training-token budget
  val c09: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(col("source"), size(split(col("text"), " ")).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).cast("long").as("src_tokens"))
      // c03's deterministic weight rule: 1/2/3 shares by source suffix
      .withColumn("share",
        (lit(1) + expr("substring(source, 4)").try_cast("int") % 3)
          .cast("long"))
    val tot = counts.agg(sum(col("share")).as("share_total"))
    counts.crossJoin(broadcast(tot))
      // explicit integral division (DIV / //): Spark's `/` promotes to
      // double and its long cast truncates while DuckDB's rounds —
      // floor-division is the semantics both engines share exactly
      .withColumn("target_tokens",
        expr(s"$C09Budget * share div share_total").cast("long"))
      .select(col("source"), col("src_tokens"), col("target_tokens"),
        (col("target_tokens").cast("double") / col("src_tokens"))
          .as("epochs"),
        when(col("target_tokens") > col("src_tokens"), lit("repeat"))
          .when(col("target_tokens") < col("src_tokens"), lit("subsample"))
          .otherwise(lit("exact")).as("regime"))
  }

  val c09Sql: String = s"""
    WITH counts AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tokens,
             CAST(1 + TRY_CAST(substr(source, 4) AS INTEGER) % 3 AS BIGINT)
               AS share
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(share) AS BIGINT) AS share_total FROM counts),
    plan AS (
      SELECT source, src_tokens,
             CAST($C09Budget * share // share_total AS BIGINT)
               AS target_tokens
      FROM counts CROSS JOIN tot)
    SELECT source, src_tokens, target_tokens,
           CAST(target_tokens AS DOUBLE) / src_tokens AS epochs,
           CASE WHEN target_tokens > src_tokens THEN 'repeat'
                WHEN target_tokens < src_tokens THEN 'subsample'
                ELSE 'exact' END AS regime
    FROM plan"""

  // ---------------------------------------------------------------- c10
  // Packed-sequence ATTENTION SPANS — the inverse of c04's doc→sequence
  // index and the other half a training loader actually consumes: for
  // every packed sequence, the (doc_id, span_start, span_len) segments
  // that tile it, which is exactly the relation block-diagonal
  // attention masks and document-boundary loss masking are built from
  // (tokens from different documents packed into one sequence must not
  // attend to each other). Same two-level prefix-sum offsets as c04
  // (one shared plan prefix), then a NARROW per-doc fan-out: each doc
  // explodes across the [seq_first, seq_last] range it straddles —
  // ⌈n_tokens/L⌉+1 rows per doc, no additional shuffle. The span
  // arithmetic is closed-form integer (max/min against the L-grid), so
  // the oracle restates it exactly.
  // Scale shape: output is (total_tokens/L + docs)-proportional —
  // the same order as the packed corpus itself; everything after the
  // c04 offsets is row-local inside whole-stage codegen.
  val c10: Q = (s, d) => {
    val L = 512L
    packedOffsets(s, d)
      .select(col("doc_id"), col("n_tokens"), col("st"),
        explode(sequence(
          expr(s"st DIV $L"),
          expr(s"(st + n_tokens - 1) DIV $L"))).as("seq_id"))
      .select(col("seq_id"), col("doc_id"),
        greatest(col("st") - col("seq_id") * L, lit(0L)).as("span_start"),
        (least(col("st") + col("n_tokens"), (col("seq_id") + lit(1L)) * L) -
          greatest(col("st"), col("seq_id") * L)).as("span_len"))
  }

  val c10Sql: String = """
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS st
          FROM t),
    sp AS (SELECT doc_id, n_tokens, st,
                  unnest(generate_series(st // 512,
                                         (st + n_tokens - 1) // 512))
                    AS seq_id
           FROM c)
    SELECT seq_id, doc_id,
           GREATEST(st - seq_id * 512, 0) AS span_start,
           LEAST(st + n_tokens, (seq_id + 1) * 512)
             - GREATEST(st, seq_id * 512) AS span_len
    FROM sp"""

  // ---------------------------------------------------------------- c11
  // Token-proportional weighted sampling — c03 samples at per-SOURCE
  // rates; mixture recipes are usually stated in TOKENS, so the
  // per-document inclusion probability should ride the document's
  // token mass (long docs carry more of the budget; sampling docs
  // uniformly over-weights short ones token-wise). Weighted Bernoulli
  // via the same portable-hash device as c03: keep doc_id iff
  // md5-derived hash mod 2000 < min(n_chars, 2000) — inclusion
  // probability min(n_chars/2000, 1), deterministic, reproducible
  // across engines and layouts, no rand(). Output is the kept set with
  // its weights (strong row/hash check), not just an audit aggregate.
  //
  // Scale shape: the weight and the hash are row-local expressions
  // fused into the scan — the sampled corpus falls out of ONE filter
  // with zero shuffles; at 100 TB this is a pure map stage whose
  // output is the sample itself.
  val c11: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("w", least(col("n_chars"), lit(2000L)))
    docs.filter(pmod(col("h"), lit(2000L)) < col("w"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("w"))
  }

  val c11Sql: String = """
    SELECT doc_id, source, n_chars, LEAST(n_chars, 2000) AS w
    FROM documents
    WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
            % 2000 < LEAST(n_chars, 2000)"""

  // ---------------------------------------------------------------- c12
  // Temperature-scaled mixture targets (α = 0.5) — the multilingual-
  // LLM resampling rule (sample source s with probability ∝ n_s^α):
  // α < 1 flattens the size distribution so head sources stop drowning
  // the tail. Weights are floor(√tokens · 10⁶) — ONE correctly-rounded
  // IEEE sqrt + multiply + floor per source, deterministic in both
  // engines — and everything downstream is exact integer arithmetic:
  // target tokens = budget·w_s DIV Σw, realized per-doc keep rate in
  // parts-per-million via the c03 portable-hash device. Output per
  // source: the full plan (sizes, weight, target, rate) plus the
  // realized sample audit (kept docs/tokens).
  //
  // Scale shape: one source-keyed token aggregate (the only shuffle —
  // the source dimension is bounded, so the target math and the Σw
  // window run on a dimension-sized relation); the realized-sample
  // pass is a row-local hash filter joined against the broadcast
  // dimension-sized rate table.
  val c12: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val Budget = 50000L
    val docs = Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
    val stats = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("src_tok"))
      .withColumn("w", floor(sqrt(col("src_tok").cast("double")) * 1000000.0))
      .withColumn("sum_w", sum(col("w")).over(Window.partitionBy()))
      .withColumn("target_tok", expr(s"$Budget * w div sum_w"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("target_tok * 1000000 div src_tok")))
    val kept = docs
      .join(broadcast(stats.select(col("source"), col("rate_ppm"))),
        Seq("source"))
      .filter(pmod(col("h"), lit(1000000L)) < col("rate_ppm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tok")).as("kept_tok"))
    stats.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("src_tok"), col("w"),
        col("target_tok"), col("rate_ppm"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tok"), lit(0L)).as("kept_tok"))
  }

  val c12Sql: String = """
    WITH dt AS (SELECT doc_id, source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                       ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         ::BIGINT % 1000000 AS hb
                FROM documents),
    st AS (SELECT source, COUNT(*) AS n_docs,
                  CAST(SUM(n_tok) AS BIGINT) AS src_tok,
                  CAST(floor(sqrt(CAST(SUM(n_tok) AS DOUBLE)) * 1000000.0)
                       AS BIGINT) AS w
           FROM dt GROUP BY source),
    pl AS (SELECT source, n_docs, src_tok, w,
                  CAST(50000 * w // SUM(w) OVER () AS BIGINT) AS target_tok
           FROM st),
    pl2 AS (SELECT *,
                   CAST(LEAST(1000000, target_tok * 1000000 // src_tok)
                        AS BIGINT) AS rate_ppm
            FROM pl),
    kept AS (SELECT dt.source, COUNT(*) AS kept_docs,
                    CAST(SUM(dt.n_tok) AS BIGINT) AS kept_tok
             FROM dt JOIN pl2 ON dt.source = pl2.source
             WHERE dt.hb < pl2.rate_ppm
             GROUP BY dt.source)
    SELECT p.source, p.n_docs, p.src_tok, p.w, p.target_tok, p.rate_ppm,
           COALESCE(k.kept_docs, 0) AS kept_docs,
           COALESCE(k.kept_tok, 0) AS kept_tok
    FROM pl2 p LEFT JOIN kept k ON p.source = k.source"""

  // ---------------------------------------------------------------- c13
  // Dataset card — the per-source summary manifest a released corpus
  // ships (HuggingFace dataset-card "Dataset Structure" numbers): doc/
  // token/char volume, language spread with the dominant language and
  // its share, duplicate-text rate, and length quantiles (p50/p90 as
  // exact rank picks, the q59 discipline — no interpolation). One
  // scan, three source-keyed aggregates and a rank window over the
  // (source, n_chars) relation; every ratio is one exact-integer IEEE
  // division. At 100 TB the card costs one corpus pass — the source
  // dimension is bounded, so everything after the first aggregate is
  // dimension-sized.
  val c13: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val base = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars_total"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(sha2(col("text"), 256)))
          .as("n_dup_docs"))
    val topLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("lc"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("lc").desc, col("lang").asc)))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("lc").as("top_lang_docs"))
    val ranked = docs.withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").asc, col("doc_id").asc)))
      .withColumn("nn", count(lit(1)).over(
        Window.partitionBy(col("source"))))
    val quant = ranked
      .filter(col("rn") === expr("cast(ceil(nn * 0.5) as bigint)") ||
        col("rn") === expr("cast(ceil(nn * 0.9) as bigint)"))
      .groupBy(col("source"))
      .agg(
        min(when(col("rn") === expr("cast(ceil(nn * 0.5) as bigint)"),
          col("n_chars"))).as("p50_chars"),
        min(when(col("rn") === expr("cast(ceil(nn * 0.9) as bigint)"),
          col("n_chars"))).as("p90_chars"))
    base.join(topLang, Seq("source")).join(quant, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_chars_total"), col("n_langs"), col("top_lang"),
        col("top_lang_docs"),
        (col("top_lang_docs").cast("double") / col("n_docs"))
          .as("top_lang_share"),
        col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs")).as("dup_rate"),
        col("p50_chars"), col("p90_chars"))
  }

  val c13Sql: String = """
    WITH docs AS (SELECT doc_id, source, lang, text, n_chars,
                         CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_tok
                  FROM documents),
    base AS (SELECT source, COUNT(*) AS n_docs,
                    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                    CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
                    COUNT(DISTINCT lang) AS n_langs,
                    COUNT(*) - COUNT(DISTINCT sha256(text)) AS n_dup_docs
             FROM docs GROUP BY source),
    tl AS (SELECT source, lang AS top_lang, lc AS top_lang_docs
           FROM (SELECT source, lang, COUNT(*) AS lc,
                        ROW_NUMBER() OVER (PARTITION BY source
                          ORDER BY COUNT(*) DESC, lang ASC) AS rk
                 FROM docs GROUP BY source, lang) t
           WHERE rk = 1),
    rk AS (SELECT source, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n_chars ASC, doc_id ASC) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS nn
           FROM docs),
    qs AS (SELECT source,
                  MIN(CASE WHEN rn = CAST(ceil(nn * 0.5) AS BIGINT)
                      THEN n_chars END) AS p50_chars,
                  MIN(CASE WHEN rn = CAST(ceil(nn * 0.9) AS BIGINT)
                      THEN n_chars END) AS p90_chars
           FROM rk
           WHERE rn = CAST(ceil(nn * 0.5) AS BIGINT)
              OR rn = CAST(ceil(nn * 0.9) AS BIGINT)
           GROUP BY source)
    SELECT b.source, b.n_docs, b.n_tokens, b.n_chars_total, b.n_langs,
           tl.top_lang, tl.top_lang_docs,
           CAST(tl.top_lang_docs AS DOUBLE) / b.n_docs AS top_lang_share,
           b.n_dup_docs,
           CAST(b.n_dup_docs AS DOUBLE) / b.n_docs AS dup_rate,
           qs.p50_chars, qs.p90_chars
    FROM base b JOIN tl USING (source) JOIN qs USING (source)"""

  // ---------------------------------------------------------------- c14
  // Curation funnel report — the per-source observability relation for
  // c01's gate cascade: how many documents each source feeds in, how
  // many survive the quality/language gates, how many of the survivors
  // are distinct after canonical hashing, and the token mass at each
  // stage. This is what a curation run publishes next to its output so
  // a reviewer can see WHERE each source's volume went (gates vs
  // dedup) before anyone trains on it — c13's dataset card describes
  // the survivors; c14 accounts for the casualties. One corpus pass,
  // one source-keyed aggregate; every rate is a single division of
  // exact longs (NULL where the denominator is 0, identically in both
  // engines via nullif).
  val c14: Q = (s, d) => {
    val stopArr = array(stopwords.map(lit): _*)
    val canon = Tables.documents(s, d)
      .withColumn("norm", graft.functions.TextExprs.normalizeText(col("text")))
      .withColumn("toks", split(col("norm"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("gate_ok",
        col("n_tokens") >= 20 &&
          size(array_distinct(col("toks"))).cast("double") /
            col("n_tokens") >= 0.3 &&
          size(filter(col("toks"), t => array_contains(stopArr, t)))
            .cast("double") / col("n_tokens") >= 0.08)
    canon.groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("gate_ok"), 1L).otherwise(0L)).as("n_gated"),
        countDistinct(when(col("gate_ok"), sha2(col("norm"), 256)))
          .as("n_unique"),
        sum(col("n_tokens").cast("long")).as("tok_raw"),
        sum(when(col("gate_ok"), col("n_tokens").cast("long"))
          .otherwise(0L)).as("tok_gated"))
      .select(col("source"), col("n_raw"), col("n_gated"), col("n_unique"),
        col("tok_raw"), col("tok_gated"),
        (col("n_gated").cast("double") / col("n_raw")).as("gate_rate"),
        ((col("n_gated") - col("n_unique")).cast("double") /
          nullif(col("n_gated"), lit(0L))).as("dup_rate"))
  }

  val c14Sql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    raw"""
    WITH canon AS (
      SELECT doc_id, source,
             trim(regexp_replace(lower(nfc_normalize(text)),
                                 '\s+', ' ', 'g')) AS norm
      FROM documents),
    stats AS (
      SELECT doc_id, source, norm, string_split(norm, ' ') AS toks
      FROM canon),
    flagged AS (
      SELECT source, norm, CAST(len(toks) AS BIGINT) AS n_tokens,
             (len(toks) >= 20
              AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3
              AND CAST(len(list_filter(toks,
                    t -> list_contains($stopList, t)))
                  AS DOUBLE) / len(toks) >= 0.08) AS gate_ok
      FROM stats)
    SELECT source,
           COUNT(*) AS n_raw,
           CAST(SUM(CASE WHEN gate_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gated,
           CAST(COUNT(DISTINCT CASE WHEN gate_ok THEN sha256(norm) END)
             AS BIGINT) AS n_unique,
           CAST(SUM(n_tokens) AS BIGINT) AS tok_raw,
           CAST(SUM(CASE WHEN gate_ok THEN n_tokens ELSE 0 END) AS BIGINT)
             AS tok_gated,
           CAST(SUM(CASE WHEN gate_ok THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS gate_rate,
           CAST(SUM(CASE WHEN gate_ok THEN 1 ELSE 0 END)
                - COUNT(DISTINCT CASE WHEN gate_ok THEN sha256(norm) END)
             AS DOUBLE)
             / nullif(SUM(CASE WHEN gate_ok THEN 1 ELSE 0 END), 0)
             AS dup_rate
    FROM flagged GROUP BY source"""
  }

  // ---------------------------------------------------------------- c15
  // Shard mixing audit — the training-order diagnostic behind c05's
  // hash-shard shuffle: per shard, the Shannon entropy of its SOURCE
  // distribution, in the exact milli-log10 integer arithmetic t29
  // established (numerator a bigint, ONE final division). A well-
  // shuffled shard's source entropy sits at the corpus-level value;
  // a low-entropy shard is source-clumped and trains like curriculum
  // you didn't ask for. The relation is shard × source sized (tiny at
  // any corpus scale — the corpus pass is the one hash-shard count).
  val c15: Q = (s, d) => {
    import graft.functions.TextExprs.milliLog10
    val sc = Tables.documents(s, d)
      .withColumn("shard",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15),
          16, 10).cast("long"), lit(8)).cast("int"))
      .groupBy(col("shard"), col("source")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds totals + the entropy numerator
    val totals = sc.groupBy(col("shard"))
      .agg(sum(col("cnt")).as("n_docs"), count(lit(1)).as("n_sources"))
    val e = sc.join(totals.select(col("shard"), col("n_docs")), Seq("shard"))
      .groupBy(col("shard"))
      .agg(sum(col("cnt") *
        (milliLog10(col("n_docs")) - milliLog10(col("cnt")))).as("h_num"))
    totals.join(e, Seq("shard"))
      .select(col("shard"), col("n_docs"), col("n_sources"), col("h_num"),
        (col("h_num").cast("double") / col("n_docs"))
          .as("mix_entropy_milli"))
  }

  val c15Sql: String = s"""
    WITH sc AS (
      SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               ::BIGINT % 8 AS INTEGER) AS shard,
             source, COUNT(*) AS cnt
      FROM documents GROUP BY 1, 2),
    totals AS (SELECT shard, CAST(SUM(cnt) AS BIGINT) AS n_docs,
                      COUNT(*) AS n_sources
               FROM sc GROUP BY 1),
    vals AS (SELECT cnt AS v FROM sc UNION SELECT n_docs FROM totals),
    ${Text.milliLogValsCtes},
    e AS (SELECT sc.shard,
                 CAST(SUM(sc.cnt * (mn.mlog - mc.mlog)) AS BIGINT) AS h_num
          FROM sc
            JOIN totals ON sc.shard = totals.shard
            JOIN ml mc ON mc.v = sc.cnt
            JOIN ml mn ON mn.v = totals.n_docs
          GROUP BY 1)
    SELECT t.shard, t.n_docs, t.n_sources, e.h_num,
           CAST(e.h_num AS DOUBLE) / t.n_docs AS mix_entropy_milli
    FROM totals t JOIN e ON t.shard = e.shard"""

  // ---------------------------------------------------------------- c16
  // In-flight load audit via `Dataset.observe` (CollectMetrics): c14's
  // funnel numbers, collected ON the curation pass itself instead of by
  // a second scan — the operational audit mode of a 100 TB load, where
  // "rows seen / kept / rejected per gate" must come out of the one
  // pass you were already paying for. The observe node rides c01's
  // narrow gate stage (CollectMetrics is a pushdown barrier, so the
  // gate filter cannot slide below it and shrink `rows_seen`); failure
  // attribution is waterfall (first failing gate claims the row), so
  // the four counters partition rows_seen exactly — PlanSpec asserts
  // the single scan + CollectMetrics shape and the partition identity,
  // the oracle pins every number in closed form.
  private[graft] def observedCurateGated(
      s: SparkSession, d: String): (DataFrame, org.apache.spark.sql.Observation) = {
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
    val passLen = col("n_tokens") >= 20
    val passDis = col("distinct_ratio") >= 0.3
    val passLang = col("stop_ratio") >= 0.08
    val obs = new org.apache.spark.sql.Observation()
    val audited = canon.observe(obs,
      count(lit(1)).as("rows_seen"),
      sum(col("n_tokens")).as("tokens_seen"),
      count_if(!passLen).as("fail_len"),
      count_if(passLen && !passDis).as("fail_distinct"),
      count_if(passLen && passDis && !passLang).as("fail_lang"),
      count_if(passLen && passDis && passLang).as("rows_kept"))
    (audited.filter(passLen && passDis && passLang)
      .select(col("doc_id"), col("norm"), col("n_tokens")), obs)
  }

  val c16: Q = (s, d) => {
    val (gated, obs) = observedCurateGated(s, d)
    // The load action (noop sink = the write side is not under test);
    // the metrics materialize as a side effect of this one job.
    gated.write.format("noop").mode("overwrite").save()
    val m = obs.get
    import s.implicits._
    Seq((m("rows_seen").asInstanceOf[Long],
      m("tokens_seen").asInstanceOf[Long],
      m("fail_len").asInstanceOf[Long],
      m("fail_distinct").asInstanceOf[Long],
      m("fail_lang").asInstanceOf[Long],
      m("rows_kept").asInstanceOf[Long]))
      .toDF("rows_seen", "tokens_seen", "fail_len", "fail_distinct",
        "fail_lang", "rows_kept")
  }

  val c16Sql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    raw"""
    WITH canon AS (
      SELECT trim(regexp_replace(lower(nfc_normalize(text)),
                                 '\s+', ' ', 'g')) AS norm
      FROM documents),
    f AS (
      SELECT len(toks) AS n_tokens,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dr,
             CAST(len(list_filter(toks, t -> list_contains($stopList, t)))
               AS DOUBLE) / len(toks) AS sr
      FROM (SELECT string_split(norm, ' ') AS toks FROM canon))
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_seen,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_seen,
           CAST(SUM(CASE WHEN NOT n_tokens >= 20
                    THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
           CAST(SUM(CASE WHEN n_tokens >= 20 AND NOT dr >= 0.3
                    THEN 1 ELSE 0 END) AS BIGINT) AS fail_distinct,
           CAST(SUM(CASE WHEN n_tokens >= 20 AND dr >= 0.3
                         AND NOT sr >= 0.08
                    THEN 1 ELSE 0 END) AS BIGINT) AS fail_lang,
           CAST(SUM(CASE WHEN n_tokens >= 20 AND dr >= 0.3 AND sr >= 0.08
                    THEN 1 ELSE 0 END) AS BIGINT) AS rows_kept
    FROM f"""
  }

  val queries: Map[String, Q] = Map(
    "c01_curate" -> c01,
    "c02_curate_sql" -> c02,
    "c03_mixture_sample" -> c03,
    "c04_pack_sequences" -> c04,
    "c05_shard_shuffle" -> c05,
    "c06_tokenize_pack" -> c06,
    "c07_split_leakage" -> c07,
    "c08_curriculum_sample" -> c08,
    "c09_epoch_plan" -> c09,
    "c10_pack_spans" -> c10,
    "c11_weighted_sample" -> c11,
    "c12_temperature_mix" -> c12,
    "c13_dataset_card" -> c13,
    "c14_curation_funnel" -> c14,
    "c15_shard_mixing" -> c15,
    "c16_observed_curate" -> c16)
  val oracle: Map[String, String] = Map(
    "c01_curate" -> c01Sql,
    "c02_curate_sql" -> c01Sql,
    "c03_mixture_sample" -> c03Sql,
    "c04_pack_sequences" -> c04Sql,
    "c05_shard_shuffle" -> c05Sql,
    "c06_tokenize_pack" -> c06Sql,
    "c07_split_leakage" -> c07Sql,
    "c08_curriculum_sample" -> c08Sql,
    "c09_epoch_plan" -> c09Sql,
    "c10_pack_spans" -> c10Sql,
    "c11_weighted_sample" -> c11Sql,
    "c12_temperature_mix" -> c12Sql,
    "c13_dataset_card" -> c13Sql,
    "c14_curation_funnel" -> c14Sql,
    "c15_shard_mixing" -> c15Sql,
    "c16_observed_curate" -> c16Sql)
}
