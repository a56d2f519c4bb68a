package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.SimHash

/** Deduplication operator family over `documents` — exact, hash-keyed,
  * n-gram Jaccard, MinHash-LSH and SimHash. The exact/Jaccard variants
  * carry DuckDB oracles; the hash-sketch variants (MinHash, SimHash) use
  * engine-specific hash functions and get the driver's rows-only check,
  * with their semantics pinned by ScalaTest specs instead.
  *
  * Scale notes: exact dedup is one hash-aggregate shuffle on the dedup
  * key. The Jaccard join is an inverted-index self-join on shingles —
  * at 100 TB you cap shingle document-frequency (see
  * [[Dedup.nearDupJaccard]]'s maxDocFreq) or switch to d04's MinHash-LSH
  * banding, which bounds candidate generation by construction.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- d01
  // Exact dedup: group by full content, keep the smallest doc_id.
  val d01: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_doc_id"), col("n_copies"))

  val d01Sql: String = """
    SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text"""

  // ---------------------------------------------------------------- d02
  // Hash-keyed exact dedup: group by sha256(text) — at scale this is the
  // right key (fixed 32-byte shuffle key instead of the full document).
  val d02: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val d02Sql: String = """
    SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1"""

  /** Distinct word-3-gram shingle array per document (docs with ≥3 tokens).
    * Shingling (w-shingling, Broder '97) is what separates true near-dups
    * from documents that merely share vocabulary. */
  private def shingleArrays(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("shingles", expr(
        """array_distinct(transform(sequence(1, size(w) - 2),
          |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
          |                 element_at(w, i + 2))))""".stripMargin))

  /** Exploded (doc_id, shingle) pairs. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    shingleArrays(s, d)
      .select(col("doc_id"), explode(col("shingles")).as("s"))

  /** Near-dup pairs by exact shingle-Jaccard via inverted-index self-join.
    * `maxDocFreq`, when set, drops shingles present in more than that many
    * documents before pairing — the standard scale guard against quadratic
    * blowup on stopword-like shingles (approximation: only affects pairs
    * whose entire overlap is ultra-frequent shingles).
    */
  def nearDupJaccard(s: SparkSession, d: String, threshold: Double,
                     maxDocFreq: Option[Long] = None): DataFrame = {
    val sh0 = shingles(s, d)
    val sh = maxDocFreq match {
      case Some(cap) =>
        val freq = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select(col("s"))
        sh0.join(freq, "s")
      case None => sh0
    }
    val counts = sh0.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("i"), col("s"))
    val b = sh.select(col("doc_id").as("j"), col("s"))
    val common = a.join(b, Seq("s")).filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
    common
      .join(counts.select(col("doc_id").as("i"), col("n").as("ni")), Seq("i"))
      .join(counts.select(col("doc_id").as("j"), col("n").as("nj")), Seq("j"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("ni") + col("nj") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("c"), col("ni"), col("nj"), col("jaccard"))
  }

  // ---------------------------------------------------------------- d03
  val d03: Q = (s, d) => nearDupJaccard(s, d, threshold = 0.5)

  val d03Sql: String = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
           FROM t CROSS JOIN range(1, 4097) r(i) WHERE i <= len(w) - 2),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT i, j, c, ca.n AS ni, cb.n AS nj,
           CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS jaccard
    FROM common
      JOIN counts ca ON i = ca.doc_id
      JOIN counts cb ON j = cb.doc_id
    WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.5"""

  // ---------------------------------------------------------------- d04
  // MinHash-LSH near-dup candidates (spark.ml MinHashLSH over binary
  // token-hash vectors, fixed seed). Engine-specific hashing → no SQL
  // oracle; the spec checks it recovers the d03 ground-truth pairs.
  val d04: Q = (s, d) => {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val docs = shingleArrays(s, d).select(col("doc_id"), col("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featurized = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(featurized)
    model.approxSimilarityJoin(featurized, featurized, 0.5, "jaccard_dist")
      .select(col("datasetA.doc_id").as("i"), col("datasetB.doc_id").as("j"),
              col("jaccard_dist"))
      .filter(col("i") < col("j"))
  }

  // ---------------------------------------------------------------- d05
  // SimHash near-dup: 64-bit simhash per doc (custom typed Aggregator),
  // banded self-join on 4×16-bit bands, Hamming distance ≤ 8. xxhash64
  // is Spark-specific → rows-only check + spec.
  val d05: Q = (s, d) => {
    val tokens = shingles(s, d)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val sims = tokens.groupBy(col("doc_id"))
      .agg(SimHash.simhash(col("h")).as("simhash"))
    val banded = sims.select(col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3),
          |  b -> named_struct('band', b,
          |                    'key', (simhash >> (b * 16)) & 65535))""".stripMargin))
        .as("bk"))
      .select(col("doc_id"), col("simhash"),
              col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"),
      col("doc_id").as("i"), col("simhash").as("sa"))
    val b = banded.select(col("band"), col("key"),
      col("doc_id").as("j"), col("simhash").as("sb"))
    a.join(b, Seq("band", "key")).filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(expr("sa ^ sb")).cast("int").as("hamming")).distinct()
      .filter(col("hamming") <= 8)
  }

  val queries: Map[String, Q] = Map(
    "d01_dedup_exact" -> d01,
    "d02_dedup_hash" -> d02,
    "d03_dedup_jaccard" -> d03,
    "d04_dedup_minhash_lsh" -> d04,
    "d05_dedup_simhash" -> d05)

  val oracle: Map[String, String] = Map(
    "d01_dedup_exact" -> d01Sql,
    "d02_dedup_hash" -> d02Sql,
    "d03_dedup_jaccard" -> d03Sql)
}
