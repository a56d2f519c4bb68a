package graft

import org.apache.spark.sql.functions._

/** Smoke + semantics spot-checks of the query surface at sf0.001.
  * (Exhaustive value checking is the oracle harness's job —
  * scripts/oracle_check.py — run per-round by the driver at sf0.01.)
  */
class QueriesSpec extends SparkSpec {

  test("every query runs at sf0.001 and yields its declared schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("t19: output schema is pure-integer (no doubles can reach the hash)") {
    // The round-9 portability fix: the milli-log10 quantization is now
    // itself exact integer arithmetic (fixed-point squaring — zero
    // libm), so every column in the t19 family is integral end to end.
    // A double creeping back into the schema would reintroduce the
    // cross-engine divergence that hashed red in rounds 5–8 — lock the
    // discipline in.
    for (name <- Seq("t19_heaps_fit", "t19e_heaps_counts", "t19f_heaps_quant")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val nonIntegral = df.schema.fields.filterNot(f =>
        f.dataType == org.apache.spark.sql.types.LongType ||
          f.dataType == org.apache.spark.sql.types.IntegerType)
      assert(nonIntegral.isEmpty,
        s"$name has non-integral columns: ${nonIntegral.mkString(", ")}")
    }
    // and the fixture must give the fit a well-conditioned denominator
    val fit = SparkEntry.queries("t19_heaps_fit")(spark, sf0001).head()
    assert(fit.getAs[Long]("n_points") >= 10L,
      "HeapsBlock mis-sized: too few fit points for a stable fit")
  }

  test("t24 (broadcast merge-table apply) is byte-identical to t17 (literal fusion)") {
    // The two apply paths must be swappable: same trained merges, same
    // encode, same counts — only the plan shape differs (one
    // aggregate() node vs K literal replace nodes).
    val a = SparkEntry.queries("t17_bpe_tokenize")(spark, sf0001)
      .orderBy("source").collect().toSeq
    val b = SparkEntry.queries("t24_bpe_apply")(spark, sf0001)
      .orderBy("source").collect().toSeq
    assert(a == b, "t24 diverged from t17")
  }

  test("q01 aggregates are exact: sum_qty equals integer-summed quantity") {
    val q1 = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
    val got = q1.agg(sum("sum_qty")).collect().head.getDouble(0)
    val want = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double"))
      .collect().head.getDouble(0)
    assert(got == want)
  }

  test("q12 topk is ordered and bounded") {
    val rows = SparkEntry.queries("q12_topk")(spark, sf0001).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("dedup: minhash-LSH recovers exact-jaccard ground truth pairs") {
    val truth = graft.queries.Dedup.nearDupJaccard(spark, sf0001, 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("d04_dedup_minhash_lsh")(spark, sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert((truth -- lsh).isEmpty,
      s"LSH missed ground-truth pairs: ${truth -- lsh}")
  }

  test("d17 runs tile each doc, alternate verdicts, and agree with d14/d15") {
    val runs = SparkEntry.queries("d17_dedup_substrings")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("run_idx"),
        r.getAs[Boolean]("kept"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_words"), r.getAs[String]("chunk_text")))
    // adjacent runs within a doc must alternate verdicts (else they
    // weren't maximal), run_idx must be dense from 1, dropped runs
    // carry no text
    runs.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length),
        s"doc $doc run_idx not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3,
          s"doc $doc adjacent runs ${a._2}/${b._2} share verdict — not maximal")
        case _ =>
      }
      sorted.filterNot(_._3).foreach(r =>
        assert(r._6 == null, s"doc $doc dropped run ${r._2} has text"))
    }
    // per-doc span totals must reconcile with d14's accounting
    val d14 = SparkEntry.queries("d14_dedup_spans")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_retained"))).toMap
    runs.groupBy(_._1).foreach { case (doc, rs) =>
      val (total, retained) = d14(doc)
      assert(rs.map(_._4).sum == total, s"doc $doc spans don't tile")
      assert(rs.filter(_._3).map(_._4).sum == retained,
        s"doc $doc retained spans disagree with d14")
    }
  }

  test("t21 batched BPE reproduces t16's sequential merge table") {
    // The conflict-free-prefix batching is exact for this corpus: the
    // merge steps, frequencies and per-step token accounting must all
    // equal the one-merge-per-round trainer's.
    val key = Seq("step", "lhs", "rhs", "freq", "tokens_after")
    val seqT = SparkEntry.queries("t16_bpe_merges")(spark, sf0001)
      .select(key.map(col): _*).collect().map(_.toSeq).sortBy(_.toString)
    val bat = SparkEntry.queries("t21_bpe_batch")(spark, sf0001)
      .select(key.map(col): _*).collect().map(_.toSeq).sortBy(_.toString)
    assert(seqT.nonEmpty)
    assert(seqT.sameElements(bat),
      s"batched != sequential:\n seq=${seqT.mkString("\n ")}\n bat=${bat.mkString("\n ")}")
  }

  test("s15 graph walk returns ranked results that touch the exact top-5") {
    import graft.functions.VectorExprs.qdot
    val rows = SparkEntry.queries("s15_graph_ann")(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).sameElements(1 to sorted.length),
        s"qid $q ranks not dense")
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)),
        s"qid $q scores not descending")
    }
    // the walk must intersect the EXACT top-5 (same quantized cosine)
    // for every query — the minimal useful-recall floor on this
    // near-uniform fixture (3 hops × beam 4 from a fixed entry; the
    // beam/hop knobs raise recall at proportional cost)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nsq", qdot(col("embedding"), col("embedding")))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nsq").as("qnsq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val exact = e.crossJoin(broadcast(q))
      .withColumn("score", qdot(col("embedding"), col("qe")) /
        (sqrt(col("nsq")) * sqrt(col("qnsq"))))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("qid"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    byQ.foreach { case (qid, rs) =>
      val walked = rs.map(_.getAs[Long]("vec_id")).toSet
      assert((walked & exact(qid)).nonEmpty,
        s"qid $qid walk ${walked.toSeq.sorted} misses exact ${exact(qid).toSeq.sorted}")
    }
  }

  test("t22: scrambled word salad scores worse than a repeated fluent doc") {
    import spark.implicits._
    import graft.queries.Text
    // 9 copies of one sentence (every transition seen 9×) + one doc of
    // the same words in a never-repeated order (every transition unique)
    val fluent = "the quick brown fox jumps over the lazy dog"
    val salad = "dog the over quick lazy fox brown jumps the"
    val docs = ((1L to 9L).map(i => (i, fluent)) :+ (10L, salad))
      .toDF("doc_id", "text")
    val dir = tmpDir("graft-bigramlm-")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Text.queries("t22_bigram_fluency")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_novel"), r.getAs[Double]("ppx_proxy"))).toMap
    val (fluentNovel, fluentPpx) = rows(1L)
    val (saladNovel, saladPpx) = rows(10L)
    assert(fluentNovel == 0L, s"repeated doc has novel transitions: $fluentNovel")
    assert(saladNovel > 0L, "salad doc shows no novel transitions")
    assert(saladPpx > fluentPpx,
      s"salad ppx $saladPpx not worse than fluent $fluentPpx")
    // inverse conditional probability is >= 1 by construction
    rows.values.foreach { case (_, p) => assert(p >= 1.0) }
  }

  test("d18: flags a short doc embedded in a long one that Jaccard misses") {
    import spark.implicits._
    import graft.queries.Dedup
    val quote = "one two three four five six seven eight nine ten"
    val host = ("alpha beta gamma delta " * 10) + quote +
      (" epsilon zeta eta theta" * 10)
    val docs = Seq(
      (1L, quote, "en", "srcA", quote.length.toLong),
      (2L, host, "en", "srcA", host.length.toLong),
      (3L, "unrelated words entirely different content here now",
        "en", "srcB", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("graft-contain-")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.queries("d18_dedup_containment")(spark, dir).collect()
    assert(rows.length == 1, s"expected one containment pair: ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Long]("contained") == 1L &&
      r.getAs[Long]("container") == 2L,
      s"orientation wrong: $r")
    assert(r.getAs[Double]("containment") == 1.0)
    // the symmetric measure would never have flagged this pair
    assert(r.getAs[Double]("jaccard") < 0.5, s"jaccard: $r")
  }

  test("t23: a vocabulary-disjoint source drifts further than same-vocab peers") {
    import spark.implicits._
    import graft.queries.Text
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, shared, "en", "srcA", 8L),
      (2L, shared, "en", "srcA", 8L),
      (3L, shared, "en", "srcB", 8L),
      (4L, "omega psi chi phi upsilon tau sigma rho", "en", "srcC", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("graft-drift-")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Text.queries("t23_source_drift")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("chi2_micro"))
      .toMap
    assert(rows.values.forall(_ >= 0.0), s"negative chi2: $rows")
    assert(rows("srcC") > rows("srcA") && rows("srcC") > rows("srcB"),
      s"disjoint-vocab source must drift most: $rows")
  }

  test("s16: merged index holds base + delta exactly once, delta reachable") {
    SparkEntry.queries("s16_ivf_incremental")(spark, sf0001).collect()
    val san = sf0001.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val t = spark.table(s"g16_ivfinc_$san")
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter("vec_id <> 0").count()
    // 4 PQ code rows per indexed vector; append added the delta without
    // duplicating (or rewriting) any base row
    assert(t.count() == n * 4, s"expected ${n * 4} code rows, got ${t.count()}")
    assert(t.select("vec_id", "m").distinct().count() == n * 4)
    assert(t.filter("vec_id % 10 = 9").count() > 0,
      "delta batch missing from merged index")
  }

  test("m08: phash collides on near-identical payloads, separates disjoint ones") {
    import spark.implicits._
    import graft.queries.Multimodal
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val docs = Seq(
      (1L, base),
      (2L, base),                            // exact copy
      (3L, base.replaceFirst("quick", "quicc")), // one-"pixel" edit
      // 32-periodic bright/dark halves → bits 0-15 only, a hash no
      // word-soup text (spaces interleaved through every bucket) hits
      (4L, ("~" * 16 + " " * 16) * 10))
      .toDF("doc_id", "text")
    val dir = tmpDir("graft-phash-")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val groups = Multimodal.queries("m08_phash_dedup")(spark, dir).collect()
      .map(r => (r.getAs[Long]("phash"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("canonical")))).toMap
    // docs 1-3 share one hash (the perceptual property sha256 lacks);
    // doc 4's hash differs
    assert(groups.values.toSet == Set((3L, 1L), (1L, 4L)),
      s"groups: $groups")
    assert(groups.contains(0x0000FFFFL), s"half-bright hash: $groups")
  }

  test("c08: quartile bins are balanced and quality-ordered") {
    val rows = SparkEntry.queries("c08_curriculum_sample")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Int]("bin"),
        (r.getAs[Int]("rate"), r.getAs[Long]("n_total"),
          r.getAs[Long]("n_kept"), r.getAs[Double]("avg_quality"))))
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(1, 2, 3, 4)))
    assert(rows.map(_._2._1).sameElements(Array(10, 25, 50, 90)))
    val totals = rows.map(_._2._2)
    val n = totals.sum
    // exact-quantile cuts keep every bin within one tie-run of n/4
    assert(totals.forall(t => t >= n / 8 && t <= 3 * n / 8),
      s"bins unbalanced: ${totals.mkString(",")}")
    val quality = rows.map(_._2._4)
    assert(quality.sameElements(quality.sorted),
      s"avg quality not increasing across bins: ${quality.mkString(",")}")
    rows.foreach { case (_, (_, t, k, _)) => assert(k <= t) }
  }

  test("jaccard maxDocFreq guard drops stopword-shingle-only pairs") {
    import spark.implicits._
    import graft.queries.Dedup
    // 6 docs sharing ONE hot shingle ("the common phrase" appears in
    // all); docs 1/2 additionally share real content. With a df cap
    // below 6 the hot shingle can't pair anything on its own.
    val docs = Seq(
      (1L, "alpha beta gamma delta the common phrase"),
      (2L, "alpha beta gamma delta the common phrase"),
      (3L, "one two three four the common phrase"),
      (4L, "five six seven eight the common phrase"),
      (5L, "nine ten eleven twelve the common phrase"),
      (6L, "red green blue yellow the common phrase"))
      .toDF("doc_id", "text")
    val dir = tmpDir("graft-hotshingle-")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val unguarded = Dedup.nearDupJaccard(spark, dir, threshold = 0.01)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Dedup.nearDupJaccard(spark, dir, threshold = 0.01,
      maxDocFreq = Some(5)).select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair exists unguarded (all docs share the hot shingle)…
    assert(unguarded.size == 15)
    // …but with the cap, only the genuinely-overlapping pair remains
    assert(guarded == Set((1L, 2L)), s"guarded: $guarded")
  }

  test("simhash: identical docs hash identically, near-dups are close") {
    import graft.functions.SimHash
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words in this entirely unrelated sentence"))
      .toDF("doc_id", "text")
    val sims = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy("doc_id").agg(SimHash.simhash(col("h")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) > 8)
  }

  test("connected components: multi-hop chains collapse to one component") {
    import spark.implicits._
    // A 5-node path (forces multi-round propagation), a disjoint pair,
    // and a triangle with a redundant edge.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("i", "j")
    val comp = graft.queries.Dedup.connectedComponents(edges, "i", "j")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(comp(_) == 1L), s"path: $comp")
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(comp(_) == 20L))
    assert(comp.size == 10)
  }

  test("d19 (incremental cluster merge) equals d08 (full recompute)") {
    // The whole contract of incremental CC maintenance: contracting the
    // persisted components, CC-ing the delta-sized contracted graph,
    // and relabeling must reproduce the full recompute row for row —
    // components, canonicals, and sizes alike.
    val full = SparkEntry.queries("d08_dedup_clusters")(spark, sf0001)
      .orderBy("doc_id").collect().toSeq
    val inc = SparkEntry.queries("d19_dedup_cluster_incremental")(spark, sf0001)
      .orderBy("doc_id").collect().toSeq
    assert(full == inc, "incremental merge diverged from full recompute")
  }

  test("c10 spans tile every packed sequence exactly (mask invariant)") {
    // The property attention masking depends on: per sequence, spans
    // are disjoint, contiguous from offset 0, and sum to the sequence
    // length (the final partial sequence excepted); globally the span
    // mass equals the corpus token count.
    val spans = SparkEntry.queries("c10_pack_spans")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_len")))
    val total = SparkEntry.queries("c04_pack_sequences")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head().getLong(0)
    assert(spans.map(_._3).sum == total, "span mass != corpus tokens")
    val lastSeq = spans.map(_._1).max
    spans.groupBy(_._1).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"seq $seq does not start at 0")
      sorted.sliding(2).foreach {
        case Array((_, a, l), (_, b, _)) =>
          assert(a + l == b, s"seq $seq has a gap/overlap at $b")
        case _ =>
      }
      val mass = ss.map(_._3).sum
      if (seq != lastSeq) assert(mass == 512L, s"seq $seq mass $mass")
      else assert(mass <= 512L)
    }
  }

  test("chunking covers every token and overlaps by window-stride") {
    import org.apache.spark.sql.Row
    val rows = SparkEntry.queries("t10_chunking")(spark, sf0001).collect()
    // group chunks per doc; starts are stride-spaced from 0 and the last
    // chunk reaches the end of the token list
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("start_tok"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Int]("start_tok") == i * 24, s"doc $doc stride")
      }
      // full chunks are exactly 32 tokens; only the final chunk may be
      // shorter, and coverage is contiguous: next start <= prev end
      sorted.init.foreach { r =>
        val len = r.getAs[Int]("chunk_len")
        val start = r.getAs[Int]("start_tok")
        assert(start + len >= start + 24, s"doc $doc gap before next chunk")
      }
      val last = sorted.last
      val nTok = last.getAs[Int]("start_tok") + last.getAs[Int]("chunk_len")
      assert(sorted.map(_.getAs[Int]("chunk_len")).sum >= nTok,
        s"doc $doc tokens uncovered")
      val full = sorted.filter(r => r.getAs[Int]("start_tok") + 32 <= nTok)
      full.foreach(r => assert(r.getAs[Int]("chunk_len") == 32))
    }
    assert(byDoc.nonEmpty)
  }

  test("t16: BPE merges shrink the token count below the whitespace proxy") {
    val rows = SparkEntry.queries("t16_bpe_merges")(spark, sf0001).collect()
      .sortBy(_.getAs[Int]("step"))
    assert(rows.length == 10, s"expected 10 merge steps, got ${rows.length}")
    // Whitespace-proxy token count = corpus words; char-level BPE starts
    // ABOVE it (chars per word > 1) but after enough merges the learned
    // units must bill differently from whitespace words — the point of
    // subword accounting. Each merge strictly shrinks the corpus (the
    // winning pair has freq >= 1 occurrence to rewrite).
    val after = rows.map(_.getAs[Long]("tokens_after"))
    assert(after.zip(after.tail).forall { case (a, b) => b < a },
      s"token counts must strictly decrease: ${after.mkString(",")}")
    val ws = SparkEntry.queries("t01_token_stats")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("total_tokens")).head()
      .getLong(0)
    assert(after.forall(_ != ws),
      s"subword counts must differ from whitespace count $ws")
    // merge table is well-formed: single-char symbols only at step 1
    assert(rows.head.getAs[String]("lhs").length == 1)
    assert(rows.map(_.getAs[Long]("freq")).forall(_ > 0))
  }

  test("t17: applied tokenizer reproduces t16's trained token count") {
    import org.apache.spark.sql.functions.sum
    // Train on the dictionary (t16), apply to the corpus (t17): the
    // corpus-wide subword total must equal the final tokens_after the
    // trainer reported — the dict-weighted count and the document-level
    // encode agree, or one of them is lying.
    val trained = SparkEntry.queries("t16_bpe_merges")(spark, sf0001)
      .collect().maxBy(_.getAs[Int]("step")).getAs[Long]("tokens_after")
    val applied = SparkEntry.queries("t17_bpe_tokenize")(spark, sf0001)
      .agg(sum("bpe_tokens")).head().getLong(0)
    assert(applied == trained, s"t17 total $applied != t16 final $trained")
  }

  test("c06: packed BPE token mass equals t16's trained count and packs densely") {
    import org.apache.spark.sql.functions.{max, sum}
    // tokenize-and-pack must place exactly the trained token mass on
    // the packing axis — no tokens invented or lost between the
    // tokenizer and the sequence layout...
    val trained = SparkEntry.queries("t16_bpe_merges")(spark, sf0001)
      .collect().maxBy(_.getAs[Int]("step")).getAs[Long]("tokens_after")
    val packed = SparkEntry.queries("c06_tokenize_pack")(spark, sf0001)
    val total = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(total == trained, s"c06 token mass $total != t16 final $trained")
    // ...and the layout is gap-free: the last sequence index is exactly
    // the one the total mass dictates at 512 tokens per sequence.
    val lastSeq = packed.agg(max("seq_last")).head().getLong(0)
    assert(lastSeq == (total - 1) / 512, s"packing has gaps: $lastSeq")
  }

  test("s11: multi-probe recall dominates single-probe recall per query") {
    def recalls(name: String): Map[Long, (Double, Long)] =
      SparkEntry.queries(name)(spark, sf0001).collect()
        .map(r => r.getAs[Long]("qid") ->
          (r.getAs[Double]("recall"), r.getAs[Long]("n_ann"))).toMap
    val single = recalls("s10_ann_recall")
    val multi = recalls("s11_ann_multiprobe")
    assert(single.keySet == multi.keySet)
    // Superset probe set ⇒ recall can never drop, per query...
    single.foreach { case (qid, (r1, _)) =>
      assert(multi(qid)._1 >= r1, s"qid $qid: multi ${multi(qid)._1} < $r1")
    }
    // ...and on this fixture the extra probes must actually buy recall
    // (strict aggregate improvement) at a bounded candidate overhead.
    assert(multi.values.map(_._1).sum > single.values.map(_._1).sum,
      s"multi-probe bought no recall: $multi vs $single")
  }

  test("s17 DBSCAN roles are density-consistent") {
    val rows = SparkEntry.queries("s17_dbscan")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, role) = (r.getAs[Long]("deg"), r.getAs[String]("role"))
      role match {
        case "core"  => assert(deg >= 2 && !r.isNullAt(r.fieldIndex("cluster")))
        case "border" =>
          assert(deg < 2 && !r.isNullAt(r.fieldIndex("cluster")))
        case "noise" => assert(r.isNullAt(r.fieldIndex("cluster")))
      }
    }
    // every labeled cluster id is itself a core point's vec_id
    val coreIds = rows.filter(_.getAs[String]("role") == "core")
      .map(_.getAs[Long]("vec_id")).toSet
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(coreIds.contains(r.getAs[Long]("cluster")))
    }
  }

  test("q65 Markov rows are probability-normalized per predecessor") {
    val rows = SparkEntry.queries("q65_markov")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (_, rs) =>
      val tot = rs.head.getAs[Long]("row_tot")
      assert(rs.map(_.getAs[Long]("c")).sum == tot)
      assert(math.abs(rs.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
    }
  }

  test("t26 BM25 length normalization penalizes long documents") {
    val rows = SparkEntry.queries("t26_bm25")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // top-5 per doc, ranked, positive scores
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length))
    }
    assert(rows.forall(_.getAs[Double]("bm25") > 0))
  }

  test("t27 backoff levels partition every trigram; log-probs are negative") {
    val rows = SparkEntry.queries("t27_lm_backoff")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit3") + r.getAs[Long]("n_hit2") +
        r.getAs[Long]("n_backoff") == r.getAs[Long]("n_tri"))
      // every conditional probability is ≤ 1, so the summed log is ≤ 0
      assert(r.getAs[Long]("score_milli") <= 0L)
    }
    assert(rows.exists(_.getAs[Long]("score_milli") < 0L))
  }

  test("g06 modularity contributions are bounded and sum below 1") {
    val rows = SparkEntry.queries("g06_modularity")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // Newman: each community contribution ≤ 1; the partition total < 1
    val total = rows.map(_.getAs[Double]("q_ratio")).sum
    assert(total < 1.0 && total > -1.0, s"modularity total $total")
    rows.foreach { r =>
      assert(r.getAs[Long]("e_in") >= 0L)
      assert(r.getAs[Long]("d_tot") >= r.getAs[Long]("n_nodes"),
        "every clustered node has degree >= 1")
    }
  }

  test("st19 (stateful stream transitions) equals q65 (batch lag window)") {
    def m(name: String): Set[(String, String, Long, Long, Double)] =
      SparkEntry.queries(name)(spark, sf0001).collect().map(r =>
        (r.getAs[String]("prev_type"), r.getAs[String]("event_type"),
          r.getAs[Long]("c"), r.getAs[Long]("row_tot"),
          r.getAs[Double]("p"))).toSet
    assert(m("st19_stream_markov") == m("q65_markov"))
  }

  test("c12 temperature mix: targets respect the budget, tail flattens") {
    val rows = SparkEntry.queries("c12_temperature_mix")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("target_tok")).sum <= 50000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("rate_ppm") <= 1000000L)
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tok") <= r.getAs[Long]("src_tok"))
    }
    // α=0.5 flattening: sampled share of the SMALLEST source exceeds
    // its raw token share (that is the whole point of temperature)
    val bySize = rows.sortBy(_.getAs[Long]("src_tok"))
    val (small, large) = (bySize.head, bySize.last)
    def tokShare(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("target_tok").toDouble / r.getAs[Long]("src_tok")
    assert(tokShare(small) >= tokShare(large),
      s"temperature failed to flatten: $small vs $large")
  }

  test("q71 (native AsofJoinExec) equals q25 (union + window as-of)") {
    def rel(name: String): Set[String] =
      SparkEntry.queries(name)(spark, sf0001).collect()
        .map(_.mkString("|")).toSet
    val native = rel("q71_asof_native")
    assert(native.nonEmpty)
    assert(native == rel("q25_asof_join"))
  }

  test("q73 (closed-form clamp) equals q63 (native recursive CTE)") {
    // The prefix-sum/running-max identity must reproduce the clamped
    // token-bucket recursion row for row — the whole point of the
    // rewrite is that it is NOT an approximation.
    def rel(name: String): Set[String] =
      SparkEntry.queries(name)(spark, sf0001).collect()
        .map(_.mkString("|")).toSet
    val closed = rel("q73_clamp_closed_form")
    assert(closed.nonEmpty)
    assert(closed == rel("q63_recursive_cte"))
  }

  test("q74 (bucketed two-level sweep) equals q72 (single sweep)") {
    // The prefix-sum ladder must reproduce the single-partition sweep
    // exactly — peak AND earliest-peak-instant, per event type.
    def rel(name: String): Set[String] =
      SparkEntry.queries(name)(spark, sf0001).collect()
        .map(_.mkString("|")).toSet
    val bucketed = rel("q74_interval_peak_buckets")
    assert(bucketed.nonEmpty)
    assert(bucketed == rel("q72_interval_peak"))
  }

  test("s19: recall is monotone in the probe radius and candidates grow") {
    val rows = SparkEntry.queries("s19_recall_sweep")(spark, sf0001)
      .orderBy(col("radius")).collect()
    assert(rows.length == 3)
    val hits = rows.map(_.getAs[Long]("n_hits"))
    val cands = rows.map(_.getAs[Long]("n_cand"))
    assert(hits.sliding(2).forall(p => p(0) <= p(1)),
      s"recall must not drop as the probe set widens: ${hits.toSeq}")
    assert(cands.sliding(2).forall(p => p(0) <= p(1)), cands.toSeq.toString)
  }

  test("d22: banding nests, so candidates and hits shrink as r grows") {
    // Divisor-chain band configs nest (full agreement on an r-row band
    // implies agreement on each contained r/2-row band), so the
    // candidate set at larger r is a subset of the one at smaller r.
    val rows = SparkEntry.queries("d22_lsh_tuning")(spark, sf0001)
      .orderBy(col("r")).collect()
    assert(rows.length == 5)
    val cands = rows.map(_.getAs[Long]("n_cand"))
    val hits = rows.map(_.getAs[Long]("n_hit"))
    assert(cands.sliding(2).forall(p => p(0) >= p(1)), cands.toSeq.toString)
    assert(hits.sliding(2).forall(p => p(0) >= p(1)), hits.toSeq.toString)
  }

  test("s21: MMR keeps the most-relevant pick, then diversifies within the pool") {
    val mmr = SparkEntry.queries("s21_mmr_rerank")(spark, sf0001)
      .orderBy(col("rank")).collect()
    assert(mmr.length == 5)
    val picked = mmr.map(_.getAs[Long]("vec_id"))
    assert(picked.distinct.length == 5, "a vector was selected twice")
    // rank 1 is pure relevance — must equal brute-force top-1 (s01)
    val top = SparkEntry.queries("s01_cosine_topk")(spark, sf0001)
      .orderBy(col("cosine").desc, col("vec_id")).collect()
    assert(picked.head == top.head.getAs[Long]("vec_id"))
    // s01 returns the 10 most relevant; MMR draws from the top-15 pool,
    // so at least one pick must land inside s01's 10.
    val top10 = top.map(_.getAs[Long]("vec_id")).toSet
    assert(picked.count(top10.contains) >= 1)
    // the diversity penalty binds: the MMR ordering must differ from
    // plain relevance order somewhere past rank 1 on this fixture
    val relOrder = mmr.sortBy(r => (-r.getAs[Double]("rel"),
      r.getAs[Long]("vec_id"))).map(_.getAs[Long]("vec_id"))
    assert(!picked.sameElements(relOrder) ||
      mmr.map(_.getAs[Double]("mmr")).zip(mmr.map(_.getAs[Double]("rel")))
        .exists { case (m, r) => m < 0.7 * r - 1e-12 },
      "MMR never penalized anything — pool looks degenerate")
  }

  test("multimodal: decode stub is deterministic and resize preserves aspect") {
    import graft.multimodal.{FakeCodec, MediaMeta}
    val m = FakeCodec.decode(7L, Array.fill[Byte](1000)(1))
    assert(m == FakeCodec.decode(7L, Array.fill[Byte](1000)(1)))
    val big = MediaMeta(1L, 640, 480, 5, 99L)
    val r = FakeCodec.resize(big, 320)
    assert(r.width == 320 && r.height == 240)
  }
}
