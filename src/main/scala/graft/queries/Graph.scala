package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate graph (SURVEY.md §2 —
  * LLM-pipeline extension family). The dedup families stop at
  * connected components (d08/d19); a curation pipeline also wants
  * per-node GRAPH STRUCTURE: centrality to pick the canonical copy of
  * a cluster on merit instead of min-id, and local clustering (triangle
  * participation) to tell boilerplate hubs (star-shaped, triangle-free
  * neighborhoods) from genuine mutual near-dup cliques.
  *
  * Both queries consume the SAME banded pair relation d03 publishes
  * ([[Dedup.jaccardPairs]] — computed once per run, localCheckpointed),
  * so the graph layer adds zero corpus scans: everything here runs on
  * the edge relation, which LSH banding keeps pair-bounded (never
  * all-pairs) at any corpus size.
  *
  * Exactness contract: both algorithms are stated in pure integer
  * arithmetic (BIGINT ranks in 1e-12 units, floor division) so the
  * DuckDB oracle replays them bit-for-bit — no floating-point
  * accumulation order anywhere (the t19/round-5–8 lesson: libm and
  * float sums are the only sources of cross-engine drift, so state
  * iterative numerics in integers).
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Symmetric edge list (src, dst) of the near-dup graph — both
    * directions of every d03 pair. */
  private def symEdges(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(s, d).select(col("i"), col("j"))
    pairs.select(col("i").as("src"), col("j").as("dst"))
      .union(pairs.select(col("j").as("src"), col("i").as("dst")))
  }

  // ---------------------------------------------------------------- g01
  // PageRank centrality (3 Jacobi iterations, damping 0.85) over the
  // near-dup graph — the merit-based canonical pick: within a dedup
  // cluster the highest-rank member is the most-corroborated copy.
  //
  // Numerics: ranks live in integer 1e-12 units; each iteration is
  //   r' = (0.15 * (1e12 div N)) div 1e6-units + 0.85 * Σ_in (r div deg)
  // with every division a floor division on BIGINT — the identical
  // expression runs in DuckDB (`//`), so 3 iterations are replayed
  // exactly. Dangling nodes cannot exist (the graph is symmetric, so
  // deg ≥ 1 for every node in it).
  //
  // Scale shape: per iteration ONE edge-keyed shuffle join (edges ×
  // node-sized rank relation) + one receiver-keyed aggregate — the
  // textbook distributed PageRank step. The edge relation is the
  // banded near-dup pair set (pair-bounded, reused from d08's build,
  // localCheckpointed so iterations replay no lineage); 3 fixed
  // iterations keep the plan tree bounded without checkpoint churn.
  // At 100 TB the rank relation is node-sized (two longs per clustered
  // doc) and the join partitioning on src/dst is reused across all
  // three rounds.
  val g01: Q = (s, d) => {
    val sym = symEdges(s, d)
    val deg = sym.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))
    // node-sized static relation: (id, deg, n) — n rides along as a
    // broadcast scalar so the per-iteration expressions stay row-local
    val base = deg.crossJoin(broadcast(n))
    var rank = base.withColumn("r", expr("1000000000000 div n"))
    for (_ <- 1 to 3) {
      val contrib = rank.select(col("id").as("v"), expr("r div deg").as("c"))
      val recv = sym.join(contrib, col("src") === col("v"))
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("sin"))
      rank = base.join(recv, Seq("id"))
        .withColumn("r", expr(
          "(150000 * (1000000000000 div n)) div 1000000" +
            " + (850000 * sin) div 1000000"))
        .select(col("id"), col("deg"), col("n"), col("r"))
    }
    rank.select(col("id").as("doc_id"), col("deg").as("degree"),
      col("r").as("prank"))
  }

  /** Oracle: the identical three iterations unrolled as CTEs — same
    * integer units, same floor divisions (`//` in DuckDB = `div` in
    * Spark on BIGINT; all values are non-negative). */
  val g01Sql: String = s"""
    WITH ${Dedup.JaccardPairsCte},
    sym AS (SELECT i AS src, j AS dst FROM pairs
            UNION ALL SELECT j, i FROM pairs),
    deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT id, deg, (SELECT 1000000000000 // n FROM nn) AS r
           FROM deg),
    c0 AS (SELECT id, r // deg AS c FROM r0),
    a0 AS (SELECT s.dst AS id, SUM(c.c) AS sin
           FROM sym s JOIN c0 c ON s.src = c.id GROUP BY 1),
    r1 AS (SELECT d.id, d.deg,
                  (150000 * (SELECT 1000000000000 // n FROM nn)) // 1000000
                    + (850000 * a.sin) // 1000000 AS r
           FROM deg d JOIN a0 a ON d.id = a.id),
    c1 AS (SELECT id, r // deg AS c FROM r1),
    a1 AS (SELECT s.dst AS id, SUM(c.c) AS sin
           FROM sym s JOIN c1 c ON s.src = c.id GROUP BY 1),
    r2 AS (SELECT d.id, d.deg,
                  (150000 * (SELECT 1000000000000 // n FROM nn)) // 1000000
                    + (850000 * a.sin) // 1000000 AS r
           FROM deg d JOIN a1 a ON d.id = a.id),
    c2 AS (SELECT id, r // deg AS c FROM r2),
    a2 AS (SELECT s.dst AS id, SUM(c.c) AS sin
           FROM sym s JOIN c2 c ON s.src = c.id GROUP BY 1),
    r3 AS (SELECT d.id, d.deg,
                  (150000 * (SELECT 1000000000000 // n FROM nn)) // 1000000
                    + (850000 * a.sin) // 1000000 AS r
           FROM deg d JOIN a2 a ON d.id = a.id)
    SELECT id AS doc_id, deg AS degree, CAST(r AS BIGINT) AS prank
    FROM r3"""

  // ---------------------------------------------------------------- g02
  // Triangle participation per node — the local-clustering signal that
  // separates mutual near-dup cliques (template families, true
  // re-posts: triangle-rich) from star hubs (one boilerplate page
  // weakly overlapping many unrelated docs: triangle-free). Canonical
  // distributed shape: orient every undirected edge from its
  // lower-(degree, id) endpoint to the higher one — a total order, so
  // each triangle is counted exactly once as a→b→c with one wedge join
  // (a→b, a→c) probed against the oriented edge set (b→c). The
  // orientation is THE scale move: wedge count is Σ min-side-deg², not
  // Σ deg² — hubs never fan out a quadratic wedge set (Suri &
  // Vassilvitskii's MR triangle bound).
  val g02: Q = (s, d) => {
    val pairs = Dedup.jaccardPairs(s, d).select(col("i"), col("j"))
    val sym = pairs.select(col("i").as("src"), col("j").as("dst"))
      .union(pairs.select(col("j").as("src"), col("i").as("dst")))
    val deg = sym.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    val withDeg = pairs
      .join(deg.select(col("id").as("i"), col("deg").as("di")), Seq("i"))
      .join(deg.select(col("id").as("j"), col("deg").as("dj")), Seq("j"))
    val oriented = withDeg.select(
      when(col("di") < col("dj") ||
        (col("di") === col("dj") && col("i") < col("j")), col("i"))
        .otherwise(col("j")).as("a"),
      when(col("di") < col("dj") ||
        (col("di") === col("dj") && col("i") < col("j")), col("j"))
        .otherwise(col("i")).as("b"))
    // wedges from a: (a→b, a→c) with b before c in the SAME total
    // order the orientation used, closed by the oriented edge b→c
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.a") === col("e2.a") &&
        col("e1.b") =!= col("e2.b"))
      .join(oriented.as("e3"),
        col("e1.b") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("tri_cnt"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("deg").as("degree"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"))
  }

  /** Oracle: identical orientation + wedge-close join. A triangle
    * {x,y,z} appears exactly once because the oriented edge relation is
    * a DAG under the (deg, id) total order. */
  val g02Sql: String = s"""
    WITH ${Dedup.JaccardPairsCte},
    sym AS (SELECT i AS src, j AS dst FROM pairs
            UNION ALL SELECT j, i FROM pairs),
    deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),
    oriented AS (
      SELECT CASE WHEN di.deg < dj.deg
                    OR (di.deg = dj.deg AND p.i < p.j)
                  THEN p.i ELSE p.j END AS a,
             CASE WHEN di.deg < dj.deg
                    OR (di.deg = dj.deg AND p.i < p.j)
                  THEN p.j ELSE p.i END AS b
      FROM pairs p
        JOIN deg di ON p.i = di.id
        JOIN deg dj ON p.j = dj.id),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM oriented e1
        JOIN oriented e2 ON e1.a = e2.a AND e1.b <> e2.b
        JOIN oriented e3 ON e1.b = e3.a AND e2.b = e3.b),
    pernode AS (
      SELECT id, COUNT(*) AS tri_cnt
      FROM (SELECT x AS id FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY id)
    SELECT d.id AS doc_id, d.deg AS degree,
           COALESCE(p.tri_cnt, 0) AS tri_cnt
    FROM deg d LEFT JOIN pernode p ON d.id = p.id"""

  // ---------------------------------------------------------------- g03
  // Label-propagation communities (2 synchronous rounds) — the
  // finer-than-connected-components grouping: CC (d08) merges everything
  // reachable, LPA splits a weakly-bridged component into its dense
  // sub-communities (template family A chained to family B through one
  // borderline pair stays two labels). Deterministic variant: every node
  // starts labeled with its own id; each round it adopts the label most
  // frequent among its neighbors, ties broken by smallest label — a
  // plurality vote with a total tie order, so both engines replay it
  // exactly (integer counts only; no randomized visit order, which is
  // what makes textbook async LPA non-reproducible).
  //
  // Scale shape per round: one edge-keyed join (edges × node-sized label
  // relation) + one (node, label) count aggregate + one per-node argmax
  // window — the same partitioning reused across both rounds, all keys
  // node- or edge-bounded. No corpus scan; the edge relation is the
  // banded pair set. Fixed 2 rounds bound the plan tree (LPA plateaus in
  // 2–3 rounds on near-dup graphs: labels only travel the graph
  // diameter, and dedup clusters are shallow).
  val g03: Q = (s, d) => {
    val lab = lpaLabels(s, d)
    val sizes = lab.groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("csize"))
    lab.join(sizes, col("lab") === col("community"))
      .select(col("id").as("doc_id"), col("community"), col("csize"))
  }

  /** The two deterministic plurality-vote rounds shared by g03 (the
    * community report) and g06 (the modularity audit of those same
    * communities): (id, lab) for every node of the near-dup graph. */
  private def lpaLabels(s: SparkSession, d: String): DataFrame = {
    val sym = symEdges(s, d)
    var lab = sym.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
    for (_ <- 1 to 2) {
      val votes = sym
        .join(lab.select(col("id").as("v"), col("lab")), col("src") === col("v"))
        .groupBy(col("dst").as("id"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))
        .orderBy(col("cnt").desc, col("lab").asc)
      lab = votes.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select(col("id"), col("lab"))
    }
    lab
  }

  /** Oracle-side statement of the same two LPA rounds, ending in
    * `l2(id, lab)` — shared CTE text for g03Sql and g06Sql. Assumes
    * `pairs` (the d03 pair CTE) is already in scope. */
  private val LpaCtes: String = """
    sym AS (SELECT i AS src, j AS dst FROM pairs
            UNION ALL SELECT j, i FROM pairs),
    l0 AS (SELECT DISTINCT src AS id, src AS lab FROM sym),
    v1 AS (SELECT s.dst AS id, l.lab, COUNT(*) AS cnt
           FROM sym s JOIN l0 l ON s.src = l.id GROUP BY 1, 2),
    l1 AS (SELECT id, lab FROM (
             SELECT id, lab,
                    ROW_NUMBER() OVER (PARTITION BY id
                                       ORDER BY cnt DESC, lab ASC) AS rn
             FROM v1) WHERE rn = 1),
    v2 AS (SELECT s.dst AS id, l.lab, COUNT(*) AS cnt
           FROM sym s JOIN l1 l ON s.src = l.id GROUP BY 1, 2),
    l2 AS (SELECT id, lab FROM (
             SELECT id, lab,
                    ROW_NUMBER() OVER (PARTITION BY id
                                       ORDER BY cnt DESC, lab ASC) AS rn
             FROM v2) WHERE rn = 1)"""

  /** Oracle: the identical two plurality-vote rounds unrolled — same
    * (cnt DESC, lab ASC) tie order via ROW_NUMBER in both engines. */
  val g03Sql: String = s"""
    WITH ${Dedup.JaccardPairsCte},
    $LpaCtes,
    sizes AS (SELECT lab AS community, COUNT(*) AS csize
              FROM l2 GROUP BY 1)
    SELECT l.id AS doc_id, s.community, s.csize
    FROM l2 l JOIN sizes s ON l.lab = s.community"""

  // ---------------------------------------------------------------- g04
  // k-core peeling (k=2, 3 unrolled rounds) — density stratification of
  // the near-dup graph: pendant docs (one borderline edge) fall out in
  // round 1, chains unravel in later rounds, and what survives is the
  // 2-core — the mutually-corroborated cluster interior a curation
  // pipeline can trust for aggressive dedup (vs the peeled fringe, which
  // deserves the conservative keep-both treatment). Output per node:
  // the round it was peeled (1–3) or 0 = still in the core after 3
  // rounds, plus its residual degree in the surviving subgraph.
  //
  // Scale shape per round: one node-sized degree aggregate + one
  // edge-vs-removed-set filter (two semi-join-shaped anti joins on the
  // node key). The edge relation only shrinks; the removed set is
  // fringe-sized. 3 fixed rounds = bounded plan; full coreness would
  // iterate to fixpoint (graph-diameter rounds) with the d08
  // localCheckpoint pattern — the per-round shape is identical.
  val g04: Q = (s, d) => {
    val sym0 = symEdges(s, d)
    // Each round's surviving node set and induced edge set are
    // MATERIALIZED (localCheckpoint — r18, guide §3.3/§5): the
    // unrolled form re-derived round r-1's two semi joins inside every
    // consumer of round r, compounding to a 11k-line physical plan
    // with 654 Exchanges whose repeated subtrees re-executed every
    // round's joins up to three times (measured 13.9 executor-seconds
    // on a pair-bounded edge list). Checkpointing each round keeps the
    // peel's per-round shape (one degree aggregate + two semi joins)
    // computed exactly ONCE — same rows, same output, plan tree now
    // round-sized. The materialized relations are node/edge-sized,
    // the same scale class as the d08 CC rounds' checkpoints.
    val all = sym0.select(col("src").as("id")).distinct().localCheckpoint()
    var sym = sym0
    var active = all            // nodes not yet peeled
    var removed = all.limit(0).withColumn("rround", lit(0))
    for (r <- 1 to 3) {
      val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= 2).select(col("id"))
        .localCheckpoint()
      // anti vs keep (not deg<2): a node isolated by the previous peel
      // has NO surviving edges, so it is absent from deg entirely —
      // it must still leave this round (induced degree 0 < 2)
      val peel = active.join(keep, Seq("id"), "left_anti")
        .select(col("id"), lit(r).as("rround"))
      removed = removed.unionByName(peel)
      active = keep
      sym = sym.join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
    }
    val finalDeg = sym.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("core_deg"))
    all.join(removed, Seq("id"), "left")
      .join(finalDeg, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("rround"), lit(0)).as("peel_round"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
  }

  /** Oracle: 3 unrolled peel rounds — nodes with induced degree < 2
    * leave; isolated-by-peeling nodes (all neighbors removed) have no
    * surviving edges, so they appear via the degree-0 branch of the
    * next round's NOT IN, same as Spark's left-semi filtered edge set. */
  val g04Sql: String = s"""
    WITH ${Dedup.JaccardPairsCte},
    sym0 AS (SELECT i AS src, j AS dst FROM pairs
             UNION ALL SELECT j, i FROM pairs),
    nodes AS (SELECT DISTINCT src AS id FROM sym0),
    d1 AS (SELECT src AS id, COUNT(*) AS deg FROM sym0 GROUP BY 1),
    p1 AS (SELECT id FROM d1 WHERE deg < 2),
    s1 AS (SELECT src, dst FROM sym0
           WHERE src NOT IN (SELECT id FROM p1)
             AND dst NOT IN (SELECT id FROM p1)),
    d2 AS (SELECT src AS id, COUNT(*) AS deg FROM s1 GROUP BY 1),
    p2 AS (SELECT id FROM nodes
           WHERE id NOT IN (SELECT id FROM p1)
             AND (id NOT IN (SELECT id FROM d2)
                  OR id IN (SELECT id FROM d2 WHERE deg < 2))),
    s2 AS (SELECT src, dst FROM s1
           WHERE src NOT IN (SELECT id FROM p2)
             AND dst NOT IN (SELECT id FROM p2)),
    d3 AS (SELECT src AS id, COUNT(*) AS deg FROM s2 GROUP BY 1),
    p3 AS (SELECT id FROM nodes
           WHERE id NOT IN (SELECT id FROM p1)
             AND id NOT IN (SELECT id FROM p2)
             AND (id NOT IN (SELECT id FROM d3)
                  OR id IN (SELECT id FROM d3 WHERE deg < 2))),
    s3 AS (SELECT src, dst FROM s2
           WHERE src NOT IN (SELECT id FROM p3)
             AND dst NOT IN (SELECT id FROM p3)),
    fd AS (SELECT src AS id, COUNT(*) AS core_deg FROM s3 GROUP BY 1)
    SELECT n.id AS doc_id,
           CASE WHEN n.id IN (SELECT id FROM p1) THEN 1
                WHEN n.id IN (SELECT id FROM p2) THEN 2
                WHEN n.id IN (SELECT id FROM p3) THEN 3
                ELSE 0 END AS peel_round,
           COALESCE(fd.core_deg, 0) AS core_deg
    FROM nodes n LEFT JOIN fd ON n.id = fd.id"""

  // ---------------------------------------------------------------- g05
  // Common-neighbor link prediction — the recall-miss audit for the
  // near-dup graph. The ≥0.5 Jaccard pair set is transitively closed in
  // practice (near-dup clusters are cliques), so predicting inside it
  // finds nothing; the signal lives one layer down. Mediation graph =
  // WEAK-evidence pairs (≥2 shared df-capped shingles — d03's candidate
  // relation before the Jaccard bar); prediction = two docs with ≥2
  // common weak neighbors that are NOT a strong (≥0.5) pair. Exactly
  // the candidate set a pipeline routes to the expensive exact
  // re-verify pass: corroborated by multiple independent weak overlaps
  // yet missed (or barely rejected) by the threshold.
  //
  // Scale shape: wedge work is Σ deg(center)², which hubs make
  // quadratic — so centers above HubCap weak-degree are excluded from
  // mediation (part of the operator's semantics, mirrored in the
  // oracle, same move as the df≤50 shingle cap upstream: a
  // shared-by-everything mediator is weak pair evidence). With the cap,
  // wedges ≤ HubCap × |E| — linear in the (already df-capped,
  // pair-bounded) weak edge set at any corpus size. Then one
  // (b, c)-keyed count aggregate + one anti join against the strong
  // pair set — no corpus scan beyond d03's own shingle build, which is
  // computed ONCE (localCheckpoint) and sliced into both layers.
  private val HubCap = 64

  val g05: Q = (s, d) => {
    val allp = Dedup.nearDupJaccard(s, d, threshold = 0.0,
      maxDocFreq = Some(Dedup.D03MaxDocFreq)).localCheckpoint()
    val weak = allp.where(col("c") >= 2).select(col("i"), col("j"))
    val strong = allp.where(col("jaccard") >= 0.5).select(col("i"), col("j"))
    val sym = weak.select(col("i").as("src"), col("j").as("dst"))
      .union(weak.select(col("j").as("src"), col("i").as("dst")))
    // Wedge emission via the d03 inverted-index shape (r17): ONE
    // shuffle groups each center's (distinct) neighbor list, the
    // HubCap filter IS the degree test (list size = weak degree — sym
    // holds one row per distinct neighbor), and the native DocPairs
    // expression emits each list's ordered pairs inline. The former
    // self-join shuffled medEdges twice and sorted both sides
    // (measured 9 of g05's 21 executor-seconds); pairs, counts and
    // the HubCap semantics are identical — DocPairs on the sorted
    // list emits exactly the (e1.dst < e2.dst) wedge set.
    // neighbor-list exchange pinned at the session's shuffle width
    // (r18, same rationale and placement as the d03 posting-list
    // build): the weak edge list is byte-small, so AQE coalesced this
    // exchange to ONE partition and the list merge + wedge Generate —
    // quadratic in list size, invisible to AQE's byte model — ran
    // single-threaded (measured 1.4 s of g05's wall on one task; wall
    // flat from 8 to 32 cores). The explicit-width repartition on the
    // grouping key is reused by the aggregation — no extra exchange.
    // Measured: g05 4.1→2.0 s at 32 cores, 3.5→1.9 s at 8.
    val wedgeParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val wedges = sym.repartition(wedgeParts, col("src")).groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("docs"))
      .filter(size(col("docs")).between(2, HubCap))
      .select(explode(graft.functions.TextExprs.docPairs(col("docs"))).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
    val cn = wedges.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("common_cnt"))
      .where(col("common_cnt") >= 2)
    cn.join(strong, Seq("i", "j"), "left_anti")
      .select(col("i"), col("j"), col("common_cnt"))
  }

  /** Oracle: identical two-layer slice of the df-capped candidate
    * relation, capped wedge count + anti join (NOT EXISTS). Wedge
    * (i, j) is canonical by i < j, so no dedup step is needed. */
  val g05Sql: String = s"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
           FROM (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM t) g
           WHERE i <= len(w) - 2),
    kept AS (SELECT s FROM sh GROUP BY s
             HAVING COUNT(*) BETWEEN 2 AND ${Dedup.D03MaxDocFreq}),
    shk AS (SELECT sh.doc_id, sh.s FROM sh JOIN kept USING (s)),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS c
               FROM shk a JOIN shk b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
    allp AS (SELECT i, j, c,
                    CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS jaccard
             FROM common
               JOIN counts ca ON i = ca.doc_id
               JOIN counts cb ON j = cb.doc_id),
    weak AS (SELECT i, j FROM allp WHERE c >= 2),
    strong AS (SELECT i, j FROM allp WHERE jaccard >= 0.5),
    sym AS (SELECT i AS src, j AS dst FROM weak
            UNION ALL SELECT j, i FROM weak),
    deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),
    med AS (SELECT s.src, s.dst FROM sym s
            JOIN deg d ON s.src = d.id AND d.deg <= $HubCap),
    cn AS (SELECT e1.dst AS i, e2.dst AS j, COUNT(*) AS common_cnt
           FROM med e1 JOIN med e2
             ON e1.src = e2.src AND e1.dst < e2.dst
           GROUP BY 1, 2
           HAVING COUNT(*) >= 2)
    SELECT c.i, c.j, c.common_cnt
    FROM cn c
    WHERE NOT EXISTS (SELECT 1 FROM strong s
                      WHERE s.i = c.i AND s.j = c.j)"""

  // ---------------------------------------------------------------- g06
  // Modularity audit of the LPA communities — the quality gate on g03's
  // partition before a pipeline trusts it for aggressive dedup: per
  // community, Newman's Q contribution e_c/m − (d_c/2m)², kept as an
  // EXACT integer numerator q_num = 4·m·e_c − d_c² over the common
  // denominator 4m² (one final IEEE division for the reported ratio —
  // deterministic in both engines, everything upstream BIGINT). A
  // community whose q_num ≤ 0 has no more internal edges than the
  // degree-random null model predicts — a bridge artifact to keep
  // conservative, not a template family to collapse.
  //
  // Scale shape: two label-keyed joins of the pair relation against
  // the node-sized label relation (edge-bounded), one degree
  // aggregate, one per-community rollup — nothing touches the corpus,
  // and m (the scalar edge count) joins as a broadcast literal.
  val g06: Q = (s, d) => {
    val pairs = Dedup.jaccardPairs(s, d).select(col("i"), col("j"))
    // the label relation feeds three joins below — checkpoint the
    // node-sized result once instead of replaying the two LPA rounds
    // (join + aggregate + window each) per consumer
    val lab = lpaLabels(s, d).localCheckpoint()
    val deg = symEdges(s, d).groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    val m = pairs.agg(count(lit(1)).as("m"))
    val ein = pairs
      .join(lab.select(col("id").as("i"), col("lab").as("li")), Seq("i"))
      .join(lab.select(col("id").as("j"), col("lab").as("lj")), Seq("j"))
      .filter(col("li") === col("lj"))
      .groupBy(col("li").as("community")).agg(count(lit(1)).as("e_in"))
    val dc = lab.join(deg, Seq("id"))
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_tot"))
    dc.join(ein, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"),
        (lit(4) * col("m") * coalesce(col("e_in"), lit(0L)) -
          col("d_tot") * col("d_tot")).as("q_num"),
        ((lit(4) * col("m") * coalesce(col("e_in"), lit(0L)) -
          col("d_tot") * col("d_tot")).cast("double") /
          (lit(4) * col("m") * col("m")).cast("double")).as("q_ratio"))
  }

  /** Oracle: identical label relation (shared LPA CTEs) and identical
    * integer modularity numerator; the one division is stated with the
    * same operand casts so the IEEE result matches bit-for-bit. */
  val g06Sql: String = s"""
    WITH ${Dedup.JaccardPairsCte},
    $LpaCtes,
    deg AS (SELECT src AS id, COUNT(*) AS deg
            FROM (SELECT i AS src FROM pairs
                  UNION ALL SELECT j FROM pairs) t
            GROUP BY 1),
    mm AS (SELECT COUNT(*) AS m FROM pairs),
    ein AS (SELECT li.lab AS community, COUNT(*) AS e_in
            FROM pairs p
              JOIN l2 li ON p.i = li.id
              JOIN l2 lj ON p.j = lj.id
            WHERE li.lab = lj.lab
            GROUP BY 1),
    dc AS (SELECT l.lab AS community, COUNT(*) AS n_nodes,
                  CAST(SUM(dg.deg) AS BIGINT) AS d_tot
           FROM l2 l JOIN deg dg ON l.id = dg.id
           GROUP BY 1)
    SELECT dc.community, dc.n_nodes, COALESCE(ein.e_in, 0) AS e_in,
           dc.d_tot,
           4 * m * COALESCE(ein.e_in, 0) - dc.d_tot * dc.d_tot AS q_num,
           CAST(4 * m * COALESCE(ein.e_in, 0) - dc.d_tot * dc.d_tot
                AS DOUBLE) /
             CAST(4 * m * m AS DOUBLE) AS q_ratio
    FROM dc LEFT JOIN ein USING (community) CROSS JOIN mm"""

  // ---------------------------------------------------------------- g07
  // Bounded BFS — 3-hop distance from the three highest-degree hubs of
  // the near-dup graph (ties on degree broken by id, so the seed pick
  // is total). The curation read: everything within k hops of a
  // boilerplate hub inherits its suspicion, with the hop count as the
  // decay. Classic frontier-expansion BFS: each round joins ONLY the
  // new frontier (not the whole visited set) against the edge list,
  // anti-joins out already-visited (seed, node) pairs, and
  // localCheckpoints the visited relation so round r+1 replays no
  // lineage. Per-round cost is frontier-edges-bounded; 3 fixed rounds
  // bound the plan tree the same way g01/g04 do.
  val g07: Q = (s, d) => {
    val sym = symEdges(s, d)
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val seeds = deg.orderBy(col("deg").desc, col("id").asc).limit(3)
      .select(col("id"))
    var dist = seeds.select(col("id").as("seed"), col("id"),
      lit(0).as("dist")).localCheckpoint()
    for (r <- 1 to 3) {
      val cand = dist.filter(col("dist") === r - 1)
        .join(sym, col("id") === col("src"))
        .select(col("seed"), col("dst").as("id")).distinct()
        .join(dist.select(col("seed"), col("id")), Seq("seed", "id"),
          "left_anti")
        .withColumn("dist", lit(r))
      dist = dist.unionByName(cand).localCheckpoint()
    }
    dist.select(col("seed"), col("id").as("doc_id"), col("dist"))
  }

  /** Oracle: the same three frontier expansions unrolled — each round
    * joins only the previous round's NEW nodes and NOT-EXISTS-filters
    * the visited set, exactly the Spark loop's anti-join. */
  val g07Sql: String = s"""
    WITH ${Dedup.JaccardPairsCte},
    sym AS (SELECT i AS src, j AS dst FROM pairs
            UNION ALL SELECT j, i FROM pairs),
    deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY 1),
    seeds AS (SELECT id FROM deg ORDER BY deg DESC, id ASC LIMIT 3),
    d0 AS (SELECT id AS seed, id, 0 AS dist FROM seeds),
    n1 AS (SELECT DISTINCT d.seed, s.dst AS id
           FROM d0 d JOIN sym s ON s.src = d.id),
    e1 AS (SELECT n.seed, n.id, 1 AS dist FROM n1 n
           WHERE NOT EXISTS (SELECT 1 FROM d0 p
                             WHERE p.seed = n.seed AND p.id = n.id)),
    d1 AS (SELECT * FROM d0 UNION ALL SELECT * FROM e1),
    n2 AS (SELECT DISTINCT e.seed, s.dst AS id
           FROM e1 e JOIN sym s ON s.src = e.id),
    e2 AS (SELECT n.seed, n.id, 2 AS dist FROM n2 n
           WHERE NOT EXISTS (SELECT 1 FROM d1 p
                             WHERE p.seed = n.seed AND p.id = n.id)),
    d2 AS (SELECT * FROM d1 UNION ALL SELECT * FROM e2),
    n3 AS (SELECT DISTINCT e.seed, s.dst AS id
           FROM e2 e JOIN sym s ON s.src = e.id),
    e3 AS (SELECT n.seed, n.id, 3 AS dist FROM n3 n
           WHERE NOT EXISTS (SELECT 1 FROM d2 p
                             WHERE p.seed = n.seed AND p.id = n.id))
    SELECT seed, id AS doc_id, dist
    FROM (SELECT * FROM d2 UNION ALL SELECT * FROM e3) f"""

  // ---------------------------------------------------------------- g08
  // Local clustering coefficient — g02's triangle counts normalized to
  // the [0,1] signal curation actually thresholds on: lcc(v) =
  // 2·tri(v) / (deg(v)·(deg(v)−1)), ≈1 for a node inside a mutual
  // near-dup clique (merge the whole family), ≈0 for a star hub
  // (boilerplate overlapping many unrelated docs — do NOT merge its
  // neighborhood transitively). The numerator and denominator are
  // published as exact BIGINTs; the coefficient itself is the single
  // final division (NULL when deg < 2, where it is undefined).
  // Plan: a projection over g02's already-bounded relation — zero new
  // shuffles beyond the triangle count it reuses.
  val g08: Q = (s, d) =>
    g02(s, d)
      .withColumn("lcc_num", lit(2L) * col("tri_cnt"))
      .withColumn("lcc_den", col("degree") * (col("degree") - 1))
      .withColumn("lcc",
        when(col("lcc_den") > 0,
          col("lcc_num").cast("double") / col("lcc_den")))

  val g08Sql: String = s"""
    WITH base AS (${g02Sql})
    SELECT doc_id, degree, tri_cnt,
           2 * tri_cnt AS lcc_num,
           degree * (degree - 1) AS lcc_den,
           CASE WHEN degree * (degree - 1) > 0
                THEN CAST(2 * tri_cnt AS DOUBLE) / (degree * (degree - 1))
           END AS lcc
    FROM base"""

  // ---------------------------------------------------------------- g09
  // WEIGHTED PageRank — g01 with each edge carrying its shared-shingle
  // count c: a pair held together by 40 shared shingles corroborates
  // its endpoints far more than a borderline 3-shingle pair, and the
  // canonical-copy pick should rank by STRENGTH of overlap, not just
  // neighbor count. Same 3 Jacobi iterations and 0.85 damping; the
  // per-edge contribution becomes (r·c) div W(v) with W(v) = Σ_out c —
  // still pure BIGINT floor arithmetic (r ≈ 1e12, c ≤ shingle counts,
  // products ≤ ~1e16), replayed exactly by the unrolled oracle. Plan
  // per iteration: one edge-keyed join + one receiver-keyed aggregate,
  // identical posture to g01 on the same checkpointed pair relation.
  val g09: Q = (s, d) => {
    val pairs = Dedup.jaccardPairs(s, d).select(col("i"), col("j"), col("c"))
    val sym = pairs.select(col("i").as("src"), col("j").as("dst"), col("c"))
      .union(pairs.select(col("j").as("src"), col("i").as("dst"), col("c")))
    val wdeg = sym.groupBy(col("src").as("id"))
      .agg(sum(col("c")).as("wsum"), count(lit(1)).as("deg"))
    val n = wdeg.agg(count(lit(1)).as("n"))
    val base = wdeg.crossJoin(broadcast(n))
    var rank = base.withColumn("r", expr("1000000000000 div n"))
    for (_ <- 1 to 3) {
      val recv = sym.join(
          rank.select(col("id").as("v"), col("r"), col("wsum").as("w")),
          col("src") === col("v"))
        .select(col("dst").as("id"), expr("(r * c) div w").as("ct"))
        .groupBy(col("id")).agg(sum(col("ct")).as("sin"))
      rank = base.join(recv, Seq("id"))
        .withColumn("r", expr(
          "(150000 * (1000000000000 div n)) div 1000000" +
            " + (850000 * sin) div 1000000"))
        .select(col("id"), col("deg"), col("wsum"), col("n"), col("r"))
    }
    rank.select(col("id").as("doc_id"), col("deg").as("degree"),
      col("wsum").as("wdegree"), col("r").as("wprank"))
  }

  val g09Sql: String = s"""
    WITH ${Dedup.JaccardPairsCte},
    sym AS (SELECT i AS src, j AS dst, c FROM pairs
            UNION ALL SELECT j, i, c FROM pairs),
    wdeg AS (SELECT src AS id, CAST(SUM(c) AS BIGINT) AS wsum,
                    COUNT(*) AS deg
             FROM sym GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM wdeg),
    r0 AS (SELECT id, deg, wsum,
                  (SELECT 1000000000000 // n FROM nn) AS r
           FROM wdeg),
    a0 AS (SELECT s.dst AS id, SUM((r0.r * s.c) // r0.wsum) AS sin
           FROM sym s JOIN r0 ON s.src = r0.id GROUP BY 1),
    r1 AS (SELECT w.id, w.deg, w.wsum,
                  (150000 * (SELECT 1000000000000 // n FROM nn)) // 1000000
                    + (850000 * a.sin) // 1000000 AS r
           FROM wdeg w JOIN a0 a ON w.id = a.id),
    a1 AS (SELECT s.dst AS id, SUM((r1.r * s.c) // r1.wsum) AS sin
           FROM sym s JOIN r1 ON s.src = r1.id GROUP BY 1),
    r2 AS (SELECT w.id, w.deg, w.wsum,
                  (150000 * (SELECT 1000000000000 // n FROM nn)) // 1000000
                    + (850000 * a.sin) // 1000000 AS r
           FROM wdeg w JOIN a1 a ON w.id = a.id),
    a2 AS (SELECT s.dst AS id, SUM((r2.r * s.c) // r2.wsum) AS sin
           FROM sym s JOIN r2 ON s.src = r2.id GROUP BY 1),
    r3 AS (SELECT w.id, w.deg, w.wsum,
                  (150000 * (SELECT 1000000000000 // n FROM nn)) // 1000000
                    + (850000 * a.sin) // 1000000 AS r
           FROM wdeg w JOIN a2 a ON w.id = a.id)
    SELECT id AS doc_id, deg AS degree, wsum AS wdegree,
           CAST(r AS BIGINT) AS wprank
    FROM r3"""

  val queries: Map[String, Q] = Map(
    "g01_pagerank" -> g01,
    "g02_triangles" -> g02,
    "g03_label_prop" -> g03,
    "g04_kcore" -> g04,
    "g05_link_pred" -> g05,
    "g06_modularity" -> g06,
    "g07_bfs_hops" -> g07,
    "g08_clustering_coeff" -> g08,
    "g09_weighted_pagerank" -> g09)

  val oracle: Map[String, String] = Map(
    "g01_pagerank" -> g01Sql,
    "g02_triangles" -> g02Sql,
    "g03_label_prop" -> g03Sql,
    "g04_kcore" -> g04Sql,
    "g05_link_pred" -> g05Sql,
    "g06_modularity" -> g06Sql,
    "g07_bfs_hops" -> g07Sql,
    "g08_clustering_coeff" -> g08Sql,
    "g09_weighted_pagerank" -> g09Sql)
}
