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
    SELECT id AS doc_id, deg AS degree, r AS prank FROM r3"""

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

  val queries: Map[String, Q] = Map(
    "g01_pagerank" -> g01,
    "g02_triangles" -> g02)

  val oracle: Map[String, String] = Map(
    "g01_pagerank" -> g01Sql,
    "g02_triangles" -> g02Sql)
}
