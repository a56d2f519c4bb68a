package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the graph-analytics family (g01/g02) at
  * sf0.001 — value-exactness is the oracle harness's job; these pin
  * the algorithmic invariants that hold at ANY scale. */
class GraphSpec extends SparkSpec {

  test("g01: rank mass is conserved within floor-division loss") {
    val df = SparkEntry.queries("g01_pagerank")(spark, sf0001)
    val n = df.count()
    assert(n > 0, "near-dup graph is empty at sf0.001")
    val total = df.agg(sum(col("prank"))).head.getLong(0)
    // Each of the 3 iterations loses < 1e-12 per floor division, twice
    // per node (contrib + base term) plus the initial split: the total
    // can only drift DOWN from 1e12, and only by ~iterations × n units.
    val scale = 1000000000000L
    assert(total <= scale, s"rank mass above unity: $total")
    assert(total >= scale - 8L * n * 1000000L,
      s"rank mass lost beyond floor-division bound: $total (n=$n)")
  }

  test("g02: per-node triangle counts sum to 3x the triangle count") {
    val df = SparkEntry.queries("g02_triangles")(spark, sf0001)
    val perNodeSum = df.agg(sum(col("tri_cnt"))).head.getLong(0)
    assert(perNodeSum % 3 == 0,
      s"per-node participation sum $perNodeSum is not divisible by 3 — " +
        "some triangle was counted an uneven number of times")
    // degree is a structural upper bound on per-node triangles:
    // tri_cnt <= deg*(deg-1)/2
    val bad = df.filter(col("tri_cnt") >
      col("degree") * (col("degree") - 1) / 2).count()
    assert(bad == 0, s"$bad nodes exceed the degree-pair triangle bound")
  }

  test("g03: labels partition the node set and sizes are consistent") {
    val df = SparkEntry.queries("g03_label_prop")(spark, sf0001)
    val n = df.count()
    assert(n > 0)
    assert(df.select(col("doc_id")).distinct().count() == n,
      "a node carries two labels")
    // every community's recorded csize equals its actual member count
    val bad = df.groupBy(col("community"), col("csize"))
      .agg(count(lit(1)).as("actual"))
      .filter(col("actual") =!= col("csize")).count()
    assert(bad == 0, s"$bad communities have inconsistent csize")
    // LPA can only refine-or-equal the CC partition: two nodes with the
    // same label must be in the same connected component (labels travel
    // edges), so #communities >= #components over the same node set
    val comps = SparkEntry.queries("d08_dedup_clusters")(spark, sf0001)
      .select(col("component")).distinct().count()
    val comms = df.select(col("community")).distinct().count()
    assert(comms >= comps,
      s"LPA produced fewer communities ($comms) than components ($comps)")
  }

  test("g04: peeling is monotone and the surviving core has min degree 2") {
    val df = SparkEntry.queries("g04_kcore")(spark, sf0001)
    assert(df.count() > 0)
    // peeled nodes have zero residual degree; survivors (round 0) kept
    // their >= 2 induced degree unless the LAST round isolated them —
    // but a round-3 survivor by definition had deg >= 2 in round 3's
    // induced graph, and the final edge set is exactly that graph
    val badPeeled = df.filter(col("peel_round") > 0 &&
      col("core_deg") =!= 0).count()
    assert(badPeeled == 0, s"$badPeeled peeled nodes still have core edges")
    val badCore = df.filter(col("peel_round") === 0 &&
      col("core_deg") < 2).count()
    assert(badCore == 0, s"$badCore core survivors below degree 2")
  }

  test("g05: predictions are non-edges with >= 2 shared neighbors") {
    val df = SparkEntry.queries("g05_link_pred")(spark, sf0001)
    assert(df.count() > 0, "the weak-evidence audit found no candidates " +
      "at sf0.001 — the operator is running on a degenerate graph")
    val under = df.filter(col("common_cnt") < 2).count()
    assert(under == 0, s"$under predictions below the 2-common-neighbor bar")
    val asEdges = df.select(col("i"), col("j"))
      .join(SparkEntry.queries("d03_dedup_jaccard")(spark, sf0001)
        .select(col("i"), col("j")), Seq("i", "j"), "left_semi").count()
    assert(asEdges == 0, s"$asEdges predicted links already exist as pairs")
  }
}
