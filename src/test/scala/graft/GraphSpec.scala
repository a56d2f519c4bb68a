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
}
