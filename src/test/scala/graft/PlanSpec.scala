package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ExtendedMode, FormattedMode}

/** Physical-plan assertions: the scale posture the Scaladoc claims must
  * actually appear in the plans — pushed-down scan predicates, pruned
  * read schemas, broadcast vs shuffled join strategies, top-k without a
  * global sort, and exchange reuse in the self-join dedup pipelines.
  * Plans are pinned against this repo's fixed Spark version.
  */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)
  private def extended(df: DataFrame): String =
    df.queryExecution.explainString(ExtendedMode)

  test("q02: filters push into the parquet scan and columns prune") {
    val p = formatted(SparkEntry.queries("q02_filter_project")(spark, sf0001))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // 5 referenced columns, not all 16
    assert(!p.contains("l_comment"), "scan reads unreferenced columns")
  }

  test("q03: dimension side broadcasts") {
    val p = formatted(SparkEntry.queries("q03_join_broadcast")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q12: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = formatted(SparkEntry.queries("q12_topk")(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q24: literal-band range join is a broadcast nested loop") {
    val p = formatted(SparkEntry.queries("q24_range_join")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d05: band self-join reuses one exchange over the simhash plan") {
    val df = SparkEntry.queries("d05_dedup_simhash")(spark, "/root/testdata/sf0.01")
    val p = formatted(df)
    assert(p.contains("ShuffledHashJoin"), p)
    // The two join inputs are the same child plan; at runtime AQE
    // materializes one shuffle stage and reuses it for the other side.
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") ||
      executed.contains("ReusedQueryStage") ||
      executed.contains("ShuffleQueryStage 0") &&
        !executed.contains("ShuffleQueryStage 3"),
      executed.take(3000))
  }
}
