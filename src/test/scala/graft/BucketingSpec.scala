package graft

import org.apache.spark.sql.functions._
import graft.load.Bucketing

/** Bucketed co-located joins: the plan-level proof that bucketing
  * removes the join shuffle (see load/Bucketing.scala scaladoc). */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans with zero exchanges") {
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sf0001/lineitem.parquet"), "li_b",
      "l_orderkey", 8)
    Bucketing.writeBucketed(
      spark.read.parquet(s"$sf0001/orders.parquet"), "ord_b",
      "o_orderkey", 8)

    // hint("merge") pins sort-merge join (the strategy that matters at
    // fact-to-fact scale) without touching the broadcast threshold conf.
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
    val jPlan = joined.queryExecution.executedPlan.toString
    assert(jPlan.contains("SortMergeJoin"), jPlan)
    assert(!jPlan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle either side:\n$jPlan")
    val bucketed = joined
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))

    // contrast: the same join over plain parquet shuffles both sides
    val plain = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .hint("merge")
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
    assert(plain.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))

    // and the result is identical to the unbucketed computation
    val reference = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))
    assert(bucketed.exceptAll(reference).count() == 0 &&
      reference.exceptAll(bucketed).count() == 0)
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val agg = spark.table("li_b")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation should reuse the bucket layout:\n$plan")
  }
}
