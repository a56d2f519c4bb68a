package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Narrow bridge into `private[sql]` surface that a library shipping
  * native Catalyst expressions legitimately needs: Expression ⇄ Column
  * conversion, session-level function registration, and Column-level
  * constructors for Spark's internal bloom-filter expressions (the same
  * pair InjectRuntimeFilter uses — exposed so operators can build
  * explicit semi-join pruning with them). Kept to one-liners so the
  * internal API exposure is auditable.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Aggregate: build a bloom filter over a LONG column (pre-hash with
    * xxhash64). `expectedItems` sizes the filter (~8 bits/item). */
  def bloomFilterAgg(c: Column, expectedItems: Long): Column =
    column(new catalyst.expressions.aggregate.BloomFilterAggregate(
      expression(c), expectedItems).toAggregateExpression())

  /** Predicate: probe a bloom filter binary (constant or scalar
    * subquery, per BloomFilterMightContain's contract) with a LONG. */
  def mightContain(bloom: Column, value: Column): Column =
    column(catalyst.expressions.BloomFilterMightContain(
      expression(bloom), expression(value)))

  def registerFunction(spark: SparkSession, name: String,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
