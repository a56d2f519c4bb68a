package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** The one `private[sql]` bridge this library uses: construct a
  * DataFrame from a custom [[LogicalPlan]] node (`Dataset.ofRows` has
  * no public equivalent). Planting a shim object inside the Spark
  * namespace is the established extension-library pattern for this
  * (Delta, Sedona, Frameless all ship one); everything else in graft
  * sticks to the public API. */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Wrap an already-produced `InternalRow` RDD as a batch DataFrame
    * (`internalCreateDataFrame` has no public equivalent). Used by the
    * commit-log streaming sink's fallback path: the executed
    * micro-batch's row RDD is always a plain batch relation even when
    * the logical plan's leaves cannot be flag-stripped. */
  def ofInternalRows(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[CSparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** The physical plan of a streaming query's LAST executed
    * micro-batch — spec-side observability for plan-shape contracts
    * inside streaming execution (e.g. zone pruning of a micro-batch's
    * batch roots), which the public API does not expose. */
  def lastExecutedPlan(q: org.apache.spark.sql.streaming.StreamingQuery):
      org.apache.spark.sql.execution.SparkPlan =
    q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime
        .StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan

  /** A parquet scan over a pre-resolved [[FileIndex]] (graft's
    * commit-log-backed ManifestFileIndex): `DataFrameReader` has no
    * way to supply a file index — it always builds an
    * `InMemoryFileIndex`, i.e. a filesystem listing per root — and
    * `LogicalRelation` has no public constructor path. One-liner
    * bridge, same pattern as [[ofRows]]. */
  def parquetScan(spark: SparkSession,
      location: org.apache.spark.sql.execution.datasources.FileIndex,
      dataSchema: org.apache.spark.sql.types.StructType,
      partitionSchema: org.apache.spark.sql.types.StructType =
        new org.apache.spark.sql.types.StructType()): DataFrame = {
    val cs = spark.asInstanceOf[CSparkSession]
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location, partitionSchema, dataSchema,
      None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      Map.empty[String, String])(cs)
    Dataset.ofRows(cs,
      org.apache.spark.sql.execution.datasources.LogicalRelation(rel))
  }
}
