package graft

import org.apache.spark.sql.functions._

/** Storage-layout specs: hive-partitioned warehouse writes must prune
  * at the file-listing level, and the engine round-trips the other
  * mainstream columnar/text formats (ORC, CSV, JSON) losslessly. */
class FormatsSpec extends SparkSpec {

  test("partitioned warehouse write prunes partitions at the scan") {
    val dir = tmpDir("part-wh-")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("o_year") === 1997)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"partition filter must be applied at listing time:\n$plan")
    // pruned scan selects only the one year-directory
    val scan = q.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")
    // and the values are right
    val expected = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(q.count() == expected)
  }

  test("ORC round-trip preserves rows and schema") {
    val dir = tmpDir("orc-")
    val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0)
  }

  test("parquet schema evolution: mergeSchema unions batch schemas") {
    val dir = tmpDir("evolve-")
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/b=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "name", "score", "b"))
    val byId = merged.collect().map(r =>
      r.getAs[Long]("id") -> (if (r.isNullAt(r.fieldIndex("score"))) None
                              else Some(r.getAs[Double]("score")))).toMap
    assert(byId == Map(1L -> None, 2L -> Some(9.5)),
      "old-batch rows must null-fill the new column")
  }

  test("CSV round-trip with header + explicit schema") {
    val dir = tmpDir("csv-")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(src.schema)
      .option("header", "true").csv(dir)
    assert(back.exceptAll(src).count() == 0 &&
      src.exceptAll(back).count() == 0)
  }
}
