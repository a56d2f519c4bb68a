package graft.tools

import org.apache.spark.sql.functions.{col, lit}

import graft.load.WarehouseLoad

/** BUILD-ONLY phase of [[CommitScale]] into a FIXED root (r17): the
  * measurement phase runs later via [[CommitScaleResume]] on a fresh
  * JVM with whatever read-path code is current — the r16 lesson is
  * that a live recompile under a running measurement JVM kills it
  * with classpath skew, so build and measure are now separate mains
  * and the build runs against a frozen classes snapshot.
  *
  * Usage: CommitScaleBuild <root> [n] [rowsPer] [par] [bulkRows]
  * [partitioned]. Leaves `<root>/warehouse` + `<root>/history` on
  * disk; prints the build metrics only.
  */
object CommitScaleBuild {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: CommitScaleBuild <root> [n] [rowsPer] [par] " +
        "[bulkRows] [partitioned]"))
    val n = args.lift(1).map(_.toInt).getOrElse(100000)
    val rowsPer = args.lift(2).map(_.toInt).getOrElse(5)
    val par = args.lift(3).map(_.toInt).getOrElse(8)
    val bulkRows = args.lift(4).map(_.toInt).getOrElse(100000)
    val partCols =
      if (args.lift(5).forall(_.toInt > 0)) Seq("commit") else Nil
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    val wh = s"$root/warehouse"
    val hist = s"$root/history"
    import spark.implicits._

    if (bulkRows > 0)
      WarehouseLoad.commitStreamedBatch(spark,
        spark.range(bulkRows.toLong).select((-col("id") - 1).as("id"))
          .withColumn("commit", lit(-1)),
        wh, hist, "bulk", partCols)

    val t0 = System.nanoTime()
    def commit(i: Int): Unit = {
      val df = (i * 1000L until i * 1000L + rowsPer).toDF("id")
        .withColumn("commit", lit(i))
      WarehouseLoad.commitStreamedBatch(spark, df, wh, hist,
        f"s-$i%05d", partCols)
    }
    if (par <= 1) (1 to n).foreach(commit)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      try {
        val futs = (1 to n).map(i =>
          pool.submit(new Runnable { def run(): Unit = commit(i) }))
        futs.foreach(_.get())
      } finally pool.shutdown()
    }
    val buildS = (System.nanoTime() - t0) / 1e9
    println(f"build_commits n=$n rowsPer=$rowsPer par=$par " +
      f"total=$buildS%.1f s (${buildS / n * 1000}%.0f ms/commit)")

    val vroot = new org.apache.hadoop.fs.Path(s"$hist/_versions")
    val vfs = vroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vsum = vfs.getContentSummary(vroot)
    println(f"version_log files=${vsum.getFileCount} " +
      f"bytes=${vsum.getLength} (${vsum.getLength / 1024.0 / 1024.0}%.1f MB)")
    println(s"fixture_root $root")
    spark.stop()
  }
}
