package graft.tools

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField,
  StructType}

import graft.load.WarehouseLoad

/** Resume [[CommitScale]]'s MEASUREMENT phase over an already-built
  * table (r16: the 100k build finished but its measurement JVM died on
  * classpath skew after a live recompile — the table is fine; rerun
  * the reads on a fresh JVM instead of rebuilding for 2.5 h).
  *
  * Usage: runMain graft.tools.CommitScaleResume <root> [n] [rowsPer]
  * where <root> holds `warehouse/` and `history/` from a prior
  * CommitScale run. Prints the same `metric=`-style lines.
  */
object CommitScaleResume {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: CommitScaleResume <root> [n] [rowsPer]"))
    val n = args.lift(1).map(_.toInt).getOrElse(100000)
    val rowsPer = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    val wh = s"$root/warehouse"
    val hist = s"$root/history"

    val (head, headS) = time(WarehouseLoad.currentVersion(spark, hist))
    println(f"current_version head=$head wall=$headS%.3f s")
    val (ids, cbS) = time(WarehouseLoad.committedBatches(spark, hist))
    println(f"committed_batches n=${ids.size} wall=$cbS%.3f s (cold walk)")
    val (_, cb2S) = time(WarehouseLoad.committedBatches(spark, hist))
    println(f"committed_batches_cached wall=$cb2S%.3f s")

    val (df, planS) = time(WarehouseLoad.readWarehouse(spark, wh, hist).get)
    val (cnt, cntS) = time(df.count())
    println(f"read_warehouse plan=$planS%.2f s count=$cnt wall=$cntS%.2f s")

    val (pdf, pplanS) = time {
      val x = WarehouseLoad.readWarehouse(spark, wh, hist).get
        .filter(col("id") >= (n / 2) * 1000L &&
          col("id") < (n / 2) * 1000L + rowsPer)
      x.queryExecution.optimizedPlan
      x
    }
    val (pcnt, pcntS) = time(pdf.count())
    println(f"zone_pruned_filter plan=$pplanS%.2f s count=$pcnt " +
      f"wall=$pcntS%.2f s")

    val (qdf, qplanS) = time {
      val x = WarehouseLoad.readWarehouse(spark, wh, hist).get
        .filter(col("commit") === n / 2)
      x.queryExecution.optimizedPlan
      x
    }
    val (qcnt, qcntS) = time(qdf.count())
    println(f"partition_filter plan=$qplanS%.2f s count=$qcnt " +
      f"wall=$qcntS%.2f s")

    val (feedRows, chS) = time(
      WarehouseLoad.changes(spark, wh, hist, head - 10, head).get.count())
    println(f"changes_last10 rows=$feedRows wall=$chS%.2f s")

    val staging = s"$root/stage2"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(staging))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(staging, "late2.json"),
      "{\"id\": \"999999998\", \"commit\": \"0\"}\n")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("commit", IntegerType)))
    val (_, loadS) = time(
      WarehouseLoad.batchIdempotent(spark, staging, target, wh, hist,
        partitionCols = Seq("commit")))
    println(f"load_atomic_at_n wall=$loadS%.2f s")

    val bulkBytes = WarehouseLoad.batchBytes(spark, hist, "bulk")
    bulkBytes.foreach { bb =>
      val (nFold, tierS) = time(
        WarehouseLoad.compactSmall(spark, wh, hist, bb - 1,
          partitionCols = Seq("commit")))
      println(f"compact_small folded=$nFold wall=$tierS%.2f s " +
        f"(bulk $bb B left untouched) [partitioned fold]")
    }
    val (nDel, vacS) = time(WarehouseLoad.vacuum(spark, wh, hist))
    println(f"vacuum removed=$nDel wall=$vacS%.2f s")
    val vroot = new org.apache.hadoop.fs.Path(s"$hist/_versions")
    val vfs = vroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vsum = vfs.getContentSummary(vroot)
    println(f"version_log_after_vacuum files=${vsum.getFileCount} " +
      f"bytes=${vsum.getLength} (${vsum.getLength / 1024.0 / 1024.0}%.1f MB)")
    val (cnt2, cnt2S) = time(
      WarehouseLoad.readWarehouse(spark, wh, hist).get.count())
    println(f"read_after_compact count=$cnt2 wall=$cnt2S%.2f s")
    spark.stop()
  }
}
