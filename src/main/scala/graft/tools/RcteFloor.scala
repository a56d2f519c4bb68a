package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement for the q63 `weak` adjudication (VERDICT r15
  * #7): is q63's wall a UnionLoop PER-ITERATION cost floor (driver
  * re-analysis/re-planning each recursive step) rather than data work?
  * Runs the same recursion over the SAME checkpointed chain relation
  * at increasing depth caps; with data held constant, wall growing
  * linearly in depth while the closed form (q73's shape) stays flat is
  * the attribution. Prints one line per depth for SCALE.md.
  *
  * Usage: runMain graft.tools.RcteFloor [sfDir] [depths: 5,10,25,50]
  */
object RcteFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val depths = args.lift(1).getOrElse("5,10,25,50")
      .split(",").map(_.toInt).toSeq
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    val ev = graft.sources.Events.read(spark, sfDir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= 50)
      .select(col("user_id"), col("rn"),
        floor(col("value") * 100).cast("long").as("v"))
      .localCheckpoint()
    ev.createOrReplaceTempView("ev_floor_v")
    def run(depth: Int): Double = {
      val t0 = System.nanoTime()
      spark.sql(s"""
        WITH RECURSIVE chain AS (
          SELECT user_id, rn, LEAST(v, 100000) AS bal
          FROM ev_floor_v WHERE rn = 1
          UNION ALL
          SELECT /*+ BROADCAST(e) */ e.user_id, e.rn,
                 LEAST(c.bal + e.v, 100000) AS bal
          FROM ev_floor_v e JOIN chain c
            ON e.user_id = c.user_id AND e.rn = c.rn + 1
          WHERE e.rn <= $depth)
        SELECT user_id, rn, bal FROM chain""")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(2) // warm the session (codegen, broadcast machinery)
    depths.foreach { dep =>
      val walls = (1 to 3).map(_ => run(dep))
      println(f"rcte_floor depth=$dep%3d min=${walls.min}%.2f s " +
        f"walls=${walls.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
