package graft

import org.apache.spark.sql.types._
import graft.load.StreamingMerge

class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("city", StringType)))

  private def ts(batchId: Long) =
    java.sql.Timestamp.valueOf(f"2026-0${batchId + 1}%d-01 00:00:00")

  private def stage(dir: String, name: String, rows: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
  }

  test("foreachBatch SCD merge: exactly-one merge per file across restarts") {
    val staging = tmpDir("smerge-stage-")
    val dim = tmpDir("smerge-dim-")
    val ckpt = tmpDir("smerge-ckpt-")

    stage(staging, "b0.json", Seq(
      """{"id": 1, "name": "alice", "city": "NY"}""",
      """{"id": 2, "name": "bob", "city": "LA"}"""))
    val q1 = StreamingMerge.continuous(spark, staging, schema, dim, ckpt,
      Seq("id"), Seq("name", "city"), ts)
    q1.awaitTermination()

    val snap1 = StreamingMerge.snapshot(spark, dim).get
    assert(snap1.count() == 2)
    assert(snap1.filter($"is_current").count() == 2)

    // second run: one changed row + one new row, in a new file
    stage(staging, "b1.json", Seq(
      """{"id": 1, "name": "alice", "city": "BOSTON"}""",
      """{"id": 3, "name": "carol", "city": "SF"}"""))
    val q2 = StreamingMerge.continuous(spark, staging, schema, dim, ckpt,
      Seq("id"), Seq("name", "city"), ts)
    q2.awaitTermination()

    val snap2 = StreamingMerge.snapshot(spark, dim).get
    assert(snap2.count() == 4) // alice closed+reopened, bob, carol
    assert(snap2.filter($"is_current").count() == 3)
    assert(snap2.filter($"id" === 1L).count() == 2)
    assert(snap2.filter($"id" === 1L && $"is_current")
      .select("city").as[String].head() == "BOSTON")

    // third run with NO new files: checkpoint prevents re-merging
    val q3 = StreamingMerge.continuous(spark, staging, schema, dim, ckpt,
      Seq("id"), Seq("name", "city"), ts)
    q3.awaitTermination()
    val snap3 = StreamingMerge.snapshot(spark, dim).get
    assert(snap3.count() == 4, "re-run without new files must be a no-op")
  }
}
