package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, to_json}

/** Shared fixture plumbing for the load-lifecycle oracle queries
  * (q81–q84, st24/st25): stage one wave of rows as ONE JSON-lines file
  * in the staging dir a warehouse load consumes — the
  * write-scratch-then-rename arrival pattern, implemented once so the
  * call sites cannot drift (empty-wave handling, staging mkdirs,
  * single-file contract).
  */
object Fixtures {
  /** Write `rows` (all of its columns, JSON-lines) as the single
    * staged file `stagingDir/name`, via a scratch dir under `root`. */
  def stageJsonWave(s: SparkSession, root: String, stagingDir: String,
                    name: String, rows: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val scratch = s"$root/.wave-$name"
    rows.select(to_json(struct(rows.columns.map(col): _*)).as("value"))
      .coalesce(1).write.mode("overwrite").text(scratch)
    val parts = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$scratch/part-*"))
    require(parts.nonEmpty, s"wave '$name' wrote no part file")
    fs.mkdirs(new org.apache.hadoop.fs.Path(stagingDir))
    fs.rename(parts.head.getPath,
      new org.apache.hadoop.fs.Path(s"$stagingDir/$name"))
  }
}
