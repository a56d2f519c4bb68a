package graft.load

import org.apache.spark.sql.SparkSession

/** Write-temp + atomic-rename manifest — the single commit primitive
  * behind every exactly-once story in this package ([[StreamingMerge]]'s
  * snapshot repoint, [[WarehouseLoad.batchIdempotent]]'s batch commit):
  * readers resolve the manifest first, so any number of data/metadata
  * files can be staged invisibly and made visible in ONE atomic rename
  * — the poor-man's transaction log Delta/Iceberg formalize.
  *
  * `FileSystem.rename` refuses existing destinations (silently!);
  * `FileContext` supports the atomic-overwrite rename a repoint needs.
  */
object AtomicManifest {
  def read(spark: SparkSession, dir: String, name: String): Option[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(dir, name)
    if (!fs.exists(mf)) None
    else {
      val in = fs.open(mf)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim)
      finally in.close()
    }
  }

  def write(spark: SparkSession, dir: String, name: String,
            content: String): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dirPath)) fs.mkdirs(dirPath)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(tmp.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(dir, name),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
