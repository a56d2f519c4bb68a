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
  /** The data-file rename is atomic, but Hadoop's LOCAL filesystem
    * keeps a SEPARATE `.crc` sidecar — a reader concurrent with the
    * repoint (the commit-log streaming source polls `getOffset` from
    * its own thread) can catch new data under the old sidecar and get
    * a transient ChecksumException. Local-fs-only (HDFS/object stores
    * have no sidecars), so a short bounded retry is the fix — NOT
    * disabling verification, which is a shared-FileSystem-wide
    * setting. */
  private val ReadRetries = 8

  def read(spark: SparkSession, dir: String, name: String): Option[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(dir, name)
    def once(): Option[String] =
      if (!fs.exists(mf)) None
      else {
        val in = fs.open(mf)
        try Some(scala.io.Source.fromInputStream(in).mkString.trim)
        finally in.close()
      }
    var attempt = 0
    while (true) {
      try return once()
      catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
                  _: java.io.FileNotFoundException) =>
          attempt += 1
          if (attempt > ReadRetries) throw e
          Thread.sleep(10L << math.min(attempt, 5))
      }
    }
    None // unreachable
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
