package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV landing-zone source — the Spark-native shape of the reference's
  * Glue crawler + catalog scan
  * (/root/reference/modules/glue.py:87-97, glue/glue_job.py:22-26):
  *
  *  - [[infer]] plays the crawler: walk the landing dir (only `.csv`
  *    objects, the reference's suffix contract at __main__.py:69),
  *    infer header + types, register the table in the session catalog.
  *  - [[read]] plays the catalog scan: fixed-schema read, no second
  *    inference pass — at scale inference samples the data once and
  *    every subsequent read is schema'd.
  *
  * Dirty-row handling (the DynamicFrame role): PERMISSIVE mode with a
  * `_corrupt_record` column via [[readPermissive]].
  */
object CsvSource {
  val CsvGlob = "*.csv"

  /** Crawler analog: infer schema over the landing dir and register the
    * result as `tableName` in the session catalog. Returns the schema. */
  def infer(spark: SparkSession, landingDir: String,
            tableName: String): StructType = {
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("pathGlobFilter", CsvGlob)
      .csv(landingDir)
    df.createOrReplaceTempView(tableName)
    df.schema
  }

  /** Catalog-scan analog: schema'd read (no inference pass). */
  def read(spark: SparkSession, landingDir: String,
           schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("pathGlobFilter", CsvGlob)
      .schema(schema)
      .csv(landingDir)

  /** PERMISSIVE read capturing unparseable lines in `_corrupt_record`. */
  def readPermissive(spark: SparkSession, landingDir: String,
                     schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    spark.read
      .option("header", "true")
      .option("pathGlobFilter", CsvGlob)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(landingDir)
  }
}
