package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import graft.sources.CsvSource

/** Dirty-row handling (SURVEY.md §2.1 S3 — the DynamicFrame role):
  * PERMISSIVE CSV reads capture unparseable lines in `_corrupt_record`
  * instead of failing the scan, and clean rows parse normally.
  */
class CsvSourceSpec extends SparkSpec {
  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("flag", BooleanType),
    StructField("name", StringType)))

  test("readPermissive captures malformed rows in _corrupt_record") {
    val dir = tmpDir("graft-dirty-")
    Files.writeString(Paths.get(dir, "mixed.csv"),
      """id,flag,name
        |1,true,alice
        |notanumber,true,bob
        |2,notabool,dave
        |3,true,carol
        |""".stripMargin)
    val df = CsvSource.readPermissive(spark, dir, schema)
    assert(df.columns.contains("_corrupt_record"))
    val rows = df.collect()
    val corrupt = rows.filter(!_.isNullAt(3))
    // both type-unparseable rows are captured verbatim…
    assert(corrupt.length == 2,
      s"expected 2 corrupt rows, got: ${corrupt.mkString("; ")}")
    assert(corrupt.exists(_.getString(3).startsWith("notanumber")))
    // …and the clean rows parse with their types
    val clean = rows.filter(_.isNullAt(3))
    assert(clean.map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("schema'd read still skips non-csv files (suffix contract)") {
    val dir = tmpDir("graft-glob-")
    Files.writeString(Paths.get(dir, "good.csv"), "id,flag,name\n7,true,x\n")
    Files.writeString(Paths.get(dir, "ignored.txt"), "id,flag,name\n8,true,y\n")
    val df = CsvSource.read(spark, dir, schema)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(7L))
  }
}
