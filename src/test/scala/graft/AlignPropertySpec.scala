package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.schema.SchemaAlign

/** Property-based checks (SURVEY.md §5 #4): schema alignment must be
  * invariant under arbitrary permutations and case-manglings of the
  * incoming columns — the exact degrees of freedom Snowflake COPY's
  * MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE absorbs.
  */
class AlignPropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val target = StructType(Seq(
    StructField("customerid", LongType),
    StructField("namestyle", BooleanType),
    StructField("firstname", StringType),
    StructField("modifieddate", TimestampType)))

  private val baseNames = Seq("CustomerID", "NameStyle", "FirstName",
    "ModifiedDate")
  private val baseVals = Seq("42", "FALSE", "Ada", "2005-08-01 00:00:00")

  private def mangle(name: String, mask: Seq[Boolean]): String =
    name.zipWithIndex.map { case (c, i) =>
      if (mask(i % mask.length)) c.toUpper else c.toLower
    }.mkString

  test("align is invariant to column order and case (property)") {
    val genCase = Gen.nonEmptyListOf(Gen.oneOf(true, false))
    val prop = Prop.forAll(genCase, Gen.choose(0L, Long.MaxValue)) {
      (mask, seed) =>
        val rnd = new scala.util.Random(seed)
        val order = rnd.shuffle(baseNames.indices.toList)
        val names = order.map(i => mangle(baseNames(i), mask))
        val vals = order.map(baseVals)
        val src = spark.createDataFrame(
          Seq(Row(vals: _*)).asJava,
          StructType(names.map(StructField(_, StringType))))
        val out = SchemaAlign(src, target).collect().head
        out.getLong(0) == 42L && !out.getBoolean(1) &&
          out.getString(2) == "Ada" &&
          out.getTimestamp(3).toString == "2005-08-01 00:00:00.0" &&
          SchemaAlign(src, target).columns.toSeq == target.fieldNames.toSeq
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("align row count is preserved for arbitrary row multiplicity") {
    val prop = Prop.forAll(Gen.choose(0, 50)) { n =>
      val rows = (0 until n).map(i =>
        Row(i.toString, "TRUE", s"name$i", "2020-01-01 00:00:00"))
      val src = spark.createDataFrame(rows.asJava,
        StructType(baseNames.map(StructField(_, StringType))))
      SchemaAlign(src, target).count() == n
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
