package graft

import org.apache.spark.sql.types._
import graft.sources.{Events, Tables}

/** Fail-fast contract on the driver-generated testdata: round 8 broke
  * because the producer regenerated `events.parquet` with a different
  * physical timestamp encoding and the engine only discovered it via
  * wrong answers downstream. This spec pins, for every table, the
  * column NAME set and the TYPE FAMILY each reader is built to absorb
  * — so the next regeneration that drifts outside the tolerated
  * families fails here, in one diagnostic line naming the table and
  * column, before any query computes garbage.
  *
  * Type families are deliberately wide where the engine adapts
  * (timestamps may arrive as TIMESTAMP / TIMESTAMP_NTZ / int64 ticks —
  * Events.normalizeTs handles all three; integer keys may widen or
  * narrow) and exact where a change would be semantic (text columns,
  * the embedding array).
  */
class TestdataContractSpec extends SparkSpec {

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val timeline: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType, LongType)
  private def exact(t: DataType): Set[DataType] = Set(t)

  /** table -> (column -> tolerated type family) */
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> integral, "r_name" -> exact(StringType)),
    "nation" -> Map(
      "n_nationkey" -> integral, "n_name" -> exact(StringType),
      "n_regionkey" -> integral),
    "customer" -> Map(
      "c_custkey" -> integral, "c_name" -> exact(StringType),
      "c_nationkey" -> integral, "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> integral, "s_name" -> exact(StringType),
      "s_nationkey" -> integral, "s_acctbal" -> exact(DoubleType)),
    "part" -> Map(
      "p_partkey" -> integral, "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> integral, "p_retailprice" -> exact(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> exact(StringType),
      "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> timeline, "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> exact(DoubleType),
      "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType),
      "l_linestatus" -> exact(StringType), "l_shipdate" -> timeline),
    "events" -> Map(
      "event_id" -> integral, "ts" -> timeline, "user_id" -> integral,
      "event_type" -> exact(StringType), "value" -> exact(DoubleType),
      "props" -> exact(StringType)),
    "documents" -> Map(
      "doc_id" -> integral, "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> integral),
    "embeddings" -> Map(
      "vec_id" -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, true),
        ArrayType(FloatType, false)),
      "label" -> integral))

  test("every testdata table matches its column/type-family contract") {
    Events.ensureNanosCompat(spark)
    val violations = Tables.all.flatMap { t =>
      val schema = Tables.table(spark, sf0001, t).schema
      val expected = contract(t)
      val nameDrift =
        (expected.keySet -- schema.fieldNames.toSet)
          .map(c => s"$t.$c: column MISSING from the regenerated file") ++
        (schema.fieldNames.toSet -- expected.keySet)
          .map(c => s"$t.$c: NEW column the contract does not know")
      val typeDrift = schema.fields.toSeq
        .filter(f => expected.contains(f.name))
        .filterNot(f => expected(f.name).contains(f.dataType))
        .map(f => s"$t.${f.name}: type ${f.dataType.simpleString} outside " +
          s"the tolerated family ${expected(f.name).map(_.simpleString)}")
      nameDrift.toSeq ++ typeDrift
    }
    assert(violations.isEmpty,
      "testdata drifted outside the engine's adaptive range — fix the " +
        "affected reader (Events.normalizeTs is the template) and widen " +
        s"this contract:\n  ${violations.mkString("\n  ")}")
  }
}
