package graft.schema

import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, count_if}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Schema-drift audit for the load leg — the highest-frequency
  * operational event the reference's COPY semantics
  * (`MATCH_BY_COLUMN_NAME`, /root/reference/modules/snowflake.py:150)
  * leave silent: an upstream producer adds a key ([[SchemaAlign]]
  * drops it), stops sending one (typed nulls), or starts sending
  * values the DDL type no longer coerces (permissive loads null them).
  * Snowflake operators answer with DDL evolution; this is the
  * engine-side analog — a drift REPORT (what changed, how many values
  * broke) plus an EVOLVED target schema for opt-in auto-addition of
  * new nullable columns.
  *
  * Classification is DATA-driven, not name-driven, matching COPY: a
  * source column whose observed JSON type differs from the DDL type is
  * still `matched` as long as every value coerces (JSON carries dates
  * as strings forever — that is not drift); it is `retyped` exactly
  * when at least one non-null value fails `try_cast` to the declared
  * type, with the failing-value count reported.
  *
  * Cost shape: one schema-inference pass over the staging root (sample
  * it with `samplingRatio` at scale) plus ONE narrow aggregate job —
  * a single `count_if` per matched column, map-side combined to one
  * row; the report itself is schema-width-sized, never data-sized.
  */
object SchemaDrift {
  private def norm(s: String): String = s.toLowerCase(Locale.ROOT)

  private val reportSchema = StructType(Seq(
    StructField("col_name", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("observed_type", StringType, nullable = true),
    StructField("declared_type", StringType, nullable = true),
    StructField("n_bad", LongType, nullable = false)))

  /** The drift report: one row per source or target column —
    * (col_name, kind ∈ {matched, retyped, new, missing, ambiguous},
    * observed_type, declared_type, n_bad). `retyped` counts the rows
    * whose value fails coercion; `new` columns use their source
    * spelling, everything else the DDL spelling. */
  def report(spark: SparkSession, stagingDir: String, target: StructType,
             samplingRatio: Double = 1.0): DataFrame = {
    // Natural-typed inference (NOT primitivesAsString): the observed
    // type column should say what the JSON actually carries now.
    val observed = spark.read
      .option("samplingRatio", samplingRatio.toString)
      .json(stagingDir)
    val obsFields = observed.schema.fields.toSeq
    val byTarget: Map[String, Seq[StructField]] =
      obsFields.groupBy(f => norm(f.name))

    val matched = target.fields.toSeq.flatMap { t =>
      byTarget.get(norm(t.name)) match {
        case Some(Seq(one)) => Some((t, one))
        case _ => None
      }
    }
    // ONE aggregate job: per matched column, how many non-null values
    // fail coercion to the declared type.
    val badCounts: Map[String, Long] =
      if (matched.isEmpty) Map.empty
      else {
        val aggs = matched.map { case (t, o) =>
          // A structurally uncastable pair (observed struct/array vs a
          // scalar DDL type — upstream turned a number into an object)
          // makes try_cast UNRESOLVABLE: building it would crash the
          // report with an AnalysisException on exactly the drift it
          // exists to diagnose. Every non-null value of such a column
          // fails coercion by definition.
          val failing =
            if (org.apache.spark.sql.catalyst.expressions.Cast
                .canAnsiCast(o.dataType, t.dataType))
              col(o.name).isNotNull &&
                col(o.name).try_cast(t.dataType).isNull
            else col(o.name).isNotNull
          count_if(failing).as(t.name)
        }
        val row = observed.agg(aggs.head, aggs.tail: _*).head()
        matched.map { case (t, _) =>
          t.name -> row.getAs[Long](t.name)
        }.toMap
      }

    val targetRows = target.fields.toSeq.map { t =>
      byTarget.get(norm(t.name)) match {
        case Some(Seq(one)) =>
          val nBad = badCounts.getOrElse(t.name, 0L)
          Row(t.name, if (nBad > 0) "retyped" else "matched",
            one.dataType.simpleString, t.dataType.simpleString, nBad)
        case Some(_) =>
          Row(t.name, "ambiguous", null, t.dataType.simpleString, 0L)
        case None =>
          Row(t.name, "missing", null, t.dataType.simpleString, 0L)
      }
    }
    val targetNames = target.fields.map(f => norm(f.name)).toSet
    val newRows = obsFields.filterNot(f => targetNames(norm(f.name)))
      .map(f => Row(f.name, "new", f.dataType.simpleString, null, 0L))

    import scala.jdk.CollectionConverters._
    spark.createDataFrame((targetRows ++ newRows).asJava, reportSchema)
      .orderBy("col_name")
  }

  /** The evolved DDL: the declared target plus every `new` source
    * column appended as a nullable field of its observed type (sorted
    * by name for determinism) — pass it straight to a
    * [[graft.load.WarehouseLoad]] load to auto-add the columns, the
    * opt-in evolution mode of Snowflake's `ALTER TABLE ADD COLUMN`
    * operational response. Existing declared types are never changed
    * by evolution — a `retyped` column is a quarantine/fix decision,
    * not an auto-widen (silently widening the DDL because bad values
    * showed up would make the error invisible). */
  def evolve(spark: SparkSession, stagingDir: String, target: StructType,
             samplingRatio: Double = 1.0): StructType = {
    val observed = spark.read
      .option("samplingRatio", samplingRatio.toString)
      .json(stagingDir).schema
    val targetNames = target.fields.map(f => norm(f.name)).toSet
    val fresh = observed.fields.toSeq
      .filterNot(f => targetNames(norm(f.name)))
      .sortBy(_.name)
      .map(f => StructField(f.name, f.dataType, nullable = true))
    StructType(target.fields.toSeq ++ fresh)
  }
}
