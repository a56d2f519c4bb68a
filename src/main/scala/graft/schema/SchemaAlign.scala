package graft.schema

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema alignment — the reference pipeline's one nontrivial semantic:
  * Snowflake `COPY INTO … MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE`
  * (/root/reference/modules/snowflake.py:150) resolves incoming record
  * keys against the declared table DDL ignoring case, casts each value
  * to the DDL type, and fills unmatched DDL columns with NULL; extra
  * incoming columns are dropped.
  *
  * Implemented as a pure projection (`select` of `cast` columns): a
  * narrow, codegen'd, shuffle-free plan — alignment costs nothing extra
  * at any scale. Coercion uses `try_cast` (null-on-failure even with
  * `spark.sql.ansi.enabled=true`, Spark 4's default), matching Snowflake
  * COPY's permissive coercion; pair with [[castFailure]] for COPY's
  * `ON_ERROR` abort behavior.
  */
object SchemaAlign {
  /** Thrown when two source columns collide on the same target column
    * case-insensitively (Snowflake COPY errors on ambiguous matches). */
  final class AmbiguousColumnException(msg: String)
    extends IllegalArgumentException(msg)

  def apply(df: DataFrame, target: StructType,
            caseInsensitive: Boolean = true): DataFrame = {
    def norm(s: String): String =
      if (caseInsensitive) s.toLowerCase(Locale.ROOT) else s
    val bySource: Map[String, Seq[String]] =
      df.columns.toSeq.groupBy(norm)
    val cols: Seq[Column] = target.fields.toSeq.map { f =>
      bySource.get(norm(f.name)) match {
        case Some(Seq(one)) => col(one).try_cast(f.dataType).as(f.name)
        case Some(many) =>
          throw new AmbiguousColumnException(
            s"columns ${many.mkString(", ")} all match target '${f.name}'")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** Predicate marking rows with at least one coercion failure: a
    * non-null source value that casts to null under the target type.
    * Load paths implementing COPY's default `ON_ERROR` (abort the file)
    * filter on this and refuse the batch if any row matches; permissive
    * paths keep the nulls (Snowflake `ON_ERROR=CONTINUE` analog). */
  def castFailure(df: DataFrame, target: StructType,
                  caseInsensitive: Boolean = true): Column = {
    def norm(s: String): String =
      if (caseInsensitive) s.toLowerCase(Locale.ROOT) else s
    val bySource = df.columns.toSeq.groupBy(norm)
    val checks = target.fields.toSeq.flatMap { f =>
      bySource.get(norm(f.name)) match {
        case Some(Seq(one)) =>
          Some(col(one).isNotNull && col(one).try_cast(f.dataType).isNull)
        case _ => None
      }
    }
    checks.reduceOption(_ || _).getOrElse(lit(false))
  }

  /** Array of target column names whose value fails coercion on this
    * row — the per-row diagnosis an error table records (Snowflake's
    * COPY validation gives rejected rows a reason; this is the
    * engine-side analog). Same predicate per column as [[castFailure]],
    * still a pure codegen'd projection. */
  def failedColumns(df: DataFrame, target: StructType,
                    caseInsensitive: Boolean = true): Column = {
    import org.apache.spark.sql.functions.{array, array_compact, when}
    def norm(s: String): String =
      if (caseInsensitive) s.toLowerCase(Locale.ROOT) else s
    val bySource = df.columns.toSeq.groupBy(norm)
    val tags = target.fields.toSeq.flatMap { f =>
      bySource.get(norm(f.name)) match {
        case Some(Seq(one)) =>
          Some(when(col(one).isNotNull &&
            col(one).try_cast(f.dataType).isNull, lit(f.name)))
        case _ => None
      }
    }
    if (tags.isEmpty) array().cast("array<string>")
    else array_compact(array(tags: _*))
  }
}
