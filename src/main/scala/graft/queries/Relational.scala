package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.{Events, Tables}
import Num._

/** Core relational operator surface (SURVEY.md §2.3–§2.7).
  *
  * Every query here is a declarative DataFrame plan — no collect, no
  * driver-side loops — so Catalyst gets full freedom: filters and
  * projections push into the parquet scans, small dimension tables are
  * explicitly `broadcast`, and wide aggregations run as partial+final
  * hash aggregates. Each query carries its DuckDB oracle SQL right next
  * to it; column names and types are aligned on both sides because the
  * driver's compare hashes (column-name-sorted) values.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q01
  // TPC-H Q1-shaped pricing summary: scan → filter → hash agg.
  // At scale: single shuffle on the (tiny-cardinality) grouping keys,
  // map-side partial aggregation does almost all the work.
  val q01: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q01Sql: String = s"""
    SELECT l_returnflag, l_linestatus,
           ${sqlDsum("l_quantity")} AS sum_qty,
           ${sqlDsum("l_extendedprice")} AS sum_base_price,
           ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
           ${sqlDavg("l_quantity")} AS avg_qty,
           ${sqlDavg("l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus"""

  // ---------------------------------------------------------------- q02
  // Filter + projection; predicates and the 4-column ReadSchema push
  // down into the parquet scan (verified via .explain in the spec).
  val q02: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
              col("l_discount").between(0.02, 0.06) &&
              col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"),
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))

  val q02Sql: String = """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24"""

  // ---------------------------------------------------------------- q03
  // Fact ⋈ dimension. `customer` grows with scale factor, so the
  // broadcast is size-guarded (Hints.broadcastIfSmall): hinted at
  // test/bench scale — no shuffle of `orders` — and left to the
  // planner (sort-merge + AQE) once the estimate exceeds the
  // threshold; grouping shuffle is on 5 keys either way.
  val q03: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(Hints.broadcastIfSmall(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(dsum(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("n_orders"))
  }

  val q03Sql: String = s"""
    SELECT c_mktsegment, ${sqlDsum("o_totalprice")} AS revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment"""

  // ---------------------------------------------------------------- q04
  // TPC-H Q5-shaped star join: one big fact (lineitem) against a chain
  // of dimensions. nation/region are bounded → unconditional broadcast;
  // customer scales → size-guarded hint (falls back to shuffle join
  // above the threshold, where the lineitem⋈orders shuffle dominates
  // anyway).
  val q04: Q = (s, d) => {
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(Hints.broadcastIfSmall(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name") === "ASIA" &&
              o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              o("o_orderdate") <  lit("1999-01-01").cast("timestamp"))
      .groupBy(n("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q04Sql: String = s"""
    SELECT n_name, ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name"""

  // ---------------------------------------------------------------- q05
  // Semi join (EXISTS): customers having at least one big order.
  val q05: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val q05Sql: String = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"""

  // ---------------------------------------------------------------- q06
  // Anti join (NOT EXISTS): customers with no January-1995 orders.
  val q06: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1995-02-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  val q06Sql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                        AND o.o_orderdate <  TIMESTAMP '1995-02-01 00:00:00')
    GROUP BY c_mktsegment"""

  // ---------------------------------------------------------------- q07
  // Distinct aggregates. countDistinct plans as a two-phase expand +
  // agg — fine at scale because the distinct keys shuffle partially
  // aggregated.
  val q07: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))

  val q07Sql: String = """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag"""

  // ---------------------------------------------------------------- q08
  // ROLLUP grouping sets.
  val q08: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n"))

  val q08Sql: String = s"""
    SELECT l_returnflag, l_linestatus, ${sqlDsum("l_quantity")} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

  // ---------------------------------------------------------------- q09
  // CUBE grouping sets.
  val q09: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("sum_price"),
           count(lit(1)).as("n"))

  val q09Sql: String = s"""
    SELECT o_orderstatus, o_orderpriority,
           ${sqlDsum("o_totalprice")} AS sum_price, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""

  // ---------------------------------------------------------------- q10
  // Ranking window: top-3 orders per market segment. The tie-break on
  // o_orderkey makes row_number deterministic across engines.
  val q10: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val joined =
      o.join(Hints.broadcastIfSmall(c), o("o_custkey") === c("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  val q10Sql: String = """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey) t
    WHERE rn <= 3"""

  // ---------------------------------------------------------------- q11
  // Analytic window: per-customer running total + lag. Explicit ROWS
  // frame and decimal quantization keep both engines bit-identical.
  val q11: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("running_spend",
        dsumExpr(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
              col("running_spend"), col("prev_price"))
  }

  val q11Sql: String = """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           LAG(o_totalprice, 1) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
             AS prev_price
    FROM orders"""

  // ---------------------------------------------------------------- q12
  // Global top-k: Spark plans TakeOrderedAndProject (no full sort at
  // scale — per-partition heaps, then a k-row merge on the driver).
  val q12: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q12Sql: String = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""

  // ---------------------------------------------------------------- q13
  // Set op INTERSECT: customers active in both 1995 and 1998.
  val q13: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def active(y: Int) = o
      .filter(col("o_orderdate") >= lit(f"$y-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit(f"${y + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    active(1995).intersect(active(1998))
  }

  val q13Sql: String = """
    SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'"""

  // ---------------------------------------------------------------- q14
  // Set op EXCEPT: parts not shipped during the first half of 1995.
  val q14: Q = (s, d) =>
    Tables.part(s, d).select(col("p_partkey"))
      .except(Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1995-07-01").cast("timestamp"))
        .select(col("l_partkey").as("p_partkey")))

  val q14Sql: String = """
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-07-01 00:00:00'"""

  // ---------------------------------------------------------------- q15
  // String function family over part names.
  val q15: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_name").like("%widget%") || col("p_name").like("%anvil%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        regexp_replace(col("p_name"), lit("widget"), lit("gadget")).as("renamed"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 3).as("prefix3"))

  val q15Sql: String = """
    SELECT p_partkey, UPPER(p_name) AS name_upper, LENGTH(p_name) AS name_len,
           SPLIT_PART(p_name, ' ', 1) AS first_word,
           REGEXP_REPLACE(p_name, 'widget', 'gadget') AS renamed,
           CONCAT_WS('/', p_brand, p_type) AS brand_type,
           SUBSTRING(p_name, 1, 3) AS prefix3
    FROM part
    WHERE p_name LIKE '%widget%' OR p_name LIKE '%anvil%'"""

  // ---------------------------------------------------------------- q16
  // Date/time function family: calendar rollup of order volume.
  val q16: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("o_year"),
               month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("revenue"))

  val q16Sql: String = s"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS revenue
    FROM orders GROUP BY 1, 2"""

  // ---------------------------------------------------------------- q17
  // Conditional expressions: CASE bucketing of order value.
  val q17: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("bucket",
        when(col("o_totalprice") < 10000, "small")
          .when(col("o_totalprice") < 100000, "mid")
          .otherwise("large"))
      .groupBy(col("bucket"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           dsum(col("o_totalprice")).as("total"))

  val q17Sql: String = s"""
    SELECT CASE WHEN o_totalprice < 10000 THEN 'small'
                WHEN o_totalprice < 100000 THEN 'mid'
                ELSE 'large' END AS bucket,
           o_orderstatus, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
    FROM orders GROUP BY 1, 2"""

  // ---------------------------------------------------------------- q18
  // Semi-structured extraction: events.props is a JSON string; parse it
  // with from_json (schema'd, codegen-friendly) and aggregate.
  val q18: Q = (s, d) =>
    Events.read(s, d)
      .withColumn("k",
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).cast("long").as("sum_k"),
           (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"),
           count(when(col("k") > 50, 1)).as("n_high"))

  val q18Sql: String = """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k,
           COUNT(CASE WHEN k > 50 THEN 1 END) AS n_high
    FROM (SELECT event_type,
                 TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          FROM events) t
    GROUP BY event_type"""

  // ---------------------------------------------------------------- q19
  // Event-time tumbling window (batch-expressible as date_trunc so the
  // oracle can check it; the streaming twin lives in queries.Streamed).
  val q19: Q = (s, d) =>
    Events.read(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))

  val q19Sql: String = s"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           COUNT(*) AS n, ${sqlDsum("value")} AS total_value
    FROM events GROUP BY 1, 2"""

  // ---------------------------------------------------------------- q20
  // Sessionization: 30-minute inactivity gap, assigned with a
  // lag → flag → running-count window cascade (pure window functions,
  // one shuffle on user_id; scales linearly with events per user).
  val q20: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Events.read(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("duration_sec"),
           dsum(col("value")).as("session_value"))
  }

  val q20Sql: String = s"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             LAG(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_es
      FROM events),
    sessions AS (
      SELECT user_id, value, es,
             SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 1800
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM flagged)
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MAX(es) - MIN(es) AS duration_sec,
           ${sqlDsum("value")} AS session_value
    FROM sessions GROUP BY user_id, session_idx"""

  // ---------------------------------------------------------------- q21
  // Join against a derived aggregate (decorrelated "above own average"):
  // the per-customer average is an exact decimal, so the > comparison is
  // engine-stable.
  val q21: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val avgs = o.groupBy(col("o_custkey").as("k"))
      .agg(davg(col("o_totalprice")).as("avg_price"))
    o.join(avgs, o("o_custkey") === avgs("k"))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above_avg"))
  }

  val q21Sql: String = s"""
    WITH avgs AS (
      SELECT o_custkey AS k, ${sqlDavg("o_totalprice")} AS avg_price
      FROM orders GROUP BY o_custkey)
    SELECT o_orderstatus, COUNT(*) AS n_above_avg
    FROM orders JOIN avgs ON o_custkey = k
    WHERE o_totalprice > avg_price
    GROUP BY o_orderstatus"""

  // ---------------------------------------------------------------- q22
  // LEFT OUTER join: every customer, order count/spend including the
  // order-less (count of the right key is 0 for unmatched rows). The big
  // side (orders) stays shuffled on the join key — at scale this is a
  // sort-merge join; nothing here is broadcastable by design.
  val q22: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"), c("c_mktsegment"))
      .agg(count(o("o_orderkey")).as("n_orders"),
           coalesce(dsum(o("o_totalprice")), lit(0.0)).as("spend"))
  }

  val q22Sql: String = s"""
    SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders,
           COALESCE(${sqlDsum("o_totalprice")}, 0.0) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY 1, 2"""

  // ---------------------------------------------------------------- q23
  // FULL OUTER join of two daily aggregates: days with orders but no
  // heavy shipments (and vice versa) survive with nulls on the missing
  // side. The using-column join coalesces the key automatically.
  val q23: Q = (s, d) => {
    val od = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(count(lit(1)).as("n_orders"))
    val ld = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 48)
      .groupBy(to_date(col("l_shipdate")).as("dt"))
      .agg(count(lit(1)).as("n_heavy_ships"))
    od.join(ld, Seq("dt"), "full")
  }

  val q23Sql: String = """
    WITH od AS (SELECT CAST(o_orderdate AS DATE) AS dt, COUNT(*) AS n_orders
                FROM orders GROUP BY 1),
    ld AS (SELECT CAST(l_shipdate AS DATE) AS dt, COUNT(*) AS n_heavy_ships
           FROM lineitem WHERE l_quantity >= 48 GROUP BY 1)
    SELECT COALESCE(od.dt, ld.dt) AS dt, n_orders, n_heavy_ships
    FROM od FULL JOIN ld ON od.dt = ld.dt"""

  // ---------------------------------------------------------------- q24
  // Range (theta) join: orders against literal price bands — a non-equi
  // condition, planned as BroadcastNestedLoopJoin with the 3-row band
  // table broadcast (the only sane side to broadcast; the fact table
  // streams through untouched).
  val q24: Q = (s, d) => {
    import s.implicits._
    val bands = Seq(
      ("small", 0d, 10000d),
      ("mid", 10000d, 100000d),
      ("large", 100000d, 1e12)).toDF("band", "lo", "hi")
    Tables.orders(s, d)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
  }

  val q24Sql: String = s"""
    SELECT band, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
    FROM orders
    JOIN (VALUES ('small', 0.0, 10000.0), ('mid', 10000.0, 100000.0),
                 ('large', 100000.0, 1e12)) b(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band"""

  // ---------------------------------------------------------------- q25
  // AS-OF join (event enrichment): each purchase picks up the most
  // recent click at-or-before it, per user. Spark has no asof primitive;
  // the scalable shape is the union + last(ignoreNulls) window trick
  // (SURVEY §2.4): one shuffle on user_id, linear in events per user —
  // never a per-row range probe. Markers sort before targets at equal ts
  // (src 0 < 1) so "at or before" includes same-instant clicks; event_id
  // breaks residual ties deterministically.
  val q25: Q = (s, d) => {
    val e = Events.read(s, d)
    val markers = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("eid"),
              lit(0).as("src"), col("ts").as("mk_ts"),
              col("value").as("mk_value"))
    val targets = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("eid"),
              lit(1).as("src"), lit(null).cast("timestamp").as("mk_ts"),
              lit(null).cast("double").as("mk_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("src").asc, col("eid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    markers.union(targets)
      .withColumn("asof_ts", last(col("mk_ts"), ignoreNulls = true).over(w))
      .withColumn("asof_value",
        last(col("mk_value"), ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      .select(col("user_id"), col("eid").as("event_id"), col("ts"),
              col("asof_ts"), col("asof_value"))
  }

  val q25Sql: String = """
    SELECT t.user_id, t.event_id, t.ts, m.ts AS asof_ts, m.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') t
    LEFT JOIN LATERAL (
      SELECT ts, value FROM events m
      WHERE m.user_id = t.user_id AND m.event_type = 'click'
        AND m.ts <= t.ts
      ORDER BY m.ts DESC, m.event_id DESC LIMIT 1) m ON TRUE"""

  // ---------------------------------------------------------------- q26
  // UNION ALL (Spark `union`) of two branch selections, then aggregate:
  // customers active in either year, counted with multiplicity.
  val q26: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def yr(y: Int) = o
      .filter(col("o_orderdate") >= lit(f"$y-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit(f"${y + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    yr(1995).union(yr(1998))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders_both_years"))
  }

  val q26Sql: String = """
    SELECT o_custkey, COUNT(*) AS n_orders_both_years
    FROM (SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
          UNION ALL
          SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00') u
    GROUP BY o_custkey"""

  // ---------------------------------------------------------------- q27
  // approx_count_distinct (HyperLogLog++). The sketch value itself is
  // engine-specific, so the oracle-checkable output is the *contract*:
  // the estimate lands within 3× the configured relative standard
  // deviation of the exact count (deterministic for fixed data — Spark's
  // HLL is seedless). The bound is 3×rsd, not rsd itself: 0.05 is a
  // standard deviation, so ~1/3 of cardinalities legitimately err past
  // it; 3σ holds across scale factors and fixture changes. At 100 TB the
  // sketch replaces the exact distinct's full shuffle with a
  // constant-size partial aggregate.
  val q27: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
           (abs(approx_count_distinct(col("l_partkey"), 0.05) -
                countDistinct(col("l_partkey"))).cast("double") /
             countDistinct(col("l_partkey")) <= 0.15).as("hll_within_3rsd"))

  val q27Sql: String = """
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_within_3rsd
    FROM lineitem GROUP BY l_returnflag"""

  // ---------------------------------------------------------------- q28
  // Ranking-family completeness: rank, dense_rank, ntile, lead and
  // first_value over one window (unique tie-break ⇒ engine-stable).
  val q28: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val joined =
      o.join(Hints.broadcastIfSmall(c), o("o_custkey") === c("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    joined
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("top_price"))
      .filter(col("rnk") <= 20)
  }

  val q28Sql: String = """
    SELECT * FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS quartile,
             LEAD(o_totalprice, 1) OVER w AS next_price,
             FIRST_VALUE(o_totalprice) OVER (
               PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey ASC)) t
    WHERE rnk <= 20"""

  // ---------------------------------------------------------------- q29
  // RIGHT OUTER join: all suppliers, heavy-shipment stats, zero rows
  // kept. (Symmetric to q22's left outer; registered separately so the
  // right-outer path is exercised and oracle-checked in its own plan.)
  val q29: Q = (s, d) => {
    val l = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
    val sup = Tables.supplier(s, d)
    l.join(sup, l("l_suppkey") === sup("s_suppkey"), "right")
      .groupBy(sup("s_suppkey"), sup("s_nationkey"))
      .agg(count(l("l_orderkey")).as("n_heavy_items"),
           coalesce(dsum(l("l_extendedprice")), lit(0.0)).as("heavy_revenue"))
  }

  val q29Sql: String = s"""
    SELECT s_suppkey, s_nationkey, COUNT(l_orderkey) AS n_heavy_items,
           COALESCE(${sqlDsum("l_extendedprice")}, 0.0) AS heavy_revenue
    FROM (SELECT * FROM lineitem WHERE l_quantity >= 45) l
      RIGHT JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1, 2"""

  // ---------------------------------------------------------------- q30
  // GROUPING SETS through the SQL front-end (`spark.sql` over a temp
  // view): the grouping-set expansion Spark plans as a single Expand +
  // aggregate, same engine path as rollup/cube but with an explicit set
  // list. grouping_id() disambiguates the null-vs-grouped rows.
  val q30: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(s"""
      SELECT l_returnflag, l_linestatus,
             ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
             CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
      FROM lineitem_v
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
  }

  val q30Sql: String = s"""
    SELECT l_returnflag, l_linestatus,
           ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
           CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""

  // ---------------------------------------------------------------- q31
  // Salted two-stage aggregation — the standard skew treatment when a
  // handful of hot keys would overload single reducers: stage 1
  // aggregates on (key, salt) spreading each hot key over 16 reducers,
  // stage 2 merges the 16 partials per key. Decimal-quantized sums make
  // the two-stage result bit-identical to a direct groupBy, which is
  // exactly what the oracle checks. (events has 5 hot event_types over
  // 10k+ rows — the canonical skew shape.)
  val q31: Q = (s, d) => {
    val salted = Events.read(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), dsumExpr(col("value")).as("pv"))
    salted
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("pv")).cast("double").as("total_value"))
  }

  val q31Sql: String = s"""
    SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
    FROM events GROUP BY event_type"""

  // ---------------------------------------------------------------- q32
  // Statistical aggregates from exact moments: n, Σx and Σx² accumulate
  // as decimals (associative → partitioning-independent), and stddev/
  // variance derive from them in double at the very end — deterministic
  // across engines, unlike a straight stddev over doubles whose
  // accumulation order varies with partitioning.
  val q32: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sum(col("l_quantity").cast("decimal(18,4)")).as("sx"),
        sum((col("l_quantity") * col("l_quantity")).cast("decimal(28,6)")).as("sxx"))
      .select(col("l_returnflag"), col("n"), col("min_qty"), col("max_qty"),
        (col("sx").cast("double") / col("n")).as("avg_qty"),
        sqrt((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n")) /
          (col("n") - 1)).as("stddev_qty"))

  val q32Sql: String = """
    WITH m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
             SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS sxx
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n, min_qty, max_qty,
           CAST(sx AS DOUBLE) / n AS avg_qty,
           sqrt((CAST(sxx AS DOUBLE) -
                 CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1))
             AS stddev_qty
    FROM m"""

  // ---------------------------------------------------------------- q33
  // MapType path for semi-structured data: props parsed as
  // map<string,string> (schema-free, unlike q18's struct), values pulled
  // with element access.
  val q33: Q = (s, d) =>
    Events.read(s, d)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
      .select(col("event_type"),
        element_at(col("m"), "k").cast("long").as("k"),
        size(map_keys(col("m"))).as("n_keys"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
           max(col("n_keys")).cast("int").as("max_keys"),
           count(when(col("k").isNull, 1)).as("n_missing"))

  // DuckDB's SUM over BIGINT widens to HUGEINT (which the driver's hash
  // compare treats as a different type) — cast back to BIGINT; and
  // n_missing must count post-cast nulls on both sides, so the oracle
  // probes TRY_CAST(...) IS NULL exactly like Spark's `k IS NULL`.
  val q33Sql: String = """
    SELECT event_type,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(len(json_keys(props))) AS INTEGER) AS max_keys,
           COUNT(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                              AS BIGINT) IS NULL
                 THEN 1 END) AS n_missing
    FROM events GROUP BY event_type"""

  // ---------------------------------------------------------------- q34
  // Array aggregation + array functions: collect per-group value lists
  // (sorted, so the result is set-deterministic regardless of
  // partitioning — a bare collect_list is partition-order-dependent and
  // can never be oracle-checked), then slice/size over them.
  val q34: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000)
      .groupBy(col("o_orderpriority"))
      .agg(sort_array(collect_list(col("o_orderkey"))).as("keys"),
           count(lit(1)).as("n"))
      .select(col("o_orderpriority"), col("n"),
        size(col("keys")).as("n_keys"),
        // Serialized to a CSV string rather than emitted as array<long>:
        // the driver's oracle comparer sorts rows with pandas, which
        // cannot hash/sort ndarray cells — scalar columns only.
        concat_ws(",", slice(col("keys"), 1, 3).cast("array<string>"))
          .as("first3"),
        element_at(col("keys"), -1).as("last_key"))

  val q34Sql: String = """
    WITH g AS (
      SELECT o_orderpriority,
             list_sort(list(o_orderkey)) AS keys, COUNT(*) AS n
      FROM orders WHERE o_totalprice > 450000
      GROUP BY o_orderpriority)
    SELECT o_orderpriority, n,
           CAST(len(keys) AS INTEGER) AS n_keys,
           array_to_string(keys[1:3], ',') AS first3,
           keys[-1] AS last_key
    FROM g"""

  // ---------------------------------------------------------------- q35
  // RANGE-framed analytic window: per-user trailing-1-hour event value,
  // frame bounded by the ORDER BY *value* (epoch seconds), not row
  // counts — rows with equal timestamps share a frame, and gaps shrink
  // it; complements the ROWS frames of q11/q20/q28.
  val q35: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("es"))
      .rangeBetween(-3600L, 0L)
    Events.read(s, d)
      .withColumn("es", expr("unix_micros(ts) div 1000000"))
      .withColumn("trailing_1h_value",
        dsumExpr(col("value")).over(w).cast("double"))
      .withColumn("trailing_1h_n", count(lit(1)).over(w))
      .select(col("user_id"), col("event_id"), col("es"),
              col("trailing_1h_value"), col("trailing_1h_n"))
  }

  val q35Sql: String = """
    SELECT user_id, event_id, es,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS trailing_1h_value,
           COUNT(*) OVER w AS trailing_1h_n
    FROM (SELECT user_id, event_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS es
          FROM events) t
    WINDOW w AS (PARTITION BY user_id ORDER BY es
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"""

  // ---------------------------------------------------------------- q36
  // Math function family — restricted to IEEE-exact operations (sqrt,
  // abs, floor/ceil, integer pmod, exact powers) so both engines agree
  // bit-for-bit; transcendentals (ln/exp) are deliberately excluded from
  // the oracle surface because libm results differ across platforms.
  val q36: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        abs(col("l_discount") - 0.04).as("abs_disc_delta"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        pmod(col("l_partkey"), lit(97)).as("part_bucket"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"))

  val q36Sql: String = """
    SELECT l_orderkey, l_linenumber,
           sqrt(l_quantity) AS sqrt_qty,
           abs(l_discount - 0.04) AS abs_disc_delta,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           l_partkey % 97 AS part_bucket,
           l_quantity * l_quantity AS qty_sq
    FROM lineitem"""

  // ---------------------------------------------------------------- q37
  // Correlated scalar subquery (TPC-H Q17 shape) through the SQL
  // front-end: Catalyst decorrelates the per-part average into an
  // aggregate-then-join — the plan has ONE extra aggregate over
  // lineitem, not a per-row subquery execution. Quantities are integral
  // doubles, so the inner AVG is order-independent and the 0.2×avg
  // threshold compares identically across engines.
  val q37: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    Tables.part(s, d).createOrReplaceTempView("part_v")
    s.sql(s"""
      SELECT p_brand, COUNT(*) AS n_small,
             ${sqlDsum("l_extendedprice")} AS small_revenue
      FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
      WHERE l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem_v l2
                          WHERE l2.l_partkey = p_partkey)
      GROUP BY p_brand""")
  }

  val q37Sql: String = s"""
    SELECT p_brand, COUNT(*) AS n_small,
           ${sqlDsum("l_extendedprice")} AS small_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    GROUP BY p_brand"""

  // ---------------------------------------------------------------- q38
  // Pivot (long → wide): per line-status row, one quantity column per
  // return flag. Spark's `pivot` with EXPLICIT values plans as a
  // two-phase aggregate — partial per (status, flag), then the pivot
  // projection over the collapsed key space — with no extra pass to
  // discover the pivot domain (at 100 TB, always pass the value list;
  // implicit pivot runs a distinct scan first). The second shuffle
  // moves ≤ |status|×|flag| rows: free. The oracle states the plan
  // literally as conditional aggregation.
  val q38: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .select(col("l_linestatus"), col("A").as("qty_a"),
              col("N").as("qty_n"), col("R").as("qty_r"))

  val q38Sql: String = """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
                    THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
             AS qty_a,
           CAST(SUM(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
             AS qty_n,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
             AS qty_r
    FROM lineitem GROUP BY l_linestatus"""

  // ---------------------------------------------------------------- q39
  // Lateral explode (wide → long): posexplode of the token array keeps
  // the element *position* — the generator runs inside whole-stage
  // codegen and the row explosion happens after the pushed-down
  // doc_id/pos filters, so the blow-up is bounded at the scan.
  val q39: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(col("pos") < 8)

  val q39Sql: String = """
    SELECT doc_id, i - 1 AS pos, w[i] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS w,
                 generate_subscripts(string_split(text, ' '), 1) AS i
          FROM documents WHERE doc_id < 100) t
    WHERE i <= 8"""

  // ---------------------------------------------------------------- q40
  // Deterministic portable sampling — the 100 TB replacement for
  // `TABLESAMPLE`/`rand()`: bucket every row by a cryptographic hash of
  // its key, so the sample is (a) exactly reproducible across engines,
  // runs and cluster layouts, (b) cheap (a filter — no shuffle, no
  // sort), and (c) consistent across tables sharing the key. Two modes
  // in one output: a ~10% Bernoulli sample (hash bucket < 10 of 100)
  // and a per-language stratified sample (10 docs with the smallest
  // hash per stratum — one window over the stratum key).
  val q40: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
    val bernoulli = docs.filter(pmod(col("h"), lit(100)) < 10)
      .select(col("doc_id"), col("lang"), lit("bernoulli").as("mode"))
    val stratified = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= 10)
      .select(col("doc_id"), col("lang"), lit("stratified").as("mode"))
    bernoulli.unionAll(stratified)
  }

  val q40Sql: String = """
    WITH h AS (SELECT doc_id, lang,
                      ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        ::BIGINT AS h
               FROM documents)
    SELECT doc_id, lang, 'bernoulli' AS mode FROM h WHERE h % 100 < 10
    UNION ALL
    SELECT doc_id, lang, 'stratified' AS mode
    FROM (SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY h, doc_id) AS rk
          FROM h) r
    WHERE rk <= 10"""

  // ---------------------------------------------------------------- q41
  // String-similarity band join: edit-distance near-matches among parts,
  // banded by (brand, size) so the quadratic levenshtein only runs
  // within buckets — the same candidates-then-verify shape as the dedup
  // family, here with equi-join banding (one shuffle; AQE handles
  // residual bucket skew). An unbanded all-pairs edit distance is never
  // the answer at scale.
  val q41: Q = (s, d) => {
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
    p.as("a").hint("shuffle_hash")
      .join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .withColumn("edit_dist",
        levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("edit_dist") <= 4)
      .select(col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
              col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
              col("edit_dist"))
  }

  val q41Sql: String = """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4"""

  // ---------------------------------------------------------------- q42
  // Exact distributed quantiles + approx contract. Exact percentiles
  // use explicit rank arithmetic (value at rank ceil(p·n)) so both
  // engines state the identical discrete-quantile definition — no
  // reliance on engine quantile functions agreeing on interpolation
  // conventions. The plan is the SHARED two-pass histogram +
  // rank-resolve helper (Num.bucketQuantiles): the original per-group
  // window-sort formulation measured a real scale ceiling (SCALE.md
  // round 5: parallelism bounded by the three l_returnflag values,
  // 26.7× at 100×), q59 answered it in code (6.1× at 100×), and round
  // 6 made that plan the default for every caller — q42's contract is
  // unchanged (same oracle), only the physical shape moved.
  // approx_percentile (Greenwald-Khanna style sketch, constant memory,
  // no sort) rides along under a contract bound: its rank error
  // ≤ n/accuracy puts the estimate strictly inside [p25, p75] for
  // p50 — asserted as a boolean the oracle states as TRUE.
  val q42: Q = (s, d) => {
    val exact = Num.bucketQuantiles(
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_quantity")),
      "l_returnflag", "l_quantity",
      Seq(0.25 -> "p25", 0.50 -> "p50", 0.75 -> "p75"),
      bucketWidth = 1.0)
    val approx = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
        .as("ap50"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("p25"), col("p50"), col("p75"),
        (col("ap50") >= col("p25") && col("ap50") <= col("p75"))
          .as("approx_ok"))
  }

  val q42Sql: String = """
    WITH r AS (
      SELECT l_returnflag, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem)
    SELECT l_returnflag,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT)
               THEN l_quantity END) AS p25,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT)
               THEN l_quantity END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT)
               THEN l_quantity END) AS p75,
           TRUE AS approx_ok
    FROM r GROUP BY l_returnflag"""

  // ---------------------------------------------------------------- q43
  // Distribution-position windows: percent_rank (rank position scaled to
  // [0,1]) and cume_dist (fraction of partition ≤ current row) complete
  // the ranking family beyond q28's row_number/rank/dense_rank/ntile.
  // Both are rank arithmetic over one per-partition sort — same single
  // shuffle as any window; values are exact small-integer ratios, so
  // both engines agree bit-for-bit.
  val q43: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"))
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 480000)
      .select(col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  val q43Sql: String = """
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM orders WHERE o_totalprice > 480000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)"""

  // ---------------------------------------------------------------- q44
  // Calendar-spine left join — the standard "report every day, even
  // empty ones" warehouse pattern: a generated date spine (sequence +
  // explode, no source table) left-joins the daily aggregate, with
  // zero-filled gaps. The spine is generated, tiny, and broadcast; the
  // fact side aggregates BEFORE the join, so the spine join touches
  // |days| rows, never |orders|.
  val q44: Q = (s, d) => {
    val days = s.range(1).select(explode(expr(
      """sequence(timestamp'1995-01-01 00:00:00',
        |         timestamp'1995-12-31 00:00:00',
        |         interval 1 day)""".stripMargin)).as("day"))
    val daily = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-01-01").cast("timestamp"))
      .groupBy(date_trunc("DAY", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("rev"))
    days.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("rev"), lit(0.0)).as("revenue"))
  }

  val q44Sql: String = s"""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                    TIMESTAMP '1995-12-31',
                                    INTERVAL 1 DAY)) AS day),
    daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             COUNT(*) AS cnt, ${sqlDsum("o_totalprice")} AS rev
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY 1)
    SELECT spine.day,
           COALESCE(cnt, 0) AS n_orders,
           COALESCE(rev, 0.0) AS revenue
    FROM spine LEFT JOIN daily ON spine.day = daily.day"""

  // ---------------------------------------------------------------- q45
  // ANSI-safe arithmetic family: Spark 4 runs with ansi.enabled=true,
  // where raw division/cast THROW on bad input — production pipelines
  // use the try_* forms (null-on-failure) plus nullif/coalesce. This is
  // the q36 counterpart for the failure paths: division by zero,
  // unparseable casts, and null plumbing, all row-level and exact.
  val q45: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_quantity, l_linenumber - 1)").as("qty_per_prev"),
        expr("try_divide(l_extendedprice, l_discount)").as("price_per_disc"),
        // try_cast pays a per-row exception on FAILURE — price it like
        // production data (a dirty minority), not a 100%-failure column:
        // rows with flag 'R' carry an unparseable value, the rest parse.
        expr("""try_cast(CASE WHEN l_returnflag = 'R' THEN 'oops'
                              ELSE CAST(l_linenumber AS STRING) END
                         AS INT)""").as("line_or_null"),
        coalesce(expr("try_divide(l_quantity, l_discount)"), lit(-1.0))
          .as("qty_per_disc_filled"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"))

  val q45Sql: String = """
    SELECT l_orderkey, l_linenumber,
           l_quantity / NULLIF(l_linenumber - 1, 0) AS qty_per_prev,
           l_extendedprice / NULLIF(l_discount, 0.0) AS price_per_disc,
           TRY_CAST(CASE WHEN l_returnflag = 'R' THEN 'oops'
                         ELSE CAST(l_linenumber AS VARCHAR) END
                    AS INTEGER) AS line_or_null,
           COALESCE(l_quantity / NULLIF(l_discount, 0.0), -1.0)
             AS qty_per_disc_filled,
           NULLIF(l_discount, 0.0) AS disc_or_null
    FROM lineitem"""

  // ---------------------------------------------------------------- q46
  // Explicit null ordering: Spark sorts ASC NULLS FIRST by default,
  // DuckDB (and Postgres) ASC NULLS LAST — silent cross-engine result
  // divergence unless the query states its null placement. Both sides
  // here pin NULLS LAST (and a total tie-break), making the window
  // deterministic and portable; the nullable key comes from nullif.
  val q46: Q = (s, d) => {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("disc_or_null").asc_nulls_last,
               col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(s, d)
      .withColumn("disc_or_null", nullif(col("l_discount"), lit(0.0)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 100)
      .select(col("l_returnflag"), col("rk").cast("int").as("rk"),
              col("l_orderkey"), col("l_linenumber"), col("disc_or_null"))
  }

  val q46Sql: String = """
    SELECT l_returnflag, CAST(rk AS INTEGER) AS rk,
           l_orderkey, l_linenumber, disc_or_null
    FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
                 NULLIF(l_discount, 0.0) AS disc_or_null,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY NULLIF(l_discount, 0.0) ASC NULLS LAST,
                            l_orderkey ASC, l_linenumber ASC) AS rk
          FROM lineitem) t
    WHERE rk <= 100"""

  // ---------------------------------------------------------------- q47
  // Schema-drift union: two generations of the same feed — the old
  // extract lacking a column, the new one carrying it — combined with
  // unionByName(allowMissingColumns), which aligns by NAME and
  // null-fills the gap. Positional unionAll would silently misalign the
  // moment column order drifts; by-name union is the schema-evolution-
  // safe operator a long-lived warehouse feed needs.
  val q47: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val oldGen = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderstatus"))
    val newGen = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    oldGen.unionByName(newGen, allowMissingColumns = true)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
           count(col("o_totalprice")).as("n_with_price"),
           dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_price"))
  }

  val q47Sql: String = s"""
    WITH unioned AS (
      SELECT o_orderkey, o_orderstatus, NULL AS o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
    SELECT o_orderstatus, COUNT(*) AS n,
           COUNT(o_totalprice) AS n_with_price,
           ${sqlDsum("COALESCE(o_totalprice, 0.0)")} AS total_price
    FROM unioned GROUP BY o_orderstatus"""

  // ---------------------------------------------------------------- q48
  // Bag-semantics set operations: intersectAll / exceptAll keep
  // MULTIPLICITY (min / difference of per-row counts) where q13/q14's
  // set forms collapse duplicates — the distinction that matters when
  // rows are legitimately repeated (line items per part). Catalyst
  // plans both as aggregate-count + generate, one shuffle each.
  val q48: Q = (s, d) => {
    val a = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_returnflag"))
    val b = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 25)
      .select(col("l_partkey"), col("l_returnflag"))
    a.intersectAll(b)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_intersect"))
      .join(
        a.exceptAll(b)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_except")),
        Seq("l_returnflag"), "full_outer")
      .select(col("l_returnflag"),
        coalesce(col("n_intersect"), lit(0L)).as("n_intersect"),
        coalesce(col("n_except"), lit(0L)).as("n_except"))
  }

  val q48Sql: String = """
    WITH a AS (SELECT l_partkey, l_returnflag FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'),
    b AS (SELECT l_partkey, l_returnflag FROM lineitem
          WHERE l_quantity >= 25),
    i AS (SELECT l_returnflag, COUNT(*) AS n_intersect
          FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
          GROUP BY 1),
    e AS (SELECT l_returnflag, COUNT(*) AS n_except
          FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
          GROUP BY 1)
    SELECT l_returnflag,
           COALESCE(n_intersect, 0) AS n_intersect,
           COALESCE(n_except, 0) AS n_except
    FROM i FULL OUTER JOIN e USING (l_returnflag)"""

  // ---------------------------------------------------------------- q49
  // Latest record per key — the change-feed-to-snapshot collapse every
  // warehouse runs constantly. Implemented with max_by over a packed
  // orderable key (one partial+final hash aggregate, no sort, no
  // window): at 100 TB this beats the row_number()-over-window form by
  // an entire per-partition sort. Tie-break on event_id makes the pick
  // total, so both engines agree.
  val q49: Q = (s, d) =>
    Events.read(s, d)
      .groupBy(col("user_id"))
      .agg(
        max_by(struct(col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"),
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"),
        col("last_ts"), col("n_events"))

  // Oracle uses the equivalent window formulation (DuckDB 1.0's arg_max
  // has no composite ordering key) — same latest-row pick, total order.
  val q49Sql: String = """
    WITH r AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events,
             MAX(ts) OVER (PARTITION BY user_id) AS last_ts
      FROM events)
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value, last_ts, n_events
    FROM r WHERE rn = 1"""

  // ---------------------------------------------------------------- q50
  // Runtime bloom-filter join pruning — Catalyst's InjectRuntimeFilter
  // builds a bloom filter over the *filtered* dimension keys at runtime
  // and pushes `might_contain(l_partkey)` beneath the fact-side shuffle,
  // so rows that can never match are dropped BEFORE they are hashed,
  // serialized and shuffled. At 100 TB this is the difference between
  // shuffling the whole fact table and shuffling the ~selectivity
  // fraction that survives; the OSS default thresholds (10 GB scan) are
  // tuned for clusters, so a session clone lowers them to make the same
  // plan shape reproducible at test scale (no global conf mutation).
  // Broadcast is disabled in the clone to exercise the shuffle-join
  // path — with broadcast the small side never shuffles and the bloom
  // filter would be redundant. PlanSpec asserts `might_contain` lands
  // in the fact-side scan filter.
  val q50: Q = (s, d) => {
    val ss = s.newSession()
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ss.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    ss.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "1")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dim = Tables.part(ss, d).filter(col("p_size") <= 2)
    Tables.lineitem(ss, d)
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q50Sql: String = s"""
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 2
    GROUP BY p_brand"""

  // ---------------------------------------------------------------- q51
  // Heavy hitters via approx_top_k (Apache DataSketches frequent-items
  // under the hood): the streaming/mergeable answer to "top tokens" at
  // 100 TB — one pass, fixed memory, partial sketches merge across
  // executors, vs t05's exact global sort-limit which shuffles every
  // distinct key. On this corpus the vocabulary (31 tokens) is far
  // below the sketch's tracked capacity, so the sketch is EXACT and the
  // oracle compares real counts; at production vocabulary sizes the
  // same plan degrades gracefully to ±ε·N guaranteed-error estimates.
  // The sketch OVER-FETCHES 10× the target k, then a deterministic
  // re-rank (count desc, token asc) cuts to k — the standard stable
  // top-k-from-sketch recipe: which members of a tied boundary class
  // the sketch surfaces is selection-order dependent (the sf1 replica
  // corpus puts a 10-way exact tie at rank 5), so determinism must
  // come from re-ranking a candidate pool wide enough to contain the
  // whole tie class, not from the sketch's own ordering.
  val q51: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(expr("approx_top_k(token, 50)").as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item").as("token"), col("e.count").as("freq"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("freq").desc, col("token").asc)).cast("int"))
      .filter(col("rk") <= 5)

  val q51Sql: String = """
    SELECT token, freq, CAST(rk AS INTEGER) AS rk
    FROM (SELECT token, COUNT(*) AS freq,
                 ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rk
          FROM (SELECT unnest(string_split(text, ' ')) AS token
                FROM documents) t
          GROUP BY token) r
    WHERE rk <= 5"""

  // ---------------------------------------------------------------- q52
  // Distributed distinct counting with MERGEABLE sketches
  // (DataSketches HLL): per-group sketches estimate each group, and
  // hll_union_agg folds the already-built group sketches into the
  // global estimate WITHOUT rescanning the data — the property that
  // matters at 100 TB, where per-partition sketches merge on one
  // reducer instead of shuffling every distinct key (and sketches are
  // storable: tomorrow's batch merges into today's). Contract oracle
  // (q27 pattern): the output carries exact counts plus a boolean
  // "estimate within 15% of exact" — lgK=12 gives ~1.6% rsd, so the
  // 15% bound is a ~9σ margin, not a tuned constant; the raw estimate
  // itself is kept out of the compared columns.
  val q52: Q = (s, d) => {
    // One distinct pre-aggregation feeds everything: HLL registers are
    // duplicate-insensitive, so sketches over the distinct (flag, key)
    // pairs are bit-identical to sketches over the raw fact rows — and
    // the exact counts become cheap counts over the same deduped set
    // instead of two independent count-distinct Expands over the scan.
    val pairs = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
    val per = pairs.groupBy(col("l_returnflag")).agg(
      expr("hll_sketch_agg(l_partkey, 12)").as("sk"),
      count(lit(1)).as("n_exact"))
    def ok(est: org.apache.spark.sql.Column,
           exact: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      abs(est.cast("double") - exact) / exact <= 0.15
    val perOut = per.select(col("l_returnflag").as("grp"), col("n_exact"),
      ok(expr("hll_sketch_estimate(sk)"), col("n_exact")).as("hll_ok"))
    val merged = per.agg(expr("hll_union_agg(sk)").as("sku"))
    val globalExact = pairs.select(col("l_partkey")).distinct()
      .agg(count(lit(1)).as("n_exact"))
    val allOut = merged.crossJoin(globalExact)
      .select(lit("ALL").as("grp"), col("n_exact"),
        ok(expr("hll_sketch_estimate(sku)"), col("n_exact")).as("hll_ok"))
    perOut.unionAll(allOut)
  }

  val q52Sql: String = """
    SELECT l_returnflag AS grp, COUNT(DISTINCT l_partkey) AS n_exact,
           TRUE AS hll_ok
    FROM lineitem GROUP BY 1
    UNION ALL
    SELECT 'ALL', COUNT(DISTINCT l_partkey), TRUE FROM lineitem"""

  // ---------------------------------------------------------------- q53
  // Ordered funnel analysis: per user, the first `view`, the first
  // `click` strictly after that view, the first `purchase` strictly
  // after that click — then the count of users surviving each stage.
  // Each stage is one conditional min-aggregate over (user_id) joined
  // back to the previous stage's firsts; user_id is the only shuffle
  // key throughout, and each stage's input is pre-filtered by event
  // type in the scan, so a 100 TB event log funnels with three
  // selective scans + three hash aggregates, never a window sort.
  val q53: Q = (s, d) => {
    val ev = Events.read(s, d)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("vts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("vts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("cts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("pts"))
    v.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("stage_order"), lit("view").as("stage"),
        col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users"))
        .select(lit(2).as("stage_order"), lit("click").as("stage"),
          col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users"))
        .select(lit(3).as("stage_order"), lit("purchase").as("stage"),
          col("n_users")))
  }

  val q53Sql: String = """
    WITH v AS (SELECT user_id, MIN(ts) AS vts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS cts
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.vts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS pts
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.cts
          GROUP BY e.user_id)
    SELECT 1 AS stage_order, 'view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL
    SELECT 2, 'click', COUNT(*) FROM c
    UNION ALL
    SELECT 3, 'purchase', COUNT(*) FROM p"""

  // ---------------------------------------------------------------- q54
  // Retention cohorts: users grouped by the calendar week of their
  // first event; for each (cohort_week, week_offset) the number of
  // distinct users active that many weeks later. One min-aggregate for
  // first-touch (user_id keys), one broadcast-able join back onto the
  // log, one count-distinct on (cohort, offset) — the standard
  // product-analytics matrix, all hash aggregates.
  val q54: Q = (s, d) => {
    val ev = Events.read(s, d)
    val firsts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .withColumn("cohort_week",
        date_trunc("week", col("first_ts")).cast("date"))
    ev.join(firsts, Seq("user_id"))
      .withColumn("week_offset",
        floor(datediff(col("ts").cast("date"), col("cohort_week")) / 7)
          .cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  val q54Sql: String = """
    WITH f AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id)
    SELECT cohort_week,
           CAST(floor(date_diff('day', cohort_week, CAST(e.ts AS DATE)) / 7)
                AS INTEGER) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN f ON e.user_id = f.user_id
    GROUP BY 1, 2"""

  // ---------------------------------------------------------------- q55
  // Rollup with grouping metadata: grouping()/grouping_id() distinguish
  // "NULL because this level aggregated the column away" from "NULL in
  // the data" — the piece that makes rollup/cube output machine-readable
  // (q08/q09 emit the levels; this emits their provenance). Same single
  // Expand + hash-aggregate plan as q08.
  val q55: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("g_flag"), col("g_status"), col("gid"), col("n"), col("sum_qty"))

  val q55Sql: String = s"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""

  // ---------------------------------------------------------------- q56
  // Six-table star-chain join (TPC-H Q5 shape): region → nation →
  // customer → orders → lineitem → supplier, with the classic local-
  // supplier predicate (customer and supplier in the same nation),
  // filtered to one region and a one-year order window, revenue by
  // nation. The optimizer showcase: every dimension is broadcast (the
  // only shuffles are the fact-side aggregation), the region/date
  // filters push into the scans, and the nation=nation predicate rides
  // the join instead of a post-filter.
  val q56: Q = (s, d) => {
    val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, d)
    val cust = Tables.customer(s, d)
    val sup = Tables.supplier(s, d)
    val orders = Tables.orders(s, d)
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1997-01-01")
    val li = Tables.lineitem(s, d)
    // orders and lineitem are both fact tables — their join shuffles on
    // the order key (co-bucketing them removes even that; Bucketing.scala);
    // customer joins shuffle on custkey; bounded dims (nation/region)
    // broadcast unconditionally, supplier only under the size guard.
    li
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(Hints.broadcastIfSmall(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q56Sql: String = s"""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
                   AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name"""

  // ---------------------------------------------------------------- q57
  // Stats-driven join planning — the missing half of the broadcast
  // story: q03/q56 *declare* size-guarded hints; here the PLANNER
  // decides from catalog statistics with no hint anywhere. The tables
  // are registered as external parquet tables and ANALYZEd (row count +
  // byte size, plus per-column stats on the join keys), CBO and
  // stats-based join reorder are on, and the three-way
  // orders-customer-nation join is written in worst-first textual
  // order. With statistics the planner still builds the plan you want:
  // nation (25 rows) broadcasts, the fact side never does —
  // PlanSpec asserts both, and that the catalog row counts are real.
  // At 100 TB this is the operational mode: ANALYZE runs at load time
  // (Compaction/Layout already rewrite files; stats collection is one
  // more pass of the same scan), and every ad-hoc query inherits
  // correct build-side choices without per-query tuning.
  val q57: Q = (s, d) => {
    val cbo = s.newSession()
    cbo.conf.set("spark.sql.cbo.enabled", "true")
    cbo.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    // External-table registration is per (table, sf dir): the catalog
    // is shared session state, so re-registration only happens when the
    // data location changes (Verify and Bench hop between sf dirs).
    Seq("customer", "orders", "nation").foreach { t =>
      val name = s"g57_$t"
      val loc = s"$d/$t.parquet"
      val stale = cbo.catalog.tableExists(name) &&
        !cbo.sql(s"DESCRIBE FORMATTED $name")
          .filter(col("col_name") === "Location")
          .head().getString(1).contains(loc)
      if (stale) cbo.sql(s"DROP TABLE $name")
      if (stale || !cbo.catalog.tableExists(name)) {
        cbo.catalog.createTable(name, loc, "parquet")
        cbo.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
        // Column stats belong to the registration, not the query:
        // repeat invocations (Bench runs each query three times) must
        // measure the CBO-planned join, not a stats-collection scan.
        if (t == "orders")
          cbo.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS " +
            "FOR COLUMNS o_custkey, o_totalprice")
      }
    }
    cbo.sql("""
      SELECT n_name,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price
      FROM g57_orders
        JOIN g57_customer ON o_custkey = c_custkey
        JOIN g57_nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY n_name""")
  }

  val q57Sql: String = """
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name"""

  // ---------------------------------------------------------------- q58
  // Skewed-JOIN handling — q31 covers skewed aggregation; this is the
  // other, more common production incident: one join key owning ~90%
  // of the fact side (here l_partkey folded so key 0 takes 9 of every
  // 10 lineitems — the one-domain-dominates-the-crawl shape). The
  // dimension is deliberately NOT broadcast (threshold -1 in a session
  // clone): at real scale the dim may be a scale-growing table the
  // size guard refuses, and the sort-merge path must then survive the
  // hot key. AQE's skew-join split does exactly that at runtime — the
  // oversized shuffle partition is split into advisory-sized chunks,
  // each joined against a replicated copy of the matching dim rows
  // (PlanSpec asserts `skew=true` in the final adaptive plan). The
  // salted fallback when AQE is unavailable: q31's two-stage shape
  // applied to joins — explode the dim side over a salt domain, salt
  // the fact key, join on (key, salt) — trades dim replication for the
  // same reducer spread; AQE does the equivalent only where needed,
  // which is why it is the default posture here.
  val q58: Q = (s, d) => {
    val sk = s.newSession()
    sk.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sk.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Test-scale thresholds: the hot partition is ~16 KB at sf0.01
    // (constant-key rows compress hard in the shuffle), so the split
    // must engage well below the 256 MB production default. At 100 TB
    // the DEFAULTS do the same job — these lines are the only
    // scale-dependent tuning in the query.
    sk.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
    sk.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    sk.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    // AQE splits a skewed reduce partition at MAP-OUTPUT granularity:
    // the single-file, single-row-group fixture parquet scans as ONE
    // map task, making the hot partition one indivisible chunk. The
    // repartition stands in for the thousands of map tasks a real
    // 100 TB scan produces — at scale it is not needed (and not
    // wanted: it is an extra full shuffle).
    val fact = Tables.lineitem(sk, d)
      .repartition(16)
      .select(
        when(col("l_partkey") % 50 < 45, lit(0L))
          .otherwise(col("l_partkey") % 50).as("hk"),
        col("l_extendedprice"))
    val dim = Tables.part(sk, d)
      .filter(col("p_partkey") <= 50)
      .select((col("p_partkey") - 1).as("hk"), col("p_brand"))
    // Aggregate on p_brand, NOT on the join key: grouping on hk would
    // let the final aggregate reuse the join's hash-partitioning, and
    // AQE then refuses to split the hot partition (splitting breaks
    // the partitioning the parent depends on, and the skew rule never
    // introduces extra shuffles). Grouping on a different key needs
    // its own exchange regardless, so the join is free to skew-split —
    // the same reason production skew incidents usually CAN be
    // AQE-repaired: the hot join rarely feeds an agg on its own key.
    fact.join(dim, Seq("hk"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("revenue"))
  }

  val q58Sql: String = """
    SELECT p_brand, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM (SELECT CASE WHEN l_partkey % 50 < 45 THEN 0
                      ELSE l_partkey % 50 END AS hk,
                 l_extendedprice
          FROM lineitem) f
      JOIN (SELECT p_partkey - 1 AS hk, p_brand
            FROM part WHERE p_partkey <= 50) d USING (hk)
    GROUP BY p_brand"""

  // ---------------------------------------------------------------- q59
  // Scalable exact quantiles — the answer to q42's measured scale
  // ceiling (SCALE.md round 5: the per-group window sort is bounded by
  // the THREE l_returnflag groups, 26.7× at 100× data). Same discrete-
  // quantile definition (value at row_number ceil(p·n)), different
  // plan: (1) histogram pass — count rows per (group, value bucket),
  // a partial-aggregated shuffle of (flag, bucket) keys only; the
  // cumulative bucket counts locate, per target rank, the ONE bucket
  // containing it and the residual rank within it; (2) resolve pass —
  // only the hit buckets' rows (≈1/width of the data) are ranked, in
  // windows keyed by (group, percentile). Both passes parallelize with
  // executors, not group count; if a bucket is still too big, the same
  // reduction recurses inside it (re-bucket at finer width) — each
  // level shrinks the sorted set ~100×. Bucket width is the knob: it
  // trades histogram size (rows/width keys) against pass-2 sort size.
  // Round 6 factored the plan into Num.bucketQuantiles (shared with
  // q42, which inherited it as its default physical shape).
  val q59: Q = (s, d) =>
    Num.bucketQuantiles(
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice")),
      "l_returnflag", "l_extendedprice",
      Seq(0.25 -> "p25", 0.50 -> "p50", 0.75 -> "p75"),
      bucketWidth = 1000.0)

  /** Oracle: the straight rank definition — same fixpoint the bucketed
    * two-pass plan must land on. Bucket boundaries cannot split ties
    * (equal values share a bucket), so value-at-rank is identical. */
  val q59Sql: String = """
    WITH r AS (SELECT l_returnflag, l_extendedprice AS v,
                      ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                         ORDER BY l_extendedprice) AS rn,
                      COUNT(*) OVER (PARTITION BY l_returnflag) AS n
               FROM lineitem)
    SELECT l_returnflag,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN v END) AS p25,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN v END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN v END) AS p75
    FROM r GROUP BY l_returnflag"""

  // ---------------------------------------------------------------- q60
  // Bucketed co-located fact-to-fact join — the layout lever q56's
  // comment points at, exercised under the oracle gate: lineitem and
  // orders are written ONCE as co-bucketed tables (same key, same
  // bucket count, per-bucket sorted — load/Bucketing.scala, the
  // warehouse's clustered-layout contract), and the orderkey join then
  // plans with ZERO exchanges on either side — the shuffle that
  // dominates every fact-to-fact join at 100 TB is paid once at load
  // time and never again. PlanSpec asserts the join stage is
  // exchange-free and that the same join over plain parquet shuffles.
  // Registration is per (table, sf dir) — the guard keys the table
  // name to the source dir so Verify (sf0.01) and Bench (sf0.1) each
  // build their layout exactly once; repeat invocations measure only
  // the join.
  /** Run `write` (a saveAsTable) only if `table` is absent from the
    * session catalog — and first clear any orphaned managed-table
    * directory a previous JVM left behind (the catalog, not the
    * directory, owns layout metadata; saveAsTable refuses a name whose
    * location already exists). Shared by the layout queries (q60, q61)
    * and the persisted ANN index (s13). */
  private[queries] def freshManagedTable(s: SparkSession, table: String)(
      write: => Unit): Unit =
    if (!s.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table)
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
      write
    }

  val q60: Q = (s, d) => {
    val san = d.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val li = s"g60_li_$san"
    val ord = s"g60_ord_$san"
    freshManagedTable(s, li)(
      graft.load.Bucketing.writeBucketed(Tables.lineitem(s, d), li,
        "l_orderkey", 8))
    freshManagedTable(s, ord)(
      graft.load.Bucketing.writeBucketed(Tables.orders(s, d), ord,
        "o_orderkey", 8))
    // hint("merge") pins the sort-merge strategy (the one that matters
    // fact-to-fact); the bucketed layout supplies its partitioning AND
    // per-bucket order, so neither Exchange nor per-partition Sort
    // appears on the join inputs.
    s.table(li).hint("merge")
      .join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
  }

  val q60Sql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority"""

  // ---------------------------------------------------------------- q61
  // Partition-pruned warehouse layout — bucketing's (q60) sibling
  // lever: orders written once PARTITIONED BY derived year, then a
  // one-year query reads only that partition's files — the scan never
  // opens the other years (PlanSpec asserts the PartitionFilters entry
  // and that the pruned scan reads fewer files than the table holds).
  // At 100 TB this is the difference between scanning a day and
  // scanning a decade: time/tenant/source partition columns are the
  // first thing a warehouse layout fixes, and every downstream query
  // inherits the pruning with zero per-query work. Same per-dir
  // registration guard as q60.
  /** Ensure the year-partitioned orders table for this sf dir exists
    * (one layout, shared by q61's static pruning and q62's dynamic
    * pruning) and return its name. */
  private def yearPartitionedOrders(s: SparkSession, d: String): String = {
    val san = d.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val tbl = s"g61_orders_$san"
    freshManagedTable(s, tbl)(
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").format("parquet")
        .partitionBy("o_year").saveAsTable(tbl))
    tbl
  }

  val q61: Q = (s, d) => {
    val tbl = yearPartitionedOrders(s, d)
    s.table(tbl)
      .filter(col("o_year") === 1996)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
  }

  val q61Sql: String = s"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ${sqlDsum("o_totalprice")} AS total_price
    FROM orders
    WHERE year(o_orderdate) = 1996
    GROUP BY o_orderpriority"""

  // ---------------------------------------------------------------- q62
  // Dynamic partition pruning — q61's runtime sibling and the last of
  // the optimizer's big levers in this suite (q50 runtime bloom, q57
  // CBO, q58 AQE skew, q60 bucketing, q61 static pruning): the year
  // predicate lives on a DIMENSION ('current' fiscal years), not on
  // the fact table, so no static filter can prune the scan — instead
  // the planner broadcasts the filtered dim, evaluates it into a
  // dynamicpruningexpression on the fact's PARTITION column, and the
  // scan skips the non-qualifying year directories at RUNTIME
  // (PlanSpec asserts the subquery in PartitionFilters). At 100 TB
  // this is the star-schema workhorse: "this quarter's" fact
  // partitions are selected by the date-dim filter without anyone
  // hand-propagating predicates onto the fact table.
  val q62: Q = (s, d) => {
    val tbl = yearPartitionedOrders(s, d)
    val dim = s.range(1992, 1999)
      .select(col("id").cast("int").as("d_year"))
      .withColumn("d_tag",
        when(col("d_year").isin(1996, 1997), "current").otherwise("old"))
    s.table(tbl)
      .join(dim.filter(col("d_tag") === "current"),
        col("o_year") === col("d_year"))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
  }

  val q62Sql: String = s"""
    WITH dim AS (
      SELECT CAST(y AS INTEGER) AS d_year,
             CASE WHEN y IN (1996, 1997) THEN 'current' ELSE 'old' END AS d_tag
      FROM range(1992, 1999) t(y))
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           COUNT(*) AS n_orders,
           ${sqlDsum("o_totalprice")} AS total_price
    FROM orders JOIN dim ON year(o_orderdate) = d_year
    WHERE d_tag = 'current'
    GROUP BY 1"""

  // ---------------------------------------------------------------- q63
  // Native recursive CTE (Spark 4's UnionLoop) — a clamped token-bucket
  // replay per user: bal_n = LEAST(bal_{n-1} + v_n, cap). The
  // row-at-a-time recurrence is not a plain associative running
  // aggregate (a window SUM can't "forget" the overflow a past clamp
  // discarded; this one-sided clamp DOES admit the prefix-sum/
  // running-max closed form min(S_n, cap + S_n − max_{k≤n} S_k), and a
  // two-sided clamp would need a sequential fold), so it is the
  // natural verifiable instance for the engine's general recursion
  // mechanism — the operator class this query exists to cover. Both
  // engines run the SAME recursive semantics (Spark only supports
  // UNION ALL recursion, and the per-user event chain is a forest —
  // each row has exactly one successor — so UNION ALL terminates
  // without cycle blowup at exactly depth = chain length).
  //
  // Exactness: v quantizes value to integer cents (floor(value*100) —
  // one deterministic IEEE op each side), so bal is BIGINT arithmetic
  // throughout. Depth is capped at 50 steps per user (inside Spark's
  // default 100-level recursion budget): the cap IS the scale contract
  // — each UnionLoop iteration is one frontier join (users-sized
  // frontier × rn-indexed chain relation), so cost is depth ×
  // user-count, independent of total event volume past the cap.
  // The windowed rn-indexed chain relation is MATERIALIZED (eager
  // localCheckpoint) before entering the recursion: UnionLoop inlines
  // non-recursive CTEs into every iteration, so without this each of
  // the 50 steps would re-scan events and re-run the row_number sort —
  // 50× the window cost for identical results. After checkpointing,
  // each iteration is one hash join of the user-sized frontier against
  // an in-memory users×50 relation.
  val q63: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Events.read(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= 50)
      .select(col("user_id"), col("rn"),
        floor(col("value") * 100).cast("long").as("v"))
      .localCheckpoint()
    ev.createOrReplaceTempView("ev_chain_v")
    // Size-guarded broadcast of the static chain side: the frontier
    // join then runs shuffle-free in every iteration (the dominant
    // cost at small scale is 50× shuffle scheduling, not work). Past
    // the guard (billions of users) the hint drops out and each step
    // is the plain shuffled equi-join — the correct plan there.
    // guard tuned empirically (x10 events fixture): UnionLoop
    // re-broadcasts the static side EVERY iteration, so the broadcast
    // only wins while serialize+build (50x) is cheaper than 50 small
    // shuffles — past ~500k chain rows the shuffled equi-join is
    // measurably faster (34 s vs 65+ s at 750k rows).
    // The decision reads the checkpointed plan's STATS — localCheckpoint
    // carries the origin estimate through, ~10 bytes/chain-row at every
    // measured sf, so 5 MiB ≈ the 500k-row crossover — instead of
    // running a counting job on every invocation (VERDICT r10 #3: the
    // count was a synchronous extra pass before the recursion even
    // started; the stats read is free and picks the same plan at both
    // sides of the crossover).
    val evStats = ev.queryExecution.optimizedPlan.stats
    val hint =
      if (evStats.rowCount.map(_ <= 500000L)
            .getOrElse(evStats.sizeInBytes <= BigInt(5L << 20)))
        "/*+ BROADCAST(e) */ " else ""
    s.sql(s"""
      WITH RECURSIVE chain AS (
        SELECT user_id, rn, LEAST(v, 100000) AS bal
        FROM ev_chain_v WHERE rn = 1
        UNION ALL
        SELECT $hint e.user_id, e.rn, LEAST(c.bal + e.v, 100000) AS bal
        FROM ev_chain_v e JOIN chain c
          ON e.user_id = c.user_id AND e.rn = c.rn + 1)
      SELECT user_id, rn, bal FROM chain""")
  }

  private def q63Text(tbl: String): String = s"""
    WITH RECURSIVE ev AS (
      SELECT user_id, rn, v FROM (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               CAST(floor(value * 100) AS BIGINT) AS v
        FROM $tbl) r
      WHERE rn <= 50),
    chain AS (
      SELECT user_id, rn, LEAST(v, 100000) AS bal
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn, LEAST(c.bal + e.v, 100000) AS bal
      FROM ev e JOIN chain c
        ON e.user_id = c.user_id AND e.rn = c.rn + 1)
    SELECT user_id, rn, bal FROM chain"""

  /** Oracle: the identical recursive SQL — DuckDB's recursive CTE and
    * Spark's UnionLoop must agree step for step. */
  val q63Sql: String = q63Text("events")

  // ---------------------------------------------------------------- q64
  // Unpivot (wide → long, `Dataset.unpivot` = melt): q38's pivoted
  // per-status quantity columns back into (status, flag, qty) rows.
  // Spark plans unpivot as Expand — a ROW-LOCAL projection that emits
  // one output row per value column, no shuffle, no join: the only
  // exchange in the whole query is q38's underlying aggregate. Unlike
  // SQL-dialect UNPIVOT (which drops NULL measures), Dataset.unpivot
  // RETAINS null-valued rows — the oracle states that semantic
  // explicitly as a three-arm UNION ALL, which is also exactly the
  // rewrite a user would hand-write in an engine without melt.
  val q64: Q = (s, d) => {
    val wide = Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
    wide.unpivot(
      ids = Array(col("l_linestatus")),
      values = Array(col("A"), col("N"), col("R")),
      variableColumnName = "flag",
      valueColumnName = "qty")
  }

  val q64Sql: String = """
    WITH wide AS (
      SELECT l_linestatus,
             CAST(SUM(CASE WHEN l_returnflag = 'A'
                      THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
               AS qty_a,
             CAST(SUM(CASE WHEN l_returnflag = 'N'
                      THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
               AS qty_n,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE)
               AS qty_r
      FROM lineitem GROUP BY l_linestatus)
    SELECT l_linestatus, 'A' AS flag, qty_a AS qty FROM wide
    UNION ALL
    SELECT l_linestatus, 'N', qty_n FROM wide
    UNION ALL
    SELECT l_linestatus, 'R', qty_r FROM wide"""

  // ---------------------------------------------------------------- q65
  // Markov transition matrix over the event stream: for every user,
  // order events by time and count (previous type → type) transitions,
  // then normalize each row of the matrix to probabilities. This is
  // the classic clickstream/user-journey model (and the base relation
  // for next-event prediction). Plan: lag() over a user-partitioned
  // time-ordered window — ONE shuffle on user_id plus a per-partition
  // sort, identical to sessionization (q20) — then a hash aggregate
  // down to the |types|² transition matrix, which is tiny at any
  // scale, so the row-total window over it is free. Tie-break on
  // event_id makes the per-user order total, so both engines see the
  // same predecessor at equal timestamps; the probability is one
  // exact-integer division.
  val q65: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Events.read(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("row_tot",
        sum(col("c")).over(Window.partitionBy(col("prev_type"))))
      .withColumn("p", col("c").cast("double") / col("row_tot"))
  }

  val q65Sql: String = """
    WITH tr AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    c AS (SELECT prev_type, event_type, COUNT(*) AS c
          FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, event_type, c,
           CAST(SUM(c) OVER (PARTITION BY prev_type) AS BIGINT) AS row_tot,
           CAST(c AS DOUBLE) /
             CAST(SUM(c) OVER (PARTITION BY prev_type) AS BIGINT) AS p
    FROM c"""

  // ---------------------------------------------------------------- q66
  // Window VALUE functions over the full-partition frame — the
  // first/nth/last family q10/q11/q35 don't cover: per customer order
  // history, the first order's price, the third order's price (NULL
  // for customers with fewer — nth_value's defining semantic), and the
  // price of the LAST FINISHED order via last_value(… IGNORE NULLS)
  // over a conditional projection (the standard "latest non-null
  // attribute" collapse). One row per customer (the frame is the whole
  // partition, so every row agrees — kept via rn = 1, which also pins
  // determinism). Values pass through untouched — no float
  // aggregation, so no decimal quantization is needed. Plan: ONE
  // shuffle on o_custkey feeding one window sort shared by all four
  // functions + the row_number.
  val q66: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wo = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("first_price", first(col("o_totalprice")).over(w))
      .withColumn("third_price", nth_value(col("o_totalprice"), 3).over(w))
      .withColumn("last_f_price",
        last(when(col("o_orderstatus") === "F", col("o_totalprice")),
          ignoreNulls = true).over(w))
      .withColumn("n_orders", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(wo))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("n_orders"), col("first_price"),
        col("third_price"), col("last_f_price"))
  }

  val q66Sql: String = """
    SELECT o_custkey, n_orders, first_price, third_price, last_f_price
    FROM (
      SELECT o_custkey,
             COUNT(*) OVER w AS n_orders,
             first_value(o_totalprice) OVER w AS first_price,
             nth_value(o_totalprice, 3) OVER w AS third_price,
             last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                        IGNORE NULLS) OVER w AS last_f_price,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)) t
    WHERE rn = 1"""

  // ---------------------------------------------------------------- q67
  // Correlated EXISTS / NOT EXISTS — the predicate-subquery surface
  // q37 (correlated scalar) doesn't touch. Catalyst decorrelates the
  // pair into a left-semi plus a left-anti join against the same scan
  // (RewritePredicateSubquery), so the executed plan is exactly the
  // q05+q06 composition a user would hand-write — stated here in the
  // SQL form a reference-engine user would actually port. Suppliers
  // with ≥1 shipment in 1995 and zero January-1995 returns; the
  // de-duplicating semi/anti semantics (a supplier appears once no
  // matter how many matches) is the point of the operator.
  val q67: Q = (s, d) => {
    Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q67_v")
    s.sql("""
      SELECT s_suppkey, s_name
      FROM supplier_v
      WHERE EXISTS (SELECT 1 FROM lineitem_q67_v
                    WHERE l_suppkey = s_suppkey
                      AND year(l_shipdate) = 1995)
        AND NOT EXISTS (SELECT 1 FROM lineitem_q67_v
                        WHERE l_suppkey = s_suppkey
                          AND l_returnflag = 'R'
                          AND year(l_shipdate) = 1995
                          AND month(l_shipdate) = 1)""")
  }

  val q67Sql: String = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey
                    AND year(l_shipdate) = 1995)
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey
                        AND l_returnflag = 'R'
                        AND year(l_shipdate) = 1995
                        AND month(l_shipdate) = 1)"""

  // ---------------------------------------------------------------- q68
  // Correlated LATERAL subquery — "for each customer, its top-2 orders
  // by price": the per-row table subquery SQL surface (OUTER APPLY in
  // T-SQL dialects) that q37/q67 (scalar / predicate subqueries) don't
  // cover. Catalyst's DecorrelateInnerQuery rewrites the correlated
  // ORDER BY + LIMIT into a per-partition rank filter over ONE join —
  // the same physical shape as a hand-written row_number() top-k
  // (q10), which is exactly what "decorrelation" must guarantee: no
  // per-customer re-execution of the inner query. Customers without
  // orders drop out (inner lateral), matching the oracle's join
  // semantics.
  val q68: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_q68_v")
    s.sql("""
      SELECT c_custkey, c_name, o.o_orderkey, o.o_totalprice
      FROM customer_v, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders_q68_v
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      WHERE c_custkey < 200""")
  }

  val q68Sql: String = """
    SELECT c_custkey, c_name, o.o_orderkey, o.o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c_custkey < 200"""

  // ---------------------------------------------------------------- q69
  // Higher-order array functions — the lambda surface (transform /
  // filter / aggregate / exists) over a per-group collected array,
  // complementing q34's array aggregation and q39's explode. All
  // lambdas stay in WholeStageCodegen (no UDF), and the array is
  // value-sorted after collect_list so the result is independent of
  // collection order — the only determinism hazard HOFs add. Integer
  // element type keeps every lambda exact cross-engine.
  // Scale: one hash-agg shuffle builds the per-order array (bounded by
  // order line count, ≤7 in TPC-H shape); every HOF after that is
  // row-local.
  val q69: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity").cast("int").as("q"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("q"))).as("qs"))
      .select(col("l_orderkey"),
        size(col("qs")).as("n_items"),
        expr("aggregate(qs, 0L, (acc, x) -> acc + x)").as("total_qty"),
        expr("size(filter(qs, x -> x > 30))").as("n_heavy"),
        expr("element_at(transform(qs, x -> x * 2), 1)").as("min_doubled"),
        expr("exists(qs, x -> x = 1)").as("has_single"))

  val q69Sql: String = """
    WITH a AS (SELECT l_orderkey,
                      list_sort(array_agg(CAST(l_quantity AS INTEGER))) AS qs
               FROM lineitem GROUP BY l_orderkey)
    SELECT l_orderkey,
           CAST(len(qs) AS INTEGER) AS n_items,
           CAST(list_aggregate(qs, 'sum') AS BIGINT) AS total_qty,
           CAST(len(list_filter(qs, x -> x > 30)) AS INTEGER) AS n_heavy,
           list_transform(qs, x -> x * 2)[1] AS min_doubled,
           len(list_filter(qs, x -> x = 1)) > 0 AS has_single
    FROM a"""

  // ---------------------------------------------------------------- q70
  // Time-grid resampling with LOCF gap fill — the "resample('15min')
  // + ffill" every metrics pipeline runs: bucket events onto a 15-min
  // grid (exact integer µs arithmetic — no timezone/rounding drift),
  // generate the full per-type spine, and carry the last observed
  // value forward across empty buckets via last_value(IGNORE NULLS)
  // over the time order. The carried value is the bucket's LAST
  // event's (max_by on (ts, event_id) — a total order, so both engines
  // pick the same row), never an aggregate, so doubles pass through
  // untouched. Scale: the grid is |types| × buckets (time-bounded, not
  // data-bounded); the bucket collapse is one hash agg; the LOCF
  // window partitions by type — no global sort.
  val q70: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Events.read(s, d)
      .withColumn("b", expr("unix_micros(ts) div 900000000"))
    val rng = ev.agg(min(col("b")).as("bmin"), max(col("b")).as("bmax"))
    val spine = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(rng))
      .select(col("event_type"), explode(expr("sequence(bmin, bmax)")).as("b"))
    val bucketLast = ev.groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("n"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("bval"))
    spine.join(bucketLast, Seq("event_type", "b"), "left")
      .select(col("event_type"),
        expr("timestamp_micros(b * 900000000)").as("bucket_ts"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("bval"), ignoreNulls = true).over(
          Window.partitionBy(col("event_type")).orderBy(col("b")))
          .as("locf_value"))
  }

  val q70Sql: String = """
    WITH ev AS (SELECT event_type, value, ts, event_id,
                       epoch_us(ts) // 900000000 AS b
                FROM events),
    r AS (SELECT MIN(b) AS bmin, MAX(b) AS bmax FROM ev),
    spine AS (SELECT t.event_type, u.b
              FROM (SELECT DISTINCT event_type FROM ev) t
              CROSS JOIN (SELECT unnest(generate_series(bmin, bmax)) AS b
                          FROM r) u),
    bl AS (SELECT event_type, b, cnt AS n, value AS bval
           FROM (SELECT event_type, b, value,
                        COUNT(*) OVER (PARTITION BY event_type, b) AS cnt,
                        ROW_NUMBER() OVER (PARTITION BY event_type, b
                                           ORDER BY ts DESC, event_id DESC)
                          AS rn
                 FROM ev) x
           WHERE rn = 1)
    SELECT s.event_type,
           make_timestamp(s.b * 900000000) AS bucket_ts,
           CAST(COALESCE(bl.n, 0) AS BIGINT) AS n,
           last_value(bl.bval IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.b) AS locf_value
    FROM spine s LEFT JOIN bl ON s.event_type = bl.event_type AND s.b = bl.b"""

  // ---------------------------------------------------------------- q71
  // The NATIVE as-of join (graft.plans.AsofJoin: custom LogicalPlan +
  // SparkStrategy + SparkPlan — the whole-operator Catalyst extension
  // rung) run against q25's exact semantics and the SAME oracle: per
  // purchase, the last click at-or-before it. Two independent
  // implementations (union + last-ignoreNulls window vs sorted
  // streaming merge) must produce the identical relation — the
  // strongest correctness statement available for a custom physical
  // operator. EnsureRequirements plants the key-clustered exchanges
  // and (key, time) sorts the exec declares; the merge itself is one
  // forward scan per partition, no padded-union window
  // materialization.
  val q71: Q = (s, d) => {
    val e = Events.read(s, d)
    val targets = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("t_us"),
        col("event_id"), col("ts"))
    val markers = e.filter(col("event_type") === "click")
      .select(col("user_id").as("m_user"), expr("unix_micros(ts)").as("m_us"),
        col("event_id").as("m_eid"), col("ts").as("mk_ts"),
        col("value").as("mk_value"))
    graft.plans.AsofJoin.join(targets, markers,
        "user_id", "t_us", "m_user", "m_us", "m_eid")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("mk_ts").as("asof_ts"), col("mk_value").as("asof_value"))
  }

  // ---------------------------------------------------------------- q73
  // The q63 recurrence WITHOUT recursion — the 100 TB path. The
  // one-sided clamp bal_n = min(bal_{n-1} + v_n, cap) admits the
  // closed form bal_n = min(S_n, cap + S_n − max_{k≤n} S_k) (S = the
  // inclusive prefix sum; induction: carrying the identity through
  // one step folds the new clamp into the running max). q63 exists to
  // cover the engine's GENERAL recursion operator (50 frontier-join
  // iterations = 50 scheduled jobs, cost ∝ depth × users); when the
  // recurrence algebra permits, this rewrite collapses all of it into
  // TWO stacked windows over ONE exchange+sort — cost independent of
  // depth, the plan you actually run at scale. QueriesSpec pins
  // row-for-row equality with q63; the oracle is literally q63's
  // recursive SQL, so the driver cross-checks the closed form against
  // DuckDB's recursion too. All arithmetic stays in exact long cents.
  val q73: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Events.read(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= 50)
      .select(col("user_id"), col("rn"),
        floor(col("value") * 100).cast("long").as("v"))
      .withColumn("s", sum(col("v")).over(run))
      .withColumn("m", max(col("s")).over(run))
      .select(col("user_id"), col("rn"),
        least(col("s"), lit(100000L) + col("s") - col("m")).as("bal"))
  }

  /** Oracle: q63's recursive CTE — the closed form must reproduce the
    * step-by-step recursion exactly. */
  val q73Sql: String = q63Text("events")

  // ---------------------------------------------------------------- q72
  // Sweep-line peak concurrency — the interval-overlap aggregate every
  // capacity/SLA analysis needs: treat each event as a 5-minute
  // half-open interval [ts, ts+300s) and report, per event_type, the
  // maximum number of simultaneously-open intervals and the earliest
  // instant it is reached. Expressed as the classic distributed sweep:
  // UNION the +1 (start) and −1 (end) boundary points, one running-sum
  // window per event_type, then a max/argmin aggregate on the same key.
  // Half-open semantics = ends sort before starts at the same instant
  // (ORDER BY t, delta ASC); within a tie group all deltas are equal,
  // so the multiset of running values — and hence the max and its
  // earliest time — is order-independent and engine-portable.
  //
  // Scale: the union is shuffle-free; ONE exchange on event_type feeds
  // both the window and the final aggregate (same key → the groupBy
  // reuses the window's hash partitioning, asserted in PlanSpec). The
  // within-partition sort is the only superlinear term; with few very
  // hot types the same salting ladder as q31 applies (split the sweep
  // by time range, prefix-sum the per-range totals — the c04 two-level
  // pattern), which PlanSpec documents rather than codifies here.
  // Timestamps are compared as exact microsecond longs.
  val q72: Q = (s, d) => {
    val e = Events.read(s, d)
      .select(col("event_type"), col("ts").cast("long").as("sec"))
    val pts = e.select(col("event_type"), col("sec").as("t"),
        lit(1).as("delta"))
      .unionAll(e.select(col("event_type"), (col("sec") + 300).as("t"),
        lit(-1).as("delta")))
    val sweep = Window.partitionBy(col("event_type"))
      .orderBy(col("t").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("open", sum(col("delta")).over(sweep))
      .withColumn("peak",
        max(col("open")).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("open")).as("peak_open"),
        min(when(col("open") === col("peak"), col("t"))).as("peak_at_sec"))
  }

  val q72Sql: String = """
    WITH pts AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t, 1 AS delta
      FROM events
      UNION ALL
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) + 300, -1
      FROM events),
    sweep AS (
      SELECT event_type, t,
             CAST(SUM(delta) OVER (PARTITION BY event_type
               ORDER BY t ASC, delta ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS open
      FROM pts),
    wp AS (
      SELECT event_type, t, open,
             MAX(open) OVER (PARTITION BY event_type) AS peak
      FROM sweep)
    SELECT event_type, MAX(open) AS peak_open,
           MIN(CASE WHEN open = peak THEN t END) AS peak_at_sec
    FROM wp GROUP BY event_type"""

  // ---------------------------------------------------------------- q74
  // q72's sweep, two-level — the 100 TB formulation. q72 partitions
  // the sweep by event_type alone, so with few hot types the
  // per-partition sort is the whole dataset (measured: 11.3 s at 100×
  // events vs 1.4 s at 10× — parallelism capped at |types|). The
  // standard fix is the c04 prefix-sum ladder: bucket time (hourly),
  // run the sweep LOCALLY per (type, bucket) — parallelism = types ×
  // buckets — reduce each bucket to one summary row (net delta, local
  // max, earliest instant of the local max), then prefix-sum the
  // bucket nets per type on the BUCKET-SIZED relation to get each
  // bucket's starting offset. Global running value = local running +
  // bucket offset, so the global peak is max over buckets of
  // (local max + offset) and its earliest instant is the earliest
  // qualifying bucket's local instant (buckets partition time, so the
  // bucket-level min IS the row-level min). Row-for-row equal to q72
  // by QueriesSpec and by the shared oracle; the heavy stages never
  // shuffle or sort anything wider than (type, bucket).
  val q74: Q = (s, d) => {
    val e = Events.read(s, d)
      .select(col("event_type"), col("ts").cast("long").as("sec"))
    val pts = e.select(col("event_type"), col("sec").as("t"),
        lit(1).as("delta"))
      .unionAll(e.select(col("event_type"), (col("sec") + 300).as("t"),
        lit(-1).as("delta")))
      .withColumn("bucket", floor(col("t") / 3600L))
    val wLoc = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("t").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBkt = Window.partitionBy(col("event_type"), col("bucket"))
    val buckets = pts
      .withColumn("lr", sum(col("delta")).over(wLoc))
      .withColumn("lmax", max(col("lr")).over(wBkt))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("delta")).as("btot"),
        max(col("lr")).as("bmax"),
        min(when(col("lr") === col("lmax"), col("t"))).as("bmax_at"))
    val wOff = Window.partitionBy(col("event_type"))
      .orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPeak = Window.partitionBy(col("event_type"))
    buckets
      .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .withColumn("peak", max(col("bmax") + col("off")).over(wPeak))
      .groupBy(col("event_type"))
      .agg(max(col("bmax") + col("off")).as("peak_open"),
        min(when(col("bmax") + col("off") === col("peak"), col("bmax_at")))
          .as("peak_at_sec"))
  }

  /** Oracle: q72's single-sweep SQL — the bucketed ladder must agree. */
  val q74Sql: String = q72Sql

  // ---------------------------------------------------------------- q75
  // Sliding distinct counting from MERGEABLE per-hour sketches — the
  // production pattern q52's Scaladoc promises ("sketches are
  // storable: tomorrow's batch merges into today's") exercised across
  // overlapping windows: build ONE DataSketches HLL sketch per hour
  // (the only stage that touches raw events), then answer every
  // trailing-24h distinct-user question by unioning 24 stored sketches
  // — the raw data is never rescanned per window. At 100 TB the
  // sketch relation is hours × ~1.5 KB regardless of event volume;
  // recounting each window exactly (the naive formulation) costs
  // 24× the scan. Contract oracle (q27/q52 pattern): the compared
  // columns carry the exact count and a boolean "estimate within 15%
  // of exact" (lgK=12 → ~1.6% rsd, so 15% is a ~9σ margin); the raw
  // estimate stays out of the hash.
  val q75: Q = (s, d) => {
    val ev = Events.read(s, d)
      .select(date_trunc("hour", col("ts")).as("hour"), col("user_id"))
    // hour-grain relations are tiny (≤ corpus hours); checkpoint the
    // sketch relation once for its three consumers (the window
    // composition + the anchor spine twice).
    val hourly = ev.groupBy(col("hour"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .localCheckpoint()
    // Window composition by EXPLODE onto the 24 anchors each hourly
    // sketch serves (hours × 24 rows, equi-shuffled) — not an hours ×
    // hours range self-join, whose BNLJ comparisons grow quadratically
    // in the corpus' time span (a decade of hours is 90k² ≈ 8G
    // predicate evaluations; the explode is 2M rows).
    val est = hourly
      .select(col("sk"), explode(expr(
        "sequence(hour, hour + INTERVAL 23 HOURS, INTERVAL 1 HOUR)"))
        .as("hour"))
      .join(broadcast(hourly.select(col("hour"))), Seq("hour"), "left_semi")
      .groupBy(col("hour"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    // Exact comparator as an interval DIFF ARRAY, O(pairs) instead of
    // the 24× explode — see [[SlidingDistinct.exact24h]] (measured r11:
    // the explode comparator cost 3.5× the sketch side it checks).
    val exact = SlidingDistinct.exact24h(ev.distinct(),
      hourly.select(col("hour")), shiftHours = 0)
    est.join(exact, Seq("hour"))
      .select(col("hour"), col("n_exact"),
        (abs(col("est").cast("double") - col("n_exact")) / col("n_exact")
          <= 0.15).as("hll_ok"))
  }

  val q75Sql: String = """
    WITH ev AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                       user_id
                FROM events),
    hours AS (SELECT DISTINCT hour FROM ev),
    pairs AS (SELECT DISTINCT hour, user_id FROM ev)
    SELECT h.hour, COUNT(DISTINCT p.user_id) AS n_exact, TRUE AS hll_ok
    FROM hours h JOIN pairs p
      ON p.hour >= h.hour - INTERVAL 23 HOUR AND p.hour <= h.hour
    GROUP BY 1"""

  // ---------------------------------------------------------------- q76
  // Session path mining — the clickstream question q20's sessions
  // exist to answer: which event-type PATHS do sessions actually
  // take, and how common is each? Reuses q20's lag→flag→running-count
  // session assignment verbatim, folds each session into its ordered
  // path string (first 5 events — the cap bounds both the string and
  // the path-space at |types|^5), counts sessions per path and keeps
  // the top 10 (ties broken by path text). Ordering inside a session
  // is (epoch-micros, event_id) via a sorted struct collect — exact
  // and engine-portable; the final top-10 window runs on the
  // path-count relation, which the cap keeps at ≤ 3,125 rows no
  // matter the corpus size.
  val q76: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val sess = Events.read(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = sess.groupBy(col("user_id"), col("session_idx"))
      .agg(expr("array_join(transform(slice(array_sort(collect_list(" +
        "struct(unix_micros(ts) as us, event_id as eid, " +
        "event_type as et))), 1, 5), x -> x.et), '>')").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path").asc)))
      .filter(col("rk") <= 10)
  }

  val q76Sql: String = """
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             LAG(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_es
      FROM events),
    sessions AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(CASE WHEN prev_es IS NULL OR es - prev_es > 1800
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_idx
      FROM flagged),
    p AS (
      SELECT user_id, session_idx,
             array_to_string(
               (list(event_type ORDER BY ts ASC, event_id ASC))[1:5], '>')
               AS path
      FROM sessions GROUP BY 1, 2),
    c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1)
    SELECT path, n_sessions, rk
    FROM (SELECT path, n_sessions,
                 CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC)
                   AS INTEGER) AS rk
          FROM c) t
    WHERE rk <= 10"""

  // ---------------------------------------------------------------- q77
  // Incremental aggregate maintenance (IVM) — the d10/d19/s16
  // discipline applied to the RELATIONAL layer: a daily summary must
  // absorb today's delta without rescanning history. The base/delta
  // split is deterministic (orders before vs from 1998-01-01); each
  // side aggregates independently into MERGEABLE partials (count, sum
  // — cents-exact longs), the partials merge with one tiny keyed
  // union-agg, and derived measures (the average) compute only at
  // read-out, never stored. The oracle is the FULL recompute over all
  // orders — merged(base ⊎ delta) must equal it row for row, which is
  // the entire correctness contract of incremental maintenance. At
  // scale the base partials are a stored dimension-sized relation;
  // per-day cost is the delta scan + a group-key-sized merge.
  val q77: Q = (s, d) => {
    val cut = lit("1998-01-01").cast("timestamp")
    // only MERGEABLE measures in the stored partials (count, sum) —
    // no countDistinct here: it is not mergeable and both consumers
    // re-derive n_cust from the auxiliary distinct-pairs relation, so
    // computing it per side would be a useless two-phase distinct agg
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    val base = partials(Tables.orders(s, d).filter(col("o_orderdate") < cut)
      .select(col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents")))
    val delta = partials(Tables.orders(s, d).filter(col("o_orderdate") >= cut)
      .select(col("o_orderstatus"),
        floor(col("o_totalprice") * 100).cast("long").as("cents")))
    // NOTE: count-distinct is NOT mergeable from plain partials — the
    // merged n_cust must re-derive from the union of per-side DISTINCT
    // customer sets (the standard IVM answer: keep the auxiliary
    // distinct relation, or an HLL sketch when approximation is
    // acceptable — q52). Here the auxiliary relation is the per-side
    // distinct (status, custkey) pairs.
    def custPairs(pred: org.apache.spark.sql.Column): DataFrame =
      Tables.orders(s, d).filter(pred)
        .select(col("o_orderstatus"), col("o_custkey")).distinct()
    val mergedCust = custPairs(col("o_orderdate") < cut)
      .unionAll(custPairs(col("o_orderdate") >= cut))
      .distinct()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_cust"))
    val merged = base.select(col("o_orderstatus"), col("n"), col("cents"))
      .unionAll(delta.select(col("o_orderstatus"), col("n"), col("cents")))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("n")).as("n_orders"), sum(col("cents")).as("total_cents"))
    merged.join(mergedCust, Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n_orders"), col("total_cents"),
        col("n_cust"),
        (col("total_cents").cast("double") / lit(100.0) / col("n_orders"))
          .as("avg_price"))
  }

  /** Oracle: the full recompute — incremental must equal it exactly. */
  val q77Sql: String = """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           COUNT(DISTINCT o_custkey) AS n_cust,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(*) AS avg_price
    FROM orders GROUP BY 1"""

  // ---------------------------------------------------------------- q78
  // Z-order layout planning — the lakehouse clustering step (Delta
  // OPTIMIZE ZORDER BY / Iceberg sort orders) that makes file-level
  // min-max skipping work on TWO predicate columns at once: interleave
  // the bits of (l_partkey, l_suppkey) into a Z-curve key, assign rows
  // to fixed-radix Z-ranges (the "files"), and emit each file's row
  // count + per-dimension min/max envelope — the footer stats a scan
  // planner prunes against — plus whether the file is prunable for a
  // demonstration predicate (l_partkey in [1200, 1400]): because the
  // Z-curve keeps both dimensions local, each file covers a small
  // RECTANGLE, so most files prune for a point/range predicate on
  // EITHER dimension — linear ordering by one column gets skipping on
  // that column only. The whole plan is one row-local codegen'd
  // projection (the 16-term interleave) + one hash aggregate on the
  // file id: one shuffle, no window, no sort — layout planning at 100
  // TB is exactly this shape, with the physical rewrite being
  // [[graft.load.Layout.writeZOrdered]] (the WRITER half of this
  // operator — same zValue expression; LayoutSpec measures the actual
  // file-skipping win vs a linear sort). Test keys fit 16 bits; at
  // warehouse scale the interleave runs on each dimension's TOP-16
  // rank bits (a width_bucket over stored quantiles) — same plan.
  private val ZBits = 16

  val q78: Q = (s, d) => {
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("zkey", graft.load.Layout.zValue(
        col("l_suppkey"), col("l_partkey"), ZBits))
      .withColumn("file_id", expr("zkey div 16384"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_p"), max(col("l_partkey")).as("max_p"),
        min(col("l_suppkey")).as("min_s"), max(col("l_suppkey")).as("max_s"))
      .withColumn("prunable",
        col("min_p") > lit(1400L) || col("max_p") < lit(1200L))
  }

  val q78Sql: String = {
    val z = (0 until ZBits).map { i =>
      s"(((l_partkey >> $i) & 1) << ${2 * i + 1})" +
        s" | (((l_suppkey >> $i) & 1) << ${2 * i})"
    }.mkString(" | ")
    s"""
    WITH z AS (SELECT l_partkey, l_suppkey, ($z) AS zkey FROM lineitem),
    f AS (SELECT zkey // 16384 AS file_id, l_partkey, l_suppkey FROM z)
    SELECT file_id, COUNT(*) AS n_rows,
           MIN(l_partkey) AS min_p, MAX(l_partkey) AS max_p,
           MIN(l_suppkey) AS min_s, MAX(l_suppkey) AS max_s,
           (MIN(l_partkey) > 1400 OR MAX(l_partkey) < 1200) AS prunable
    FROM f GROUP BY 1"""
  }

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01,
    "q02_filter_project" -> q02,
    "q03_join_broadcast" -> q03,
    "q04_star_join" -> q04,
    "q05_semi_join" -> q05,
    "q06_anti_join" -> q06,
    "q07_count_distinct" -> q07,
    "q08_rollup" -> q08,
    "q09_cube" -> q09,
    "q10_window_rank" -> q10,
    "q11_window_running" -> q11,
    "q12_topk" -> q12,
    "q13_intersect" -> q13,
    "q14_except" -> q14,
    "q15_string_funcs" -> q15,
    "q16_date_funcs" -> q16,
    "q17_case_buckets" -> q17,
    "q18_json_extract" -> q18,
    "q19_time_window" -> q19,
    "q20_sessionize" -> q20,
    "q21_above_avg" -> q21,
    "q22_left_outer" -> q22,
    "q23_full_outer" -> q23,
    "q24_range_join" -> q24,
    "q25_asof_join" -> q25,
    "q26_union_all" -> q26,
    "q27_approx_distinct" -> q27,
    "q28_ranking_family" -> q28,
    "q29_right_outer" -> q29,
    "q30_grouping_sets" -> q30,
    "q31_salted_agg" -> q31,
    "q32_moment_stats" -> q32,
    "q33_map_extract" -> q33,
    "q34_array_agg" -> q34,
    "q35_range_frame" -> q35,
    "q36_math_funcs" -> q36,
    "q37_correlated_subquery" -> q37,
    "q38_pivot" -> q38,
    "q39_explode" -> q39,
    "q40_sample_hash" -> q40,
    "q41_edit_distance" -> q41,
    "q42_quantiles" -> q42,
    "q43_rank_distribution" -> q43,
    "q44_date_spine" -> q44,
    "q45_try_arithmetic" -> q45,
    "q46_null_ordering" -> q46,
    "q47_schema_drift_union" -> q47,
    "q48_bag_set_ops" -> q48,
    "q49_latest_per_key" -> q49,
    "q50_bloom_prune" -> q50,
    "q51_approx_topk" -> q51,
    "q52_hll_sketch" -> q52,
    "q53_funnel" -> q53,
    "q54_retention" -> q54,
    "q55_grouping_id" -> q55,
    "q56_local_supplier" -> q56,
    "q57_cbo_stats_join" -> q57,
    "q58_skew_join" -> q58,
    "q59_bucket_quantiles" -> q59,
    "q60_bucketed_join" -> q60,
    "q61_partition_prune" -> q61,
    "q62_dynamic_prune" -> q62,
    "q63_recursive_cte" -> q63,
    "q64_unpivot" -> q64,
    "q65_markov" -> q65,
    "q66_window_values" -> q66,
    "q67_exists_subquery" -> q67,
    "q68_lateral_topk" -> q68,
    "q69_array_hof" -> q69,
    "q70_resample_locf" -> q70,
    "q71_asof_native" -> q71,
    "q72_interval_peak" -> q72,
    "q73_clamp_closed_form" -> q73,
    "q74_interval_peak_buckets" -> q74,
    "q75_sliding_distinct" -> q75,
    "q76_session_paths" -> q76,
    "q77_ivm_agg" -> q77,
    "q78_zorder_layout" -> q78)

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_join_broadcast" -> q03Sql,
    "q04_star_join" -> q04Sql,
    "q05_semi_join" -> q05Sql,
    "q06_anti_join" -> q06Sql,
    "q07_count_distinct" -> q07Sql,
    "q08_rollup" -> q08Sql,
    "q09_cube" -> q09Sql,
    "q10_window_rank" -> q10Sql,
    "q11_window_running" -> q11Sql,
    "q12_topk" -> q12Sql,
    "q13_intersect" -> q13Sql,
    "q14_except" -> q14Sql,
    "q15_string_funcs" -> q15Sql,
    "q16_date_funcs" -> q16Sql,
    "q17_case_buckets" -> q17Sql,
    "q18_json_extract" -> q18Sql,
    "q19_time_window" -> q19Sql,
    "q20_sessionize" -> q20Sql,
    "q21_above_avg" -> q21Sql,
    "q22_left_outer" -> q22Sql,
    "q23_full_outer" -> q23Sql,
    "q24_range_join" -> q24Sql,
    "q25_asof_join" -> q25Sql,
    "q26_union_all" -> q26Sql,
    "q27_approx_distinct" -> q27Sql,
    "q28_ranking_family" -> q28Sql,
    "q29_right_outer" -> q29Sql,
    "q30_grouping_sets" -> q30Sql,
    "q31_salted_agg" -> q31Sql,
    "q32_moment_stats" -> q32Sql,
    "q33_map_extract" -> q33Sql,
    "q34_array_agg" -> q34Sql,
    "q35_range_frame" -> q35Sql,
    "q36_math_funcs" -> q36Sql,
    "q37_correlated_subquery" -> q37Sql,
    "q38_pivot" -> q38Sql,
    "q39_explode" -> q39Sql,
    "q40_sample_hash" -> q40Sql,
    "q41_edit_distance" -> q41Sql,
    "q42_quantiles" -> q42Sql,
    "q43_rank_distribution" -> q43Sql,
    "q44_date_spine" -> q44Sql,
    "q45_try_arithmetic" -> q45Sql,
    "q46_null_ordering" -> q46Sql,
    "q47_schema_drift_union" -> q47Sql,
    "q48_bag_set_ops" -> q48Sql,
    "q49_latest_per_key" -> q49Sql,
    "q50_bloom_prune" -> q50Sql,
    "q51_approx_topk" -> q51Sql,
    "q52_hll_sketch" -> q52Sql,
    "q53_funnel" -> q53Sql,
    "q54_retention" -> q54Sql,
    "q55_grouping_id" -> q55Sql,
    "q56_local_supplier" -> q56Sql,
    "q57_cbo_stats_join" -> q57Sql,
    "q58_skew_join" -> q58Sql,
    "q59_bucket_quantiles" -> q59Sql,
    "q60_bucketed_join" -> q60Sql,
    "q61_partition_prune" -> q61Sql,
    "q62_dynamic_prune" -> q62Sql,
    "q63_recursive_cte" -> q63Sql,
    "q64_unpivot" -> q64Sql,
    "q65_markov" -> q65Sql,
    "q66_window_values" -> q66Sql,
    "q67_exists_subquery" -> q67Sql,
    "q68_lateral_topk" -> q68Sql,
    "q69_array_hof" -> q69Sql,
    "q70_resample_locf" -> q70Sql,
    "q71_asof_native" -> q25Sql,
    "q72_interval_peak" -> q72Sql,
    "q73_clamp_closed_form" -> q73Sql,
    "q74_interval_peak_buckets" -> q74Sql,
    "q75_sliding_distinct" -> q75Sql,
    "q76_session_paths" -> q76Sql,
    "q77_ivm_agg" -> q77Sql,
    "q78_zorder_layout" -> q78Sql)
}
