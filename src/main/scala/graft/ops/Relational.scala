package graft.ops

import graft.{Q, Tables}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator catalog over the driver star schema (TESTDATA.md).
  *
  * Covers SURVEY.md §2.2: projection, filter, joins
  * (broadcast/SMJ/semi/anti/as-of), aggregation (+rollup/grouping sets,
  * distinct), window functions (rank/running/lag-lead), sort/limit/top-k,
  * set ops, scalar string/date/math/array/map/json functions, tumbling
  * windows, scalar subqueries.
  *
  * Every query here has a DuckDB oracle; numeric parity rules are in
  * [[graft.Tables]]'s scaladoc. Scale notes are per-query: the driver runs
  * these at sf0.1 locally, but each plan is written for the 100 TB shape
  * (broadcast only the dimension side, aggregate before join where
  * possible, never collect).
  */
object Relational {

  // -- q01: full-table hash aggregate, TPC-H Q1 shape. Map-side partial
  //    agg (5 groups) makes the shuffle tiny at any scale.
  private val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      val li = lineitem(s, d).filter(col("l_shipdate") <= tsLit("1999-12-01 00:00:00"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """.trim))

  // -- q02: projection + filter; predicate and column pruning reach the
  //    parquet scan (PushedFilters). Per-row double math is
  //    order-independent, so no decimal detour needed.
  private val q02 = Q(
    "q02_filter_project",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_shipdate") >= tsLit("1996-01-01 00:00:00"))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .cast(DoubleType)
            .as("charge")),
    Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6)) AS DOUBLE) AS charge
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    """.trim))

  // -- q03: 3-way join + agg + top-k (TPC-H Q3 shape). customer is the
  //    dimension side -> broadcast; orders-lineitem co-shuffle on orderkey.
  private val q03 = Q(
    "q03_top_unshipped_orders",
    (s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < tsLit("1998-01-01 00:00:00"))
      val li = lineitem(s, d).filter(col("l_shipdate") > tsLit("1997-01-01 00:00:00"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("odate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    },
    Some("""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY o_orderkey, odate
      ORDER BY revenue DESC, o_orderkey ASC
      LIMIT 10
    """.trim))

  // -- q04: correlated EXISTS == left-semi join with a non-equi conjunct.
  private val q04 = Q(
    "q04_order_priority",
    (s, d) => {
      val o = orders(s, d)
      val li = lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(li, col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority
    """.trim))

  // -- q05: 6-way snowflake join (TPC-H Q5 shape). region/nation/supplier
  //    broadcast; the fact-side join keys stay co-partitioned.
  private val q05 = Q(
    "q05_regional_revenue",
    (s, d) => {
      val r = region(s, d).filter(col("r_name") === "ASIA")
      val n = nation(s, d)
      val c = customer(s, d)
      val sup = supplier(s, d)
      val o = orders(s, d).filter(
        col("o_orderdate") >= tsLit("1995-01-01 00:00:00") &&
          col("o_orderdate") < tsLit("2000-01-01 00:00:00"))
      val li = lineitem(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      GROUP BY n_name
    """.trim))

  // -- q06: selective scan-aggregate (TPC-H Q6 shape); no shuffle beyond
  //    the single-row final agg.
  private val q06 = Q(
    "q06_forecast_revenue",
    (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= tsLit("1996-01-01 00:00:00") &&
            col("l_shipdate") < tsLit("1997-01-01 00:00:00") &&
            col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 25)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue")),
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25
    """.trim))

  // -- q07: anti join (NOT EXISTS).
  private val q07 = Q(
    "q07_quiet_customers",
    (s, d) => {
      val recent = orders(s, d).filter(col("o_orderdate") >= tsLit("2000-01-01 00:00:00"))
      customer(s, d)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    """.trim))

  // -- q08: top-k per group via ranking window (partition-local sort, no
  //    global sort).
  private val q08 = Q(
    "q08_brand_topk",
    (s, d) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      part(s, d)
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")
    },
    Some("""
      SELECT p_brand, p_partkey, p_name, p_retailprice, rk
      FROM (SELECT p_brand, p_partkey, p_name, p_retailprice,
              row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
            FROM part) t
      WHERE rk <= 3
    """.trim))

  // -- q09: running-total window frame; exact decimal running sum keeps
  //    both engines bit-identical.
  private val q09 = Q(
    "q09_running_quantity",
    (s, d) => {
      val w = Window
        .partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(s, d)
        .filter(col("l_shipdate") >= tsLit("2001-01-01 00:00:00"))
        .withColumn("run_qty", sum(dec(col("l_quantity"))).over(w).cast(DoubleType))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "run_qty")
    },
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
    """.trim))

  // -- q10: global sort + limit (TakeOrderedAndProject, no full sort at
  //    scale).
  private val q10 = Q(
    "q10_top_customers",
    (s, d) =>
      customer(s, d)
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .limit(20)
        .select("c_custkey", "c_name", "c_acctbal"),
    Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer
      ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20
    """.trim))

  // -- q11: set operations (intersect / except / union all).
  private val q11 = Q(
    "q11_nation_setops",
    (s, d) => {
      val cn = customer(s, d).select(col("c_nationkey").as("nk")).distinct()
      val sn = supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
      val both = cn.intersect(sn).withColumn("tag", lit("both"))
      val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
      val suppOnly = sn.except(cn).withColumn("tag", lit("supp_only"))
      both.unionAll(custOnly).unionAll(suppOnly).select("tag", "nk")
    },
    Some("""
      WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
           sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
      SELECT 'both' AS tag, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
      UNION ALL
      SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
      UNION ALL
      SELECT 'supp_only' AS tag, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
    """.trim))

  // -- q12: ROLLUP hierarchy totals.
  private val q12 = Q(
    "q12_rollup",
    (s, d) =>
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty")),
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """.trim))

  // -- q13: GROUPING SETS.
  private val q13 = Q(
    "q13_grouping_sets",
    (s, d) =>
      lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"),
          col("l_linestatus"))
        .agg(count(lit(1)).as("cnt")),
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """.trim))

  // -- q14: scalar string functions.
  private val q14 = Q(
    "q14_string_fns",
    (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("pfx"),
        length(col("p_name")).cast(LongType).as("namelen"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("label"),
        regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"),
        regexp_replace(col("p_name"), "\\s+", "_").as("snake"),
        lower(col("p_type")).as("ltype")),
    Some("""
      SELECT p_partkey, upper(p_name) AS uname, substr(p_name, 1, 5) AS pfx,
        CAST(length(p_name) AS BIGINT) AS namelen,
        concat(p_brand, '#', p_type) AS label,
        regexp_extract(p_name, '[a-z]+') AS first_word,
        regexp_replace(p_name, '\s+', '_', 'g') AS snake,
        lower(p_type) AS ltype
      FROM part
    """.trim))

  // -- q15: date/time functions (DATE-typed outputs for tz-free parity).
  private val q15 = Q(
    "q15_date_fns",
    (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("omonth"),
        year(col("o_orderdate")).cast(IntegerType).as("oyear"),
        month(col("o_orderdate")).cast(IntegerType).as("omon"),
        dayofmonth(col("o_orderdate")).cast(IntegerType).as("oday"),
        quarter(col("o_orderdate")).cast(IntegerType).as("oquarter"),
        date_add(to_date(col("o_orderdate")), 30).as("due"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast(DateType))
          .cast(LongType)
          .as("days_since")),
    Some("""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS omonth,
        CAST(year(o_orderdate) AS INT) AS oyear,
        CAST(month(o_orderdate) AS INT) AS omon,
        CAST(day(o_orderdate) AS INT) AS oday,
        CAST(quarter(o_orderdate) AS INT) AS oquarter,
        CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
      FROM orders
    """.trim))

  // -- q16: scalar math functions (per-row double ops are deterministic).
  private val q16 = Q(
    "q16_math_fns",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("r1"),
          abs(col("l_discount") - 0.05).as("adisc"),
          ceil(col("l_quantity")).cast(LongType).as("cq"),
          floor(col("l_extendedprice")).cast(LongType).as("fp"),
          sqrt(col("l_quantity")).as("sq"),
          (col("l_orderkey") % 7).as("m7"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
          least(col("l_tax"), col("l_discount")).as("l")),
    Some("""
      SELECT l_orderkey, l_linenumber,
        round(l_extendedprice, 2) AS r1,
        abs(l_discount - 0.05) AS adisc,
        CAST(ceil(l_quantity) AS BIGINT) AS cq,
        CAST(floor(l_extendedprice) AS BIGINT) AS fp,
        sqrt(l_quantity) AS sq,
        l_orderkey % 7 AS m7,
        greatest(l_quantity, l_discount * 100) AS g,
        least(l_tax, l_discount) AS l
      FROM lineitem WHERE l_orderkey % 100 = 0
    """.trim))

  // -- q17: conditional aggregation (CASE WHEN inside agg).
  private val q17 = Q(
    "q17_case_agg",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_quantity") > 30, dec(col("l_extendedprice")))
            .otherwise(lit(0).cast(DecimalType(18, 4))))
            .cast(DoubleType)
            .as("big_rev"),
          count(when(col("l_discount") > 0.05, lit(1))).as("discounted"),
          sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("n_f")),
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN l_quantity > 30 THEN CAST(l_extendedprice AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS big_rev,
        COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS discounted,
        CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
      FROM lineitem GROUP BY l_returnflag
    """.trim))

  // -- q18: HAVING (post-aggregation filter).
  private val q18 = Q(
    "q18_having",
    (s, d) =>
      orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 3),
    Some("""
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      GROUP BY o_custkey HAVING COUNT(*) >= 3
    """.trim))

  // -- q19: scalar subquery via broadcast cross-join of a 1-row aggregate
  //    (stays fully distributed; no driver collect).
  private val q19 = Q(
    "q19_above_avg_parts",
    (s, d) => {
      val p = part(s, d)
      val avgDf = p.agg((sum(dec(col("p_retailprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"))
      p.crossJoin(broadcast(avgDf))
        .filter(col("p_retailprice") > col("avg_price"))
        .select("p_partkey", "p_name", "p_retailprice")
    },
    Some("""
      SELECT p_partkey, p_name, p_retailprice FROM part
      WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                             FROM part)
    """.trim))

  // -- q20: JSON extraction from a string column + aggregation.
  private val q20 = Q(
    "q20_json_extract",
    (s, d) =>
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy("event_type")
        .agg(
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          count(lit(1)).as("n")),
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        COUNT(*) AS n
      FROM events GROUP BY event_type
    """.trim))

  // -- q21: array functions over tokenized text.
  private val q21 = Q(
    "q21_array_fns",
    (s, d) =>
      documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).cast(LongType).as("n_tokens"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          array_contains(col("toks"), "spark").as("has_spark"),
          size(array_distinct(col("toks"))).cast(LongType).as("n_distinct"),
          array_join(slice(sort_array(array_distinct(col("toks"))), 1, 3), ",").as("first3_sorted")),
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        string_split(text, ' ')[1] AS first_tok,
        string_split(text, ' ')[-1] AS last_tok,
        list_contains(string_split(text, ' '), 'spark') AS has_spark,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3_sorted
      FROM documents
    """.trim))

  // -- q22: as-of join (see AsOfJoin scaladoc for the 100 TB-safe plan).
  //    The body and oracle are shared with q22b (Relational4), which
  //    runs the SAME question through the native physical operator —
  //    one definition keeps the pair an exact A/B of the two
  //    formulations.
  private[ops] def asofQuery(
      joinFn: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, Seq[String]) => org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev
        .filter(col("event_type") === "view")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("view_event_id"))
      joinFn(purchases, views, "user_id", "ts", Seq("view_event_id"))
        .select(
          col("event_id"),
          col("user_id"),
          epochS(col("ts")).as("ts_s"),
          col("view_event_id"))
    }

  private[ops] val asofOracle: String = """
      WITH v AS (SELECT user_id, ts, MAX(event_id) AS view_event_id
                 FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
           p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id,
        CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_s,
        v.view_event_id
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """.trim

  private val q22 = Q("q22_asof_join", asofQuery(AsOfJoin.asofLeft), Some(asofOracle))

  // -- q23: tumbling time window (batch image of the streaming window op).
  private val q23 = Q(
    "q23_tumbling_window",
    (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
        .select(
          epochS(col("window.start")).as("hour_s"),
          col("event_type"),
          col("n"),
          col("sum_value")),
    Some("""
      SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts))) AS BIGINT) AS hour_s,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    """.trim))

  // -- q24: multi count-distinct (expand-based).
  private val q24 = Q(
    "q24_count_distinct",
    (s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n")),
    Some("""
      SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n
      FROM lineitem
    """.trim))

  // -- q24b: HLL sketch count-distinct, oracle-checkable as an
  //    estimate-within-bound invariant: the query emits the EXACT
  //    distinct counts (DuckDB recomputes those) plus booleans
  //    asserting the rsd=0.01 HLL estimate lands within 5% of exact —
  //    a 5-sigma margin, robust to testdata regeneration. The sketch
  //    stays engine-internal; the bound is the driver's hard signal.
  //    Exact and approx run as SEPARATE single-row aggregations joined
  //    at the end: mixing countDistinct with approx_count_distinct in
  //    one agg puts the HLL under the multi-distinct Expand rewrite,
  //    where partial_approx_count_distinct is keyed by the distinct
  //    values themselves — one 16 KB rsd=0.01 HLL buffer PER DISTINCT
  //    KEY (measured 8.1 s vs 0.8 s for q24's pure-distinct plan at
  //    sf0.1; split, the HLL is one global buffer per partition again).
  private val q24b = Q(
    "q24b_approx_count_distinct",
    (s, d) => {
      val li = lineitem(s, d)
      val exact = li.agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      val approx = li.agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
      exact.crossJoin(approx) // 1-row x 1-row
        .select(
          col("n_parts"),
          col("n_orders"),
          (abs(col("ap") - col("n_parts")) <= col("n_parts") * lit(0.05))
            .cast(LongType).as("parts_within_5pct"),
          (abs(col("ao") - col("n_orders")) <= col("n_orders") * lit(0.05))
            .cast(LongType).as("orders_within_5pct"))
    },
    Some("""
      SELECT COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_orderkey) AS n_orders,
             CAST(1 AS BIGINT) AS parts_within_5pct,
             CAST(1 AS BIGINT) AS orders_within_5pct
      FROM lineitem
    """.trim))

  // -- q25: lag/lead navigation windows.
  private val q25 = Q(
    "q25_lag_lead",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .select(
          col("user_id"),
          col("event_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("dv"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          row_number().over(w).cast(LongType).as("seq"))
    },
    Some("""
      SELECT user_id, event_id,
        value - lag(value, 1) OVER w AS dv,
        lead(event_type, 1) OVER w AS next_type,
        CAST(row_number() OVER w AS BIGINT) AS seq
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """.trim))

  val queries: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13,
    q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q24b, q25)
}
