package graft.ops

import graft.Q
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second relational batch, completing SURVEY §2.2: CUBE, map
  * functions, json functions, multiset set-ops, the full ranking-window
  * family, RANGE frames, sliding + session time windows, and a custom
  * typed Aggregator registered as a UDAF.
  */
object Relational2 {

  // -- q26: CUBE totals.
  private val q26 = Q(
    "q26_cube",
    (s, d) =>
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty")),
    Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """.trim))

  // -- q27: MapType construction + map functions (the oracle validates
  //    the extracted scalars; the map ops themselves are Spark-side).
  private val q27 = Q(
    "q27_map_fns",
    (s, d) => {
      val m = map(
        lit("k"), get_json_object(col("props"), "$.k").cast(LongType),
        lit("uid"), col("user_id"))
      events(s, d)
        .withColumn("m", m)
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), ",").as("keys_csv"),
          element_at(col("m"), "k").as("k_val"),
          element_at(col("m"), "uid").as("uid_val"),
          size(col("m")).cast(LongType).as("n_entries"),
          // null map values propagate (matches the oracle's NULL + x)
          aggregate(map_values(col("m")), lit(0L), (a, x) => a + x).as("vals_sum"))
    },
    Some("""
      SELECT event_id, 'k,uid' AS keys_csv,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        user_id AS uid_val,
        CAST(2 AS BIGINT) AS n_entries,
        CAST(json_extract_string(props, '$.k') AS BIGINT) + user_id AS vals_sum
      FROM events
    """.trim))

  // -- q28: json functions — to_json / json_tuple / from_json.
  private val q28 = Q(
    "q28_json_fns",
    (s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          to_json(struct(col("event_type").as("t"), col("user_id").as("u"))).as("j"),
          json_tuple(col("props"), "k").as("k_str"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k_int")),
    Some("""
      SELECT event_id,
        CAST(to_json(struct_pack(t := event_type, u := user_id)) AS VARCHAR) AS j,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS INT) AS k_int
      FROM events
    """.trim))

  // -- q29: multiset set ops (INTERSECT ALL / EXCEPT ALL).
  private val q29 = Q(
    "q29_multiset_setops",
    (s, d) => {
      val o = orders(s, d)
      val urgent = o.filter(col("o_orderpriority") === "URGENT").select(col("o_custkey").as("ck"))
      val high = o.filter(col("o_orderpriority") === "HIGH").select(col("o_custkey").as("ck"))
      urgent.intersectAll(high).withColumn("tag", lit("both"))
        .unionAll(urgent.exceptAll(high).withColumn("tag", lit("urgent_extra")))
        .select("tag", "ck")
    },
    Some("""
      WITH u AS (SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = 'URGENT'),
           h AS (SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = 'HIGH')
      SELECT 'both' AS tag, ck FROM (SELECT ck FROM u INTERSECT ALL SELECT ck FROM h)
      UNION ALL
      SELECT 'urgent_extra' AS tag, ck FROM (SELECT ck FROM u EXCEPT ALL SELECT ck FROM h)
    """.trim))

  // -- q30: full ranking family over a partitioned window.
  private val q30 = Q(
    "q30_rank_family",
    (s, d) => {
      val w = Window.partitionBy("p_type").orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      part(s, d).select(
        col("p_type"),
        col("p_partkey"),
        rank().over(w).cast(LongType).as("rnk"),
        dense_rank().over(w).cast(LongType).as("drnk"),
        row_number().over(w).cast(LongType).as("rn"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"))
    },
    Some("""
      SELECT p_type, p_partkey,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        CAST(row_number() OVER w AS BIGINT) AS rn,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        round(percent_rank() OVER w, 6) AS prank,
        round(cume_dist() OVER w, 6) AS cdist
      FROM part
      WINDOW w AS (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey ASC)
    """.trim))

  // -- q31: RANGE frame — trailing 30-day quantity per supplier.
  private val q31 = Q(
    "q31_range_frame",
    (s, d) => {
      val day = datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast(DateType))
        .cast(LongType)
      val w = Window.partitionBy("l_suppkey").orderBy(col("day")).rangeBetween(-30, 0)
      lineitem(s, d)
        .filter(col("l_shipdate") >= tsLit("2001-01-01 00:00:00"))
        .withColumn("day", day)
        .withColumn("qty_30d", sum(dec(col("l_quantity"))).over(w).cast(DoubleType))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "day", "qty_30d")
    },
    Some("""
      WITH f AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
                   CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS day
                 FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
      SELECT l_suppkey, l_orderkey, l_linenumber, day,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
             OVER (PARTITION BY l_suppkey ORDER BY day
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_30d
      FROM f
    """.trim))

  // -- q32: sliding time window (1h every 15min) — each event lands in
  //    4 overlapping windows.
  private val q32 = Q(
    "q32_sliding_window",
    (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          epochS(col("window.start")).as("ws"),
          col("event_type"),
          col("n")),
    Some("""
      SELECT CAST(floor(epoch(time_bucket(INTERVAL '15 minutes', ts) - i.i * INTERVAL '15 minutes')) AS BIGINT) AS ws,
        event_type, COUNT(*) AS n
      FROM events, (SELECT unnest(range(4)) AS i) i
      GROUP BY 1, 2
    """.trim))

  // -- q33: session window (30-min gap per user). Spark sessions are
  //    end-exclusive (an event exactly gap after the last starts a new
  //    session) — the oracle's islands use strict `<` to match.
  private val q33 = Q(
    "q33_session_window",
    (s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          epochS(col("session_window.start")).as("s_start"),
          col("n_events")),
    Some("""
      WITH e AS (SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
                 FROM events),
      s AS (SELECT user_id, ts,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
            FROM e)
      SELECT user_id, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS s_start, COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid
    """.trim))

  // -- q34: custom typed Aggregator as a UDAF — merge-order-invariant
  //    exact decimal sum (the u128 discipline as a reusable aggregate).
  private val q34 = Q(
    "q34_custom_aggregator",
    (s, d) => {
      val exactSum = udaf(new Aggregators.ExactDecimalSum)
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(exactSum(col("l_extendedprice")).as("exact_rev"), count(lit(1)).as("n"))
    },
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS exact_rev,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag
    """.trim))

  val queries: Seq[Q] = Seq(q26, q27, q28, q29, q30, q31, q32, q33, q34)
}
