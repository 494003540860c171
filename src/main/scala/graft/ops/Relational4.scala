package graft.ops

import graft.Q
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth relational batch: reshaping (pivot/unpivot) and the interval
  * range join.
  *
  * 100 TB notes per operator:
  *  - q35 pivot: one hash-aggregate shuffle keyed on the group column;
  *    the pivoted value list is declared explicitly (`Seq("F","O")`) so
  *    Spark skips the extra distinct-values job it otherwise runs first.
  *  - q39 unpivot: `stack` is a map-side generator — rows multiply
  *    AFTER the aggregation shuffle, so the wide->long reshape is free.
  *  - q40 range join: equi-key (user) + bounded time band as residual.
  *    The equi key keeps it a shuffle/broadcast hash join with the band
  *    as a cheap post-filter — never an unbounded interval cross-join;
  *    candidate count per row is bounded by per-user activity in the
  *    10-minute window, independent of corpus size.
  */
object Relational4 {

  // -- q35: PIVOT — wide sums per linestatus (fills the q35 numbering
  //    gap with the one reshape op the catalog lacked).
  private val q35 = Q(
    "q35_pivot",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))))
        .select(
          col("l_returnflag"),
          col("F").cast(DoubleType).as("qty_f"),
          col("O").cast(DoubleType).as("qty_o")),
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_f,
        CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_o
      FROM lineitem GROUP BY 1
    """.trim))

  // -- q39: UNPIVOT — wide aggregate melted to (measure, value) rows
  //    via the stack generator.
  private val q39 = Q(
    "q39_unpivot",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"))
        .selectExpr(
          "l_returnflag",
          "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price, " +
            "'sum_disc_price', sum_disc_price) AS (measure, value)"),
    Some("""
      WITH a AS (SELECT l_returnflag,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
          CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
      UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
      UNION ALL SELECT l_returnflag, 'sum_disc_price', sum_disc_price FROM a
    """.trim))

  // -- q40: interval range join — for every purchase, activity of the
  //    same user in the preceding 10 minutes. Microsecond arithmetic on
  //    both engines (events are µs-aligned; Spark `div 1000` of the
  //    nano column ≡ DuckDB epoch_us of the µs-truncated timestamp).
  private val q40 = Q(
    "q40_range_join",
    (s, d) => {
      val ev = events(s, d)
      val p = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("purchase_id"),
          col("user_id").as("p_user"),
          expr("ts_ns div 1000").as("p_us"))
      val e = ev.select(
        col("user_id").as("e_user"),
        expr("ts_ns div 1000").as("e_us"),
        col("event_id").as("prior_id"),
        col("event_type").as("prior_type"))
      p.join(
          e,
          col("p_user") === col("e_user") &&
            col("e_us") >= col("p_us") - lit(600000000L) && col("e_us") < col("p_us"),
          "left")
        .groupBy("purchase_id")
        .agg(
          count(col("prior_id")).as("n_prior"),
          countDistinct(col("prior_type")).as("n_prior_types"))
    },
    Some("""
      WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
                 FROM events WHERE event_type = 'purchase'),
           e AS (SELECT user_id, epoch_us(ts) AS e_us, event_id, event_type FROM events)
      SELECT p.purchase_id,
             count(e.event_id) AS n_prior,
             count(DISTINCT e.event_type) AS n_prior_types
      FROM p LEFT JOIN e
        ON e.user_id = p.user_id AND e.e_us >= p.p_us - 600000000 AND e.e_us < p.p_us
      GROUP BY 1
    """.trim))

  // -- q41/q42: the SQL-parser surface. Every other catalog entry
  //    declares its plan through the DataFrame API; these two go
  //    through `spark.sql(...)` over temp views — correlated EXISTS and
  //    a scalar subquery — proving the engine's full SQL path (parse →
  //    analyze → Catalyst's subquery decorrelation into semi/broadcast
  //    joins) end-to-end. Same executed plan shapes as the DataFrame
  //    forms, so every 100 TB property carries over unchanged.
  private val q41 = Q(
    "q41_sql_exists",
    (s, d) => {
      customer(s, d).createOrReplaceTempView("v_customer")
      orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT c_custkey, c_name
        FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM v_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
      """)
    },
    Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 300000)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'F')
    """.trim))

  private val q42 = Q(
    "q42_sql_scalar_subquery",
    (s, d) => {
      lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql("""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_above
        FROM v_lineitem
        WHERE CAST(l_quantity AS DECIMAL(18,4)) >
              (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) / COUNT(*) AS DECIMAL(18,4))
               FROM v_lineitem)
        GROUP BY l_returnflag
      """)
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n_above
      FROM lineitem
      WHERE CAST(l_quantity AS DECIMAL(18,4)) >
            (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) / COUNT(*) AS DECIMAL(18,4))
             FROM lineitem)
      GROUP BY l_returnflag
    """.trim))

  // -- z01: Z-order (Morton) clustering key — the lake-layout operator:
  //    sort/partition by the interleaved key and parquet min/max zone
  //    maps prune 2-D range predicates. Native codegen ZOrder2
  //    expression; the oracle expands the same 10-bit interleave as
  //    integer bit math. DISTINCT before the top-k makes the z order
  //    total (the key is bijective on distinct (x, y)), so LIMIT has no
  //    tie ambiguity between engines.
  private val z01 = Q(
    "z01_zorder_key",
    (s, d) =>
      lineitem(s, d)
        .select(
          (col("l_orderkey") % 1024).as("x"),
          (col("l_partkey") % 1024).as("y"))
        .distinct()
        .select(col("x"), col("y"),
          graft.functions.ColumnFns.zorder2(col("x"), col("y")).as("z"))
        .orderBy("z")
        .limit(50),
    Some {
      val terms = (0 until 10).flatMap(b => Seq(
        s"(((x >> $b) & 1) << ${2 * b})",
        s"(((y >> $b) & 1) << ${2 * b + 1})"))
      s"""
      SELECT x, y, CAST(${terms.mkString(" | ")} AS BIGINT) AS z
      FROM (SELECT DISTINCT l_orderkey % 1024 AS x, l_partkey % 1024 AS y
            FROM lineitem)
      ORDER BY z LIMIT 50
      """.trim
    })

  // -- q22b: the SAME as-of join as q22, through the whole-operator
  //    Catalyst path — custom AsOfJoinNode logical plan, planned by the
  //    injected AsOfJoinStrategy into a sorted-merge AsOfJoinExec (one
  //    shuffle + sort per side, O(1) merge state per partition; see
  //    graft.plans.NativeAsOf). Identical oracle to q22, so the driver
  //    hash-verifies the physical operator's output against DuckDB's
  //    native ASOF JOIN.
  private val q22b = Q(
    "q22b_asof_native",
    Relational.asofQuery(AsOfJoin.asofNative),
    Some(Relational.asofOracle))

  // -- q43: FULL OUTER join — the one join type the catalog lacked.
  //    Daily order counts vs daily ship counts: the date ranges only
  //    partly overlap (shipments trail orders), so both null sides are
  //    genuinely exercised. Plan shape: two partial+final aggregations
  //    then a sort-merge full join on the (already shuffled) date key —
  //    agg-grain inputs, never a fact-fact outer blow-up.
  private val q43 = Q(
    "q43_full_outer",
    (s, d) => {
      val o = orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n_orders"))
      val l = lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(count(lit(1)).as("n_ships"))
      o.join(l, Seq("d"), "full")
        .select(
          col("d"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_ships"), lit(0L)).as("n_ships"))
    },
    Some("""
      WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
                 FROM orders GROUP BY 1),
           l AS (SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
                 FROM lineitem GROUP BY 1)
      SELECT COALESCE(o.d, l.d) AS d,
             COALESCE(o.n_orders, 0) AS n_orders,
             COALESCE(l.n_ships, 0) AS n_ships
      FROM o FULL OUTER JOIN l ON o.d = l.d
    """.trim))

  // -- q44: LATERAL correlated subquery in FROM — the third SQL-parser
  //    surface after EXISTS (q41) and scalar subqueries (q42). Catalyst
  //    decorrelates the per-row lateral aggregate into a join +
  //    aggregation, so the executed plan carries no per-row subquery
  //    execution — the property that makes LATERAL safe at fact-table
  //    cardinality.
  private val q44 = Q(
    "q44_sql_lateral",
    (s, d) => {
      nation(s, d).createOrReplaceTempView("v_nation")
      customer(s, d).createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT n.n_name, t.n_cust, t.total_bal
        FROM v_nation n,
        LATERAL (SELECT COUNT(*) AS n_cust,
                        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
                 FROM v_customer c
                 WHERE c.c_nationkey = n.n_nationkey) t
      """)
    },
    Some("""
      SELECT n.n_name, t.n_cust, t.total_bal
      FROM nation n,
      LATERAL (SELECT COUNT(*) AS n_cust,
                      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
               FROM customer c
               WHERE c.c_nationkey = n.n_nationkey) t
    """.trim))

  // -- q45: RECURSIVE CTE — data-dependent event chains. Sessionizes
  //    each user's timeline by following rn -> rn+1 links while the gap
  //    stays under 10 minutes; the recursion terminates naturally
  //    because rn strictly increases (a DAG walk, no cycle risk under
  //    UNION ALL). 100 TB shape: iteration count = longest chain (4 at
  //    sf0.1), and every iteration is one equi-join on (user_id, rn) —
  //    shuffle-partitioned by user, never a cross join; the anchor is a
  //    lag-window scan, no self-join.
  /** q45's recursion body over any (event_id, user_id, us) frame —
    * shared with the property test that fuzzes it against the
    * window-sessionization formulation on random event sets.
    */
  def chainStats(s: org.apache.spark.sql.SparkSession,
      ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // materialize the windowed base ONCE: each recursion iteration
    // replans a scan of the referenced relation, so an uncached view
    // would redo the source read + rn/lag window per loop — linear
    // in depth x corpus instead of depth x frontier (at lake scale,
    // substitute a checkpoint for the cache; the recursion itself is
    // unchanged)
    val base = ev
      .selectExpr(
        "user_id", "us",
        "CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS rn",
        "lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us")
      .cache()
    base.createOrReplaceTempView("v_chain_base")
    s.sql("""
      WITH RECURSIVE chain(user_id, anchor, rn, us) AS (
        SELECT user_id, rn, rn, us FROM v_chain_base
        WHERE prev_us IS NULL OR us > prev_us + 600000000
        UNION ALL
        SELECT c.user_id, c.anchor, n.rn, n.us
        FROM chain c JOIN v_chain_base n
          ON n.user_id = c.user_id AND n.rn = c.rn + 1
         AND n.us <= c.us + 600000000)
      SELECT user_id,
             CAST(count(DISTINCT anchor) AS BIGINT) AS n_chains,
             CAST(max(cnt) AS BIGINT) AS longest_chain
      FROM (SELECT user_id, anchor, count(*) AS cnt
            FROM chain GROUP BY user_id, anchor)
      GROUP BY user_id
    """)
  }

  private val q45 = Q(
    "q45_sql_recursive",
    (s, d) => chainStats(s,
      events(s, d).selectExpr("event_id", "user_id", "ts_ns div 1000 AS us")),
    Some("""
      WITH RECURSIVE e AS (
        SELECT user_id, us,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS rn,
               lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)),
      chain(user_id, anchor, rn, us) AS (
        SELECT user_id, rn, rn, us FROM e
        WHERE prev_us IS NULL OR us > prev_us + 600000000
        UNION ALL
        SELECT c.user_id, c.anchor, n.rn, n.us
        FROM chain c JOIN e n
          ON n.user_id = c.user_id AND n.rn = c.rn + 1
         AND n.us <= c.us + 600000000)
      SELECT user_id,
             CAST(count(DISTINCT anchor) AS BIGINT) AS n_chains,
             CAST(max(cnt) AS BIGINT) AS longest_chain
      FROM (SELECT user_id, anchor, count(*) AS cnt
            FROM chain GROUP BY user_id, anchor)
      GROUP BY user_id
    """.trim))

  // -- q46: VARIANT — Spark 4's semi-structured type. parse_json
  //    shreds the props payload once into the binary VARIANT encoding;
  //    variant_get path-extracts with a declared result type, so the
  //    aggregation below runs on typed longs, not strings (vs q20's
  //    get_json_object, which re-parses text per access). Map-side
  //    extraction + one hash-aggregate shuffle.
  private val q46 = Q(
    "q46_variant",
    (s, d) =>
      events(s, d)
        .selectExpr(
          "event_type",
          // try_parse_json, not parse_json: a malformed payload must
          // become a NULL the aggregate skips (as the oracle's
          // json_extract does), not an ANSI runtime error — the same
          // crash-vs-clean divergence class as the v03 bigram guard
          "variant_get(try_parse_json(props), '$.k', 'bigint') AS k")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k")),
    Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY 1
    """.trim))

  // -- q47: mergeable top-k — the two-phase sketch pattern that scales
  //    to 1000 executors: approx_top_k_accumulate builds one bounded
  //    state per day partition (map-side), approx_top_k_combine merges
  //    the states associatively, approx_top_k_estimate reads out the
  //    final ranking. With maxItemsTracked (64) >= the domain size the
  //    counts are exact, which is what makes the entry oracle-checkable;
  //    at an unbounded domain the same plan degrades gracefully to an
  //    estimate instead of blowing up state.
  private val q47 = Q(
    "q47_approx_top_k",
    (s, d) =>
      events(s, d)
        .selectExpr("date_trunc('DAY', ts) AS day", "event_type")
        .groupBy("day")
        .agg(expr("approx_top_k_accumulate(event_type, 64)").as("st"))
        .agg(expr("approx_top_k_estimate(approx_top_k_combine(st, 64), 5)").as("top"))
        .selectExpr("explode(top) AS t")
        .selectExpr("t.item AS event_type", "CAST(t.count AS BIGINT) AS n_events"),
    // the oracle carries the SAME top-5 cut as the sketch read-out (not
    // a bare GROUP BY that happens to match because the generator emits
    // exactly 5 event types): a wider domain keeps the gate comparing
    // k-vs-k instead of failing on row count with no hint that the
    // k/domain coupling is the cause. Exactness below capacity (64)
    // still licenses the compare; a count TIE at the k boundary is the
    // one case the estimate may legitimately order differently.
    Some("""
      SELECT event_type, count(*) AS n_events FROM events
      GROUP BY 1 ORDER BY n_events DESC, event_type LIMIT 5
    """.trim))

  // -- q48: theta sketch — distinct counting that stays SET-ALGEBRAIC:
  //    unlike HLL, theta sketches support union/intersection/difference
  //    after aggregation, so per-group sketches roll up to any coarser
  //    grain without rescanning (the 100 TB property: one scan, every
  //    rollup). Below the sketch's nominal capacity (default 2^12 =
  //    4096 retained hashes) the estimate is exact and deterministic —
  //    true for this corpus's user cardinality at every driver SF —
  //    which is what licenses the DuckDB oracle.
  private val q48 = Q(
    "q48_theta_distinct",
    (s, d) => {
      // sketch-per-group frame is group-cardinality-sized; caching it
      // keeps the per-type branch and the union rollup at ONE corpus
      // scan instead of two (the whole point of mergeable sketches)
      val g = events(s, d)
        .groupBy("event_type")
        .agg(expr("theta_sketch_agg(user_id)").as("sk"))
        .cache()
      g.selectExpr(
          "event_type",
          "CAST(theta_sketch_estimate(sk) AS BIGINT) AS n_users")
        .union(g
          .agg(expr("theta_sketch_estimate(theta_union_agg(sk))").as("e"))
          .selectExpr("'_all' AS event_type", "CAST(e AS BIGINT) AS n_users"))
    },
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1
      UNION ALL
      SELECT '_all' AS event_type, count(DISTINCT user_id) AS n_users FROM events
    """.trim))

  // -- q49: try_* arithmetic — the ANSI-mode safety valve. Spark 4
  //    runs ANSI by default, so integer mod/div by zero and bigint
  //    overflow THROW mid-pipeline; the try_* family turns the poison
  //    rows into NULLs the aggregates then count and exclude — the
  //    per-row error-handling shape a 100 TB job needs (one bad row
  //    must not kill a 1000-executor stage). All three production
  //    poisons in one entry: try_mod / try_divide (divide-by-zero, the
  //    commonest) / try_multiply (bigint overflow: only quantity = 50
  //    rows overflow against the 1.85e17 factor — ~2% of the table, so
  //    both arms are exercised at every SF while the poison stays RARE,
  //    which matters for cost: TRY-mode multiply catches a JVM
  //    exception per overflowing row, and a 40%-overflow variant of
  //    this entry measured 5.2 s vs ~1 s at sf0.1; divide-by-zero is a
  //    plain checked branch, so its 14% rate is free). Quotients are
  //    imaged as DECIMAL(18,6) per row before SUM (order-invariant;
  //    denominators are 1..6, whose decimal expansions never
  //    round-boundary at 6 digits); everything else is exact integers.
  private val q49 = Q(
    "q49_try_arith",
    (s, d) =>
      lineitem(s, d)
        .selectExpr(
          "l_returnflag",
          "try_mod(CAST(l_quantity AS BIGINT), CAST(l_linenumber - 1 AS BIGINT)) AS r",
          "try_divide(CAST(l_quantity AS BIGINT), CAST(l_linenumber - 1 AS BIGINT)) AS q",
          "try_multiply(CAST(l_quantity AS BIGINT), 185000000000000000L) AS m")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("r").isNull, 1L).otherwise(0L)).as("n_mod0"),
          sum(coalesce(col("r"), lit(0L))).as("mod_sum"),
          sum(col("q").cast("decimal(18,6)")).cast(DoubleType).as("div_sum"),
          sum(when(col("m").isNull, 1L).otherwise(0L)).as("n_mul_ovf")),
    Some("""
      SELECT l_returnflag, count(*) AS n,
        CAST(SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_mod0,
        CAST(SUM(CASE WHEN l_linenumber = 1 THEN 0
                 ELSE CAST(l_quantity AS BIGINT) % (l_linenumber - 1) END) AS BIGINT) AS mod_sum,
        CAST(SUM(CASE WHEN l_linenumber = 1 THEN NULL
                 ELSE CAST(CAST(l_quantity AS BIGINT) / CAST(l_linenumber - 1 AS BIGINT)
                           AS DECIMAL(18,6)) END) AS DOUBLE) AS div_sum,
        CAST(SUM(CASE WHEN CAST(l_quantity AS BIGINT) >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_mul_ovf
      FROM lineitem GROUP BY 1
    """.trim))

  // -- q50: two-phase salted aggregation — the skew shape AQE can't
  //    fix (AQE splits skewed JOIN partitions, not skewed AGG keys).
  //    l_returnflag has 3 values over the whole corpus, so a plain
  //    groupBy funnels everything through 3 reducers no matter the
  //    cluster size; the salt spreads each hot key over 16 partials
  //    first (map-side-combined), then merges partials per key. The
  //    DECIMAL image keeps the two-phase sum bit-equal to the oracle's
  //    one-phase sum — the exactness-under-parallelism house rule.
  private val q50 = Q(
    "q50_salted_agg",
    (s, d) =>
      Skew.saltedAgg(
        lineitem(s, d).select(col("l_returnflag"), dec(col("l_quantity")).as("q")),
        "l_returnflag",
        buckets = 16,
        partials = Seq(
          "part_qty" -> sum(col("q")),
          "part_n" -> count(lit(1))),
        merges = Seq(
          "sum_qty" -> sum(col("part_qty")).cast(DoubleType),
          "n_rows" -> sum(col("part_n")))),
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             count(*) AS n_rows
      FROM lineitem GROUP BY 1
    """.trim))

  // -- q51: keep-latest compaction — the CDC/upsert materialization
  //    pattern: collapse an append-only change stream to the newest
  //    record per key (here: each user's latest event, ties broken by
  //    event_id so the result is total). One window shuffle keyed on
  //    user_id; Spark plans a PARTIAL WindowGroupLimit before the
  //    exchange (asserted for the top-k family in PlanAuditSpec), so
  //    each map task forwards only its own per-key newest rows — the
  //    shuffle carries candidates, not the full change history.
  private val q51 = Q(
    "q51_latest_per_key",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_ns").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 6).as("value"))
    },
    Some("""
      SELECT user_id, event_id, event_type, round(value, 6) AS value
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) = 1
    """.trim))

  // -- q52: SQL-defined scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN`)
  //    — business logic shared as a catalog object instead of a JVM
  //    jar. Because the body is SQL, Catalyst inlines it into the
  //    calling plan (full codegen, pushdown through it) — unlike a
  //    Scala UDF black box. The oracle inlines the same expression; the
  //    per-row DECIMAL(18,6) image before SUM keeps the aggregate
  //    order-invariant (scale 6, not 4: a 3-factor product of 2-dp
  //    inputs is exact at scale 6 — the Tables.dec6 house rule).
  private val q52 = Q(
    "q52_sql_udf",
    (s, d) => {
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(
                 price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
               RETURN price * (1.0 - disc) * (1.0 + tax)""")
      lineitem(s, d).createOrReplaceTempView("v_lineitem52")
      s.sql("""
        SELECT l_returnflag,
               CAST(SUM(CAST(graft_margin(l_extendedprice, l_discount, l_tax)
                             AS DECIMAL(18,6))) AS DOUBLE) AS margin,
               CAST(count(*) AS BIGINT) AS n
        FROM v_lineitem52 GROUP BY l_returnflag
      """)
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                           AS DECIMAL(18,6))) AS DOUBLE) AS margin,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    """.trim))

  // -- q53: CDC MERGE/upsert APPLY — q51 collapses a change stream to
  //    latest-per-key; this is the other half: applying a change batch
  //    (updates, inserts, delete tombstones) onto a standing snapshot,
  //    the MERGE INTO every lakehouse table-maintenance job runs. The
  //    batch derives from the 2001+ orders slice: per-customer recent
  //    spend, with key%10==7 as tombstones and key%10==3 re-keyed past
  //    the snapshot range as inserts. Semantics are the standard
  //    three-arm MERGE: matched+U -> update (bal += spend), matched+D
  //    -> drop, unmatched delta -> insert, unmatched snapshot -> keep.
  //    The apply is ONE full-outer join keyed on the primary key —
  //    full outer cannot broadcast, so both sides shuffle on k once;
  //    at 100 TB the snapshot side prunes to only the files whose
  //    key zone-maps intersect the delta (z01's layout machinery —
  //    Delta/Iceberg-style merge touches the delta's partitions, not
  //    the table). Money flows through the dsum DECIMAL discipline;
  //    the update add is a single IEEE op on engine-identical operands.
  private val q53 = Q(
    "q53_merge_upsert",
    (s, d) => {
      val delta = orders(s, d)
        .filter(col("o_orderdate") >= tsLit("2001-01-01 00:00:00"))
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
        .withColumn("op",
          when(col("o_custkey") % 10 === 7, "D")
            .when(col("o_custkey") % 10 === 3, "I")
            .otherwise("U"))
        .select(
          when(col("op") === "I", col("o_custkey") + 10000000L)
            .otherwise(col("o_custkey")).as("k"),
          col("spend"), col("op"))
      val snap = customer(s, d)
        .select(col("c_custkey").as("k"), col("c_name"), col("c_acctbal"))
      snap.join(delta, Seq("k"), "full_outer")
        .filter(coalesce(col("op") =!= "D", lit(true)))
        .select(
          col("k").as("c_custkey"),
          coalesce(col("c_name"), concat(lit("new-"), col("k"))).as("c_name"),
          round(
            when(col("op").isNull, col("c_acctbal"))
              .when(col("c_acctbal").isNull, col("spend"))
              .otherwise(col("c_acctbal") + col("spend")), 2).as("c_acctbal"),
          when(col("op").isNull, "kept")
            .when(col("c_acctbal").isNull, "inserted")
            .otherwise("updated").as("action"))
    },
    Some("""
      WITH delta0 AS (SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend,
               CASE WHEN o_custkey % 10 = 7 THEN 'D'
                    WHEN o_custkey % 10 = 3 THEN 'I' ELSE 'U' END AS op
             FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
             GROUP BY o_custkey),
      delta AS (SELECT CASE WHEN op = 'I' THEN o_custkey + 10000000 ELSE o_custkey END AS k,
                       spend, op
                FROM delta0),
      snap AS (SELECT c_custkey AS k, c_name, c_acctbal FROM customer)
      SELECT coalesce(s.k, d.k) AS c_custkey,
             coalesce(s.c_name, 'new-' || CAST(d.k AS VARCHAR)) AS c_name,
             round(CASE WHEN d.op IS NULL THEN s.c_acctbal
                        WHEN s.c_acctbal IS NULL THEN d.spend
                        ELSE s.c_acctbal + d.spend END, 2) AS c_acctbal,
             CASE WHEN d.op IS NULL THEN 'kept'
                  WHEN s.c_acctbal IS NULL THEN 'inserted'
                  ELSE 'updated' END AS action
      FROM snap s FULL OUTER JOIN delta d ON s.k = d.k
      WHERE d.op IS NULL OR d.op <> 'D'
    """.trim))

  val queries: Seq[Q] =
    Seq(q22b, q35, q39, q40, q41, q42, q43, q44, q45, q46, q47, q48, q49, q50, q51, q52, q53, z01)
}
