package graft.ops

import graft.Q
import graft.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third relational batch: percentiles, value-navigation windows, and
  * statistical aggregates. Statistical moments are computed from exact
  * decimal power sums with one shared closed-form formula per engine —
  * the same merge-order-invariance discipline as the money sums (plain
  * stddev()/corr() accumulate doubles and drift between engines).
  */
object Relational3 {

  /** exact decimal sums of x and x^2 (2-dp inputs: x^2 has 4 decimals) */
  private def sx(c: Column) = sum(c.cast(DecimalType(28, 4))).cast(DoubleType)
  private def sxx(c: Column) = sum((c * c).cast(DecimalType(28, 4))).cast(DoubleType)
  private def sxy(a: Column, b: Column) = sum((a * b).cast(DecimalType(28, 6))).cast(DoubleType)

  // -- q36: exact + interpolated percentiles. Parity note: both engines
  //    interpolate as lower + (upper-lower)*frac on identical sorted
  //    values (verified at sf0.001/0.01); round(6) absorbs any residual
  //    last-ulp lerp difference.
  private val q36 = Q(
    "q36_percentiles",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty")),
    Some("""
      SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
        MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag
    """.trim))

  // -- q36b: sketch percentiles — approx_percentile (Greenwald-Khanna
  //    with relative-error accuracy knob). The 100 TB path for q36:
  //    exact `percentile` buffers every value per group; the GK sketch
  //    is fixed-size per group, merges associatively across partitions,
  //    and answers all three quantiles from one pass. Oracle-checkable
  //    as estimate-within-bound invariants: the group row count is the
  //    DuckDB-recomputed anchor, and each boolean asserts the sketch
  //    value lands within max(1%, 1.0 absolute) of the exact
  //    percentile — at accuracy=10000 the GK rank error is n/10000
  //    rows (≤6 at sf0.01), far inside that bound at every SF.
  private val q36b = Q(
    "q36b_approx_percentiles",
    (s, d) => {
      def ok(approx: Column, exact: Column) =
        (abs(approx - exact) <= greatest(exact * lit(0.01), lit(1.0)))
          .cast(LongType)
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("am"),
          expr("approx_percentile(l_quantity, 0.9, 10000)").as("a90"),
          expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("a25"),
          expr("percentile(l_quantity, 0.5)").as("em"),
          expr("percentile(l_quantity, 0.9)").as("e90"),
          expr("percentile(l_extendedprice, 0.25)").as("e25"))
        .select(
          col("l_returnflag"),
          col("n"),
          ok(col("am").cast(DoubleType), col("em")).as("median_ok"),
          ok(col("a90").cast(DoubleType), col("e90")).as("p90_ok"),
          ok(col("a25").cast(DoubleType), col("e25")).as("p25_ok"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             CAST(1 AS BIGINT) AS median_ok,
             CAST(1 AS BIGINT) AS p90_ok,
             CAST(1 AS BIGINT) AS p25_ok
      FROM lineitem GROUP BY l_returnflag
    """.trim))

  // -- q37: first/last/nth value navigation over full-partition frames.
  private val q37 = Q(
    "q37_value_windows",
    (s, d) => {
      val w = Window
        .partitionBy("l_returnflag")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      lineitem(s, d)
        .filter(col("l_shipdate") >= tsLit("2001-06-01 00:00:00"))
        .select(
          col("l_returnflag"),
          col("l_orderkey"),
          col("l_linenumber"),
          first(col("l_orderkey")).over(w).as("first_ok"),
          last(col("l_orderkey")).over(w).as("last_ok"),
          nth_value(col("l_orderkey"), 2).over(w).as("second_ok"))
    },
    Some("""
      SELECT l_returnflag, l_orderkey, l_linenumber,
        first_value(l_orderkey) OVER w AS first_ok,
        last_value(l_orderkey) OVER w AS last_ok,
        nth_value(l_orderkey, 2) OVER w AS second_ok
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
      WINDOW w AS (PARTITION BY l_returnflag
                   ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """.trim))

  // -- q38: variance / stddev / covariance / correlation from exact
  //    power sums (closed-form, engine-order-invariant).
  private val q38 = Q(
    "q38_statistics",
    (s, d) => {
      val q = col("l_quantity"); val p = col("l_extendedprice")
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sx(q).as("sq"), sxx(q).as("sqq"),
          sx(p).as("sp"), sxx(p).as("spp"),
          sxy(q, p).as("sqp"))
        .select(
          col("l_returnflag"),
          col("n"),
          round((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1), 6)
            .as("var_qty"),
          round(sqrt((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1)), 6)
            .as("stddev_qty"),
          round((col("sqp") - col("sq") * col("sp") / col("n")) / (col("n") - 1), 6)
            .as("covar_qty_price"),
          round(
            (col("sqp") - col("sq") * col("sp") / col("n")) /
              (sqrt(col("sqq") - col("sq") * col("sq") / col("n")) *
                sqrt(col("spp") - col("sp") * col("sp") / col("n"))),
            6).as("corr_qty_price"))
    },
    Some("""
      WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sq,
          CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sqq,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sp,
          CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS spp,
          CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sqp
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round((sqq - sq * sq / n) / (n - 1), 6) AS var_qty,
        round(sqrt((sqq - sq * sq / n) / (n - 1)), 6) AS stddev_qty,
        round((sqp - sq * sp / n) / (n - 1), 6) AS covar_qty_price,
        round((sqp - sq * sp / n) /
              (sqrt(sqq - sq * sq / n) * sqrt(spp - sp * sp / n)), 6) AS corr_qty_price
      FROM m
    """.trim))

  val queries: Seq[Q] = Seq(q36, q36b, q37, q38)
}
