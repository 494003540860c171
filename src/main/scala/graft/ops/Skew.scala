package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4.2 "Shuffle" row): AQE's skew-join
  * handling covers joins automatically; these helpers cover the cases
  * AQE doesn't — hot-key aggregation and broadcast-salted joins — as
  * reusable plan shapes.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key) where a handful of keys
    * carry most rows. Phase 1 aggregates (key, salt) partials across
    * `buckets` random salts (spreads a hot key over `buckets` reducers);
    * phase 2 merges partials per key. `aggs` must be algebraic
    * (sum/count/min/max-shaped) — supplied as (partial, merge) pairs on
    * the same output names.
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      buckets: Int,
      partials: Seq[(String, Column)],
      merges: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted
      .groupBy(col(key), col("__salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(col(key))
      .agg(merges.head._2.as(merges.head._1),
        merges.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: the big
    * (skewed) side gets a random salt in [0, buckets); the small side is
    * replicated `buckets` times with every salt value, then the join key
    * becomes (key, salt). Use when the small side is too big for a plain
    * broadcast but the big side's key distribution is pathological.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val smallReplicated = small.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted
      .join(smallReplicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
