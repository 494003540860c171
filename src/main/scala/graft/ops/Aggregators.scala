package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (SURVEY §2.2 UDAF row): the reference's
  * u128 balances force exact, overflow-aware summation; this Aggregator
  * is the engine's reusable form of the dec()-cast discipline — each
  * input double is snapped to its exact DECIMAL(scale=4) image and
  * summed in arbitrary precision, so the result is identical under any
  * partitioning / merge order.
  */
object Aggregators {

  /** Exact decimal-imaged sum of a double column; merge-order invariant.
    *
    * The buffer is a plain `Encoders.DECIMAL` (Spark `Decimal(38,18)`
    * Tungsten column, NOT a kryo blob): the aggregation buffer stays an
    * unsafe-row field, so partial aggregation and merges never
    * round-trip a serialized JVM object. Inputs are imaged at scale 4
    * (≤ 2-dp source data), leaving 20 integer digits of headroom —
    * ~10^20 — before a 38,18 sum could overflow.
    */
  class ExactDecimalSum extends Aggregator[Double, java.math.BigDecimal, Double] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(acc: java.math.BigDecimal, x: Double): java.math.BigDecimal =
      // valueOf = Double.toString image (same as scala.BigDecimal(x));
      // the raw binary-expansion constructor would shift HALF_UP midpoints
      acc.add(java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP))
    override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
      a.add(b)
    override def finish(acc: java.math.BigDecimal): Double = acc.doubleValue()
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
