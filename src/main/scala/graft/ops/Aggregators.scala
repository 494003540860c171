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

  /** exact decimal-imaged sum of a double column; merge-order invariant */
  class ExactDecimalSum extends Aggregator[Double, BigDecimal, Double] {
    override def zero: BigDecimal = BigDecimal(0)
    override def reduce(acc: BigDecimal, x: Double): BigDecimal =
      acc + BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    override def merge(a: BigDecimal, b: BigDecimal): BigDecimal = a + b
    override def finish(acc: BigDecimal): Double = acc.toDouble
    override def bufferEncoder: Encoder[BigDecimal] = Encoders.kryo[BigDecimal]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
