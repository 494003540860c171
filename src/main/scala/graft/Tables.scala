package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated star-schema parquet tables
  * (TESTDATA.md) plus shared numeric-parity helpers.
  *
  * Parity discipline (Spark result must hash-match the DuckDB oracle):
  *  - SUM/AVG over DOUBLE columns is float-order-dependent, so every
  *    monetary/quantity aggregate goes through an exact DECIMAL(18,4) sum
  *    and only then is cast to DOUBLE. Decimal addition is associative =>
  *    both engines produce the identical double, regardless of partition
  *    or evaluation order.
  *  - Dates are emitted as DATE, never TIMESTAMP (timezone-free compare).
  *  - Timestamps are emitted as floored epoch seconds (BIGINT).
  *  - Counts/lengths are cast to BIGINT (DuckDB's len()/count() width).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")

  /** events.ts drifts across testdata generations: parquet
    * TIMESTAMP(NANOS) (Spark's vectorized reader rejects it — read nanos
    * as Long; the reference keeps u64 nanosecond timestamps as source of
    * truth, borealis-indexer src/main.rs:142-143), TIMESTAMP(MICROS,
    * adjustedToUTC) (Spark TimestampType), and TIMESTAMP(MICROS, local)
    * (Spark TIMESTAMP_NTZ). All three branches normalize to the same
    * contract: `ts` is a session-UTC TimestampType, `ts_ns` the epoch
    * nanos BIGINT. The NTZ cast is value-preserving ONLY because the
    * session timezone is pinned UTC (SparkSessions.local), matching the
    * oracle's zone-free literals; TsEncodingSpec pins all three
    * encodings against each other.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ => raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** exact decimal image of a double money/qty column.
    * Scale rule: the cast scale must be >= the true decimal precision of
    * the value, else the true value can sit exactly on a rounding
    * midpoint and Spark/DuckDB tie-break differently. Raw columns and
    * 2-factor products of 2-dp inputs are exact at scale 4; 3-factor
    * products need scale 6 ([[dec6]]).
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** order-insensitive exact sum of a double column, emitted as DOUBLE */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  def dsum6(c: Column): Column = sum(dec6(c)).cast(DoubleType)

  /** deterministic average: exact decimal sum / count, both in double */
  def davg(c: Column): Column =
    sum(dec(c)).cast(DoubleType) / count(c)

  /** timestamp -> floored epoch seconds (matches duckdb
    * CAST(floor(epoch(ts)) AS BIGINT))
    */
  def epochS(c: Column): Column = unix_timestamp(c)

  /** timestamp literal parsed in the SESSION timezone (UTC), not the
    * JVM default — `Timestamp.valueOf` would shift the literal on
    * machines whose default zone isn't UTC, silently diverging from the
    * oracle's zone-free TIMESTAMP literals
    */
  def tsLit(s: String): Column = to_timestamp(lit(s))
}
