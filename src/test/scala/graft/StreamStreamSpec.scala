package graft

import graft.blocks.{Fixtures, Flatten}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream join with watermarks: the tx->outcome cross-block
  * match (borealis-indexer/src/main.rs:121-124) as two live streams —
  * transactions from block h join outcomes that may arrive in later
  * blocks, bounded by a 1-hour event-time watermark.
  */
class StreamStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("watermarked tx-outcome stream-stream join matches across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val txStream = MemoryStream[String]
    val outStream = MemoryStream[String]

    val txDocs = Flatten.parse(spark, txStream.toDF())
    val outDocs = Flatten.parse(spark, outStream.toDF())

    val tx = Flatten.transactions(txDocs)
      .select(
        col("tx_hash"),
        explode(col("receipt_ids")).as("rid"),
        col("block_time").as("tx_time"))
      .withWatermark("tx_time", "1 hour")
    val outcomes = Flatten.executionOutcomes(outDocs)
      .select(
        col("outcome_id"),
        col("gas_burnt"),
        col("block_time").as("out_time"))
      .withWatermark("out_time", "1 hour")

    val joined = tx.join(
      outcomes,
      col("rid") === col("outcome_id") &&
        col("out_time") >= col("tx_time") &&
        col("out_time") <= col("tx_time") + expr("INTERVAL 1 HOUR"))

    val q = joined.writeStream.format("memory").queryName("txout").outputMode("append").start()

    // batch 1: blocks 100..104 carry the transactions
    txStream.addData(Fixtures.blocksJson(100, 5): _*)
    q.processAllAvailable()
    // batch 2: the SAME blocks arrive on the outcome stream (fixture
    // outcomes carry ids matching the tx receipt ids of their block)
    outStream.addData(Fixtures.blocksJson(100, 5): _*)
    q.processAllAvailable()

    val got = spark.table("txout").select("tx_hash", "outcome_id", "gas_burnt").collect()
    // 4 of 5 blocks have chunks (every 5th is chunk-less): block 100 is
    // chunk-less -> 4 tx, each matched exactly once
    assert(got.length == 4, s"expected 4 joined rows, got ${got.length}")
    assert(got.forall(_.getAs[Long]("gas_burnt") == 424555062500L))
    q.stop()
  }
}
