package graft

import graft.streaming.KeeperGate
import graft.streaming.KeeperGate.{Decision, Doc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState keeper election (KeeperGate), driven through a
  * real streaming query (MemoryStream -> RocksDB state store -> memory
  * sink) across micro-batches.
  */
class KeeperGateSpec extends AnyFunSuite {
  import TestSpark._

  private def decisions(name: String): Seq[Decision] =
    spark.table(name).as[Decision](org.apache.spark.sql.Encoders.product[Decision])
      .collect().toSeq

  test("keeper election admits first, supersedes on better, drops worse — across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = KeeperGate(spark, source.toDS())
      .writeStream.format("memory").queryName("keeper_out").outputMode("append").start()

    // batch 1: two fingerprints; fp "a" sees two docs in ONE batch —
    // the better one (q=0.9) must be processed first (determinism sort),
    // so doc 2 admits and doc 1 drops even if it arrived "first"
    source.addData(Doc("a", 1L, 0.5), Doc("a", 2L, 0.9), Doc("b", 3L, 0.4))
    q.processAllAvailable()
    val d1 = decisions("keeper_out")
    assert(d1.toSet == Set(
      Decision("a", 2L, 0.9, "admit"),
      Decision("a", 1L, 0.5, "drop"),
      Decision("b", 3L, 0.4, "admit")))

    // batch 2: state persisted across batches — a worse doc for "a"
    // drops; a better doc for "b" supersedes; ties lose to incumbent
    source.addData(Doc("a", 4L, 0.9), Doc("a", 5L, 0.2), Doc("b", 6L, 0.8))
    q.processAllAvailable()
    val d2 = decisions("keeper_out").toSet -- d1.toSet
    assert(d2 == Set(
      Decision("a", 4L, 0.9, "drop"), // tie -> incumbent keeps
      Decision("a", 5L, 0.2, "drop"),
      Decision("b", 6L, 0.8, "supersede")))
    q.stop()
  }

  test("final keeper per fingerprint = max-quality doc, vs a batch recount") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 200 docs over 40 fingerprints, deterministic pseudo-random quality
    val docs = (1 to 200).map { i =>
      Doc(s"fp${i % 40}", i.toLong, ((i * 2654435761L) % 1000) / 1000.0)
    }
    val source = MemoryStream[Doc]
    val q = KeeperGate(spark, source.toDS())
      .writeStream.format("memory").queryName("keeper_bulk").outputMode("append").start()
    docs.grouped(50).foreach { g => source.addData(g: _*); q.processAllAvailable() }

    // replay the decision log: last admit/supersede per fp is the keeper
    val log = decisions("keeper_bulk")
    assert(log.size == 200) // every doc got exactly one decision
    val keepers = log.zipWithIndex
      .filter { case (d, _) => d.decision != "drop" }
      .groupBy(_._1.fp).map { case (fp, ds) => fp -> ds.maxBy(_._2)._1 }
    val expected = docs.groupBy(_.fp).map { case (fp, ds) =>
      fp -> ds.map(_.quality).max
    }
    assert(keepers.keySet == expected.keySet)
    keepers.foreach { case (fp, k) => assert(k.quality == expected(fp)) }
    q.stop()
  }
}
