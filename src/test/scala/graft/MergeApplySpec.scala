package graft

import java.nio.file.{Files, Paths}

import graft.streaming.MergeApply
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC apply (MergeApply): latest-per-key collapse, the
  * three-arm merge, version gating, generation/manifest idempotence.
  */
class MergeApplySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def newBase(): String =
    Files.createTempDirectory("graft_mergeapply").toString

  private def dropChanges(srcDir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(srcDir))
    Files.write(Paths.get(s"$srcDir/$name.json"), lines.mkString("\n").getBytes("UTF-8")): Unit
  }

  private def snapshotMap(lakeDir: String): Map[Long, (Double, Long)] =
    MergeApply.read(spark, lakeDir).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Double]("value"), r.getAs[Long]("version"))).toMap

  private def chg(k: Long, op: String, value: Double, version: Long): String =
    s"""{"k":$k,"op":"$op","value":$value,"version":$version}"""

  test("changes fold into the snapshot: update, insert, tombstone, intra-batch latest-wins") {
    val base = newBase()
    val src = s"$base/src"; val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    dropChanges(src, "b0", Seq(
      chg(1, "U", 10.0, 1), chg(2, "U", 20.0, 1), chg(3, "U", 30.0, 1)))
    MergeApply.start(spark, src, lake, ckpt).awaitTermination()
    assert(snapshotMap(lake) == Map(
      1L -> (10.0, 1L), 2L -> (20.0, 1L), 3L -> (30.0, 1L)))

    // second batch: update k=2, tombstone k=3, insert k=4 twice (the
    // v2 row must win regardless of file order), tombstone a key that
    // never existed (must produce nothing)
    dropChanges(src, "b1", Seq(
      chg(2, "U", 21.0, 2), chg(3, "D", 0.0, 2),
      chg(4, "U", 40.0, 1), chg(4, "U", 41.0, 2), chg(9, "D", 0.0, 1)))
    MergeApply.start(spark, src, lake, ckpt).awaitTermination()
    assert(snapshotMap(lake) == Map(
      1L -> (10.0, 1L), 2L -> (21.0, 2L), 4L -> (41.0, 2L)))
  }

  test("a replayed batch is idempotent: the generation never re-merges") {
    val lake = s"${newBase()}/lake"
    val b0 = Seq((1L, "U", 10.0, 1L), (2L, "U", 20.0, 1L))
      .toDF("k", "op", "value", "version")
    MergeApply.applyBatch(spark, b0, lake, 0L)
    val after = snapshotMap(lake)
    // replay the same batch id (restart-from-checkpoint re-delivery):
    // even with DIFFERENT content the completed generation must win —
    // proof the merge didn't re-run
    val poisoned = Seq((1L, "U", 99.0, 9L)).toDF("k", "op", "value", "version")
    MergeApply.applyBatch(spark, poisoned, lake, 0L)
    assert(snapshotMap(lake) == after, "replayed batch re-merged")
    assert(MergeApply.currentGen(lake) == 0L)
  }

  test("a lost manifest flip is repaired by the replay") {
    val lake = s"${newBase()}/lake"
    MergeApply.applyBatch(spark,
      Seq((1L, "U", 10.0, 1L)).toDF("k", "op", "value", "version"), lake, 0L)
    // simulate a crash between _SUCCESS and the flip: manifest gone
    Files.delete(Paths.get(s"$lake/_current"))
    MergeApply.applyBatch(spark,
      Seq((1L, "U", 10.0, 1L)).toDF("k", "op", "value", "version"), lake, 0L)
    assert(MergeApply.currentGen(lake) == 0L)
    assert(snapshotMap(lake) == Map(1L -> (10.0, 1L)))
  }

  test("the bench merge probe applies a multi-batch feed and reports a positive rate") {
    val rate = graft.Bench.mergeApplyRun(spark, 800)
    assert(rate > 0, s"merge probe rate $rate")
  }

  test("generation retention keeps current + one prior and the snapshot stays intact") {
    val lake = s"${newBase()}/lake"
    for (b <- 0L until 5L)
      MergeApply.applyBatch(spark,
        Seq((b, "U", b.toDouble, b + 1)).toDF("k", "op", "value", "version"),
        lake, b)
    assert(MergeApply.listGens(lake) == Seq(0L, 1L, 2L, 3L, 4L))
    MergeApply.compact(spark, lake)
    // retained: the current generation and the newest prior (a reader
    // that resolved the manifest just before the flip may still scan it)
    assert(MergeApply.listGens(lake) == Seq(3L, 4L))
    assert(MergeApply.currentGen(lake) == 4L)
    assert(snapshotMap(lake) == (0L until 5L).map(k => k -> (k.toDouble, k + 1)).toMap)
    // and the apply keeps working after the fold
    MergeApply.applyBatch(spark,
      Seq((99L, "U", 9.0, 1L)).toDF("k", "op", "value", "version"), lake, 5L)
    assert(snapshotMap(lake).contains(99L))
  }

  test("autoFoldGenerations bounds the gen count during a streamed apply") {
    val lake = s"${newBase()}/lake"
    for (b <- 0L until 6L)
      MergeApply.applyBatch(spark,
        Seq((b, "U", 1.0, 1L)).toDF("k", "op", "value", "version"),
        lake, b, autoFoldGenerations = 3)
    assert(MergeApply.listGens(lake).size <= 4,
      s"gens must stay bounded, saw ${MergeApply.listGens(lake)}")
    assert(snapshotMap(lake).keySet == (0L until 6L).toSet)
  }

  test("stale changes lose to newer applied state; fresh tombstones win") {
    val lake = s"${newBase()}/lake"
    MergeApply.applyBatch(spark,
      Seq((1L, "U", 10.0, 5L), (2L, "U", 20.0, 5L)).toDF("k", "op", "value", "version"),
      lake, 0L)
    // batch 1: a stale update and a stale tombstone (both v3 < v5)
    // must not touch applied state; a fresh tombstone kills k=2
    MergeApply.applyBatch(spark,
      Seq((1L, "U", 9.0, 3L), (1L, "D", 0.0, 2L), (2L, "D", 0.0, 6L))
        .toDF("k", "op", "value", "version"),
      lake, 1L)
    assert(snapshotMap(lake) == Map(1L -> (10.0, 5L)))
  }
}
