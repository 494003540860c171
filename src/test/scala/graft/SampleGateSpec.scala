package graft

import java.nio.file.Files

import graft.streaming.SampleGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming weighted sampler: the standing sample after streaming the
  * corpus must equal the oracle-checked batch p11 answer exactly;
  * replays and generation folds must not change it.
  */
class SampleGateSpec extends AnyFunSuite {
  import TestSpark._

  test("streamed standing sample equals batch p11 exactly, across batches, replays, and folds") {
    val base = Files.createTempDirectory("graft_sample").toString
    val (src, state, ckpt) = (s"$base/src", s"$base/state", s"$base/ckpt")
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang", "source")
    // three staggered drops -> multiple micro-batches
    docs.filter(col("doc_id") % 3 === 0).write.mode("append").json(src)
    docs.filter(col("doc_id") % 3 === 1).write.mode("append").json(src)
    docs.filter(col("doc_id") % 3 === 2).write.mode("append").json(src)
    SampleGate.start(spark, src, state, ckpt).awaitTermination()

    val batch = Catalog.byName("p11_weighted_sample").run(spark, sf)
    def assertEqualsBatch(clue: String): Unit = {
      val streamed = SampleGate.sample(spark, state)
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        s"$clue: standing sample != batch p11")
    }
    assertEqualsBatch("after streaming the corpus")

    // replay: re-landing a batch tag with a corpus slice changes nothing
    SampleGate.step(spark, docs.filter(col("doc_id") % 3 === 0)
      .withColumn("text", col("text")), "replay-0", state)
    SampleGate.step(spark, docs.filter(col("doc_id") % 3 === 0)
      .withColumn("text", col("text")), "replay-0", state)
    assertEqualsBatch("after replaying a slice generation")

    // fold: generations collapse, the sample is unchanged
    SampleGate.compact(spark, state)
    val p = new org.apache.hadoop.fs.Path(state)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch="))
    // steady state is two: the compacted fold + the never-folded live
    // tail (it may be an uncommitted micro-batch the stream replays)
    assert(gens <= 2, s"fold left $gens generations")
    assertEqualsBatch("after folding generations")
  }

  test("per-generation state is O(n): each batch lands at most n + reserve candidate rows") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sample_n").toString
    val state = s"$base/state"
    val big = (0 until 500).map(i =>
      (5000L + i, ("w " * (10 + i % 50)).trim, "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
    // default reserve = n, so a generation persists its batch top-2n
    SampleGate.step(spark, big, "n-0", state, SampleGate.Config(n = 25))
    assert(spark.read.parquet(s"$state/batch=n-0").count() == 50)
    SampleGate.step(spark, big, "n-1", state,
      SampleGate.Config(n = 25, reserve = 5))
    assert(spark.read.parquet(s"$state/batch=n-1").count() == 30)
  }

  test("forget re-elects the discarded runner-up exactly, and refuses past the reserve") {
    val base = Files.createTempDirectory("graft_sample_forget").toString
    val state = s"$base/state"
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang", "source")
    val cfg = SampleGate.Config(n = 50, reserve = 8)
    SampleGate.step(spark, docs.filter(col("doc_id") % 2 === 0), "f-0", state, cfg)
    SampleGate.step(spark, docs.filter(col("doc_id") % 2 === 1), "f-1", state, cfg)

    // forget the top 3 WINNERS — the worst case the old top-n-only state
    // could not re-elect (their replacements were discarded at ingest)
    val winners = SampleGate.sample(spark, state, cfg)
      .orderBy(col("rank")).limit(3)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    SampleGate.forget(spark, state, col("doc_id").isin(winners: _*), cfg)

    // ground truth: the batch p11 sampler over the surviving corpus
    // (same key formula, computed independently of the gate's state)
    import org.apache.spark.sql.expressions.Window
    val key = round(pow(
      graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast("string")) /
        lit(1152921504606846976.0),
      lit(1.0) / col("n_chars")), 6)
    val expected = docs.filter(!col("doc_id").isin(winners: _*))
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("key", key)
      .orderBy(col("key").desc, col("doc_id").asc).limit(cfg.n)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("key").desc, col("doc_id").asc)).cast("long"))
    val got = SampleGate.sample(spark, state, cfg)
    assert(got.exceptAll(expected).count() == 0 &&
      expected.exceptAll(got).count() == 0,
      "post-forget sample != batch sampler over the surviving corpus")
    assert(got.count() == cfg.n, "forget shrank the sample")

    // the budget burned the worst per-generation eviction count (2 or 3
    // of 8, depending on how the winners split across the two
    // generations — and the first fold consolidated the state to ONE
    // generation, so this forget's evictions all count against it):
    // evicting 8 more exceeds any possible remainder and must REFUSE,
    // not silently under-fill the sample
    val eightMore = SampleGate.sample(spark, state, cfg)
      .orderBy(col("rank")).limit(8)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val refused = intercept[IllegalArgumentException] {
      SampleGate.forget(spark, state, col("doc_id").isin(eightMore: _*), cfg)
    }
    assert(refused.getMessage.contains("reserve exhausted"))
    // and the refused fold changed nothing
    val after = SampleGate.sample(spark, state, cfg)
    assert(after.exceptAll(expected).count() == 0 &&
      expected.exceptAll(after).count() == 0)
  }

  test("the bench sample probe streams the corpus and reports a positive rate") {
    // the probe's own require() enforces a non-empty standing sample
    val rate = graft.Bench.sampleRun(spark, "/root/testdata/sf0.001")
    assert(rate > 0, s"sample probe rate $rate")
  }
}
