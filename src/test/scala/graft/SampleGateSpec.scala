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

  test("per-generation state is O(n): each batch lands at most n candidate rows") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sample_n").toString
    val state = s"$base/state"
    val big = (0 until 500).map(i =>
      (5000L + i, ("w " * (10 + i % 50)).trim, "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
    SampleGate.step(spark, big, "n-0", state, SampleGate.Config(n = 25))
    assert(spark.read.parquet(s"$state/batch=n-0").count() == 25)
  }
}
