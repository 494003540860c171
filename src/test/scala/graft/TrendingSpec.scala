package graft

import java.nio.file.Files
import graft.streaming.{LakeCompact, TrendingTopK}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming mergeable top-k: exactness below capacity, replay
  * idempotence, state compaction, lease refusal, and the end-to-end
  * file-stream path.
  */
class TrendingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def dirs(): (String, String) = (
    Files.createTempDirectory("graft_trend_state").toString,
    Files.createTempDirectory("graft_trend_out").toString)

  // item i appears (i+1)*10 times per batch -> all counts distinct, so
  // rank order is deterministic, and capacity >> domain -> exact counts
  private def batchDf(mult: Int) =
    (0 until 5).flatMap(i => Seq.fill((i + 1) * 10 * mult)(s"item$i")).toDF("item")

  test("per-batch steps merge to exact global counts; replay does not double-count") {
    val (state, out) = dirs()
    val cfg = TrendingTopK.Config(k = 5, capacity = 64)
    TrendingTopK.step(spark, batchDf(1), "b0", state, out, cfg)
    TrendingTopK.step(spark, batchDf(2), "b1", state, out, cfg)
    TrendingTopK.step(spark, batchDf(1), "b2", state, out, cfg)
    def snapshot() = TrendingTopK.current(spark, out).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("item"), r.getAs[Long]("est_count")))
      .sortBy(_._1)
    val expect = (0 until 5).map(i => (
      (5 - i).toLong, s"item$i", ((i + 1) * 10 * 4).toLong)).sortBy(_._1)
    assert(snapshot().toSeq == expect)
    // crash replay: batch b2 runs again with the same tag and data —
    // its generation is overwritten, not appended, so counts hold
    TrendingTopK.step(spark, batchDf(1), "b2", state, out, cfg)
    assert(snapshot().toSeq == expect)
  }

  test("state folds without changing the ranking; capacity mismatch refuses") {
    val (state, out) = dirs()
    val cfg = TrendingTopK.Config(k = 5, capacity = 64)
    for (i <- 0 until 4)
      TrendingTopK.step(spark, batchDf(1), s"b$i", state, out, cfg)
    val before = TrendingTopK.current(spark, out).collect().toSet
    TrendingTopK.compact(spark, state)
    TrendingTopK.step(spark, batchDf(0), "b4", state, out, cfg) // empty batch
    val after = TrendingTopK.current(spark, out).collect().toSet
    assert(before == after, "fold or empty batch changed the ranking")
    intercept[IllegalArgumentException] {
      TrendingTopK.step(spark, batchDf(1), "b5", state, out,
        TrendingTopK.Config(k = 5, capacity = 128))
    }
  }

  test("a leased state dir refuses the step") {
    val (state, out) = dirs()
    val cfg = TrendingTopK.Config(k = 5, capacity = 64)
    TrendingTopK.step(spark, batchDf(1), "b0", state, out, cfg)
    LakeCompact.withLease(spark, state) {
      intercept[IllegalStateException] {
        TrendingTopK.step(spark, batchDf(1), "b1", state, out, cfg)
      }
    }
  }

  test("end-to-end file stream: drops in, ranking snapshot out, resume continues") {
    val src = Files.createTempDirectory("graft_trend_src").toString
    val ckpt = Files.createTempDirectory("graft_trend_ckpt").toString
    val (state, out) = dirs()
    val cfg = TrendingTopK.Config(k = 5, capacity = 64)
    batchDf(1).write.mode("append").json(src)
    TrendingTopK.start(spark, src, state, out, ckpt, cfg).awaitTermination()
    // second drop through the SAME checkpoint: state continues, not restarts
    batchDf(2).write.mode("append").json(src)
    TrendingTopK.start(spark, src, state, out, ckpt, cfg).awaitTermination()
    val got = TrendingTopK.current(spark, out).collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("est_count"))).toMap
    val expect = (0 until 5).map(i => s"item$i" -> ((i + 1) * 10 * 3).toLong).toMap
    assert(got == expect)
  }
}
