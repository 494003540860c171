package graft

import java.nio.file.Files
import graft.streaming.{LakeCompact, TrendingTopK}
import org.apache.spark.sql.functions.col
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

  test("crash between state write and snapshot write replays consistently") {
    val (state, out) = dirs()
    val cfg = TrendingTopK.Config(k = 5, capacity = 64)
    TrendingTopK.step(spark, batchDf(1), "b0", state, out, cfg)
    // simulate the crash window: b1's state generation landed but the
    // snapshot write never happened
    batchDf(2)
      .selectExpr("approx_top_k_accumulate(item, 64) AS st")
      .write.mode("overwrite").parquet(s"$state/batch=b1")
    // replay of b1 overwrites the orphan generation and completes both
    TrendingTopK.step(spark, batchDf(2), "b1", state, out, cfg)
    val got = TrendingTopK.current(spark, out).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Long]("est_count")).toMap
    val expect = (0 until 5).map(i => s"item$i" -> ((i + 1) * 10 * 3).toLong).toMap
    assert(got == expect, s"orphan state generation double-counted: $got")
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

  test("auto-fold keeps state generations bounded with the ranking identical to an unfolded control") {
    def gens(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    }
    val (state, out) = dirs()
    val (stateCtl, outCtl) = dirs()
    val auto = TrendingTopK.Config(k = 5, capacity = 64, autoFoldGenerations = 4)
    val manual = TrendingTopK.Config(k = 5, capacity = 64, autoFoldGenerations = 0)
    var maxGens = 0
    for (i <- 0 until 12) {
      TrendingTopK.step(spark, batchDf(1), f"b$i%03d", state, out, auto)
      TrendingTopK.step(spark, batchDf(1), f"b$i%03d", stateCtl, outCtl, manual)
      maxGens = math.max(maxGens, gens(state))
    }
    // the read between folds sees at most threshold+1 generations; the
    // control accumulates one per batch
    assert(maxGens <= 5, s"auto-fold did not bound state reads: $maxGens generations")
    assert(gens(stateCtl) == 12, "control unexpectedly folded")
    val folded = TrendingTopK.current(spark, out).collect().toSet
    val control = TrendingTopK.current(spark, outCtl).collect().toSet
    assert(folded == control, "auto-fold changed the ranking")
    val expect = (0 until 5).map(i => s"item$i" -> ((i + 1) * 10 * 12).toLong).toMap
    assert(folded.map(r => r.getAs[String]("item") -> r.getAs[Long]("est_count")).toMap == expect)
  }

  test("snapshot retention prunes old rankings; the newest is untouched") {
    def gens(dir: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("batch=")).toSeq.sorted
    }
    val (state, out) = dirs()
    val cfg = TrendingTopK.Config(k = 5, capacity = 64, keepSnapshots = 3)
    for (i <- 0 until 7)
      TrendingTopK.step(spark, batchDf(1), f"b$i%03d", state, out, cfg)
    assert(gens(out) == Seq("batch=b004", "batch=b005", "batch=b006"), s"got ${gens(out)}")
    val got = TrendingTopK.current(spark, out).collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("est_count"))).toMap
    val expect = (0 until 5).map(i => s"item$i" -> ((i + 1) * 10 * 7).toLong).toMap
    assert(got == expect, "retention corrupted the newest snapshot")
  }

  test("forget rebuilds the sketch from the surviving source and purges the snapshot history") {
    val (state, out) = dirs()
    val src = Files.createTempDirectory("graft_trend_src").toString
    val cfg = TrendingTopK.Config(k = 5, capacity = 64)
    batchDf(1).write.mode("append").json(src)
    TrendingTopK.step(spark, batchDf(1), "b0", state, out, cfg)
    batchDf(2).write.mode("append").json(src)
    TrendingTopK.step(spark, batchDf(2), "b1", state, out, cfg)

    // forget the DOMINANT item: a sketch cannot retract, so this must
    // rebuild the state from the surviving source
    TrendingTopK.forget(spark, src, state, out, Seq("item4"), cfg)

    def mergedEstimate(): Map[String, Long] =
      spark.read.parquet(state).filter("st IS NOT NULL")
        .selectExpr("approx_top_k_estimate(approx_top_k_combine(st, 64), 5) AS top")
        .selectExpr("explode(top) AS t")
        .selectExpr("t.item AS item", "CAST(t.count AS BIGINT) AS c")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the item is gone from the STATE itself (not just suppressed), and
    // below capacity the rebuilt sketch is exact for the survivors
    val est = mergedEstimate()
    assert(!est.contains("item4"), "forgotten item still in the sketch state")
    assert(est == (0 until 4).map(i => s"item$i" -> ((i + 1) * 10 * 3).toLong).toMap)

    // the snapshot HISTORY is purged: no snapshot mentions the item, and
    // each re-ranks its survivors 1..k-1 in the original relative order
    for (snap <- Seq("b0", "b1")) {
      val r = spark.read.parquet(s"$out/batch=$snap")
        .orderBy(col("rank")).collect()
        .map(x => (x.getAs[Long]("rank"), x.getAs[String]("item")))
      assert(!r.exists(_._2 == "item4"), s"history snapshot $snap still lists the item")
      assert(r.map(_._1).toSeq == (1L to 4L), s"snapshot $snap ranks not re-packed: $r")
      assert(r.map(_._2).toSeq == Seq("item3", "item2", "item1", "item0"),
        s"snapshot $snap lost its relative order: $r")
    }
    // the mtime restore kept current() resolving the NEWEST snapshot
    val cur = TrendingTopK.current(spark, out).collect()
      .map(x => x.getAs[String]("item") -> x.getAs[Long]("est_count")).toMap
    // (each snapshot is the merged ranking AS OF its batch, so b1's
    // surviving counts are the b0+b1 cumulative ones)
    assert(cur == (0 until 4).map(i => s"item$i" -> ((i + 1) * 10 * 3).toLong).toMap,
      s"current() no longer resolves the purged b1 snapshot: $cur")

    // new occurrences after the forget are NEW data: a later batch
    // containing the item counts only its own contribution — proof the
    // rebuild actually removed the prior ones rather than masking them
    TrendingTopK.step(spark, batchDf(1), "b2", state, out, cfg)
    val est2 = mergedEstimate()
    assert(est2("item4") == 50L,
      s"rebuilt state resurrected pre-forget counts: ${est2.get("item4")}")
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

  test("composes with the near-dup gate: trending ranks admitted docs, not raw drops") {
    import java.nio.file.{Files => JFiles, Paths}
    val base = JFiles.createTempDirectory("graft_trend_ndg").toString
    val src = s"$base/src"
    JFiles.createDirectories(Paths.get(src))
    val vocab = (0 until 200).map(i => s"w$i")
    def text(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    def doc(id: Long, t: String, source: String) =
      s"""{"doc_id":$id,"text":"$t","lang":"en","source":"$source"}"""
    // raw counts: srcB 5 > srcA 4; admitted counts: srcA 4 > srcB 2 —
    // the ranking flips iff the near-dup gate ran first
    val aDocs = (0 until 4).map(i => doc(i, text(i), "srcA"))
    val bBase = Seq(text(100), text(101))
    val bDocs = Seq(doc(100, bBase(0), "srcB"), doc(101, bBase(1), "srcB")) ++
      // append-one-word near-dups (seed-independent Jaccard ~0.97)
      Seq(doc(102, bBase(0) + " extra", "srcB"),
        doc(103, bBase(1) + " extra", "srcB"),
        doc(104, bBase(0) + " other", "srcB"))
    JFiles.write(Paths.get(s"$src/drop.jsonl"),
      (aDocs ++ bDocs).mkString("\n").getBytes("UTF-8"))
    graft.streaming.NearDupGate
      .start(spark, src, s"$base/lake", s"$base/idx", s"$base/dec", s"$base/ckpt")
      .awaitTermination()
    val admitted = spark.read.parquet(s"$base/lake").selectExpr("source AS item")
    val (state, out) = dirs()
    TrendingTopK.step(spark, admitted, "b0", state, out,
      TrendingTopK.Config(k = 2, capacity = 64))
    val ranked = TrendingTopK.current(spark, out).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("est_count")))
    assert(ranked.head == ("srcA", 4L), s"got ${ranked.toSeq}")
    assert(ranked(1) == ("srcB", 2L), s"got ${ranked.toSeq}")
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
