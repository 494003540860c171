package graft

import java.nio.file.{Files, Paths}

import graft.llm.Dedup
import graft.streaming.NearDupGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup gate: planted near/exact duplicates across two
  * micro-batches must drop against the growing admitted index; the
  * admitted set must be pairwise near-dup-free; replays must not
  * duplicate output (batch-scoped overwrite).
  */
class NearDupGateSpec extends AnyFunSuite {
  import TestSpark._

  private val vocab = (1 to 60).map(i => s"tok$i")
  private def text(seed: Int, words: Int = 30): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(words)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }
  /** near-dup: one word substituted -> ~25/31 shared 3-gram shingles */
  private def mutate(t: String): String = {
    val toks = t.split(" "); toks(10) = "MUTANT"; toks.mkString(" ")
  }
  private def doc(id: Long, t: String): String =
    s"""{"doc_id":$id,"text":"$t","lang":"en","source":"crawl"}"""

  test("auto-fold keeps index generations bounded with decisions identical to the unfolded control") {
    import spark.implicits._
    def dirs() = {
      val b = Files.createTempDirectory("graft_ndg_fold").toString
      (s"$b/lake", s"$b/idx", s"$b/dec")
    }
    def gens(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    }
    val t0 = text(900)
    def batch(b: Int) = {
      val fresh = (0 until 2).map(i => (b * 10L + i, text(901 + b * 2 + i), "en", "crawl"))
      // from batch 1 on, an append-one-word near-dup of a batch-0 doc:
      // the drop decision must survive folds of the index it probes
      val dup = if (b > 0) Seq((b * 10L + 9, t0 + " extra", "en", "crawl")) else Nil
      (Seq((b * 10L + 5, t0, "en", "crawl")).filter(_ => b == 0) ++ fresh ++ dup)
        .toDF("doc_id", "text", "lang", "source")
    }
    val (lakeA, idxA, decA) = dirs()
    val (lakeC, idxC, decC) = dirs()
    val auto = NearDupGate.Config(autoFoldGenerations = 3)
    val manual = NearDupGate.Config(autoFoldGenerations = 0)
    var maxGens = 0
    for (b <- 0 until 8) {
      NearDupGate.step(spark, batch(b), f"a-$b%03d", lakeA, idxA, decA, auto)
      NearDupGate.step(spark, batch(b), f"c-$b%03d", lakeC, idxC, decC, manual)
      maxGens = math.max(maxGens, gens(s"$idxA/bands"))
    }
    assert(maxGens <= 4, s"auto-fold did not bound the index probe: $maxGens generations")
    assert(gens(s"$idxC/bands") == 8, "control unexpectedly folded")
    def verdicts(dec: String) = spark.read.parquet(dec)
      .select("doc_id", "decision", "partner").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("decision"),
        Option(r.getAs[java.lang.Long]("partner")))).toSet
    assert(verdicts(decA) == verdicts(decC), "auto-fold changed a gate decision")
    def admitted(lake: String) =
      spark.read.parquet(lake).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted(lakeA) == admitted(lakeC), "auto-fold changed the admitted set")
    // every cross-batch dup actually dropped (the fold kept the index lossless)
    val drops = verdicts(decA).filter(_._2 == "drop_corpus").map(_._1)
    assert((1 until 8).forall(b => drops.contains(b * 10L + 9)), s"missed drops: $drops")
  }

  test("cross-batch + intra-batch near-dups drop; admitted set is clean; replay-safe") {
    val base = Files.createTempDirectory("graft_neardup").toString
    val src = s"$base/src"; val lake = s"$base/lake"; val idx = s"$base/idx"
    val dec = s"$base/dec"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))

    val t1 = text(1); val t2 = text(2); val t3 = text(3); val t4 = text(4)
    // batch 1: two distinct docs + an intra-batch near-dup pair (10~11)
    Files.write(Paths.get(s"$src/a.jsonl"), Seq(
      doc(10, t1), doc(11, mutate(t1)), doc(12, t2)
    ).mkString("\n").getBytes("UTF-8"))
    NearDupGate.start(spark, src, lake, idx, dec, ckpt).awaitTermination()

    // batch 2: near-dup of an admitted batch-1 doc (20~12), an exact
    // copy of a batch-1 DROPPED doc (21 = 11 -> still ~ admitted 10),
    // and two fresh docs
    Files.write(Paths.get(s"$src/b.jsonl"), Seq(
      doc(20, mutate(t2)), doc(21, mutate(t1)), doc(22, t3), doc(23, t4)
    ).mkString("\n").getBytes("UTF-8"))
    NearDupGate.start(spark, src, lake, idx, dec, ckpt).awaitTermination()

    val lakeDf = spark.read.parquet(lake).cache()
    val decisions = spark.read.parquet(dec).cache()
    val admitted = lakeDf.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(admitted == Set(10L, 12L, 22L, 23L), s"admitted = $admitted")

    // decisions: every input doc decided exactly once, with the right verdicts
    assert(decisions.count() == 7 && decisions.select("doc_id").distinct().count() == 7)
    val byId = decisions.collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[String]("decision"), Option(r.getAs[java.lang.Long]("partner")))).toMap
    assert(byId(11L)._1 == "drop_batch" && byId(11L)._2.contains(10L))
    assert(byId(20L)._1 == "drop_corpus" && byId(20L)._2.contains(12L))
    assert(byId(21L)._1 == "drop_corpus" && byId(21L)._2.contains(10L))
    for (id <- Seq(10L, 12L, 22L, 23L)) assert(byId(id)._1 == "admit")

    // drop_corpus audit rows carry a verified jaccard >= threshold
    val corpusJacs = decisions.filter(col("decision") === "drop_corpus")
      .select("jac").collect().map(_.getDouble(0))
    assert(corpusJacs.nonEmpty && corpusJacs.forall(_ >= 0.8))

    // the admitted set is pairwise near-dup-free under the same detector
    val sh = Dedup.shingleIndex(Dedup.shingles(lakeDf.select("doc_id", "text")), 1000)
    val pairs = Dedup.jaccard(
        Dedup.lshCandidates(Dedup.minhashSigs(sh, 8), 8, 2), sh)
      .filter(col("jac") >= 0.8)
    assert(pairs.count() == 0, "admitted docs contain a near-dup pair")

    // replaying a batch overwrites, never duplicates: re-run step 1's
    // output dirs by re-invoking step with the same batch tag the
    // stream used (checkpoint token + micro-batch id, read back from
    // the decision log's partition dirs)
    val tag0 = decisions.select("batch").distinct().collect()
      .map(_.getString(0)).find(_.endsWith("-0")).get
    val batch1 = spark.read.json(s"$src/a.jsonl")
      .selectExpr("doc_id", "text", "lang", "source")
    NearDupGate.step(spark, batch1, tag0, lake, idx, dec)
    val again = spark.read.parquet(lake)
    assert(again.count() == again.select("doc_id").distinct().count(),
      "replay duplicated lake rows")

    // the index holds signatures for exactly the admitted docs
    val idxDocs = NearDupGate.readBands(spark, idx).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(idxDocs == admitted, s"index docs = $idxDocs")

    // pre-compaction the index is all delta generations (micro-batch-
    // sized by design — nothing worth pruning there; the file-subset
    // dir-pruning assertion lives in the compaction test, where the
    // _base tier exists). Here: the pruned probe is LOSSLESS — probing
    // with one doc's band buckets sees every band row of that doc
    val fullBands = NearDupGate.readBands(spark, idx)
    val oneDocBuckets = fullBands.filter(col("doc_id") === 22L)
      .select("bucket").distinct().collect().map(_.getInt(0)).toIndexedSeq
    val probe = NearDupGate.probeBands(spark, idx, "no-such-batch", oneDocBuckets)
    assert(probe.filter(col("doc_id") === 22L).count() ==
      fullBands.filter(col("doc_id") === 22L).count())
    // and each micro-batch landed a FEW delta files, not a 64-dir
    // bucketed generation (the commit-cost regression this layout
    // exists to prevent: ~64 file creates + renames per micro-batch)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/bands"))
      .filter(_.getPath.getName.startsWith("batch="))
    assert(gens.nonEmpty)
    for (g <- gens) {
      val n = fs.listStatus(g.getPath).count(_.getPath.getName.endsWith(".parquet"))
      assert(n <= 8, s"delta generation ${g.getPath.getName} splintered into $n files")
      assert(!fs.listStatus(g.getPath).exists(_.getPath.getName.startsWith("bucket=")),
        "delta generation carries bucket subdirs — the per-batch commit storm is back")
    }
  }

  test("a mismatched indexBuckets config is refused, not silently mis-probed") {
    import spark.implicits._
    val b = Files.createTempDirectory("graft_ndg_buckets").toString
    def docs(id: Long) = Seq((id, text(id.toInt))).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("crawl"))
    NearDupGate.step(spark, docs(1), "b1", s"$b/lake", s"$b/idx", s"$b/dec",
      NearDupGate.Config(indexBuckets = 64))
    val ex = intercept[IllegalArgumentException] {
      NearDupGate.step(spark, docs(2), "b2", s"$b/lake", s"$b/idx", s"$b/dec",
        NearDupGate.Config(indexBuckets = 32))
    }
    assert(ex.getMessage.contains("indexBuckets=64"), ex.getMessage)
    // matching config proceeds
    NearDupGate.step(spark, docs(2), "b2", s"$b/lake", s"$b/idx", s"$b/dec",
      NearDupGate.Config(indexBuckets = 64))
    assert(spark.read.parquet(s"$b/lake").count() == 2)
  }

  test("bucket pruning is lossless: 64-bucket and 1-bucket gates decide identically") {
    // indexBuckets=1 degenerates to an unpruned probe (every key in the
    // one bucket); any candidate the 64-way layout's pruning lost would
    // show up as a decision difference
    import spark.implicits._
    def mkDirs() = {
      val b = Files.createTempDirectory("graft_ndg_prune").toString
      (s"$b/lake", s"$b/idx", s"$b/dec")
    }
    val (lake1, idx1, dec1) = mkDirs()
    val (lake64, idx64, dec64) = mkDirs()
    val t1 = text(201); val t2 = text(202)
    val batches = Seq(
      "b1" -> Seq(1L -> t1, 2L -> t2, 3L -> text(203)),
      "b2" -> Seq(10L -> mutate(t1), 11L -> (t2 + " extraterm"), 12L -> text(204)))
    for ((tag, rows) <- batches) {
      val df = rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("crawl"))
      NearDupGate.step(spark, df, tag, lake1, idx1, dec1,
        NearDupGate.Config(indexBuckets = 1))
      NearDupGate.step(spark, df, tag, lake64, idx64, dec64,
        NearDupGate.Config(indexBuckets = 64))
    }
    def decisionsOf(dir: String) = spark.read.parquet(dir)
      .select("doc_id", "decision", "partner").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getAs[java.lang.Long](2)))).toSet
    val (d1, d64) = (decisionsOf(dec1), decisionsOf(dec64))
    assert(d1 == d64, s"pruned gate diverged:\n1-bucket: $d1\n64-bucket: $d64")
    // and the planted cross-batch dups were caught (not vacuously equal)
    assert(d64.exists(d => d._1 == 10L && d._2 == "drop_corpus" && d._3.contains(1L)))
    assert(d64.exists(d => d._1 == 11L && d._2 == "drop_corpus" && d._3.contains(2L)))
  }

  test("maintenance round-trip: compacting lake + signature index changes no decision") {
    // gate 4 batches through two identical pipelines; the 'maint' one is
    // compacted mid-run (folding the index generations, bucket layout
    // preserved), the 'control' one never is — every decision, the lake,
    // and the admitted index must come out identical
    import graft.streaming.LakeCompact
    def mkDirs() = {
      val b = Files.createTempDirectory("graft_ndg_maint").toString
      (s"$b/lake", s"$b/idx", s"$b/dec")
    }
    val (lakeC, idxC, decC) = mkDirs() // control
    val (lakeM, idxM, decM) = mkDirs() // maintained
    val t1 = text(101); val t2 = text(102); val t3 = text(103)

    def batchDf(rows: Seq[(Long, String)]) = {
      import spark.implicits._
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("crawl"))
    }
    val batches = Seq(
      "b1" -> Seq(1L -> t1, 2L -> t2, 3L -> t3),
      "b2" -> Seq(20L -> mutate(t1), 21L -> text(104)),
      "b3" -> Seq(30L -> mutate(t2), 31L -> text(105)),
      // 40 must drop against doc 1, whose signatures live in the
      // COMPACTED generation by now; 41 drops against tail-gen doc 31;
      // 42/43 are an intra-batch pair; 44 is fresh
      // 43 appends one word to 42's text: 28 of 29 shingles shared
      // (jac ~0.97 for ANY seed — a substituted middle word can dip
      // under the 0.8 threshold depending on the drawn tokens)
      "b4" -> Seq(40L -> mutate(t1), 41L -> mutate(text(105)),
        42L -> text(106), 43L -> (text(106) + " extraterm"), 44L -> text(107)))

    for ((tag, rows) <- batches) {
      if (tag == "b4") // maintenance window between b3 and b4
        NearDupGate.compact(spark, lakeM, idxM, decM)
      NearDupGate.step(spark, batchDf(rows), tag, lakeC, idxC, decC)
      NearDupGate.step(spark, batchDf(rows), tag, lakeM, idxM, decM)
    }

    def decisionsOf(dir: String) = spark.read.parquet(dir)
      .select("doc_id", "decision", "partner", "jac").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getAs[java.lang.Long](2)),
        Option(r.getAs[java.lang.Double](3)))).toSet
    def docsOf(dir: String) = spark.read.parquet(dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    assert(decisionsOf(decM) == decisionsOf(decC), "decisions diverged after compaction")
    assert(docsOf(lakeM) == docsOf(lakeC), "lake diverged after compaction")
    def readSide(idx: String, side: String) =
      if (side == "bands") NearDupGate.readBands(spark, idx)
      else NearDupGate.readShingles(spark, idx)
    for (side <- Seq("bands", "shingles"))
      assert(readSide(idxM, side).select("doc_id").distinct().collect()
          .map(_.getLong(0)).toSet ==
        readSide(idxC, side).select("doc_id").distinct().collect()
          .map(_.getLong(0)).toSet, s"$side index diverged")

    // the planted verdicts actually happened (guards against a vacuous
    // pass where everything was admitted on both sides)
    val dec = decisionsOf(decM).map(d => d._1 -> d._2).toMap
    assert(dec(40L) == "drop_corpus" && dec(41L) == "drop_corpus" &&
      dec(43L) == "drop_batch" && dec(42L) == "admit" && dec(44L) == "admit",
      s"verdicts: $dec")

    // the fold really happened: deltas moved into the _base tier,
    // which keeps the bucket=* partition layout for directory pruning
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(s"$idxM/bands/_base")
    assert(fs.exists(base), "compaction published no _base tier")
    assert(fs.listStatus(base).exists(_.getPath.getName.startsWith("bucket=")),
      "base tier lost the bucket partition layout")
    // ...and the probe DIR-PRUNES the base: restricted buckets scan a
    // strict subset of the index's files (this is the scan `step`
    // issues — probeBands IS its corpus read)
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    }
    val full = NearDupGate.readBands(spark, idxM)
    val bks = full.filter(col("doc_id") === 1L).select("bucket").distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val pr = NearDupGate.probeBands(spark, idxM, "none", bks)
    assert(scanned(pr) > 0 && scanned(pr) < scanned(full),
      "probe no longer pruned after compaction")
  }

  test("forget evicts a doc from lake + index: a copy re-admits, other dups still drop, audit intact") {
    import spark.implicits._
    val b = Files.createTempDirectory("graft_ndg_forget").toString
    val (lake, idx, dec) = (s"$b/lake", s"$b/idx", s"$b/dec")
    def batchDf(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("crawl"))
    val t1 = text(301); val t2 = text(302)
    NearDupGate.step(spark, batchDf(Seq(1L -> t1, 2L -> t2)), "f1", lake, idx, dec)
    // takedown of doc 1
    NearDupGate.forget(spark, lake, idx, col("doc_id") === 1L)
    val lakeIds = spark.read.parquet(lake).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lakeIds == Set(2L), s"lake after forget = $lakeIds")
    assert(NearDupGate.readShingles(spark, idx).filter(col("doc_id") === 1L).count() == 0)
    assert(NearDupGate.readBands(spark, idx).filter(col("doc_id") === 1L).count() == 0)
    // the audit record of the original decision survives the takedown
    assert(spark.read.parquet(dec).filter(col("doc_id") === 1L).count() == 1)

    // an identical copy of the FORGOTTEN content is admitted afresh;
    // a near-dup of the SURVIVING doc still drops
    NearDupGate.step(spark, batchDf(Seq(10L -> t1, 11L -> mutate(t2))), "f2", lake, idx, dec)
    val byId = spark.read.parquet(dec).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
    assert(byId(10L) == "admit", s"copy of forgotten content must re-admit, got ${byId(10L)}")
    assert(byId(11L) == "drop_corpus", s"dup of surviving doc must still drop, got ${byId(11L)}")
    // and the bucket layout survived: the gate keeps stepping + probing
    NearDupGate.step(spark, batchDf(Seq(20L -> mutate(t1))), "f3", lake, idx, dec)
    val d20 = spark.read.parquet(dec).filter(col("doc_id") === 20L)
      .select("decision").head().getString(0)
    assert(d20 == "drop_corpus", s"dup of re-admitted content must drop, got $d20")
  }

  test("the bench gate-forget probe folds a takedown and reports a positive rate") {
    // rate asserted >0 only: the probe's own require()s enforce the
    // semantic half (forgotten ids gone, decision log untouched)
    val rate = graft.Bench.gateForgetRun(spark, "/root/testdata/sf0.001", 60)
    assert(rate > 0, s"gate forget probe rate $rate")
  }
}
