package graft

import graft.llm.LlmQueries
import graft.streaming.FoldCommit
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CRASH-INJECTION coverage for the unified maintenance primitive: a
  * process death at every protocol point (staged / committed /
  * displaced / published / retiring) must heal, on re-entry, to either
  * the pre-fold or the post-fold image — never a torn relation — and a
  * re-entered fold over a healed image must be a no-op (the folds are
  * idempotent filtered rewrites).
  */
class FoldCommitSpec extends AnyFunSuite {
  import TestSpark._

  private def fsOf(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeRows(dir: String, ids: Range): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("overwrite").parquet(dir)
  }

  private def readIds(dir: String): Seq[Int] =
    spark.read.parquet(dir).collect().map(_.getInt(0)).toSeq.sorted

  private val CrashPoints =
    Seq("staged", "committed", "displaced", "published", "retiring")

  test("relation-replacement fold survives a crash at every protocol point") {
    for (point <- CrashPoints) {
      val idx = s"${tmp("graft_foldcommit")}/idx"
      writeRows(s"$idx/rows", 0 until 100)
      val gone = col("id") % 5 === 1
      FoldCommit.failpoint = point
      val crashed = intercept[IllegalStateException] {
        LlmQueries.forgetRows(spark, idx, Seq("rows"), gone)
      }
      assert(crashed.getMessage.contains(point))
      FoldCommit.failpoint = null
      // the torn state must never be a MISSING relation past the
      // displaced point without a staged replacement on disk
      val root = new Path(idx)
      val fs = fsOf(root)
      assert(fs.exists(new Path(s"$idx/rows")) ||
        fs.listStatus(root).exists(_.getPath.getName.endsWith(".staging")),
        s"$point left neither the relation nor a staged image")
      // re-entering the fold heals whatever the crash left, then
      // applies the (idempotent) filter again
      LlmQueries.forgetRows(spark, idx, Seq("rows"), gone)
      assert(readIds(s"$idx/rows") == (0 until 100).filterNot(_ % 5 == 1),
        s"crash at $point did not heal to the post-fold image")
      // no residue: no staging, no retired slot, no marker
      val names = fs.listStatus(root).map(_.getPath.getName).toSeq
      assert(!names.exists(n => n.endsWith(".staging") || n.contains(".retired-")),
        s"crash at $point left residue: $names")
      assert(!fs.exists(new Path(s"$idx/rows/${FoldCommit.Marker}")))
    }
  }

  test("heal alone (no re-entered fold) already restores a readable relation") {
    for (point <- Seq("displaced", "published")) {
      val idx = s"${tmp("graft_foldcommit_heal")}/idx"
      writeRows(s"$idx/rows", 0 until 50)
      FoldCommit.failpoint = point
      intercept[IllegalStateException] {
        LlmQueries.forgetRows(spark, idx, Seq("rows"), col("id") >= 40)
      }
      FoldCommit.failpoint = null
      val root = new Path(idx)
      FoldCommit.heal(fsOf(root), root)
      // past the commit point the staged image is complete, so heal
      // rolls FORWARD: the fold's result is what a reader sees
      assert(readIds(s"$idx/rows") == (0 until 40),
        s"heal after $point crash did not roll the committed fold forward")
    }
  }

  test("uncommitted staging rolls back; committed staging with vanished inputs rolls back") {
    val dir = tmp("graft_foldcommit_rb")
    val root = new Path(dir)
    val fs = fsOf(root)
    writeRows(s"$dir/batch=a", 0 until 10)
    writeRows(s"$dir/batch=b", 10 until 20)
    // uncommitted staging (crash before the marker): garbage, deleted
    fs.mkdirs(new Path(dir, "_fold-dead.staging"))
    FoldCommit.heal(fs, root)
    assert(!fs.exists(new Path(dir, "_fold-dead.staging")))
    assert(readIds(s"$dir/batch=a") == (0 until 10))

    // committed staging whose input generations were consumed while the
    // lease was stale (the compaction race): must roll BACK, because the
    // staged consolidation no longer replaces anything coherent
    writeRows(s"$dir/_fold-race.staging", 0 until 5)
    val mf = fs.create(new Path(s"$dir/_fold-race.staging/${FoldCommit.Marker}"), true)
    try mf.write("batch=forget-race\nbatch=a\nbatch=vanished".getBytes("UTF-8"))
    finally mf.close()
    FoldCommit.heal(fs, root)
    assert(!fs.exists(new Path(dir, "_fold-race.staging")), "stale staging must die")
    assert(!fs.exists(new Path(dir, "batch=forget-race")), "stale fold must not publish")
    assert(readIds(s"$dir/batch=a") == (0 until 10), "surviving input untouched")
  }

  test("d18 end-to-end: crash in the displaced window, then re-entry ≡ rebuild-without") {
    // the window that was FATAL before the unification: old forgetRows
    // deleted the relation then crashed before the rename, stranding
    // the index with the partition missing
    val idx = s"${tmp("graft_d18_crash")}/idx"
    LlmQueries.d15BuildAt(spark, sf, idx)
    val gone = col("doc_id") % 10 === 3
    FoldCommit.failpoint = "displaced"
    intercept[IllegalStateException] {
      LlmQueries.forgetDocs(spark, idx, gone)
    }
    FoldCommit.failpoint = null
    LlmQueries.forgetDocs(spark, idx, gone)
    val healed = LlmQueries.d15ProbeAt(spark, sf, idx)
      .collect().map(_.toString).sorted.toSeq

    val clean = s"${tmp("graft_d18_clean")}/idx"
    LlmQueries.d15BuildAt(spark, sf, clean)
    LlmQueries.forgetDocs(spark, clean, gone)
    val expected = LlmQueries.d15ProbeAt(spark, sf, clean)
      .collect().map(_.toString).sorted.toSeq
    assert(healed == expected,
      "crashed-then-healed fold must equal an uninterrupted fold")
    assert(spark.read.parquet(s"$idx/shingles").filter(gone).count() == 0)
    assert(spark.read.parquet(s"$idx/bands").filter(gone).count() == 0)
  }

  test("s13 retraction generation: crash before publish is invisible; heal-then-forget does not double-retract") {
    val base = tmp("graft_s13_crash")
    val idx = s"$base/idx"
    val gone = col("doc_id") % 7 === 2
    LlmQueries.s13BuildAt(spark, sf, idx)
    FoldCommit.failpoint = "staged"
    intercept[IllegalStateException] { LlmQueries.s13Forget(spark, idx, gone) }
    FoldCommit.failpoint = null
    // nothing visible: the probe still sees the full corpus
    assert(new java.io.File(s"$idx/forgets").listFiles() == null ||
      !new java.io.File(s"$idx/forgets").listFiles().exists(f =>
        f.isDirectory && !f.getName.endsWith(".staging") && !f.getName.startsWith("_")),
      "a crashed-before-commit retraction must not be visible")

    // crash AFTER commit: heal publishes the generation; the re-entered
    // forget derives `gone` MINUS the now-visible tombstones => no
    // double retraction (scores equal a single clean forget)
    FoldCommit.failpoint = "published"
    intercept[IllegalStateException] { LlmQueries.s13Forget(spark, idx, gone) }
    FoldCommit.failpoint = null
    LlmQueries.s13Forget(spark, idx, gone)
    val healed = LlmQueries.s13ProbeAt(spark, sf, idx)
      .collect().map(_.toString).sorted.toSeq

    val clean = s"$base/clean"
    LlmQueries.s13BuildAt(spark, sf, clean)
    LlmQueries.s13Forget(spark, clean, gone)
    val expected = LlmQueries.s13ProbeAt(spark, sf, clean)
      .collect().map(_.toString).sorted.toSeq
    assert(healed == expected, "healed retraction must not double-retract")
  }

  test("s13 compaction: crash mid-sequence re-runs idempotently (df/stats recomputed, not re-merged)") {
    val base = tmp("graft_s13_compact_crash")
    val idx = s"$base/idx"
    val gone = col("doc_id") % 7 === 2
    LlmQueries.s13BuildAt(spark, sf, idx)
    LlmQueries.s13Forget(spark, idx, gone)
    val tombstoned = LlmQueries.s13ProbeAt(spark, sf, idx)
      .collect().map(_.toString).sorted.toSeq

    // kill the compaction between the postings swap and the rest: the
    // old code's df merge would double-subtract on re-entry; the
    // recomputed form must not
    var fired = false
    FoldCommit.failpoint = null
    try {
      // inject at the SECOND publish (dl) by tripping on "published"
      // after letting the first through: use the retiring point of the
      // first relation instead — simplest deterministic mid-sequence
      // kill is the df publish; "committed" on a fresh run trips on
      // postings, so crash there and re-run twice to walk the sequence
      FoldCommit.failpoint = "published"
      intercept[IllegalStateException] { LlmQueries.s13FoldForgets(spark, idx) }
      fired = true
    } finally FoldCommit.failpoint = null
    assert(fired)
    LlmQueries.s13FoldForgets(spark, idx)
    assert(!new java.io.File(s"$idx/forgets").exists(), "forgets dir must be gone")
    val afterCrash = LlmQueries.s13ProbeAt(spark, sf, idx)
      .collect().map(_.toString).sorted.toSeq
    assert(afterCrash == tombstoned,
      "crashed-then-re-run compaction changed the scores")
  }

  test("a rebuild clears crashed-fold residue instead of letting it roll forward") {
    val idx = s"${tmp("graft_rebuild_residue")}/idx"
    LlmQueries.s13BuildAt(spark, sf, idx)
    // crash a fold right after commit: a staged (filtered) postings
    // image is sitting at the root, eligible for roll-forward
    FoldCommit.failpoint = "committed"
    intercept[IllegalStateException] {
      LlmQueries.forgetRows(spark, idx, Seq("postings"), col("doc_id") % 2 === 0)
    }
    FoldCommit.failpoint = null
    val full = LlmQueries.s13ProbeAt(spark, sf, idx)
      .collect().map(_.toString).sorted.toSeq
    // the rebuild must purge that staging — if it survived, the next
    // maintenance op's heal would replace the fresh postings with the
    // stale filtered image
    LlmQueries.s13BuildAt(spark, sf, idx)
    LlmQueries.s13Forget(spark, idx, col("doc_id") % 1000 === -1) // no-op fold => entry heal runs
    val after = LlmQueries.s13ProbeAt(spark, sf, idx)
      .collect().map(_.toString).sorted.toSeq
    assert(after == full, "stale staged fold rolled forward over the rebuild")
  }
}
