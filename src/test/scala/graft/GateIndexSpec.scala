package graft.streaming

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-tier gate-index layout's maintenance contracts, adversarial
  * arms:
  *
  *  - the auto-fold's live-generation exclusion is BY NAME, so it
  *    cannot be fooled by stores that report no directory mtimes
  *    (where the old newest-by-mtime sort degraded to listing order —
  *    lexicographic, `batch=tok-10` before `batch=tok-9` — and could
  *    fold the LIVE batch's own delta into `_base`, defeating the
  *    crash-replay's `batch =!= tag` self-exclusion);
  *  - the forget rewrite stages BOTH tiers before committing either:
  *    a crash after the commit point heals to the complete post-forget
  *    image on both tiers with no re-run, and a crash inside the
  *    (metadata-sized) commit window completes on re-run.
  */
class GateIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fsOf(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** a minimal index-shaped delta: (id, bucket) rows */
  private def delta(root: String, tag: String, ids: Range): Unit = {
    import spark.implicits._
    GateIndex.writeDelta(
      ids.toDF("id").withColumn("bucket", pmod(col("id"), lit(4))),
      root, tag)
  }

  private def deltaTags(root: String): Set[String] = {
    val p = new Path(root)
    val fs = fsOf(p)
    fs.listStatus(p).filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=")).toSet
  }

  test("foldIntoBase(liveTag) excludes the live delta BY NAME even when mtimes lie") {
    val root = s"${tmp("graft_gateindex_fold")}/bands"
    delta(root, "tok-9", 0 until 10)
    delta(root, "tok-10", 10 until 20) // the LIVE batch
    // adversarial mtimes: make the live generation look OLDEST, the
    // exact inversion an mtime-less store's lexicographic listing
    // produces for tok-10 vs tok-9 (and what a copy-based rename can
    // produce on object stores)
    val p = new Path(root)
    val fs = fsOf(p)
    val now = System.currentTimeMillis()
    fs.setTimes(new Path(p, "batch=tok-10"), now - 60000, -1)
    fs.setTimes(new Path(p, "batch=tok-9"), now, -1)

    GateIndex.foldIntoBase(spark, root, liveTag = Some("tok-10"))

    assert(deltaTags(root) == Set("tok-10"),
      "the live generation must survive the fold as a delta")
    val read = GateIndex.read(spark, root)
    assert(read.filter(col("batch") === GateIndex.BaseName)
      .select("id").collect().map(_.getInt(0)).sorted.toSeq == (0 until 10),
      "only the committed generation folds into _base")
    // the crash-replay invariant the by-name exclusion protects: the
    // live tag's rows are still self-excludable by `batch =!= tag`
    assert(read.filter(col("batch") =!= "tok-10")
      .select("id").collect().map(_.getInt(0)).sorted.toSeq == (0 until 10))

    // and the no-tag manual-compaction fallback still never folds the
    // sole remaining (newest) delta — a single-delta fold is a no-op
    GateIndex.foldIntoBase(spark, root)
    assert(deltaTags(root) == Set("tok-10"))
  }

  test("forgetRewrite: crash AFTER the commit point heals BOTH tiers with no re-run") {
    for (point <- Seq("displaced", "published")) {
      val root = s"${tmp("graft_gateindex_forget")}/bands"
      delta(root, "a", 0 until 20)
      GateIndex.foldIntoBase(spark, root, liveTag = Some("z-live"))
      delta(root, "b", 20 until 40)
      val gone = col("id") % 3 === 0

      FoldCommit.failpoint = point
      intercept[IllegalStateException] {
        GateIndex.forgetRewrite(spark, root, gone)
      }
      FoldCommit.failpoint = null
      // heal alone — no re-driven forget — must complete the fold on
      // BOTH tiers, because both markers were committed before either
      // tier published
      val p = new Path(root)
      FoldCommit.heal(fsOf(p), p)
      val ids = GateIndex.read(spark, root)
        .select("id").collect().map(_.getInt(0)).sorted.toSeq
      assert(ids == (0 until 40).filterNot(_ % 3 == 0),
        s"crash at $point did not heal both tiers to the post-forget image")
      val names = fsOf(p).listStatus(p).map(_.getPath.getName).toSeq
      assert(!names.exists(n => n.endsWith(".staging") || n.contains(".retired-")),
        s"crash at $point left residue: $names")
    }
  }

  test("forgetRewrite: crash INSIDE the commit window completes on re-run") {
    val root = s"${tmp("graft_gateindex_forget2")}/bands"
    delta(root, "a", 0 until 20)
    GateIndex.foldIntoBase(spark, root, liveTag = Some("z-live"))
    delta(root, "b", 20 until 40)
    val gone = col("id") % 3 === 0

    // "committed" trips after the FIRST marker (the base tier's): the
    // documented torn window — base committed, deltas still staged
    FoldCommit.failpoint = "committed"
    intercept[IllegalStateException] {
      GateIndex.forgetRewrite(spark, root, gone)
    }
    FoldCommit.failpoint = null
    // the re-run (what a Takedown-ledger re-drive does) completes it;
    // the filtered rewrite is idempotent, so no double-delete effects
    GateIndex.forgetRewrite(spark, root, gone)
    val ids = GateIndex.read(spark, root)
      .select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(ids == (0 until 40).filterNot(_ % 3 == 0))
  }
}
