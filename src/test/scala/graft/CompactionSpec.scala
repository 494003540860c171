package graft

import java.nio.file.Files

import graft.streaming.{BlockIngest, DocIngest}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Crash-recovery windows of the staged-swap compaction protocol (the
  * happy paths live in StreamingSpec/DocIngestSpec). Each test
  * hand-crafts the exact on-disk state a crash would leave and asserts
  * the next compact call repairs it with no row loss and no duplicates.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(dir: String): Set[Long] =
    spark.read.parquet(dir).select("id").collect().map(_.getLong(0)).toSet

  // ---- DocIngest.compact: generation fold preserving lang dirs ----

  private def mkDocLake(): String = {
    val lake = Files.createTempDirectory("graft_doc_compact").toString
    for (i <- 0 until 3)
      spark.range(i * 10, i * 10 + 10)
        .selectExpr("id", "'x' AS text", "if(id % 2 = 0, 'en', 'de') AS lang")
        .write.partitionBy("lang").parquet(s"$lake/batch=$i")
    lake
  }

  test("doc lake: fold preserves rows and lang partitioning, protecting the newest tail") {
    val lake = mkDocLake()
    val expect = rows(lake)
    DocIngest.compact(spark, lake)
    assert(rows(lake) == expect)
    val gens = fs.listStatus(new Path(lake))
      .filter(_.getPath.getName.startsWith("batch=")).map(_.getPath)
    val fold = gens.filter(_.getName.startsWith("batch=compact-"))
    // newest generation is never folded (it may be an uncommitted tail
    // the stream will replay); steady state = fold + live tail
    assert(gens.length == 2 && fold.length == 1, s"got ${gens.map(_.getName).toList}")
    // per-language readers must still prune at the directory level
    assert(fs.exists(new Path(fold.head, "lang=en")) &&
      fs.exists(new Path(fold.head, "lang=de")))
    // the fold is clustered on the layout keys: each partition dir holds
    // ~one data file, not (tasks x dirs) splinters
    for (lang <- Seq("lang=en", "lang=de")) {
      val files = fs.listStatus(new Path(fold.head, lang))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(files == 1, s"$lang has $files files after fold")
    }
  }

  test("doc lake: staged fold WITH manifest (crash pre-rename) is recovered through compact") {
    val lake = mkDocLake()
    val expect = rows(lake)
    spark.read.parquet(lake).drop("batch").coalesce(1)
      .write.partitionBy("lang").parquet(s"$lake/.compact-5")
    val out = fs.create(new Path(s"$lake/.compact-5/_inputs.manifest"), true)
    out.write("batch=0\nbatch=1\nbatch=2".getBytes("UTF-8")); out.close()
    DocIngest.compact(spark, lake)
    assert(rows(lake) == expect, "recovery must not duplicate or lose rows")
    assert(fs.exists(new Path(s"$lake/batch=5")) &&
      !fs.exists(new Path(s"$lake/.compact-5")))
    for (i <- 0 until 3) assert(!fs.exists(new Path(s"$lake/batch=$i")))
  }

  // ---- BlockIngest.compact: batch-generation fold, manifest-gated ----

  private def mkBlockLake(): String = {
    val lake = Files.createTempDirectory("graft_block_compact").toString
    for (i <- 0 until 3)
      spark.range(i * 10, i * 10 + 10).selectExpr("id", "'x' AS payload")
        .write.parquet(s"$lake/transactions/batch=$i")
    lake
  }

  test("block lake: staged dir WITHOUT manifest (crash mid-write or pre-gate) is discarded") {
    val lake = mkBlockLake()
    val expect = rows(s"$lake/transactions")
    // a PARTIAL compacted copy (only half the rows) that never reached
    // its commit gate must not survive
    spark.range(0, 15).selectExpr("id", "'x' AS payload")
      .write.parquet(s"$lake/transactions/.compact-999")
    BlockIngest.compact(spark, lake, "transactions")
    assert(rows(s"$lake/transactions") == expect)
    val gens = fs.listStatus(new Path(s"$lake/transactions"))
      .filter(_.getPath.getName.startsWith("batch=")).map(_.getPath.getName).toSet
    assert(gens.size == 2 && gens.count(_.startsWith("batch=compact-")) == 1,
      s"expected fold + protected newest generation, got $gens")
  }

  test("block lake: staged dir WITH manifest (crash pre-rename) is renamed in, inputs removed") {
    val lake = mkBlockLake()
    val expect = rows(s"$lake/transactions")
    spark.read.parquet(s"$lake/transactions").drop("batch").coalesce(1)
      .write.parquet(s"$lake/transactions/.compact-999")
    val out = fs.create(new Path(s"$lake/transactions/.compact-999/_inputs.manifest"), true)
    out.write("batch=0\nbatch=1\nbatch=2".getBytes("UTF-8")); out.close()
    BlockIngest.compact(spark, lake, "transactions")
    assert(rows(s"$lake/transactions") == expect, "recovery must not duplicate or lose rows")
    assert(fs.exists(new Path(s"$lake/transactions/batch=999")))
    assert(!fs.exists(new Path(s"$lake/transactions/batch=999/_inputs.manifest")))
    for (i <- 0 until 3) assert(!fs.exists(new Path(s"$lake/transactions/batch=$i")))
  }

  test("maintenance lease: a concurrent append fails loudly, a second compactor is refused, stale locks break") {
    import graft.streaming.LakeCompact
    val lake = mkDocLake()
    val expect = rows(lake)
    // while the lease is held, the sink-side check throws — an append
    // racing a compaction can never be silently folded away
    LakeCompact.withLease(spark, lake) {
      assert(LakeCompact.leaseHeld(spark, lake))
      intercept[IllegalStateException] { LakeCompact.assertNoLease(spark, lake) }
      // a second compactor is refused outright
      intercept[IllegalStateException] {
        LakeCompact.withLease(spark, lake) { fail("second lease granted") }
      }
    }
    // released: sinks admit again, and a full fold works under its own lease
    LakeCompact.assertNoLease(spark, lake)
    DocIngest.compact(spark, lake)
    assert(rows(lake) == expect)
    assert(!fs.exists(new Path(lake, LakeCompact.LockName)), "lease leaked after fold")
    // a crashed compactor's lock (older than staleMs) is broken, not fatal
    val lock = new Path(lake, LakeCompact.LockName)
    fs.create(lock, true).close()
    fs.setTimes(lock, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    assert(!LakeCompact.leaseHeld(spark, lake), "stale lock treated as live")
    LakeCompact.assertNoLease(spark, lake) // stale => sinks not blocked
    LakeCompact.withLease(spark, lake)(()) // stale => acquirable
    assert(!fs.exists(lock))
  }

  test("maintenance lease: breakers racing one stale lock never hold the lease concurrently") {
    import graft.streaming.LakeCompact
    val lake = mkDocLake()
    val lock = new Path(lake, LakeCompact.LockName)
    fs.create(lock, true).close()
    fs.setTimes(lock, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    // 4 compactors race the same stale lock: the atomic-rename break +
    // create-then-verify must admit holders strictly one at a time
    // (the delete+create form admitted two — the r6 ADVICE scenario)
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
    val acquired = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        try LakeCompact.withLease(spark, lake) {
          acquired.incrementAndGet()
          val a = active.incrementAndGet()
          maxActive.getAndUpdate(m => math.max(m, a)): Unit
          Thread.sleep(300)
          active.decrementAndGet(): Unit
        } catch { case _: IllegalStateException => () } // correctly refused
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(acquired.get() >= 1, "nobody managed to break the stale lease")
    assert(maxActive.get() == 1, s"${maxActive.get()} compactors held the lease at once")
    val leftovers = fs.listStatus(new Path(lake)).map(_.getPath.getName)
      .filter(_.startsWith(LakeCompact.LockName + "."))
    assert(leftovers.isEmpty, s"grave files left behind: ${leftovers.mkString(", ")}")
  }

  test("maintenance lease: breaker must not evict a live lock re-created mid-break") {
    // the mid-break adversary: breaker B observes a stale lock, but
    // before B reads its token, breaker A breaks it and re-creates a
    // FRESH lease A now holds. B then reads A's token as "observed", so
    // a token-only grave verify would match and B would delete A's LIVE
    // lock. The (token, mtime)-pair verify must put it back instead.
    import graft.streaming.LakeCompact
    val lake = mkDocLake()
    val lock = new Path(lake, LakeCompact.LockName)
    fs.create(lock, true).close()
    fs.setTimes(lock, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    LakeCompact.breakRaceHook = () => {
      // simulate breaker A winning the break and re-acquiring: the lock
      // is replaced by a fresh-mtime incarnation held by "live-holder"
      fs.delete(lock, false)
      val out = fs.create(lock, true)
      out.write("live-holder\n".getBytes("UTF-8")); out.close()
      LakeCompact.breakRaceHook = () => () // fire once
    }
    try {
      intercept[IllegalStateException] {
        LakeCompact.withLease(spark, lake) { fail("lease granted over a live holder") }
      }
    } finally LakeCompact.breakRaceHook = () => ()
    // the live holder's lease survived the attempted break
    val in = fs.open(lock)
    val owner = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
    assert(owner == "live-holder", s"live lease evicted (lock now '$owner')")
    val graves = fs.listStatus(new Path(lake)).map(_.getPath.getName)
      .filter(_.startsWith(LakeCompact.LockName + "."))
    assert(graves.isEmpty, s"grave files left behind: ${graves.mkString(", ")}")
    fs.delete(lock, false)
  }

  test("maintenance lease: heartbeat keeps a long-running fold's lock live past staleMs") {
    import graft.streaming.LakeCompact
    val lake = mkDocLake()
    // staleMs = 3 s, body runs 5 s: without the heartbeat the lock
    // would look stale mid-body and a second compactor could break it
    LakeCompact.withLease(spark, lake, staleMs = 3000L) {
      Thread.sleep(5000L)
      assert(LakeCompact.leaseHeld(spark, lake, staleMs = 3000L),
        "heartbeat failed: live lease aged into staleness")
      intercept[IllegalStateException] {
        LakeCompact.withLease(spark, lake, staleMs = 3000L) {
          fail("second lease granted while heartbeat live")
        }
      }
    }
    assert(!fs.exists(new Path(lake, LakeCompact.LockName)))
  }

  test("maintenance lease: release leaves a lock re-acquired by another holder") {
    import graft.streaming.LakeCompact
    val lake = mkDocLake()
    val lock = new Path(lake, LakeCompact.LockName)
    LakeCompact.withLease(spark, lake) {
      // simulate a (wrongly) broken-and-reacquired lock mid-body: the
      // exiting holder must not delete a lease that is no longer its own
      fs.delete(lock, false)
      val out = fs.create(lock, true)
      out.write("someone-else\n".getBytes("UTF-8")); out.close()
    }
    assert(fs.exists(lock), "release deleted another holder's lease")
    fs.delete(lock, false)
  }

  test("multi-root lease window: all roots locked at once, all released") {
    import graft.streaming.LakeCompact
    val a = mkDocLake(); val b = mkDocLake()
    LakeCompact.withLeases(spark, Seq(a, b)) {
      assert(LakeCompact.leaseHeld(spark, a) && LakeCompact.leaseHeld(spark, b))
      intercept[IllegalStateException] { LakeCompact.assertNoLease(spark, a) }
      intercept[IllegalStateException] { LakeCompact.assertNoLease(spark, b) }
    }
    assert(!LakeCompact.leaseHeld(spark, a) && !LakeCompact.leaseHeld(spark, b))
  }

  test("the streaming sink itself refuses while its lake is leased") {
    // end-to-end form of the contract: a live DocIngest micro-batch
    // against a leased lake must error, not lose rows
    import graft.streaming.{DocIngest, LakeCompact}
    val base = Files.createTempDirectory("graft_lease_sink").toString
    val src = s"$base/src"; val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/a.jsonl"),
      (1 to 5).map(i =>
        s"""{"doc_id":$i,"text":"${("tok" + i + " ") * 12}","lang":"en","source":"crawl"}""")
        .mkString("\n").getBytes("UTF-8"))
    new java.io.File(lake).mkdirs()
    LakeCompact.withLease(spark, lake) {
      val q = DocIngest.start(spark, src, lake, ckpt)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(_.isInstanceOf[IllegalStateException]),
        s"stream failed for another reason: $ex")
    }
    // after the maintenance window the replay lands every row exactly once
    DocIngest.start(spark, src, lake, ckpt).awaitTermination()
    assert(spark.read.parquet(lake).select("doc_id").collect()
      .map(_.getLong(0)).toSet == (1L to 5L).toSet)
  }

  test("block lake: visible generation still carrying its manifest (crash mid-delete) is finished") {
    val lake = mkBlockLake()
    val expect = rows(s"$lake/transactions")
    // simulate: compacted generation renamed in, batch=2 already
    // deleted, crash before batch=0/1 and the manifest were removed
    spark.read.parquet(s"$lake/transactions").drop("batch").coalesce(1)
      .write.parquet(s"$lake/transactions/batch=compact-7")
    fs.delete(new Path(s"$lake/transactions/batch=2"), true)
    val out = fs.create(new Path(s"$lake/transactions/batch=compact-7/_inputs.manifest"), true)
    out.write("batch=0\nbatch=1\nbatch=2".getBytes("UTF-8")); out.close()
    BlockIngest.compact(spark, lake, "transactions")
    assert(rows(s"$lake/transactions") == expect)
    for (i <- 0 until 3) assert(!fs.exists(new Path(s"$lake/transactions/batch=$i")))
    assert(!fs.exists(new Path(s"$lake/transactions/batch=compact-7/_inputs.manifest")))
  }
}
