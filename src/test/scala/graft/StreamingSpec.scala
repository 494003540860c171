package graft

import java.nio.file.{Files, Paths}

import graft.blocks.Fixtures
import graft.streaming.{BlockIngest, Verbosity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming test (SURVEY §5.2(3)): file-drop source ->
  * flatten -> parquet lake, kill/restart across batches, assert no loss
  * and no duplicates (S3 FromInterruption + S13 dedup semantics).
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def writeBatch(dir: String, from: Long, n: Int, suffix: String): Unit = {
    val lines = Fixtures.blocksJson(from, n).mkString("\n")
    Files.write(Paths.get(s"$dir/blocks_$suffix.jsonl"), lines.getBytes("UTF-8")): Unit
  }

  test("ingest survives restart with no loss or duplication") {
    val base = Files.createTempDirectory("graft_stream").toString
    val src = s"$base/src"; val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))

    // batch 1: heights 1000..1063
    writeBatch(src, 1000, 64, "a")
    val q1 = BlockIngest.start(spark, src, lake, ckpt)
    q1.awaitTermination() // AvailableNow terminates when drained

    // restart with new files; second file REPLAYS heights 1050..1063
    // (duplicates) plus new 1064..1099
    writeBatch(src, 1050, 50, "b")
    val q2 = BlockIngest.start(spark, src, lake, ckpt)
    q2.awaitTermination()

    val blocks = spark.read.parquet(s"$lake/blocks")
    val heights = blocks.select("block_height").collect().map(_.getLong(0)).sorted
    assert(heights.length == 100, s"expected 100 distinct heights, got ${heights.length}")
    assert(heights.toSeq == (1000L until 1100L).toSeq)

    // entity tables consistent: every chunked block has exactly 1 tx
    val tx = spark.read.parquet(s"$lake/transactions")
    val expectedTx = (1000L until 1100L).count(_ % 5 != 0)
    assert(tx.count() == expectedTx)
    assert(tx.select(countDistinct(col("tx_hash"))).collect()(0).getLong(0) == expectedTx)

    // blocks lake is date-partitioned (pruning layout)
    assert(Files.list(Paths.get(s"$lake/blocks")).iterator().hasNext)

    // third generation, then compaction folds the per-micro-batch dirs,
    // protecting the newest (a possibly-uncommitted tail the stream
    // could replay): identical content, steady state = fold + live tail
    writeBatch(src, 1100, 10, "c")
    BlockIngest.start(spark, src, lake, ckpt).awaitTermination()
    val expectedTx3 = (1000L until 1110L).count(_ % 5 != 0)
    BlockIngest.compact(spark, lake, "transactions")
    val txAfter = spark.read.parquet(s"$lake/transactions")
    assert(txAfter.count() == expectedTx3)
    assert(txAfter.select(countDistinct(col("tx_hash"))).collect()(0).getLong(0) == expectedTx3)
    import scala.jdk.CollectionConverters._
    val batchDirs = Files.list(Paths.get(s"$lake/transactions")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch=")).toList
    assert(batchDirs.length == 2 && batchDirs.count(_.startsWith("batch=compact-")) == 1,
      s"expected fold + protected tail, got $batchDirs")
  }

  test("live tail: a rate source drives the same ingest path as the file drop") {
    // the source-agnostic half of S1/S12: BlockIngest.startFrom takes
    // any streaming `value: STRING` frame. Here a continuously-ticking
    // rate source synthesizes one wire-format block per tick and runs
    // the UNMODIFIED parse -> dedup -> entity-write path under a
    // ProcessingTime trigger (the live-tail mode, not AvailableNow).
    val base = Files.createTempDirectory("graft_rate").toString
    val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    val toWire = udf((i: Long) => Fixtures.blockJson(700000L + i))
    val lines = spark.readStream.format("rate")
      .option("rowsPerSecond", "100")
      .load()
      .select(toWire(col("value")).as("value"))
    val q = BlockIngest.startFrom(spark, lines, lake, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))

    // poll the growing lake until >= 30 blocks have landed (live tail
    // has no natural end; bounded wait, then stop). A query failure must
    // fail the test NOW, not after the full deadline reads as "no data".
    val deadline = System.currentTimeMillis() + 90000
    def landed(): Long =
      try spark.read.parquet(s"$lake/blocks").count()
      catch { case _: Throwable => 0L } // lake dir not created yet
    while (landed() < 30 && System.currentTimeMillis() < deadline) {
      q.exception.foreach(e => fail(s"live-tail query died: $e"))
      Thread.sleep(500)
    }
    q.stop()
    q.awaitTermination()

    val blocks = spark.read.parquet(s"$lake/blocks")
    val n = blocks.count()
    assert(n >= 30, s"live tail landed only $n blocks before the deadline")
    // same contract as the file-drop path: distinct heights, parsed cols
    assert(blocks.select("block_height").distinct().count() == n)
    assert(blocks.filter(col("block_height").isNull).count() == 0)
    assert(spark.read.parquet(s"$lake/transactions").count() > 0)
  }

  test("malformed lines never reach the entity tables and land in the dead-letter dir") {
    val base = Files.createTempDirectory("graft_rejects").toString
    val src = s"$base/src"; val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))
    writeBatch(src, 2000, 8, "ok")
    Files.write(Paths.get(s"$src/garbage.jsonl"),
      "not json at all\n{\"valid\":\"json\",\"but\":\"wrong shape\"}\n{broken"
        .getBytes("UTF-8")): Unit

    // streaming main path: bad lines dropped, 8 good blocks land
    BlockIngest.start(spark, src, lake, s"$ckpt/main").awaitTermination()
    val blocks = spark.read.parquet(s"$lake/blocks")
    assert(blocks.count() == 8)
    assert(blocks.filter(col("block_height").isNull).count() == 0)

    // dead-letter companion: exactly the 3 bad lines, raw, in
    // batch-scoped generations (replays rewrite, never duplicate)
    BlockIngest.startRejects(spark, src, lake, s"$ckpt/rejects").awaitTermination()
    val rejects = spark.read.parquet(s"$lake/_rejects")
    assert(rejects.count() == 3)
    assert(rejects.columns.toSeq == Seq("raw", "batch"))

    // batch backfill honors the same contract
    val lake2 = s"$base/lake2"
    BlockIngest.backfill(spark, src, lake2)
    assert(spark.read.parquet(s"$lake2/blocks").count() == 8)
    assert(spark.read.parquet(s"$lake2/_rejects").count() == 3)
  }

  test("S22 cloud-lake bootstrap loads a drop URI through the s3a-ready path") {
    val conf = graft.sources.CloudLake.s3aConf(anonymous = true)
    assert(conf("spark.hadoop.fs.s3a.committer.name") == "magic")
    assert(conf("spark.hadoop.fs.s3a.aws.credentials.provider").contains("Anonymous"))
    // scheme-agnostic: same code path against a file: URI
    val base = Files.createTempDirectory("graft_bootstrap").toString
    val src = s"$base/src"; val lake = s"$base/lake"
    Files.createDirectories(Paths.get(src))
    writeBatch(src, 5000, 16, "s3")
    graft.sources.CloudLake.bootstrap(spark, s"file:$src", lake)
    assert(spark.read.parquet(s"$lake/blocks").count() == 16)
  }

  test("S19 verbosity levels project the reference's three debug shapes") {
    import spark.implicits._
    val raw = Fixtures.blocksJson(2000, 4).toDF("value")

    val l1 = BlockIngest.debugProjection(spark, raw, Verbosity.KeyFields)
    assert(l1.columns.toSeq == Seq("height", "hash", "block_time", "n_chunks", "n_shards"))
    assert(l1.select("height").collect().map(_.getLong(0)).sorted.toSeq == (2000L until 2004L))

    val l2 = BlockIngest.debugProjection(spark, raw, Verbosity.FullJson)
    assert(l2.columns.toSeq == Seq("wire_json"))
    assert(l2.collect().forall(_.getString(0).contains("\"block\"")))

    val l3 = BlockIngest.debugProjection(spark, raw, Verbosity.FullParse)
    assert(l3.columns.toSeq == Seq("block", "shards"))
    assert(Verbosity.FullParse.level == 3)
  }

  test("S19 console-sink stream drains a drop dir at each verbosity") {
    val base = Files.createTempDirectory("graft_console").toString
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    writeBatch(src, 3000, 8, "c")
    for (v <- Seq(Verbosity.KeyFields, Verbosity.FullJson)) {
      val q = BlockIngest.startConsole(spark, src, v, numRows = 2)
      q.awaitTermination()
      assert(q.lastProgress.sources.nonEmpty)
    }
  }
}
