package graft

import java.nio.file.Files

import graft.blocks.Fixtures
import graft.sources.BusSource
import graft.streaming.BlockIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The `graftbus` DataSourceV2 source — the sandbox image of the
  * reference's JetStream subject (S12/S13): durable offsets, replay,
  * admission control, torn-write safety, partitioned parallel reads.
  */
class BusSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def newTopic(partitions: Int = 2): String = {
    val dir = Files.createTempDirectory("graft_bus").toString
    BusSource.createTopic(dir, partitions)
    dir
  }

  private def busLines(dir: String) =
    spark.readStream.format("graftbus").option("path", dir).load().selectExpr("value")

  test("batch read returns every terminated record with partition/offset lineage") {
    val dir = newTopic(3)
    BusSource.append(dir, 0, Seq("a0", "a1"))
    BusSource.append(dir, 1, Seq("b0"))
    BusSource.append(dir, 2, Seq("c0", "c1", "c2"))
    val rows = spark.read.format("graftbus").option("path", dir).load().collect()
    assert(rows.length == 6)
    val byPart = rows.groupBy(_.getAs[Int]("partition")).view.mapValues(_.length).toMap
    assert(byPart == Map(0 -> 2, 1 -> 1, 2 -> 3))
    // offsets are the byte positions of record starts: strictly
    // increasing within a partition, starting at 0
    for ((_, rs) <- rows.groupBy(_.getAs[Int]("partition"))) {
      val offs = rs.map(_.getAs[Long]("offset")).sorted
      assert(offs.head == 0L && offs.distinct.length == offs.length)
    }
    assert(rows.map(_.getAs[String]("value")).sorted.toSeq ==
      Seq("a0", "a1", "b0", "c0", "c1", "c2"))
  }

  test("bus ingest drains, resumes from committed offsets, and never re-delivers") {
    val dir = newTopic(2)
    val base = Files.createTempDirectory("graft_bus_ing").toString
    val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    // publish 40 blocks across both partitions
    val blocks = Fixtures.blocksJson(2000, 40)
    BusSource.append(dir, 0, blocks.take(20))
    BusSource.append(dir, 1, blocks.drop(20))
    BlockIngest.startFrom(spark, busLines(dir), lake, ckpt).awaitTermination()
    val h1 = spark.read.parquet(s"$lake/blocks").select("block_height")
      .collect().map(_.getLong(0)).sorted
    assert(h1.toSeq == (2000L until 2040L).toSeq)

    // publish 10 more; restart the SAME consumer (checkpoint): only the
    // delta is delivered — the committed byte offsets are the ack floor
    BusSource.append(dir, 0, Fixtures.blocksJson(2040, 10))
    BlockIngest.startFrom(spark, busLines(dir), lake, ckpt).awaitTermination()
    val h2 = spark.read.parquet(s"$lake/blocks").select("block_height")
      .collect().map(_.getLong(0)).sorted
    assert(h2.length == 50, s"loss or re-delivery: ${h2.length} heights")
    assert(h2.toSeq == (2000L until 2050L).toSeq)
  }

  test("maxbytespertrigger drains a backlog in multiple bounded batches") {
    val dir = newTopic(1)
    BusSource.append(dir, 0, (0 until 100).map(i => s"msg$i"))
    val totalBytes = new java.io.File(dir, "p0/log").length()
    val ckpt = Files.createTempDirectory("graft_bus_ac").toString
    var batches = 0
    var rows = 0L
    val q = spark.readStream.format("graftbus")
      .option("path", dir)
      .option("maxbytespertrigger", (totalBytes / 4).toString)
      .load()
      .writeStream
      .option("checkpointLocation", s"$ckpt/c")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        rows += b.count()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(rows == 100, s"admission control lost rows: $rows")
    assert(batches >= 4, s"backlog drained in $batches batches, cap ignored")
  }

  test("a torn trailing write is invisible until its terminator lands") {
    val dir = newTopic(1)
    BusSource.append(dir, 0, Seq("whole1"))
    BusSource.appendTorn(dir, 0, "par".getBytes("UTF-8"))
    assert(BusSource.latestOffsets(dir)(0) == "whole1\n".length.toLong)
    val seen1 = spark.read.format("graftbus").option("path", dir).load()
      .collect().map(_.getAs[String]("value"))
    assert(seen1.toSeq == Seq("whole1"), "partial record leaked")
    // the crashed producer's record completes: now (and only now) it delivers
    BusSource.appendTorn(dir, 0, "tial\n".getBytes("UTF-8"))
    val seen2 = spark.read.format("graftbus").option("path", dir).load()
      .collect().map(_.getAs[String]("value")).sorted
    assert(seen2.toSeq == Seq("partial", "whole1"))
  }

  test("delivery matches a byte-level reference model under random append/torn sequences (property)") {
    // model: each partition is the raw byte string appended so far; the
    // delivered records are exactly the '\n'-terminated prefix, split on
    // '\n', with each record's offset = byte position of its first byte
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val nParts = 1 + rnd.nextInt(3)
      val dir = newTopic(nParts)
      val model = Array.fill(nParts)(new StringBuilder)
      for (_ <- 0 until 12) {
        val p = rnd.nextInt(nParts)
        rnd.nextInt(3) match {
          case 0 => // whole records
            val lines = Seq.fill(1 + rnd.nextInt(3))(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
            BusSource.append(dir, p, lines)
            lines.foreach(l => model(p) ++= l + "\n")
          case 1 => // torn fragment, no terminator
            val frag = rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString
            BusSource.appendTorn(dir, p, frag.getBytes("UTF-8"))
            model(p) ++= frag
          case 2 => // terminate whatever is outstanding (possibly empty record)
            BusSource.appendTorn(dir, p, "\n".getBytes("UTF-8"))
            model(p) += '\n'
        }
      }
      val expected = (for (p <- 0 until nParts) yield {
        val bytes = model(p).toString
        val cut = bytes.lastIndexOf('\n') + 1 // only the terminated prefix delivers
        var off = 0L
        bytes.take(cut).split("\n", -1).dropRight(1).map { rec =>
          val r = (p, off, rec); off += rec.getBytes("UTF-8").length + 1; r
        }
      }).flatten.toSet
      val got = spark.read.format("graftbus").option("path", dir).load().collect()
        .map(r => (r.getAs[Int]("partition"), r.getAs[Long]("offset"), r.getAs[String]("value")))
        .toSet
      assert(got == expected, s"seed $seed diverged:\n got=$got\n exp=$expected")
    }
  }

  test("startingoffsets=latest subscribes at the tail (DeliverPolicy::New)") {
    val dir = newTopic(1)
    BusSource.append(dir, 0, Seq("old1", "old2"))
    val ckpt = Files.createTempDirectory("graft_bus_tail").toString
    // first run binds the initial offset AT THE TAIL into the checkpoint
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def drain(): Unit = {
      val q = spark.readStream.format("graftbus")
        .option("path", dir).option("startingoffsets", "latest")
        .load()
        .writeStream.option("checkpointLocation", s"$ckpt/c")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => out.add(r.getAs[String]("value")))
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(out.isEmpty, s"latest consumer replayed the backlog: $out")
    BusSource.append(dir, 0, Seq("new1"))
    drain()
    import scala.jdk.CollectionConverters._
    assert(out.iterator().asScala.toSeq == Seq("new1"))
  }
}
