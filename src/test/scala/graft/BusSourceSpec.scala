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

  /** drain the topic into `out` under `ckpt`, AvailableNow, returning
    * the values delivered by THIS run (retention-suite helper)
    */
  private def drainTo(dir: String, ckpt: String,
      extraOpts: Map[String, String] = Map.empty): Seq[String] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = extraOpts.foldLeft(
      spark.readStream.format("graftbus").option("path", dir)) {
      case (r, (k, v)) => r.option(k, v)
    }
    reader.load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add(r.getAs[String]("value")))
      }
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    import scala.jdk.CollectionConverters._
    got.iterator().asScala.toSeq
  }

  test("retention folds below the committed ack floor: no loss/dup mid-stream, earliest starts at the floor") {
    val dir = newTopic(2)
    val base = Files.createTempDirectory("graft_bus_ret").toString
    BusSource.append(dir, 0, (0 until 50).map(i => s"a$i"))
    BusSource.append(dir, 1, (0 until 50).map(i => s"b$i"))
    // consumer drains the backlog and commits its ack floor
    val first = drainTo(dir, s"$base/c")
    assert(first.length == 100)
    val floor = BusSource.committedOffsets(s"$base/c")
      .getOrElse(fail("no committed offsets in checkpoint"))
    assert(floor == BusSource.latestOffsets(dir), "ack floor must be the drained tail")

    // FOLD below the floor (JetStream Limits/Old parity)
    BusSource.retain(dir, floor)
    assert(BusSource.earliestOffsets(dir) == floor,
      "retained floor must equal the fold point — offsets preserved")
    assert(BusSource.latestOffsets(dir) == floor, "tail must survive the fold")

    // mid-stream consumer resumes over the fold: no loss, no dup
    BusSource.append(dir, 0, (50 until 60).map(i => s"a$i"))
    BusSource.append(dir, 1, (50 until 55).map(i => s"b$i"))
    val second = drainTo(dir, s"$base/c")
    assert(second.sorted == ((50 until 60).map(i => s"a$i") ++
      (50 until 55).map(i => s"b$i")).sorted,
      s"resume over the fold lost or duplicated records: $second")

    // logical offsets are MONOTONIC across the fold: the post-fold
    // records' offsets continue from the pre-fold byte positions
    val rows = spark.read.format("graftbus").option("path", dir).load().collect()
    assert(rows.forall(r => r.getAs[Long]("offset") >= floor(r.getAs[Int]("partition"))))

    // a FRESH earliest consumer starts at the retained floor — only
    // the 15 post-fold records exist for it
    val fresh = drainTo(dir, s"$base/c2")
    assert(fresh.length == 15, s"fresh earliest consumer saw ${fresh.length} records")
  }

  test("a fold that died mid-copy leaves residue the next fold clears; readers never see it") {
    val dir = newTopic(1)
    val base = Files.createTempDirectory("graft_bus_crash").toString
    BusSource.append(dir, 0, (0 until 40).map(i => s"""{"seq_id":${100 + i},"v":$i}"""))
    // simulate a retention fold killed mid-copy: a partial .log.tmp in
    // the partition dir (never a reader-visible segment name)
    val leftover = new java.io.File(s"$dir/p0", "999.log.tmp")
    java.nio.file.Files.write(leftover.toPath, "torn partial".getBytes("UTF-8"))
    // readers ignore it outright
    assert(drainTo(dir, s"$base/c").length == 40)
    // the next fold clears the crash leftover and lands normally
    BusSource.retainAboveHeight(dir, 120)
    assert(!leftover.exists(), "crashed fold's .log.tmp must be cleared by the next fold")
    assert(!new java.io.File(s"$dir/p0").listFiles().exists(_.getName.endsWith(".tmp")),
      "no temp residue after a completed fold")
    val fresh = drainTo(dir, s"$base/c2")
    assert(fresh.length == 20, s"fresh earliest consumer saw ${fresh.length} records")
  }

  test("maxBytesRetained keeps a bounded tail even below the ack floor") {
    val dir = newTopic(1)
    BusSource.append(dir, 0, (0 until 100).map(i => f"m$i%03d")) // 5 bytes/record
    val end = BusSource.latestOffsets(dir)(0)
    // ack floor at the tail, but retain the last ~25 records anyway
    BusSource.retain(dir, Map(0 -> end), maxBytesRetained = 125L)
    val floor = BusSource.earliestOffsets(dir)(0)
    assert(end - floor >= 125L && end - floor < 130L, s"retained ${end - floor} bytes")
    val vals = spark.read.format("graftbus").option("path", dir).load()
      .collect().map(_.getAs[String]("value"))
    assert(vals.length == 25 && vals.head == "m075")
  }

  test("count-based retention: max_msgs keeps the newest N records per partition, offsets preserved") {
    val dir = newTopic(2)
    val base = Files.createTempDirectory("graft_bus_maxmsgs").toString
    BusSource.append(dir, 0, (0 until 30).map(i => f"a$i%03d")) // 5 bytes/record
    BusSource.append(dir, 1, (0 until 30).map(i => f"b$i%03d"))
    // a lagging consumer commits HERE — below the eventual count cut
    assert(drainTo(dir, s"$base/lagging").length == 60)
    BusSource.append(dir, 0, (30 until 60).map(i => f"a$i%03d"))
    BusSource.append(dir, 1, (30 until 50).map(i => f"b$i%03d"))

    // an oversized cap is a no-op (the log is under the limit)
    val before = BusSource.earliestOffsets(dir)
    BusSource.retainMaxMessages(dir, 1000)
    assert(BusSource.earliestOffsets(dir) == before, "an under-limit fold must not move the floor")

    // a torn in-flight publish is not a record: it never counts toward
    // the limit and always survives the fold
    BusSource.appendTorn(dir, 0, "par".getBytes("UTF-8"))

    BusSource.retainMaxMessages(dir, 25)
    // p0: newest 25 of 60 = a035.., floor 35*5; p1: newest 25 of 50 = b025..
    assert(BusSource.earliestOffsets(dir) == Map(0 -> 175L, 1 -> 125L),
      "floors must be the byte positions the first retained records always had")
    val fresh = drainTo(dir, s"$base/fresh")
    assert(fresh.sorted == ((35 until 60).map(i => f"a$i%03d") ++
      (25 until 50).map(i => f"b$i%03d")).sorted,
      s"fresh earliest consumer must see exactly the newest 25+25: $fresh")
    // the torn bytes survived; completing the record delivers it
    BusSource.appendTorn(dir, 0, "tial\n".getBytes("UTF-8"))
    assert(drainTo(dir, s"$base/fresh") == Seq("partial"))

    // DiscardPolicy::Old discards unconsumed records too: the lagging
    // consumer's committed floor is below the cut — refuse by default,
    // clamp when opted out
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(dir, s"$base/lagging")
    }
    assert(ex.getCause.toString.contains("retention floor"), s"got ${ex.getCause}")
    val clamped = drainTo(dir, s"$base/lagging", Map("failondataloss" -> "false"))
    assert(clamped.sorted == ((35 until 60).map(i => f"a$i%03d") ++
      (30 until 50).map(i => f"b$i%03d") :+ "partial").sorted,
      s"clamped resume must continue at the floor: $clamped")
  }

  test("height-based retention: the MaxAge image over the envelope's height axis") {
    val dir = newTopic(2)
    val base = Files.createTempDirectory("graft_bus_height").toString
    def rec(h: Int) = s"""{"seq_id": $h, "payload": "blk$h"}"""
    // evens to p0, odds to p1 — heights non-decreasing within each log
    BusSource.append(dir, 0, (100 until 130 by 2).map(rec))
    BusSource.append(dir, 1, (101 until 130 by 2).map(rec))
    // a consumer that stops HERE has its committed floor below the
    // eventual height cut — the failOnDataLoss case exercised at the end
    assert(drainTo(dir, s"$base/lagging").length == 30)
    BusSource.append(dir, 0, (130 until 150 by 2).map(rec))
    BusSource.append(dir, 1, (131 until 150 by 2).map(rec))
    // a fully-caught-up consumer, unaffected by the fold
    assert(drainTo(dir, s"$base/caught").length == 50)

    BusSource.retainAboveHeight(dir, 140)

    // a fresh earliest consumer starts at the height floor
    val fresh = drainTo(dir, s"$base/fresh")
    val heights = fresh.map(v => v.split("""[:,]""")(1).trim.toInt).sorted
    assert(heights == (140 until 150).toList, s"fresh consumer saw heights $heights")
    // offsets are preserved: the retained floor is the byte position the
    // first height>=140 record always had
    val floors = BusSource.earliestOffsets(dir)
    assert(floors.values.forall(_ > 0), s"floors not advanced: $floors")
    assert(floors == BusSource.committedOffsets(s"$base/fresh").get.map {
      case (p, o) => p -> (o - fresh.filter(v =>
        BusSource.defaultHeightOf(v) % 2 == p).map(_.length + 1).sum)
    }, "fresh consumer's start offsets must be the retained floors")

    // the caught-up consumer resumes over the fold without loss or dup
    BusSource.append(dir, 0, Seq(rec(150)))
    assert(drainTo(dir, s"$base/caught") == Seq(rec(150)))

    // the lagging consumer's committed offset is below the height floor:
    // failOnDataLoss (default true) refuses, opting out clamps
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(dir, s"$base/lagging")
    }
    assert(ex.getCause.toString.contains("retention floor"), s"got ${ex.getCause}")
    val clamped = drainTo(dir, s"$base/lagging", Map("failondataloss" -> "false"))
    val clampedHeights = clamped.map(BusSource.defaultHeightOf(_).toInt).sorted
    assert(clampedHeights == ((140 to 150).toList),
      s"clamped resume saw heights $clampedHeights")

    // an unparseable record is retained conservatively and stops the scan
    val dir2 = newTopic(1)
    BusSource.append(dir2, 0, Seq(rec(5), "not json at all", rec(6), rec(99)))
    BusSource.retainAboveHeight(dir2, 50)
    val left = spark.read.format("graftbus").option("path", dir2).load()
      .collect().map(_.getAs[String]("value")).toSeq
    assert(left == Seq("not json at all", rec(6), rec(99)),
      s"conservative stop violated: $left")
  }

  test("startingOffsets accepts the Kafka per-partition JSON form with -1/-2 sentinels") {
    val dir = newTopic(3)
    BusSource.append(dir, 0, Seq("x0", "x1", "x2")) // 3 bytes each
    BusSource.append(dir, 1, Seq("y0", "y1"))
    BusSource.append(dir, 2, Seq("z0"))
    val ckpt = Files.createTempDirectory("graft_bus_json").toString
    // p0 from byte 3 (second record), p1 from latest, p2 defaulted to earliest
    val got = drainTo(dir, s"$ckpt/c",
      Map("startingoffsets" -> """{"0": 3, "1": -1}"""))
    assert(got.sorted == Seq("x1", "x2", "z0"), s"got $got")
    // malformed forms are rejected, not silently defaulted
    val ex = intercept[Exception] {
      drainTo(dir, s"$ckpt/c2", Map("startingoffsets" -> "sometime-yesterday"))
    }
    assert(ex.getMessage != null)
  }

  test("failOnDataLoss: an offset below the floor fails by default, clamps when disabled") {
    val dir = newTopic(1)
    val base = Files.createTempDirectory("graft_bus_loss").toString
    BusSource.append(dir, 0, (0 until 20).map(i => s"r$i"))
    assert(drainTo(dir, s"$base/c").length == 20)
    // records the consumer never saw are folded away: floor > ack floor
    BusSource.append(dir, 0, (20 until 40).map(i => s"r$i"))
    BusSource.retain(dir, BusSource.latestOffsets(dir))
    BusSource.append(dir, 0, Seq("fresh1", "fresh2"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(dir, s"$base/c")
    }
    assert(ex.getCause.toString.contains("retention floor"), s"got ${ex.getCause}")
    // opt-in skip: resumes from the floor, delivers only what survives
    val got = drainTo(dir, s"$base/c", Map("failondataloss" -> "false"))
    assert(got == Seq("fresh1", "fresh2"), s"got $got")
  }

  test("publishers are fenced while a retention lease is held") {
    val dir = newTopic(1)
    BusSource.append(dir, 0, Seq("pre"))
    val lock = new java.io.File(dir, "_retention.lock")
    assert(lock.createNewFile())
    try {
      intercept[IllegalStateException] { BusSource.append(dir, 0, Seq("during")) }
    } finally lock.delete()
    BusSource.append(dir, 0, Seq("post"))
    assert(spark.read.format("graftbus").option("path", dir).load().count() == 2)
  }

  test("client auth/TLS options are validated like the reference consumer's matrix") {
    val dir = newTopic(1)
    BusSource.append(dir, 0, Seq("v"))
    def read(opts: (String, String)*): Long =
      opts.foldLeft(spark.read.format("graftbus").option("path", dir)) {
        case (r, (k, v)) => r.option(k, v)
      }.load().count()
    val creds = Files.createTempFile("graft_bus_creds", ".creds")
    val ca = Files.createTempFile("graft_bus_ca", ".pem")
    // valid combinations pass through (transport is a sandbox no-op)
    assert(read("credsfile" -> creds.toString, "tlscacert" -> ca.toString) == 1)
    assert(read("username" -> "u", "password" -> "p") == 1)
    // malformed combinations are rejected the way the reference rejects them
    for (bad <- Seq(
        Seq("username" -> "u"),                                    // password missing
        Seq("credsfile" -> creds.toString, "token" -> "t"),        // two auth modes
        Seq("tlscert" -> ca.toString),                             // key missing
        Seq("credsfile" -> "/nonexistent/x.creds")))               // file absent
      intercept[IllegalArgumentException] { read(bad: _*) }
  }
}
