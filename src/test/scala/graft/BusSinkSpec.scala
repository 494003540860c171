package graft.sources

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The `graftbus` publish sink (reference S9): two-phase pending-file
  * writes, driver-side epoch commit with a ledger, idempotent epoch
  * replay, and round-trip compatibility with the graftbus source.
  * (In package graft.sources to reach the private[sources] write
  * internals for the replay test.)
  */
class BusSinkSpec extends AnyFunSuite {
  import TestSpark._

  private def newTopic(partitions: Int = 2): String = {
    val dir = Files.createTempDirectory("graft_bus_sink").toString
    BusSource.createTopic(dir, partitions)
    dir
  }

  private def readAll(dir: String): Seq[(Int, String)] =
    spark.read.format("graftbus").option("path", dir).load()
      .collect().map(r => (r.getAs[Int]("partition"), r.getAs[String]("value"))).toSeq

  test("batch publish routes by value hash and round-trips through the source") {
    val dir = newTopic(3)
    import spark.implicits._
    val values = (0 until 50).map(i => s"rec$i")
    values.toDF("value").write.format("graftbus").option("path", dir).mode("append").save()
    val got = readAll(dir)
    assert(got.map(_._2).sorted == values.sorted)
    // routing is a pure function of value: publishing the same values
    // again must land each on the same partition as the first copy
    values.toDF("value").write.format("graftbus").option("path", dir).mode("append").save()
    val byValue = readAll(dir).groupBy(_._2).view.mapValues(_.map(_._1).distinct).toMap
    assert(byValue.values.forall(_.length == 1), "same value routed to two partitions")
    assert(readAll(dir).size == 100)
  }

  test("an explicit partition column overrides hash routing") {
    val dir = newTopic(4)
    import spark.implicits._
    val df = (0 until 20).map(i => (i % 4, s"v$i")).toDF("partition", "value")
    df.write.format("graftbus").option("path", dir).mode("append").save()
    for ((p, v) <- readAll(dir))
      assert(v.drop(1).toInt % 4 == p, s"value $v landed on partition $p")
  }

  test("streaming publish drains a backlog exactly-once under AvailableNow") {
    val src = newTopic(2)
    val dst = newTopic(3)
    BusSource.append(src, 0, (0 until 30).map(i => s"a$i"))
    BusSource.append(src, 1, (30 until 60).map(i => s"b$i"))
    val ckpt = Files.createTempDirectory("graft_bus_sink_ck").toString
    val q = spark.readStream.format("graftbus").option("path", src).load()
      .selectExpr("value")
      .writeStream.format("graftbus").option("path", dst)
      .option("checkpointLocation", s"$ckpt/c")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = readAll(dst).map(_._2).sorted
    assert(got == ((0 until 30).map(i => s"a$i") ++ (30 until 60).map(i => s"b$i")).sorted)
    // the committed epoch is in the ledger; pending dirs are swept
    assert(new java.io.File(dst, "commits").exists())
    for (p <- 0 until 3) {
      val pend = new java.io.File(dst, s"p$p/pending")
      assert(!pend.exists() || pend.listFiles().isEmpty, s"pending residue on p$p")
    }
  }

  test("a replayed epoch is skipped: the ledger makes publish idempotent") {
    val dir = newTopic(2)
    val write = new BusWrite(dir, new StructType().add("value", StringType))
    val sw = write.toStreaming
    def publish(epoch: Long, taskId: Long, values: Seq[String]): Unit = {
      val w = sw.createStreamingWriterFactory(null).createWriter(0, taskId, epoch)
      values.foreach(v => w.write(new GenericInternalRow(Array[Any](UTF8String.fromString(v)))))
      sw.commit(epoch, Array(w.commit()))
    }
    publish(7L, 0L, Seq("x1", "x2", "x3"))
    val after1 = readAll(dir).map(_._2).sorted
    assert(after1 == Seq("x1", "x2", "x3"))
    // restart-from-checkpoint redelivers the same epoch: same rows,
    // fresh task — the ledger must swallow it whole
    publish(7L, 1L, Seq("x1", "x2", "x3"))
    assert(readAll(dir).map(_._2).sorted == after1, "replayed epoch duplicated records")
    // a NEW epoch still lands
    publish(8L, 2L, Seq("y1"))
    assert(readAll(dir).map(_._2).sorted == Seq("x1", "x2", "x3", "y1"))
  }

  test("a missing pending file fails the epoch commit loudly instead of dropping records") {
    val dir = newTopic(2)
    val write = new BusWrite(dir, new StructType().add("value", StringType))
    val sw = write.toStreaming
    val w = sw.createStreamingWriterFactory(null).createWriter(0, 0L, 11L)
    w.write(new GenericInternalRow(Array[Any](UTF8String.fromString("real"))))
    val msg = w.commit().asInstanceOf[BusPendingMsg]
    // simulate a cleaned tmp / executor-local path the driver can't
    // see: delete one enumerated pending file before the epoch commit
    new java.io.File(msg.files.head._2).delete()
    val ex = intercept[java.io.IOException] { sw.commit(11L, Array(msg)) }
    assert(ex.getMessage.contains("pending file"))
    // the epoch must NOT be ledgered — a retry can still land it
    val ledger = new java.io.File(dir, "commits")
    assert(!ledger.exists() ||
      !scala.io.Source.fromFile(ledger, "UTF-8").getLines().contains("11"),
      "a failed commit must not ledger its epoch")
  }

  test("the sink preserves torn-write safety: appended records are whole lines") {
    val dir = newTopic(1)
    import spark.implicits._
    Seq("alpha", "beta").toDF("value").write.format("graftbus").option("path", dir)
      .mode("append").save()
    val raw = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "p0/log").toPath), "UTF-8")
    assert(raw.endsWith("\n"), "log tail not newline-terminated")
    assert(raw.split("\n").sorted.toSeq == Seq("alpha", "beta"))
  }

  test("the sink refuses a schema without a string value column") {
    val dir = newTopic(1)
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(1, 2).toDF("n").write.format("graftbus").option("path", dir).mode("append").save()
    }
    assert(ex.getMessage != null)
  }

  test("the bench publish probe relays a backlog and reports a positive rate") {
    val rate = graft.Bench.busPublishRun(spark, 200)
    assert(rate > 0, s"publish probe rate $rate")
  }

  test("partition column routing wraps out-of-range ids instead of crashing") {
    val dir = newTopic(2)
    val write = new BusWrite(dir,
      new StructType().add("partition", IntegerType).add("value", StringType))
    val sw = write.toStreaming
    val w = sw.createStreamingWriterFactory(null).createWriter(0, 0L, 1L)
    w.write(new GenericInternalRow(Array[Any](5, UTF8String.fromString("wrapped"))))
    sw.commit(1L, Array(w.commit()))
    val got = readAll(dir)
    assert(got == Seq((5 % 2, "wrapped")))
  }
}
