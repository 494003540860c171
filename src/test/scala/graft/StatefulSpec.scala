package graft

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState sessionization, driven through a real
  * streaming query (MemoryStream source -> memory sink) across two
  * micro-batches.
  */
class StatefulSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming sessionization closes sessions on gap across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val q = StatefulSessions(spark, source.toDS())
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()

    // batch 1: user 1 has two events 10 min apart (one open session);
    // user 2 one event
    source.addData(Event(1, 1000, "view"), Event(1, 1600, "click"), Event(2, 5000, "view"))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() == 0) // nothing closed yet

    // batch 2: user 1 event 2h later -> closes first session (2 events);
    // user 2 event within gap -> still open
    source.addData(Event(1, 9000, "purchase"), Event(2, 5900, "click"))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[ClosedSession].collect()
    assert(closed.toSeq == Seq(ClosedSession(1, 1000, 1600, 2)))

    // batch 3: both users far in the future -> closes both open sessions
    source.addData(Event(1, 100000, "view"), Event(2, 100000, "view"))
    q.processAllAvailable()
    val all = spark.table("sessions_out").as[ClosedSession].collect().sortBy(c => (c.user_id, c.start_s))
    assert(all.toSeq == Seq(
      ClosedSession(1, 1000, 1600, 2),
      ClosedSession(1, 9000, 9000, 1),
      ClosedSession(2, 5000, 5900, 2)))
    q.stop()
  }

  test("batch session query q33 agrees with the stateful machine on final sessions") {
    import spark.implicits._
    // run the stateful op in batch mode over the events table
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_s"), col("event_type"))
      .as[Event]
    // batch flatMapGroupsWithState emits only CLOSED sessions; emulate
    // closure by appending a far-future sentinel per user
    val sentinels = ev.groupBy("user_id").agg(max("ts_s").as("m"))
      .select(col("user_id"), (col("m") + 1000000L).as("ts_s"), lit("__sentinel").as("event_type"))
      .as[Event]
    // sentinel events open a final never-emitted session, so the
    // emitted set is exactly the real (closed) sessions
    val closed = StatefulSessions(spark, ev.union(sentinels))
    val q33 = Catalog.byName("q33_session_window").run(spark, sf)
      .select(col("user_id"), col("s_start"), col("n_events"))
    val a = closed.select(col("user_id"), col("start_s").as("s_start"), col("n_events"))
    assert(a.except(q33).count() == 0 && q33.except(a).count() == 0)
  }
}
