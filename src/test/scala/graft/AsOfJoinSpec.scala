package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole-operator as-of join (AsOfJoinNode -> AsOfJoinStrategy ->
  * AsOfJoinExec): semantic parity with the union+window formulation,
  * null handling the window encoding can't express, and the physical
  * plan shape the strategy promises.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("q22b native operator output equals q22 union+window output") {
    val a = Catalog.byName("q22_asof_join").run(spark, sf)
    val b = Catalog.byName("q22b_asof_native").run(spark, sf)
    assert(a.count() == b.count())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("strategy plans AsOfJoinExec with one shuffle+sort per side") {
    val df = Catalog.byName("q22b_asof_native").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin user_id"), s"strategy did not fire:\n$plan")
    // EnsureRequirements must satisfy the declared distribution/ordering:
    // a key-only hash exchange and a (key, ts) sort on each side, like
    // SMJ (the views groupBy adds its own (user_id, ts) exchange)
    assert("Exchange hashpartitioning\\(user_id#\\d+L, \\d+\\)".r.findAllIn(plan).size == 2,
      s"expected a key-only exchange per side:\n$plan")
    assert("Sort \\[user_id#\\d+L ASC NULLS FIRST, ts#\\d+ ASC NULLS FIRST\\]".r
        .findAllIn(plan).size == 2,
      s"expected a (key, ts) sort per side:\n$plan")
  }

  test("q22b parity holds at sf0.01 (multi-partition, AQE)") {
    val sf01 = "/root/testdata/sf0.01"
    val a = Catalog.byName("q22_asof_join").run(spark, sf01)
    val b = Catalog.byName("q22b_asof_native").run(spark, sf01)
    assert(a.count() == b.count() && a.count() > 1000)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("randomized parity with the union+window formulation") {
    import spark.implicits._
    // (seed, key range, ts range): dense ties, one-key pileups,
    // disjoint key sets, sparse timelines — different merge-loop shapes
    for ((seed, nKeys, nTs) <- Seq((87, 12, 40), (11, 1, 25), (52, 200, 5), (99, 30, 1000))) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.tabulate(400)(i => (rnd.nextInt(nKeys), rnd.nextInt(nTs).toLong, i.toLong))
        .toDF("k", "ts", "lid")
      val right = Seq.tabulate(300)(i =>
          (rnd.nextInt(nKeys + 4), rnd.nextInt(nTs).toLong, i.toLong))
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, ts), max wins
        .toDF("k", "ts", "payload")
      val viaWindow = AsOfJoin.asofLeft(left, right, "k", "ts", Seq("payload"))
      val viaNative = AsOfJoin.asofNative(left, right, "k", "ts", Seq("payload"))
      assert(viaNative.count() == 400, s"seed $seed")
      assert(viaWindow.except(viaNative).count() == 0 &&
        viaNative.except(viaWindow).count() == 0, s"seed $seed diverged")
    }
  }

  test("null payloads join exactly (no forward-fill)") {
    import spark.implicits._
    // the union+window encoding uses null as its no-match marker so it
    // would forward-fill past a genuinely-null payload; the native
    // operator must return the null payload itself
    val left = Seq((1, 10L, 100L), (1, 20L, 101L)).toDF("k", "ts", "lid")
    val right = Seq((1, 5L, Some(7L)), (1, 15L, None)).toDF("k", "ts", "payload")
    val got = AsOfJoin.asofNative(left, right, "k", "ts", Seq("payload"))
      .orderBy("lid").collect()
    assert(got(0) == Row(1, 10L, 100L, 7L))   // latest at ts<=10 is (5, 7)
    assert(got(1) == Row(1, 20L, 101L, null)) // latest at ts<=20 is (15, null) itself
  }

  test("rows with null key or null ts never match") {
    import spark.implicits._
    val left = Seq(
      (Option(1), Option(10L), 100L),
      (Option.empty[Int], Option(10L), 101L),
      (Option(1), Option.empty[Long], 102L)).toDF("k", "ts", "lid")
    val right = Seq(
      (Option(1), Option(5L), 7L),
      (Option.empty[Int], Option(1L), 8L),
      (Option(1), Option.empty[Long], 9L)).toDF("k", "ts", "payload")
    val got = AsOfJoin.asofNative(left, right, "k", "ts", Seq("payload"))
      .orderBy("lid").collect()
    assert(got(0).get(3) == 7L)   // normal match ignores the null-ts right row
    assert(got(1).get(3) == null) // null left key
    assert(got(2).get(3) == null) // null left ts
  }

  test("asofNative rejects key/ts type mismatches and payload name collisions") {
    import spark.implicits._
    val l = Seq((1, 10L, 1L)).toDF("k", "ts", "lid")
    // int key on the left, long on the right: each side would hash-
    // partition by its own type and silently lose matches — must throw
    val rLong = Seq((1L, 5L, 7L)).toDF("k", "ts", "payload")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofNative(l, rLong, "k", "ts", Seq("payload"))
    }
    // payload name already present on the left -> ambiguous output
    val r = Seq((1, 5L, 7L)).toDF("k", "ts", "lid")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofNative(l, r, "k", "ts", Seq("lid"))
    }
  }

  test("left rows with no right partner keep left semantics (null payload)") {
    import spark.implicits._
    val left = Seq((1, 10L, 100L), (2, 10L, 101L)).toDF("k", "ts", "lid")
    val right = Seq((1, 50L, 7L)).toDF("k", "ts", "payload") // too late for k=1
    val got = AsOfJoin.asofNative(left, right, "k", "ts", Seq("payload"))
      .orderBy("lid").collect()
    assert(got.length == 2 && got.forall(_.get(3) == null))
  }
}
