package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path plan shapes: bucketed co-located joins (no shuffle),
  * salted aggregation/join equivalence.
  */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // an aborted prior run can leave orphan managed-table locations
    for (t <- Seq("b_orders", "b_lineitem")) {
      val loc = new java.io.File("/tmp/graft_test_warehouse", t)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (bucketing co-locates);
    // only the post-join aggregation exchanges
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not re-shuffle join keys:\n$plan")
    // and it computes the right thing
    val direct = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.except(direct).count() == 0 && direct.except(joined).count() == 0)
  }

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf)
    val salted = Skew.saltedAgg(
      li, "l_returnflag", 8,
      partials = Seq(
        "s_qty" -> sum(Tables.dec(col("l_quantity"))),
        "s_cnt" -> count(lit(1))),
      merges = Seq(
        "sum_qty" -> sum(col("s_qty")).cast("double"),
        "cnt" -> sum(col("s_cnt")).cast("long")))
    val direct = li.groupBy("l_returnflag")
      .agg(Tables.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
    assert(salted.except(direct).count() == 0 && direct.except(salted).count() == 0)
  }

  test("salted join equals direct join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val saltedCount = Skew.saltedJoin(li, o, "l_orderkey", 4)
      .groupBy("o_orderpriority").count()
    val directCount = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").count()
    assert(saltedCount.except(directCount).count() == 0 &&
      directCount.except(saltedCount).count() == 0)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // one pathological key carrying ~all rows vs a uniform right side —
    // the shape salting handles manually; this guards the AQE runtime
    // path (skew-split must actually fire under our session config)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffled join
      // key must be data-dependent or Catalyst folds the join away
      // entirely (a literal key becomes filter + cartesian): ~99.9% of
      // rows land on k=1, the rest on k=0
      val left = spark.range(200000)
        .select((col("id") % 1000).as("pad"), least(col("id") % 1000, lit(1L)).as("k"))
      val right = spark.range(1000).select(col("id").as("k"), col("id").as("r"))
      val joined = left.join(right, "k")
      // execute THIS dataset's plan via collect (count()/foreach build
      // separate QueryExecutions and would leave this one un-adapted)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
