package graft

import java.nio.file.Files

import graft.blocks.Flatten
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S23 tracked-shards ≡ partition pruning: the date-partitioned blocks
  * lake must prune non-matching partitions at planning time.
  */
class PruningSpec extends AnyFunSuite {
  import TestSpark._

  test("date-partitioned lake prunes partitions for date predicates") {
    val lake = Files.createTempDirectory("graft_prune").toString + "/blocks"
    // fixture heights spaced 1s apart → ~86400 per date; jump heights to
    // span 3 dates
    val docs = Flatten.fixtureDocs(spark, 63596L, 50)
      .union(Flatten.fixtureDocs(spark, 63596L + 200000L, 50))
    Flatten.blocks(docs).write.partitionBy("block_date").parquet(lake)
    val dates = spark.read.parquet(lake).select("block_date").distinct().collect()
    assert(dates.length >= 2)

    val target = dates.head.getDate(0)
    val q = spark.read.parquet(lake).filter(col("block_date") === lit(target))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // the FileSourceScan must carry the partition filter and read only
    // one partition's files
    assert(scan.contains("PartitionFilters"), scan)
    val expected = Flatten.blocks(docs).filter(col("block_date") === lit(target)).count()
    assert(q.count() == expected)

    // pruned scan reads strictly fewer files than the full scan
    val full = spark.read.parquet(lake)
    val prunedFiles = q.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.totalNumberOfFiles
    val allFiles = full.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.totalNumberOfFiles
    assert(prunedFiles < allFiles, s"pruned=$prunedFiles all=$allFiles")
  }

  test("z-ordered lake layout prunes row groups for 2-D range predicates") {
    // the payoff of z01's interleaved key: sort the lake by z and the
    // parquet min/max zone maps become selective on BOTH x and y, so a
    // 2-D box predicate skips whole row groups. The baseline layout is
    // hash-ordered (arrival order), where every row group spans the full
    // x/y range and nothing can be skipped.
    val base = Files.createTempDirectory("graft_zorder").toString
    val n = 1 << 18 // full 512x512 grid
    val grid = spark.range(n).select(
      (col("id") % 512).as("x"),
      shiftright(col("id"), 9).as("y"))

    grid.orderBy(md5(concat_ws("|", col("x"), col("y")))) // scrambled
      .repartition(16)
      .write.parquet(s"$base/unsorted")
    grid.withColumn("z", graft.functions.ColumnFns.zorder2(col("x"), col("y")))
      .repartitionByRange(16, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.parquet(s"$base/zsorted")

    def scannedRows(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir)
        .filter(col("x").between(100, 131) && col("y").between(200, 231))
      val out = q.collect().length.toLong
      val scan = q.queryExecution.executedPlan.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(x,100)"), scan.metadata)
      (scan.metrics("numOutputRows").value, out)
    }
    val (plainScanned, plainOut) = scannedRows(s"$base/unsorted")
    val (zScanned, zOut) = scannedRows(s"$base/zsorted")
    assert(plainOut == 32L * 32L && zOut == plainOut) // same answer
    // unsorted layout: every row group intersects the box -> full scan
    assert(plainScanned == n.toLong, s"plainScanned=$plainScanned")
    // z layout: only the row groups whose zone maps intersect are read
    assert(zScanned * 4 <= plainScanned, s"zScanned=$zScanned plainScanned=$plainScanned")
  }

  test("shard filter on the shards entity mirrors tracked_shards") {
    val docs = Flatten.fixtureDocs(spark, 63596L, 20)
    val tracked = Flatten.shards(docs).filter(col("shard_id") === 0L)
    assert(tracked.count() == 20)
    assert(Flatten.shards(docs).filter(col("shard_id") === 999L).count() == 0)
  }
}
