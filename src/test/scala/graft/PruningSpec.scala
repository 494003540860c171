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

  test("shard filter on the shards entity mirrors tracked_shards") {
    val docs = Flatten.fixtureDocs(spark, 63596L, 20)
    val tracked = Flatten.shards(docs).filter(col("shard_id") === 0L)
    assert(tracked.count() == 20)
    assert(Flatten.shards(docs).filter(col("shard_id") === 999L).count() == 0)
  }
}
