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

  // ---- DocIngest.compact: per-lang staged swap, _SUCCESS-gated ----

  private def mkDocLake(): String = {
    val lake = Files.createTempDirectory("graft_doc_compact").toString
    for (i <- 0 until 3)
      spark.range(i * 10, i * 10 + 10).selectExpr("id", "'x' AS text")
        .write.mode("append").parquet(s"$lake/lang=en")
    lake
  }

  test("doc lake: staged dir WITH _SUCCESS but target deleted (crash pre-rename) is renamed in") {
    val lake = mkDocLake()
    val expect = rows(s"$lake/lang=en")
    // simulate: previous run wrote the staging copy (incl. _SUCCESS),
    // deleted lang=en, then died before the rename
    spark.read.parquet(s"$lake/lang=en").coalesce(1)
      .write.parquet(s"$lake/.compact-lang=en")
    fs.delete(new Path(s"$lake/lang=en"), true)
    DocIngest.compact(spark, lake)
    assert(rows(s"$lake/lang=en") == expect)
    assert(!fs.exists(new Path(s"$lake/.compact-lang=en")))
  }

  test("doc lake: staged dir WITH _SUCCESS and target present (crash pre-delete) is swapped in") {
    val lake = mkDocLake()
    val expect = rows(s"$lake/lang=en")
    spark.read.parquet(s"$lake/lang=en").coalesce(1)
      .write.parquet(s"$lake/.compact-lang=en")
    DocIngest.compact(spark, lake)
    assert(rows(s"$lake/lang=en") == expect, "swap must not duplicate or lose rows")
    assert(!fs.exists(new Path(s"$lake/.compact-lang=en")))
  }

  test("doc lake: staged dir WITHOUT _SUCCESS (crash mid-write) is discarded, original intact") {
    val lake = mkDocLake()
    val expect = rows(s"$lake/lang=en")
    spark.read.parquet(s"$lake/lang=en").coalesce(1)
      .write.parquet(s"$lake/.compact-lang=en")
    fs.delete(new Path(s"$lake/.compact-lang=en/_SUCCESS"), false)
    DocIngest.compact(spark, lake)
    assert(rows(s"$lake/lang=en") == expect)
    assert(!fs.exists(new Path(s"$lake/.compact-lang=en")), "incomplete staging must be discarded")
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
    assert(gens.size == 1 && gens.head.startsWith("batch=compact-"),
      s"expected one fresh compacted generation, got $gens")
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
