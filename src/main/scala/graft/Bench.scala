package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BENCH harness (driver contract): runs every catalog query against
  * SPARK_GRAFT_SF_DIR. Prints the per-query map as one JSON line, then a
  * short summary JSON line LAST (the driver tail-captures stdout, so the
  * final line must be a complete object on its own); the combined blob
  * also lands in `bench_full.json` for offline regression diffs.
  *
  * Methodology:
  *  - a full warmup pass at sf0.001 first — JIT, codegen caches, parquet
  *    reader init — so measured times reflect steady-state execution,
  *    not JVM startup (the thing a long-lived cluster amortizes away).
  *  - every query is fully materialized through the noop sink (count()
  *    would let scans shortcut via parquet row-group counts).
  *  - deterministic name order; per-query seconds + total reported.
  */
object Bench {
  private val WarmDir = "/root/testdata/sf0.001"

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    // JSON output must be locale-independent (comma-decimal locales would
    // break the f"" formatting below)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSessions.local("graft-bench", cpus.toInt)

    // local-iteration extras (driver passes no args): restrict to the
    // named queries and repeat each, reporting the best-of-n time.
    // Default is best-of-3: the first sf-target pass pays one-off costs
    // (OS page-cache fill of each parquet file, AQE-shaped codegen) that
    // a long-lived cluster amortizes away; later reps are the steady
    // state the per-query numbers are meant to measure, and three reps
    // keep single-run noise out of round-over-round regression diffs.
    val only = args.filterNot(_.forall(_.isDigit)).toSet
    val reps = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    // contention sentinel: a bench sharing the box with compiles/tests
    // reads 3-5x high (round-5 postmortem). Record the 1-min load
    // average at start and end so a contaminated run is self-identifying
    // in the committed artifact, and warn per query when rep spread
    // exceeds 2x (steady-state reps of an uncontended box are tight).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    val all = Catalog.all
      .filter(q => only.isEmpty || only(q.name))
      .map(q => q.name -> q.run)
    // warmup: run everything once on the tiny sf
    for ((_, fn) <- all)
      try materialize(fn(spark, WarmDir)) catch { case _: Throwable => () }

    var spreadWarnings = 0
    val results = all.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      // spread is judged over the STEADY reps only: rep 1 legitimately
      // pays one-off page-cache/codegen costs 2x+ on a clean box (the
      // documented methodology), so including it would make the
      // sentinel cry wolf on every uncontended run. Sub-50ms queries
      // flap on scheduler noise alone — don't flag them either.
      val steady = if (times.length > 2) times.drop(1) else times
      if (steady.length > 1 && best > 0.05 && steady.max / steady.min > 2.0) {
        spreadWarnings += 1
        System.err.println(f"[bench] WARN $name steady-rep spread ${steady.max / steady.min}%.1fx " +
          s"(${times.map(t => f"$t%.3f").mkString(", ")}) — is the box contended?")
      }
      name -> best
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // streaming probe LAST (measured: running it first both reads ~3x
    // low — cold JIT on the parse/flatten path — and leaves streaming
    // machinery that inflates every subsequent batch query 3-15x).
    // Placement after the timed loop keeps the query timings clean and
    // the probe JIT-warm.
    // both probe sizes are committed: 2k blocks is micro-batch-overhead
    // bound (~500 blk/s), 8k amortizes it (~1700 blk/s) — recording the
    // pair makes the scaling claim reproducible instead of prose
    val blocksPerSec =
      try if (only.nonEmpty) 0.0 else streamingThroughput(spark)
      catch { case e: Throwable => System.err.println(s"[bench] streaming probe failed: $e"); 0.0 }
    // separate catch: an 8k failure (e.g. /tmp pressure from the larger
    // fixture) must not discard the already-measured 2k number
    val blocksPerSec8k =
      try if (only.nonEmpty) 0.0 else ingestRun(spark, 8000)
      catch { case e: Throwable => System.err.println(s"[bench] 8k streaming probe failed: $e"); 0.0 }
    val docsPerSec =
      try if (only.nonEmpty) 0.0 else docThroughput(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] doc probe failed: $e"); 0.0 }
    val nearDupDocsPerSec =
      try if (only.nonEmpty) 0.0 else nearDupThroughput(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] neardup probe failed: $e"); 0.0 }
    val trendingDocsPerSec =
      try if (only.nonEmpty) 0.0 else trendingThroughput(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] trending probe failed: $e"); 0.0 }
    // Output contract, tail-capture-proof (the driver keeps only the
    // LAST few KB of stdout): the big per-query map goes out first on
    // its own line AND into bench_full.json, then a short summary line
    // prints LAST so a bounded tail window always contains one complete,
    // parseable JSON object with the headline numbers.
    val loadEnd = osBean.getSystemLoadAverage
    val sentinel =
      s""""load_avg_start":${f"$loadStart%.2f"},"load_avg_end":${f"$loadEnd%.2f"},"rep_spread_warnings":$spreadWarnings"""
    val summary =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","sf":"$sfDir","cpus":$cpus,"shuffle_partitions":$cpus,"aqe":true,"driver_mem":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}","streaming_blocks_per_sec":${f"$blocksPerSec%.0f"},"streaming_blocks_per_sec_8k":${f"$blocksPerSec8k%.0f"},"streaming_docs_per_sec":${f"$docsPerSec%.0f"},"streaming_neardup_docs_per_sec":${f"$nearDupDocsPerSec%.0f"},"streaming_trending_docs_per_sec":${f"$trendingDocsPerSec%.0f"},$sentinel,"n_queries":${results.size},"queries_file":"bench_full.json"}"""
    val full =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","sf":"$sfDir","cpus":$cpus,"shuffle_partitions":$cpus,"aqe":true,"driver_mem":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}","streaming_blocks_per_sec":${f"$blocksPerSec%.0f"},"streaming_blocks_per_sec_8k":${f"$blocksPerSec8k%.0f"},"streaming_docs_per_sec":${f"$docsPerSec%.0f"},"streaming_neardup_docs_per_sec":${f"$nearDupDocsPerSec%.0f"},"streaming_trending_docs_per_sec":${f"$trendingDocsPerSec%.0f"},$sentinel,"queries":$qs}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] bench_full.json write failed: $e") }
    println(s"""{"queries":$qs}""")
    println(summary)
    spark.stop()
  }

  /** Reference-shaped metric (BASELINE.md "streaming parity"): blocks/s
    * through the full ingest path — JSON source -> schema parse ->
    * 8-table flatten -> checkpointed parquet lake. The reference's live
    * floor is ~1 block/s (NEAR cadence); backfill wants orders of
    * magnitude more.
    *
    * A small untimed pass runs first: the streaming path (micro-batch
    * planner, state machinery, per-entity writers) JITs independently
    * of the batch warmup, and a single cold pass reads ~3x low with
    * run-to-run spread of 2x+ (measured in graft.tools.StreamProbe:
    * cold 144 blocks/s vs steady 480-510). The metric's contract is
    * steady-state throughput of a long-lived ingest job, same as the
    * per-query times.
    */
  private def streamingThroughput(spark: SparkSession, nBlocks: Int = 2000): Double = {
    ingestRun(spark, 200) // warmup: JIT the streaming path, untimed
    ingestRun(spark, nBlocks)
  }

  /** one fixture-drop -> BlockIngest -> lake pass; returns blocks/s
    * (private[graft]: graft.tools.StreamProbe reuses it so the
    * diagnostic measures the identical pipeline)
    */
  private[graft] def ingestRun(spark: SparkSession, nBlocks: Int): Double = {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft_bench_stream").toString
    try {
      val src = s"$base/src"
      Files.createDirectories(Paths.get(src))
      val groups = graft.blocks.Fixtures.blocksJson(1000000L, nBlocks).grouped(500).zipWithIndex
      for ((g, i) <- groups)
        Files.write(Paths.get(s"$src/blocks_$i.jsonl"), g.mkString("\n").getBytes("UTF-8"))
      val t0 = System.nanoTime()
      graft.streaming.BlockIngest
        .start(spark, src, s"$base/lake", s"$base/ckpt")
        .awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      nBlocks / secs
    } finally rmTree(base)
  }

  /** LLM-pipeline streaming metric: curation-gate docs/s through the
    * full DocIngest path — JSON drop -> stateless quality gates ->
    * watermarked fingerprint dedup -> lang-partitioned parquet lake.
    * Input is the sf corpus streamed 4x with shifted doc_ids, so the
    * dedup state carries real duplicate pressure (3 of every 4 copies
    * share a fingerprint and must drop).
    */
  private def docThroughput(spark: SparkSession, sfDir: String): Double = {
    docRun(spark, WarmDir, copies = 1) // warmup: JIT the gate+dedup path
    docRun(spark, sfDir, copies = 4)
  }

  /** one corpus-drop -> DocIngest -> lake pass; returns docs/s */
  private def docRun(spark: SparkSession, sfDir: String, copies: Int): Double = {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_bench_docs").toString
    try {
      val src = s"$base/src"
      val docs = Tables.documents(spark, sfDir)
        .selectExpr("doc_id", "text", "lang", "source")
      val n = docs.count() * copies
      for (i <- 0 until copies)
        docs.selectExpr(s"doc_id + ${i}000000 AS doc_id", "text", "lang", "source")
          .write.mode("append").json(src)
      val t0 = System.nanoTime()
      graft.streaming.DocIngest
        .start(spark, src, s"$base/lake", s"$base/ckpt")
        .awaitTermination()
      n / ((System.nanoTime() - t0) / 1e9)
    } finally rmTree(base)
  }

  /** Streaming near-dup gate docs/s: the sf corpus streamed twice, the
    * second pass with remapped doc_ids — every pass-2 doc collides with
    * pass-1's admitted index, so the probe pays the gate's full
    * steady-state path (shingle/minhash per batch, bucket-pruned corpus
    * probe, Jaccard verify, intra-batch election, index append) under
    * maximum duplicate pressure.
    */
  private def nearDupThroughput(spark: SparkSession, sfDir: String): Double = {
    nearDupRun(spark, WarmDir) // JIT the LSH/probe/gate path, untimed
    nearDupRun(spark, sfDir)
  }

  /** Streaming mergeable top-k gate: docs/s through TrendingTopK's
    * accumulate -> state append -> combine-on-read snapshot loop,
    * trending sources over the documents corpus. Same warm-then-time
    * recipe as the other streaming probes.
    */
  private def trendingThroughput(spark: SparkSession, sfDir: String): Double = {
    trendingRun(spark, WarmDir)
    trendingRun(spark, sfDir)
  }

  private def trendingRun(spark: SparkSession, sfDir: String): Double = {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_bench_trend").toString
    try {
      val src = s"$base/src"
      val docs = Tables.documents(spark, sfDir).selectExpr("source AS item")
      val n = docs.count()
      docs.write.mode("append").json(src)
      val t0 = System.nanoTime()
      graft.streaming.TrendingTopK
        .start(spark, src, s"$base/state", s"$base/out", s"$base/ckpt",
          graft.streaming.TrendingTopK.Config(k = 10, capacity = 256))
        .awaitTermination()
      n / ((System.nanoTime() - t0) / 1e9)
    } finally rmTree(base)
  }

  private def nearDupRun(spark: SparkSession, sfDir: String): Double = {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_bench_ndg").toString
    try {
      val src = s"$base/src"
      val docs = Tables.documents(spark, sfDir)
        .selectExpr("doc_id", "text", "lang", "source")
      val n = docs.count() * 2
      // remap offset derived from the corpus: a fixed constant would
      // collide pass-2 ids with real pass-1 ids at scale factors whose
      // doc_ids exceed it, merging distinct texts under one key
      val off = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
        .head.getLong(0) + 1
      docs.write.mode("append").json(src)
      docs.selectExpr(s"doc_id + $off AS doc_id", "text", "lang", "source")
        .write.mode("append").json(src)
      val t0 = System.nanoTime()
      graft.streaming.NearDupGate
        .start(spark, src, s"$base/lake", s"$base/idx", s"$base/dec", s"$base/ckpt")
        .awaitTermination()
      n / ((System.nanoTime() - t0) / 1e9)
    } finally rmTree(base)
  }

  /** probes leave ~5x the corpus behind otherwise (JSON drop + lake +
    * RocksDB checkpoint per run) — bounded /tmp is part of the contract
    */
  private def rmTree(dir: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    try
      Files.walk(Paths.get(dir)).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    catch { case e: Throwable => System.err.println(s"[bench] cleanup of $dir failed: $e") }
  }
}
