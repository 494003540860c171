package graft.streaming

import graft.llm.{Curation, Dedup}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CONTAMINATION gate: c03's per-document decision layer run
  * continuously at ingest, against a FROZEN held-out test set.
  *
  * DocIngest's docstring draws the line "contamination is corpus-wide
  * => batch"; this gate is the refinement that makes the important
  * half streamable: exact train-corpus x test-corpus contamination is
  * indeed a batch job, but the production question at ingest time —
  * "does THIS arriving document leak the benchmark?" — is a join of
  * one micro-batch against a FIXED test set, and that streams:
  *
  *   freeze:  test split -> distinct shingle-hash relation (parquet)
  *                       -> bloom sketch of those hashes (sidecar)
  *   batch:   docs -> per-doc distinct shingle hashes (map-side)
  *         -> bloom prefilter              (codegen, kills >99.9%)
  *         -> exact semi-join vs test set  (hit volume, not corpus)
  *         -> per-doc n_hit / n_shingles ratio + verdict (c03's rule)
  *         -> clean docs to the lake; every doc to the decision log
  *
  * 100 TB notes: the sketch is constant-size (~1.8 MB at fpp 1e-3 for
  * 2^20 hashes) and rides to every executor once per batch — the
  * non-matching bulk of each batch dies inside whole-stage codegen
  * without shuffling; the exact verify join's left side is only the
  * bloom survivors, so shuffled volume follows the contamination rate.
  * The frozen-index contract is the point: benchmark sets change by
  * RELEASE, not by stream, so index rebuild is an operator action
  * ([[buildIndex]] again), never stream state. Writes are the
  * batch-scoped overwrite-generation recipe shared by every gate
  * (replays re-land identical partitions), decision/lake roots fold
  * under the same [[LakeCompact]] lease window.
  *
  * Decisions carry c03's exact columns (train_doc, n_shingles, n_hit,
  * hit_ratio, contaminated), so the union of a run's decision
  * generations equals the oracle-checked batch c03 output over the
  * same documents — ContamGateSpec asserts that equality.
  *
  * [[Config.excise]] switches the gate to c05-at-ingest: instead of a
  * keep/drop verdict, the leaked spans are REMOVED and the document
  * kept — per-position shingles bloom-prefiltered then exact-verified
  * against the same frozen index, the hit starts collected per doc
  * (contamination-bounded), the excision one map-side indexed token
  * filter (the batch c05 kernel, shared verbatim via
  * [[Curation.positionShingles]]/[[Curation.exciseKept]]). Every doc
  * lands in the lake with `clean_text`; the decision log carries the
  * span accounting (n_toks, n_removed, n_spans). ContamGateSpec
  * asserts the gate's output equals the oracle-checked batch c05.
  */
object ContamGate {

  /** `excise = false` is c03-at-ingest (verdict: keep or drop whole
    * docs); `excise = true` is c05-at-ingest (remove the leaked spans,
    * keep the document — published decontamination pipelines run this
    * continuously, because dropping whole docs at crawl scale wastes
    * the clean 99%). The two modes write DIFFERENT decision schemas,
    * so a deployment picks one per root pair.
    */
  final case class Config(
      nItems: Long = 1L << 20,
      fpp: Double = 1e-3,
      ratioThreshold: Double = Curation.ContamRatio,
      autoFoldGenerations: Int = 64,
      excise: Boolean = false)

  /** the p01/c01 unit hash, u in [0, 1) as a pure function of doc_id */
  private def unitHash(c: org.apache.spark.sql.Column) =
    graft.functions.ColumnFns.md5_prefix64(c.cast("string")) /
      lit(1152921504606846976.0) // 2^60

  /** Freeze the test-set index from a documents frame: the u >= 0.95
    * split's distinct shingle hashes as parquet plus their bloom
    * sketch as a sidecar byte file. Rebuild = call again (benchmark
    * releases are operator events, not stream events).
    */
  def buildIndex(
      spark: SparkSession,
      docs: DataFrame,
      indexDir: String,
      cfg: Config = Config()): Unit = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val testSet = Dedup.shingleH64(docs, Curation.ContamN)
      .withColumn("u", unitHash(col("doc_id")))
      .filter(col("u") >= 0.95)
      .select("h64").distinct()
    testSet.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/test_hashes")
    val nBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(cfg.nItems, cfg.fpp)
    val bfAgg = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(col("h64")),
      Literal(cfg.nItems), Literal(nBits)).toAggregateExpression())
    val bytes = spark.read.parquet(s"$indexDir/test_hashes")
      .select(bfAgg.as("bf")).head().getAs[Array[Byte]](0)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/bloom.bin")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** One incremental step: verdict every doc in `batchDocs` against the
    * frozen index, append decisions (and clean docs) under batch-scoped
    * partitions named by `batchTag`.
    */
  def step(
      spark: SparkSession,
      batchDocs: DataFrame,
      batchTag: String,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      cfg: Config = Config()): Unit = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    Seq(lakeDir, decisionsDir).foreach(LakeCompact.assertNoLease(spark, _))
    val bp = new org.apache.hadoop.fs.Path(s"$indexDir/bloom.bin")
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(bp)
    val bytes =
      try {
        val len = fs.getFileStatus(bp).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        buf
      } finally in.close()
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
      Bridge.expression(col("h64"))))
    val docs = batchDocs.cache()
    try {
      if (cfg.excise) {
        // c05 at ingest: the batch entry's kernel VERBATIM
        // (Curation.positionShingles / exciseKept), with the bloom
        // prefilter composed in front of the exact semi-join — false
        // positives die in the join, so hit_starts (and the excision)
        // stay exact while the shuffled volume follows the contamination
        // rate, never the batch size
        val toks = docs.withColumn("toks", split(col("text"), " "))
        val hits = Curation.positionShingles(toks.select(col("doc_id"), col("toks")))
          .filter(mightContain)
          .join(spark.read.parquet(s"$indexDir/test_hashes"), Seq("h64"), "leftsemi")
          .groupBy("doc_id").agg(collect_set(col("start")).as("hit_starts"))
        val cleaned = toks
          .join(hits, Seq("doc_id"), "left")
          .withColumn("hit_starts", coalesce(col("hit_starts"), expr("CAST(array() AS array<int>)")))
          .withColumn("kept_toks", Curation.exciseKept)
          .cache()
        try {
          // decision log: the span accounting (every arriving doc, one row)
          cleaned.select(
              col("doc_id").as("train_doc"),
              size(col("toks")).cast("long").as("n_toks"),
              (size(col("toks")) - size(col("kept_toks"))).cast("long").as("n_removed"),
              size(col("hit_starts")).cast("long").as("n_spans"))
            .write.mode(SaveMode.Overwrite).parquet(s"$decisionsDir/batch=$batchTag")
          // lake: EVERY document lands, leaked spans removed — excision
          // keeps the doc, that is the point of the mode
          cleaned.select(
              col("doc_id"), array_join(col("kept_toks"), " ").as("text"),
              col("lang"), col("source"))
            .write.mode(SaveMode.Overwrite).parquet(s"$lakeDir/batch=$batchTag")
        } finally cleaned.unpersist(): Unit
      } else {
        val sh = Dedup.shingleH64(docs, Curation.ContamN).cache()
        try {
          // every ARRIVING doc gets a decision row — docs shorter than
          // ContamN tokens produce zero shingles (Dedup.shingles filters
          // size >= n), so building `total` from the shingle relation
          // alone would silently drop them from both the decision log and
          // (via the semi-join below) the clean lake. They are trivially
          // clean: a doc with no 5-gram cannot contain a test 5-gram.
          val total = docs.select("doc_id").distinct()
            .join(sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles")),
              Seq("doc_id"), "left")
            .withColumn("n_shingles", coalesce(col("n_shingles"), lit(0L)))
          // bloom survivors only reach the exact join; false positives
          // die there, so n_hit is exact (c02's two-stage argument)
          val hits = sh.filter(mightContain)
            .join(spark.read.parquet(s"$indexDir/test_hashes"), Seq("h64"), "leftsemi")
            .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
          val ratio = when(col("n_shingles") > 0, col("n_hit") / col("n_shingles"))
            .otherwise(lit(0.0))
          val decisions = total
            .join(hits, Seq("doc_id"), "left")
            .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
            .select(
              col("doc_id").as("train_doc"), col("n_shingles"), col("n_hit"),
              round(ratio, 6).as("hit_ratio"),
              (ratio >= lit(cfg.ratioThreshold)).as("contaminated"))
          decisions.write.mode(SaveMode.Overwrite)
            .parquet(s"$decisionsDir/batch=$batchTag")
          docs.join(
            spark.read.parquet(s"$decisionsDir/batch=$batchTag")
              .filter(!col("contaminated"))
              .select(col("train_doc").as("doc_id")),
            Seq("doc_id"), "leftsemi")
            .write.mode(SaveMode.Overwrite).parquet(s"$lakeDir/batch=$batchTag")
        } finally sh.unpersist()
      }
    } finally docs.unpersist()
    if (cfg.autoFoldGenerations > 0) {
      val dp = new org.apache.hadoop.fs.Path(decisionsDir)
      val dfs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gens =
        if (dfs.exists(dp))
          dfs.listStatus(dp).count(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch="))
        else 0
      if (gens > cfg.autoFoldGenerations) compact(spark, lakeDir, decisionsDir)
    }
  }

  /** Two-root maintenance window (the index is frozen — rebuilds are
    * [[buildIndex]] calls, not folds).
    */
  def compact(spark: SparkSession, lakeDir: String, decisionsDir: String): Unit =
    LakeCompact.withLeases(spark, Seq(lakeDir, decisionsDir)) {
      LakeCompact.foldGenerations(spark, lakeDir, assumeLeased = true)
      LakeCompact.foldGenerations(spark, decisionsDir, assumeLeased = true)
    }

  /** Streaming entry point: JSON doc drop dir in, decontaminated doc
    * lake + decision log out, checkpointed resume.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      checkpointDir: String,
      cfg: Config = Config(),
      availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(DocIngest.docSchema)
      .option("maxFilesPerTrigger", 64)
      .json(srcDir)
    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(spark, batch, s"$token-$batchId", lakeDir, indexDir, decisionsDir, cfg)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }
}
