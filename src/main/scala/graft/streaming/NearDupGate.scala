package graft.streaming

import graft.llm.{Clusters, Dedup}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming NEAR-duplicate gate: the micro-batch form of the
  * delta-vs-corpus LSH dedup (d11), run continuously. [[DocIngest]]
  * dedups exact fingerprints in stream state; near-dup detection is
  * corpus-relative by nature, so its streaming shape is a foreachBatch
  * loop over a persisted signature index — each micro-batch is the
  * "delta", everything admitted so far is the "corpus":
  *
  *   batch -> shingle/minhash/band (map-side, per batch)
  *         -> band-join vs the persisted index   (corpus near-dups)
  *         -> band self-join within the batch    (intra-batch near-dups)
  *         -> exact-Jaccard verify >= threshold  (candidates only)
  *         -> admit cluster keepers; append their signatures to the index
  *
  * State is the admitted-docs index (shingle hashes + band table), i.e.
  * proportional to DISTINCT content — the same silver table x03
  * documents for the batch pipeline, here grown incrementally. A doc is
  * dropped iff it Jaccard-verifies against an already-ADMITTED doc or
  * loses its intra-batch cluster election (min doc_id keeps, ≡ d09's
  * keeper rule). Banding recall at the threshold matches d03/d11 (same
  * k/r).
  *
  * Idempotence: every output (lake, index, decisions) lands in a
  * batch-scoped `batch=<id>` partition with overwrite semantics — a
  * replayed micro-batch rewrites its own directories instead of
  * appending duplicates (same recipe as BlockIngest's S9 sink).
  *
  * 100 TB notes: the per-batch pipeline shuffles band keys and
  * candidate shingles only (longs, candidate-bounded — see
  * Dedup.jaccard). The persisted index lives in the two-tier
  * [[GateIndex]] layout: micro-batch DELTA generations land as the
  * batch's own few parquet files with `bucket = hash(key) mod
  * indexBuckets` as a data column (writing them as 64 `bucket=` dirs
  * per micro-batch was pure commit cost at micro-batch sizes — the
  * commit canary prices that sequence at ~0.5 s), while compaction
  * folds deltas into the `_base/bucket=*` tier where DIRECTORY pruning
  * makes the probe read only the touched buckets of a corpus-sized
  * index (NearDupGateSpec asserts the file-subset scan on the base).
  * The batch side is broadcast into the probe, so there is no index
  * shuffle either; the only driver materialization is the
  * touched-bucket list, bounded by indexBuckets.
  */
/** Shared physical-layout guard for the gate indexes ([[NearDupGate]],
  * [[SemanticGate]]). The bucket count is a LAYOUT constant, not a
  * tuning knob: the admitted index is physically partitioned by it, so
  * probing with a different value would silently miss candidates and
  * re-admit duplicates. The first step records it in
  * `indexDir/_buckets` (underscore-prefixed — parquet readers skip
  * it); every later step refuses a mismatched Config loudly.
  */
private[streaming] object GateLayout {
  def assertBuckets(spark: SparkSession, indexDir: String, nb: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_buckets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def requireStored(): Unit = {
      val in = fs.open(p)
      val stored =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      require(stored == nb,
        s"index at $indexDir is laid out with indexBuckets=$stored but the " +
          s"gate is configured with $nb — the pruned probe would silently " +
          "miss candidates; rebuild the index or match the config")
    }
    if (fs.exists(p)) requireStored()
    else {
      // two gates can race the first write: create-if-absent (NOT
      // overwrite — two racing overwrites with different configs would
      // both pass and interleave incompatible layouts), and on losing
      // re-read and apply the normal mismatch rule. Same recipe as
      // TrendingTopK's _capacity marker.
      try {
        val out = fs.create(p, false)
        try out.write(s"$nb\n".getBytes("UTF-8")) finally out.close()
      } catch { case _: java.io.IOException => requireStored() }
    }
  }
}

object NearDupGate {

  final case class Config(
      k: Int = 8,
      r: Int = 2,
      maxDf: Int = 1000,
      threshold: Double = 0.8,
      indexBuckets: Int = 64,
      // the pruned probe still reads every un-folded delta generation's
      // files, so probe cost grows with generations between
      // compactions; past this many, step() folds all four roots
      // itself under the maintenance lease (same recipe as
      // TrendingTopK). 0 disables — manual compact() windows only.
      autoFoldGenerations: Int = 64)

  /** index partition key of a band row: which bucket the (band, bv)
    * signature lives in (a data column on delta generations, a
    * `bucket=` partition dir on the compacted base)
    */
  private[graft] def bandBucket(nb: Int, band: Column, bv: Column): Column =
    pmod(hash(band, bv), lit(nb))

  /** index partition key of a shingle row (keyed by owning doc) */
  private[graft] def docBucket(nb: Int, id: Column): Column =
    pmod(hash(id), lit(nb))

  /** The corpus-side probe scan: both index tiers restricted to
    * `buckets` (dir-pruned on the base, a data filter on the deltas)
    * and excluding this batch's own `batch=` partition (a crash-replay
    * runs AFTER a partial write may have landed the batch's own
    * signatures — without the exclusion every replayed doc would
    * "match" itself and be dropped as a corpus dup).
    */
  private[graft] def probeBands(
      spark: SparkSession,
      indexDir: String,
      batchTag: String,
      buckets: Seq[Int]): DataFrame =
    GateIndex.read(spark, s"$indexDir/bands")
      .filter(col("batch") =!= batchTag && col("bucket").isin(buckets: _*))

  /** Same pruned shape for the shingle side: only the buckets owning the
    * candidate corpus docs are read for Jaccard verification.
    */
  private[graft] def probeShingles(
      spark: SparkSession,
      indexDir: String,
      batchTag: String,
      buckets: Seq[Int]): DataFrame =
    GateIndex.read(spark, s"$indexDir/shingles")
      .filter(col("batch") =!= batchTag && col("bucket").isin(buckets: _*))

  /** the admitted band index, both [[GateIndex]] tiers as one relation */
  def readBands(spark: SparkSession, indexDir: String): DataFrame =
    GateIndex.read(spark, s"$indexDir/bands")

  /** the admitted shingle index, both tiers as one relation */
  def readShingles(spark: SparkSession, indexDir: String): DataFrame =
    GateIndex.read(spark, s"$indexDir/shingles")

  /** One incremental step: gate `batchDocs` against the index at
    * `indexDir`, append admitted docs/signatures/decisions under
    * batch-scoped partitions named by `batchTag` (a checkpoint-lineage
    * token + micro-batch id from [[start]], or any unique run label for
    * standalone batch-incremental backfills).
    */
  def step(
      spark: SparkSession,
      batchDocs: DataFrame,
      batchTag: String,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      cfg: Config = Config()): Unit = {
    // refuse (loudly) while a compaction holds the maintenance lease on
    // any of our output roots — see LakeCompact's quiesce contract
    Seq(lakeDir, s"$indexDir/bands", s"$indexDir/shingles", decisionsDir)
      .foreach(LakeCompact.assertNoLease(spark, _))
    GateLayout.assertBuckets(spark, indexDir, cfg.indexBuckets)
    // every cached frame (ours, plus the candidate frames Dedup.jaccard
    // caches internally) is unpersisted in the finally: a long-running
    // stream must not accumulate cache entries per micro-batch, and a
    // batch that THROWS mid-write must not leak them either
    var cached = List[DataFrame](batchDocs.cache())
    def track(df: DataFrame): DataFrame = { cached ::= df; df }
    val docs = batchDocs
    try {
      val sh = track(Dedup.shingleIndex(Dedup.shingleH64(docs), cfg.maxDf).cache())
      val bands = track(
        Dedup.bandTable(Dedup.minhashSigs(sh, cfg.k), cfg.k, cfg.r)
          .withColumn("bucket", bandBucket(cfg.indexBuckets, col("band"), col("bv")))
          .cache())

      // corpus-relative drops: band collision vs the admitted index,
      // then exact-Jaccard verify over the union of shingle tables.
      // Partner choice (for the audit log) is the min admitted doc_id
      // among verified matches — deterministic across replays. None
      // when there is no index or no collisions, so the steady-state
      // batch never runs jobs over empty relations.
      val corpusDropped: Option[DataFrame] =
        if (!GateIndex.exists(spark, s"$indexDir/bands")) None
        else {
          // which index buckets does this batch touch? ≤ indexBuckets
          // ints — the one driver-side materialization of the probe
          val batchBuckets = bands
            .select("bucket").distinct().collect().map(_.getInt(0)).toIndexedSeq
          // batch side is micro-batch-sized: broadcast it so the
          // bucket-pruned index probe is one partial scan of the band
          // table with no index shuffle
          val cand = track(probeBands(spark, indexDir, batchTag, batchBuckets)
            .select(col("band"), col("bv"), col("doc_id").as("d1"))
            .join(broadcast(bands.select(col("band"), col("bv"), col("doc_id").as("d2"))),
              Seq("band", "bv"))
            .select("d1", "d2").distinct().cache())
          // shingles are only needed for the corpus docs that actually
          // collided — prune to their owning buckets; the common
          // steady-state batch (no collisions at all) short-circuits
          // past the whole verify stage instead of running ~5 jobs over
          // empty frames
          val candBuckets = cand
            .select(docBucket(cfg.indexBuckets, col("d1")).as("bucket"))
            .distinct().collect().map(_.getInt(0)).toIndexedSeq
          if (candBuckets.isEmpty) None
          else {
            val corpusSh = probeShingles(spark, indexDir, batchTag, candBuckets)
            Some(Dedup.jaccard(cand,
              corpusSh.select("doc_id", "h64").unionByName(sh.select("doc_id", "h64")))
              .filter(col("jac") >= cfg.threshold)
              .groupBy(col("d2").as("doc_id"))
              .agg(min_by(struct(col("d1"), col("jac")), col("d1")).as("m"))
              .select(col("doc_id"), col("m.d1").as("partner"), col("m.jac").as("jac")))
          }
        }
      val cd = corpusDropped.map(df => track(df.cache()))

      // intra-batch near-dup clusters among the survivors: keeper =
      // min doc_id per connected component (d09's election)
      val rem = cd match {
        case Some(c) =>
          track(docs.join(broadcast(c.select("doc_id")), Seq("doc_id"), "left_anti").cache())
        case None => docs
      }
      val remIds = rem.select("doc_id")
      val candB = bands.join(broadcast(remIds), Seq("doc_id"), "leftsemi")
      val candBPairs = track(Dedup.bandPairs(candB))
      val pairsB = Dedup.jaccard(candBPairs, sh)
        .filter(col("jac") >= cfg.threshold)
      // one materialization of the labels, reused by the decision log
      // and the three admitted-side writes
      val comps = Clusters.connectedComponents(remIds, pairsB.select("d1", "d2"))
        .localCheckpoint()
      val batchDropped = comps.filter(col("cluster") =!= col("doc_id"))
        .select(col("doc_id"), col("cluster").as("partner"))
      val admittedIds = comps.filter(col("cluster") === col("doc_id")).select("doc_id")
      val admitted = track(
        rem.join(broadcast(admittedIds), Seq("doc_id"), "leftsemi").cache())

      def write(df: DataFrame, dir: String): Unit =
        df.write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$batchTag")

      write(admitted, lakeDir)
      GateIndex.writeDelta(
        sh.join(broadcast(admittedIds), Seq("doc_id"), "leftsemi")
          .withColumn("bucket", docBucket(cfg.indexBuckets, col("doc_id"))),
        s"$indexDir/shingles", batchTag)
      GateIndex.writeDelta(
        bands.join(broadcast(admittedIds), Seq("doc_id"), "leftsemi"),
        s"$indexDir/bands", batchTag)
      val admitArm = admittedIds.withColumn("decision", lit("admit"))
        .withColumn("partner", lit(null).cast("long"))
        .withColumn("jac", lit(null).cast("double"))
        .unionByName(batchDropped.withColumn("decision", lit("drop_batch"))
          .withColumn("jac", lit(null).cast("double"))
          .select(col("doc_id"), col("decision"), col("partner"), col("jac")))
      val decisions = cd.map(c => admitArm.unionByName(
        c.withColumn("decision", lit("drop_corpus"))
          .select(col("doc_id"), col("decision"), col("partner"), col("jac"))))
        .getOrElse(admitArm)
      // audit-row-thin; collapse union splinters to the batch's own
      // parallelism before the write
      write(decisions.coalesce(math.max(1, batchDocs.rdd.getNumPartitions)), decisionsDir)
    } finally cached.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    // auto-fold: an unattended stream must not pay an ever-growing
    // probe waiting for an operator maintenance window. Runs AFTER the
    // batch fully commits; the newest delta generation (this batch's)
    // is never folded, so a crash-replay of this batch remains a
    // same-tag overwrite, never a duplicate.
    if (cfg.autoFoldGenerations > 0 &&
        GateIndex.deltaGenerationCount(spark, s"$indexDir/bands") > cfg.autoFoldGenerations)
      // the auto-fold knows its own live tag, so exclusion is by name
      compact(spark, lakeDir, indexDir, decisionsDir, Some(batchTag))
  }

  /** Lake maintenance for the gate's four batch-scoped outputs: fold
    * the doc lake, the decision log, and BOTH signature-index tables.
    * The index folds move delta generations into the `_base/bucket=*`
    * tier, so the pruned probe partition-prunes the compacted corpus —
    * the base never carries a live batch tag, which is why the probe's
    * `batch =!= batchTag` self-exclusion only has to bite on deltas.
    * Run from a maintenance window; the [[LakeCompact]] lease makes a
    * racing micro-batch fail loudly rather than lose rows.
    */
  def compact(
      spark: SparkSession,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      liveTag: Option[String] = None): Unit = {
    // ONE lease window spanning all four roots: per-root sequential
    // leases would leave gaps between folds in which a starting
    // micro-batch passes every assertNoLease check and then races the
    // remaining folds mid-pipeline
    val roots = Seq(lakeDir, decisionsDir, s"$indexDir/bands", s"$indexDir/shingles")
    LakeCompact.withLeases(spark, roots) {
      LakeCompact.foldGenerations(spark, lakeDir, assumeLeased = true, liveTag = liveTag)
      LakeCompact.foldGenerations(spark, decisionsDir, assumeLeased = true, liveTag = liveTag)
      GateIndex.foldIntoBase(spark, s"$indexDir/bands", liveTag)
      GateIndex.foldIntoBase(spark, s"$indexDir/shingles", liveTag)
    }
  }

  /** RIGHT-TO-BE-FORGOTTEN on the gate's admitted state: remove the
    * predicate's doc_ids from the lake and BOTH signature-index tables
    * under one lease window (the d18/s22 fold run against the gate's
    * two-tier layout — each root is row-shaped, so a filtered rewrite
    * preserving the tier layout is exact). The DECISION LOG is
    * deliberately untouched: it is the audit record of what was
    * decided, and a takedown concerns the content (lake) and its
    * searchable signatures (index), not the audit trail. After a
    * forget, an identical future arrival finds no colliding signature
    * and is admitted afresh (NearDupGateSpec asserts it), while dups
    * of surviving docs keep dropping.
    *
    * CRASH-RE-RUN CONTRACT ([[GateForget]]): each root rewrites
    * crash-atomically, but a death between roots leaves a half-done
    * forget with no on-disk record — re-run the same forget until it
    * returns; ledger-driven takedowns ([[Takedown]]) re-drive this
    * automatically.
    */
  def forget(
      spark: SparkSession,
      lakeDir: String,
      indexDir: String,
      pred: org.apache.spark.sql.Column): Unit =
    GateForget.fold(spark, pred, Seq(
      (lakeDir, None),
      (s"$indexDir/shingles", Some("bucket")),
      (s"$indexDir/bands", Some("bucket"))))

  /** Streaming entry point: JSON drop dir in, near-dup-gated lake out,
    * checkpointed resume. Same source contract as [[DocIngest.start]].
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
    // checkpoint-lineage token: replays rewrite their own generation;
    // a fresh checkpoint over the same lake/index gets new dirs instead
    // of clobbering a previous run's (and the string tag keeps the
    // index-exclusion filter a string comparison — a bare numeric id
    // would cast the base tier's '_base' value to null and silently
    // drop the whole corpus from the probe)
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
