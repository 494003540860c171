package graft.streaming

import graft.llm.{Clusters, Similarity}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming SEMANTIC near-duplicate gate: the embedding-space sibling
  * of [[NearDupGate]] — same micro-batch-vs-admitted-corpus
  * architecture, with hyperplane-LSH bands for MinHash bands and exact
  * cosine for exact Jaccard:
  *
  *   batch -> hyperplane band signature      (map-side, per batch)
  *         -> band-join vs persisted index   (corpus candidates)
  *         -> band self-join within batch    (intra-batch candidates)
  *         -> exact cosine verify >= tau     (candidates only)
  *         -> admit cluster keepers; append bands + vectors to the index
  *
  * This is d14/d06's semantics run continuously: a vector is dropped
  * iff it cosine-verifies against an already-ADMITTED vector or loses
  * its intra-batch cluster election (min vec_id keeps — d09's rule,
  * via the same [[Clusters.connectedComponents]], which takes its
  * broadcast union-find fast path at micro-batch edge-set sizes).
  *
  * State is the admitted-vector index: a band table keyed by
  * (band, bv) and the admitted embeddings keyed by vec_id, both in the
  * two-tier [[GateIndex]] layout — micro-batch deltas land as the
  * batch's own few parquet files (bucket a data column; the previous
  * per-batch 64-directory bucketed write was pure commit cost at
  * micro-batch sizes), while compaction folds deltas into the
  * `_base/bucket=*` tier where directory pruning makes the probe
  * delta-sized against a corpus-sized index. Idempotence is the same
  * batch-scoped `batch=<tag>` overwrite recipe; compaction is the same
  * four-root [[LakeCompact]] lease window.
  *
  * 100 TB notes: bands are (long, long) keys — the widest shuffle
  * carries 16 bytes per signature row; the batch side is broadcast
  * into the pruned index probe so the corpus is never shuffled; cosine
  * verification is the codegen expression over candidate pairs only,
  * and every intra-batch join side is micro-batch-sized and broadcast,
  * so the per-batch pipeline plans no corpus-shaped exchange at all.
  * `planes` should grow ~log2(corpus) to hold band-bucket occupancy
  * constant — size it at index creation via
  * [[Similarity.adaptiveBandBits]](expected corpus); band values are
  * persisted with the index, so widening later is [[rebuildBands]]: a
  * recompute of the band table from the admitted vectors inside the
  * [[LakeCompact]] lease window, which changes FUTURE probe pruning
  * but never a past decision (SemanticGateSpec asserts both halves).
  * The batch queries (d06/s03/d10) recompute bands per run and
  * therefore adapt automatically.
  */
object SemanticGate {

  final case class Config(
      planes: Int = 16,
      bandBits: Int = 4,
      tau: Double = 0.4,
      indexBuckets: Int = 64,
      autoFoldGenerations: Int = 64)

  /** JSON source schema: vec_id + the embedding as a float array
    * (labels ride along untyped through the lake write)
    */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** One incremental step: gate `batchVecs` against the index at
    * `indexDir`, append admitted vectors/signatures/decisions under
    * batch-scoped partitions named by `batchTag`.
    */
  def step(
      spark: SparkSession,
      batchVecs: DataFrame,
      batchTag: String,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      cfg: Config = Config()): Unit = {
    Seq(lakeDir, s"$indexDir/bands", s"$indexDir/vectors", decisionsDir)
      .foreach(LakeCompact.assertNoLease(spark, _))
    GateLayout.assertBuckets(spark, indexDir, cfg.indexBuckets)
    var cached = List[DataFrame](batchVecs.cache())
    def track(df: DataFrame): DataFrame = { cached ::= df; df }
    val vecs = batchVecs
    try {
      // band signatures carry their index bucket from birth — computed
      // once, reused by the probe's pruning collect and the index write
      val bands = track(
        Similarity.hyperplaneBands(vecs, cfg.planes, cfg.bandBits)
          .withColumn("bucket",
            NearDupGate.bandBucket(cfg.indexBuckets, col("band"), col("bv")))
          .cache())

      // corpus-relative drops: band collision vs the admitted index,
      // then exact-cosine verify. Partner = min admitted vec_id among
      // verified matches — deterministic across replays. None (not an
      // empty frame) when there is no index or no candidates, so the
      // steady-state batch never pays jobs over empty relations.
      val corpusDropped: Option[DataFrame] =
        if (!GateIndex.exists(spark, s"$indexDir/bands")) None
        else {
          val batchBuckets = bands
            .select("bucket").distinct().collect().map(_.getInt(0)).toIndexedSeq
          val cand = track(GateIndex.read(spark, s"$indexDir/bands")
            .filter(col("batch") =!= batchTag && col("bucket").isin(batchBuckets: _*))
            .select(col("band"), col("bv"), col("vec_id").as("v1"))
            .join(broadcast(bands.select(col("band"), col("bv"), col("vec_id").as("v2"))),
              Seq("band", "bv"))
            .select("v1", "v2").distinct().cache())
          val candBuckets = cand
            .select(NearDupGate.docBucket(cfg.indexBuckets, col("v1")).as("bucket"))
            .distinct().collect().map(_.getInt(0)).toIndexedSeq
          if (candBuckets.isEmpty) None
          else {
            val corpusVecs = GateIndex.read(spark, s"$indexDir/vectors")
              .filter(col("batch") =!= batchTag && col("bucket").isin(candBuckets: _*))
              .select(col("vec_id").as("v1"), col("embedding").as("e1"))
            Some(cand
              .join(corpusVecs, "v1")
              .join(broadcast(vecs.select(col("vec_id").as("v2"), col("embedding").as("e2"))), "v2")
              .withColumn("cos", round(Similarity.cosine(col("e1"), col("e2")), 6))
              .filter(col("cos") >= cfg.tau)
              .groupBy(col("v2").as("vec_id"))
              .agg(min_by(struct(col("v1"), col("cos")), col("v1")).as("m"))
              .select(col("vec_id"), col("m.v1").as("partner"), col("m.cos").as("cos")))
          }
        }
      val cd = corpusDropped.map(df => track(df.cache()))

      // intra-batch clusters among the survivors: band self-join,
      // cosine verify, min-vec_id keeper election. Every join side is
      // micro-batch-sized, so everything is broadcast — the whole
      // chain is map-shaped up to the components' one distinct.
      val rem = cd match {
        case Some(c) =>
          track(vecs.join(broadcast(c.select("vec_id")), Seq("vec_id"), "left_anti").cache())
        case None => vecs
      }
      val remIds = rem.select("vec_id")
      val candB = bands.join(broadcast(remIds), Seq("vec_id"), "leftsemi")
      // no pre-distinct on the collided pairs: a pair colliding in k
      // bands re-verifies k times (k <= planes/bandBits, candidates
      // only) and the components' canonical edge set dedups — cheaper
      // than a dedicated shuffle per micro-batch
      val pairsB = candB.select(col("band"), col("bv"), col("vec_id").as("v1"))
        .join(broadcast(candB.select(col("band"), col("bv"), col("vec_id").as("v2"))),
          Seq("band", "bv"))
        .filter(col("v1") < col("v2"))
        .join(broadcast(rem.select(col("vec_id").as("v1"), col("embedding").as("e1"))), "v1")
        .join(broadcast(rem.select(col("vec_id").as("v2"), col("embedding").as("e2"))), "v2")
        .filter(round(Similarity.cosine(col("e1"), col("e2")), 6) >= cfg.tau)
        .select(col("v1").as("d1"), col("v2").as("d2"))
      // one materialization of the labels, reused by the decision log
      // and the three admitted-side writes (block-manager-backed;
      // reclaimed by the ContextCleaner after the batch)
      val comps = Clusters.connectedComponents(
        remIds.select(col("vec_id").as("doc_id")), pairsB).localCheckpoint()
      val batchDropped = comps.filter(col("cluster") =!= col("doc_id"))
        .select(col("doc_id").as("vec_id"), col("cluster").as("partner"))
      val admittedIds = comps.filter(col("cluster") === col("doc_id"))
        .select(col("doc_id").as("vec_id"))
      val admitted = track(
        rem.join(broadcast(admittedIds), Seq("vec_id"), "leftsemi").cache())

      def write(df: DataFrame, dir: String): Unit =
        df.write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$batchTag")

      write(admitted, lakeDir)
      GateIndex.writeDelta(
        admitted.select(col("vec_id"), col("embedding"))
          .withColumn("bucket", NearDupGate.docBucket(cfg.indexBuckets, col("vec_id"))),
        s"$indexDir/vectors", batchTag)
      GateIndex.writeDelta(
        bands.join(broadcast(admittedIds), Seq("vec_id"), "leftsemi"),
        s"$indexDir/bands", batchTag)
      val admitArm = admittedIds.withColumn("decision", lit("admit"))
        .withColumn("partner", lit(null).cast("long"))
        .withColumn("cos", lit(null).cast("double"))
        .unionByName(batchDropped.withColumn("decision", lit("drop_batch"))
          .withColumn("cos", lit(null).cast("double"))
          .select(col("vec_id"), col("decision"), col("partner"), col("cos")))
      val decisions = cd.map(c => admitArm.unionByName(
        c.withColumn("decision", lit("drop_corpus"))
          .select(col("vec_id"), col("decision"), col("partner"), col("cos"))))
        .getOrElse(admitArm)
      // decisions are audit-row-thin; collapse the union's partition
      // splinters to the batch's own parallelism before the write
      write(decisions.coalesce(math.max(1, batchVecs.rdd.getNumPartitions)), decisionsDir)
    } finally cached.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    if (cfg.autoFoldGenerations > 0 &&
        GateIndex.deltaGenerationCount(spark, s"$indexDir/bands") > cfg.autoFoldGenerations)
      // the auto-fold knows its own live tag, so exclusion is by name
      compact(spark, lakeDir, indexDir, decisionsDir, Some(batchTag))
  }

  /** the admitted band index, both [[GateIndex]] tiers as one relation */
  def readBands(spark: SparkSession, indexDir: String): DataFrame =
    GateIndex.read(spark, s"$indexDir/bands")

  /** the admitted vector index, both tiers as one relation */
  def readVectors(spark: SparkSession, indexDir: String): DataFrame =
    GateIndex.read(spark, s"$indexDir/vectors")

  /** WIDEN the persisted band signature by REBUILD: when the corpus
    * outgrows its creation-time width (band-bucket occupancy climbs,
    * probe cost bends super-linear — the r10 ScaleProbe lesson), the
    * band table is recomputed from the admitted VECTORS at the new
    * width inside the lease window, where probes and writers are
    * already fenced out. The vector index, lake and decision log are
    * untouched: a rebuild changes future probe pruning, never a past
    * decision — admitted vectors stay admitted, and a duplicate of an
    * admitted vector still collides (same vector => same signature at
    * any width). The rebuilt table publishes as a fresh `_base` tier
    * retiring every band delta in one [[FoldCommit]]-atomic swap; a
    * crash mid-rebuild leaves mixed widths only INSIDE the lease
    * window, which no probe can enter.
    */
  def rebuildBands(spark: SparkSession, indexDir: String, cfg: Config): Unit =
    LakeCompact.withLeases(spark, Seq(s"$indexDir/bands", s"$indexDir/vectors")) {
      if (GateIndex.exists(spark, s"$indexDir/bands")) {
        val vecs = GateIndex.read(spark, s"$indexDir/vectors")
          .select("vec_id", "embedding")
        GateIndex.replaceAll(spark, s"$indexDir/bands",
          Similarity.hyperplaneBands(vecs, cfg.planes, cfg.bandBits)
            .withColumn("bucket",
              NearDupGate.bandBucket(cfg.indexBuckets, col("band"), col("bv"))))
      }
    }

  /** RIGHT-TO-BE-FORGOTTEN on the gate's admitted state — the
    * [[NearDupGate.forget]] contract on the vector family: the
    * predicate's vec_ids leave the lake, the vector index and the band
    * index under one lease window; the decision log stays as the audit
    * record. An identical vector arriving later finds no colliding
    * signature and is admitted afresh (SemanticGateSpec asserts it).
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
      (s"$indexDir/vectors", Some("bucket")),
      (s"$indexDir/bands", Some("bucket"))))

  /** Four-root maintenance window, same recipe as [[NearDupGate.compact]]. */
  def compact(
      spark: SparkSession,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      liveTag: Option[String] = None): Unit = {
    val roots = Seq(lakeDir, decisionsDir, s"$indexDir/bands", s"$indexDir/vectors")
    LakeCompact.withLeases(spark, roots) {
      LakeCompact.foldGenerations(spark, lakeDir, assumeLeased = true, liveTag = liveTag)
      LakeCompact.foldGenerations(spark, decisionsDir, assumeLeased = true, liveTag = liveTag)
      GateIndex.foldIntoBase(spark, s"$indexDir/bands", liveTag)
      GateIndex.foldIntoBase(spark, s"$indexDir/vectors", liveTag)
    }
  }

  /** Streaming entry point: JSON vector drop dir in, semantically-
    * deduped vector lake out, checkpointed resume.
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
      .schema(vecSchema)
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
