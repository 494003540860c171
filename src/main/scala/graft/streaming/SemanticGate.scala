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
  * (band, bv) and the admitted embeddings keyed by vec_id, both
  * physically partitioned by `bucket = hash(key) mod indexBuckets` so
  * the per-batch probe partition-prunes to only the bucket directories
  * the batch's signatures touch — probe cost follows the delta, not
  * the corpus (the NearDupGate layout, verbatim). Idempotence is the
  * same batch-scoped `batch=<tag>` overwrite recipe; compaction is the
  * same four-root [[LakeCompact]] lease window.
  *
  * 100 TB notes: bands are (long, long) keys — the widest shuffle
  * carries 16 bytes per signature row; the batch side is broadcast
  * into the pruned index probe so the corpus is never shuffled; cosine
  * verification is the codegen expression over candidate pairs only.
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
      val bands = track(
        Similarity.hyperplaneBands(vecs, cfg.planes, cfg.bandBits).cache())

      val hasIndex = {
        val p = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
      }
      // corpus-relative drops: band collision vs the admitted index,
      // then exact-cosine verify. Partner = min admitted vec_id among
      // verified matches — deterministic across replays.
      val corpusDropped: DataFrame =
        if (!hasIndex) emptyDecisions(vecs)
        else {
          val batchBuckets = bands
            .select(NearDupGate.bandBucket(cfg.indexBuckets, col("band"), col("bv")).as("bucket"))
            .distinct().collect().map(_.getInt(0)).toIndexedSeq
          val cand = track(
            spark.read.parquet(s"$indexDir/bands")
              .filter(col("batch") =!= batchTag && col("bucket").isin(batchBuckets: _*))
              .select(col("band"), col("bv"), col("vec_id").as("v1"))
              .join(broadcast(bands.select(col("band"), col("bv"), col("vec_id").as("v2"))),
                Seq("band", "bv"))
              .select("v1", "v2").distinct().cache())
          val candBuckets = cand
            .select(NearDupGate.docBucket(cfg.indexBuckets, col("v1")).as("bucket"))
            .distinct().collect().map(_.getInt(0)).toIndexedSeq
          if (candBuckets.isEmpty) emptyDecisions(vecs)
          else {
            val corpusVecs = spark.read.parquet(s"$indexDir/vectors")
              .filter(col("batch") =!= batchTag && col("bucket").isin(candBuckets: _*))
              .select(col("vec_id").as("v1"), col("embedding").as("e1"))
            cand
              .join(corpusVecs, "v1")
              .join(broadcast(vecs.select(col("vec_id").as("v2"), col("embedding").as("e2"))), "v2")
              .withColumn("cos", round(Similarity.cosine(col("e1"), col("e2")), 6))
              .filter(col("cos") >= cfg.tau)
              .groupBy(col("v2").as("vec_id"))
              .agg(min_by(struct(col("v1"), col("cos")), col("v1")).as("m"))
              .select(col("vec_id"), col("m.v1").as("partner"), col("m.cos").as("cos"))
          }
        }
      val cd = track(corpusDropped.cache())

      // intra-batch clusters among the survivors: band self-join,
      // cosine verify, min-vec_id keeper election
      val rem = track(vecs.join(cd.select("vec_id"), Seq("vec_id"), "left_anti").cache())
      val remIds = rem.select("vec_id")
      val candB = bands.join(broadcast(remIds), Seq("vec_id"), "leftsemi")
      val l = candB.select(col("band"), col("bv"), col("vec_id").as("v1"))
      val r = candB.select(col("band"), col("bv"), col("vec_id").as("v2"))
      val e1 = rem.select(col("vec_id").as("v1"), col("embedding").as("e1"))
      val e2 = rem.select(col("vec_id").as("v2"), col("embedding").as("e2"))
      val pairsB = l.join(r, Seq("band", "bv"))
        .filter(col("v1") < col("v2"))
        .select("v1", "v2").distinct()
        .join(e1, "v1").join(e2, "v2")
        .filter(round(Similarity.cosine(col("e1"), col("e2")), 6) >= cfg.tau)
        .select(col("v1").as("d1"), col("v2").as("d2"))
      val comps = Clusters.connectedComponents(
        remIds.select(col("vec_id").as("doc_id")), pairsB)
      val batchDropped = comps.filter(col("cluster") =!= col("doc_id"))
        .select(col("doc_id").as("vec_id"), col("cluster").as("partner"))
      val admittedIds = comps.filter(col("cluster") === col("doc_id"))
        .select(col("doc_id").as("vec_id"))

      def write(df: DataFrame, dir: String): Unit =
        df.write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$batchTag")
      def writeBucketed(df: DataFrame, dir: String): Unit =
        df.repartition(col("bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(s"$dir/batch=$batchTag")

      write(rem.join(broadcast(admittedIds), Seq("vec_id"), "leftsemi"), lakeDir)
      writeBucketed(
        rem.join(broadcast(admittedIds), Seq("vec_id"), "leftsemi")
          .select(col("vec_id"), col("embedding"))
          .withColumn("bucket", NearDupGate.docBucket(cfg.indexBuckets, col("vec_id"))),
        s"$indexDir/vectors")
      writeBucketed(
        bands.join(broadcast(admittedIds), Seq("vec_id"), "leftsemi")
          .withColumn("bucket", NearDupGate.bandBucket(cfg.indexBuckets, col("band"), col("bv"))),
        s"$indexDir/bands")
      write(
        admittedIds.withColumn("decision", lit("admit"))
          .withColumn("partner", lit(null).cast("long"))
          .withColumn("cos", lit(null).cast("double"))
          .unionByName(cd.withColumn("decision", lit("drop_corpus"))
            .select(col("vec_id"), col("decision"), col("partner"), col("cos")))
          .unionByName(batchDropped.withColumn("decision", lit("drop_batch"))
            .withColumn("cos", lit(null).cast("double"))
            .select(col("vec_id"), col("decision"), col("partner"), col("cos"))),
        decisionsDir)
    } finally cached.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    if (cfg.autoFoldGenerations > 0) {
      val bp = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
      val bfs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gens =
        if (bfs.exists(bp))
          bfs.listStatus(bp).count(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch="))
        else 0
      if (gens > cfg.autoFoldGenerations) compact(spark, lakeDir, indexDir, decisionsDir)
    }
  }

  private def emptyDecisions(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id")).limit(0)
      .withColumn("partner", lit(null).cast("long"))
      .withColumn("cos", lit(null).cast("double"))

  /** WIDEN the persisted band signature by REBUILD: when the corpus
    * outgrows its creation-time width (band-bucket occupancy climbs,
    * probe cost bends super-linear — the r10 ScaleProbe lesson), the
    * band table is recomputed from the admitted VECTORS at the new
    * width inside the lease window, where probes and writers are
    * already fenced out. The vector index, lake and decision log are
    * untouched: a rebuild changes future probe pruning, never a past
    * decision — admitted vectors stay admitted, and a duplicate of an
    * admitted vector still collides (same vector => same signature at
    * any width). One new `batch=rebuild-<token>` generation replaces
    * every prior band generation; a crash mid-rebuild leaves mixed
    * widths only INSIDE the lease window, which no probe can enter.
    */
  def rebuildBands(spark: SparkSession, indexDir: String, cfg: Config): Unit =
    LakeCompact.withLeases(spark, Seq(s"$indexDir/bands", s"$indexDir/vectors")) {
      val bandsRoot = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
      val fs = bandsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(bandsRoot)) {
        val vecs = spark.read.parquet(s"$indexDir/vectors")
          .select("vec_id", "embedding")
        val token = java.util.UUID.randomUUID().toString.take(8)
        Similarity.hyperplaneBands(vecs, cfg.planes, cfg.bandBits)
          .withColumn("bucket",
            NearDupGate.bandBucket(cfg.indexBuckets, col("band"), col("bv")))
          .repartition(col("bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(s"$indexDir/bands/batch=rebuild-$token")
        fs.listStatus(bandsRoot).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=") &&
            s.getPath.getName != s"batch=rebuild-$token")
          .foreach(s => fs.delete(s.getPath, true): Unit)
      }
    }

  /** RIGHT-TO-BE-FORGOTTEN on the gate's admitted state — the
    * [[NearDupGate.forget]] contract on the vector family: the
    * predicate's vec_ids leave the lake, the vector index and the band
    * index under one lease window; the decision log stays as the audit
    * record. An identical vector arriving later finds no colliding
    * signature and is admitted afresh (SemanticGateSpec asserts it).
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
      decisionsDir: String): Unit = {
    val roots = Seq(lakeDir, decisionsDir, s"$indexDir/bands", s"$indexDir/vectors")
    LakeCompact.withLeases(spark, roots) {
      LakeCompact.foldGenerations(spark, lakeDir, assumeLeased = true)
      LakeCompact.foldGenerations(spark, decisionsDir, assumeLeased = true)
      LakeCompact.foldGenerations(spark, s"$indexDir/bands",
        partitionCols = Seq("bucket"), assumeLeased = true)
      LakeCompact.foldGenerations(spark, s"$indexDir/vectors",
        partitionCols = Seq("bucket"), assumeLeased = true)
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
