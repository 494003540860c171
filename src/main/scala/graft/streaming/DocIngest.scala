package graft.streaming

import graft.llm.{Curation, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming image of the curation gate (x01): documents arrive as a
  * JSON-lines drop (≡ a crawl/ingest feed), pass the STATELESS quality
  * gates inline, are deduplicated on content fingerprint within a
  * watermark, and land in a curated parquet lake partitioned by lang.
  *
  * What is and isn't streamable, by design:
  *  - length / repetition gates: per-row Column logic, identical
  *    expressions to the batch x01 — stateless, runs at wire speed.
  *  - fingerprint dedup: `dropDuplicatesWithinWatermark` keeps the
  *    dedup state bounded (≡ the reference's 24 h JetStream
  *    duplicate_window for blocks); an exact global dedup over all
  *    history is a batch job (d01/d02), not stream state.
  *  - near-dup LSH (d03/d09) and contamination (c01): corpus-wide by
  *    nature — they run as periodic batch jobs over the lake this
  *    stream feeds, exactly as at 100 TB.
  *
  * At scale the lake layout is the point: partitioned by lang so the
  * per-language curation/training readers prune files at the source.
  */
object DocIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** the stateless x01 gates as a reusable projection: adds n_tokens,
    * dup_ratio-lite (top-bigram share is corpus-free), fp, and a
    * disposition; `keep` rows are the curated output
    */
  def gated(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("fp", TextAnalysis.contentFingerprint)
      .withColumn("disposition",
        when(col("n_tokens") < Curation.MinTokens || col("n_tokens") > Curation.MaxTokens, "length")
          .otherwise("kept"))

  /** streaming ingest with checkpointed resume + fingerprint dedup */
  def start(
      spark: SparkSession,
      srcDir: String,
      lakeDir: String,
      checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 64)
      .json(srcDir)
    val curated = gated(raw)
      .filter(col("disposition") === "kept")
      .withColumn("ingest_time", current_timestamp())
      .withWatermark("ingest_time", "24 hours")
      .dropDuplicatesWithinWatermark("fp")
      .drop("disposition", "ingest_time")

    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    val writer = curated.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-scoped OVERWRITE keyed by the checkpoint-lineage token
        // (same recipe as BlockIngest's S9 sink): a micro-batch replayed
        // after a crash between this write and the checkpoint commit
        // rewrites its own generation instead of appending duplicate
        // docs, and a FRESH checkpoint over the same lake (batch ids
        // restart at 0) gets new dirs instead of clobbering a previous
        // run's. Lang partitioning nests inside each generation
        // (batch=tok-N/lang=X), so per-language readers still prune at
        // the directory level.
        LakeCompact.assertNoLease(spark, lakeDir) // quiesce contract
        batch.write.mode("overwrite").partitionBy("lang")
          .parquet(s"$lakeDir/batch=$token-$batchId")
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  /** Keeper-gated ingest: same stateless gates, but duplicate handling
    * runs through [[KeeperGate]]'s transformWithState election instead
    * of `dropDuplicatesWithinWatermark` — the BEST-quality document per
    * fingerprint survives (first-wins vs best-wins is the semantic
    * difference; see KeeperGate's scaladoc). Output is the append-only
    * decision log, stamped with the micro-batch id; [[keeperCompact]]
    * reads it back into the current keeper set. State recovers from the
    * checkpoint's RocksDB snapshot across restarts.
    */
  def startKeeper(
      spark: SparkSession,
      srcDir: String,
      decisionsDir: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val raw = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 64)
      .json(srcDir)
    val docs = gated(raw)
      .filter(col("disposition") === "kept")
      .select(col("fp"), col("doc_id"),
        TextAnalysis.qualityScore.as("quality"))
      .as[graft.streaming.KeeperGate.Doc]
    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    KeeperGate(spark, docs)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeeperGate.Decision], batchId: Long) =>
        // batch-scoped overwrite keyed by the checkpoint-lineage token:
        // a replayed micro-batch re-emits the same decisions from the
        // rewound state store and rewrites its own generation; a fresh
        // checkpoint gets new dirs instead of clobbering the log
        LakeCompact.assertNoLease(spark, decisionsDir) // quiesce contract
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$decisionsDir/batch=$token-$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Compaction reader for the keeper decision log — the lake half of
    * the election: the LAST admit/supersede per fingerprint is the
    * current keeper (drops never change ownership). "Last" is resolved
    * by (batch_id, quality): within one micro-batch at most one non-drop
    * decision per fingerprint exists (KeeperGate processes a batch's
    * rows for a key in one call), and across batches a later admit —
    * possible after TTL expiry — outranks an earlier higher-quality
    * keeper, matching the state store's view.
    *
    * 100 TB shape: one partial+final aggregation over the log (max_by),
    * no window, no sort — state per reducer is one row per distinct
    * fingerprint, the same cardinality the election itself holds.
    */
  def keeperCompact(spark: SparkSession, decisionsDir: String): DataFrame =
    spark.read.parquet(decisionsDir)
      .filter(col("decision") =!= "drop")
      .groupBy("fp")
      .agg(max_by(
        struct(col("doc_id"), col("quality")),
        struct(col("batch_id"), col("quality"))).as("k"))
      .select(col("fp"), col("k.doc_id").as("doc_id"), col("k.quality").as("quality"))

  /** Small-file compaction for the curated lake — the maintenance job
    * every streaming parquet sink needs (each micro-batch writes its
    * own batch=N generation with lang dirs inside; at 100 TB the file
    * count, not the byte count, is what kills the downstream readers'
    * scan planning). Folds the generations into one, lang-partitioned,
    * via the shared crash-recoverable staged-swap protocol — see
    * [[LakeCompact]]. Run with the stream quiesced.
    */
  def compact(spark: SparkSession, lakeDir: String): Unit =
    LakeCompact.foldGenerations(spark, lakeDir, partitionCols = Seq("lang"))
}
