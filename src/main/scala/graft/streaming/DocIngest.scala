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

    val writer = curated.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("lang").parquet(lakeDir)
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
    KeeperGate(spark, docs)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeeperGate.Decision], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(decisionsDir)
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
    * every streaming parquet sink needs (each micro-batch appends a
    * file per lang partition; at 100 TB the file count, not the byte
    * count, is what kills the downstream readers' scan planning).
    * Rewrites each lang partition in place to ~`targetFiles` files.
    *
    * Crash recovery without a table format: the rewrite lands in a
    * dot-prefixed staging dir (invisible to Spark readers), gated by
    * the `_SUCCESS` marker Spark writes on commit. The swap is
    * delete-old -> rename-staged; a crash at ANY point is repaired at
    * the next compact call: staging with `_SUCCESS` is the durable
    * copy and the swap is finished (delete target if still present,
    * rename in); staging without `_SUCCESS` is an incomplete write and
    * is discarded with the original untouched. Run with the stream
    * quiesced (appends racing the swap would be lost — the standard
    * maintenance-window contract for file-based lakes).
    */
  def compact(spark: SparkSession, lakeDir: String, targetFiles: Int = 1): Unit = {
    val path = new org.apache.hadoop.fs.Path(lakeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // recovery pass: finish or discard any swap a previous run left
    for (s <- fs.listStatus(path)
        if s.isDirectory && s.getPath.getName.startsWith(".compact-")) {
      val target = new org.apache.hadoop.fs.Path(
        lakeDir, s.getPath.getName.stripPrefix(".compact-"))
      if (fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS"))) {
        if (fs.exists(target)) fs.delete(target, true)
        fs.rename(s.getPath, target): Unit
      } else fs.delete(s.getPath, true): Unit
    }

    val langDirs = fs.listStatus(path).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("lang="))
    for (d <- langDirs) {
      val files = fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet"))
      if (files > targetFiles) {
        val staged = new org.apache.hadoop.fs.Path(s"$lakeDir/.compact-${d.getPath.getName}")
        spark.read.parquet(d.getPath.toString)
          .coalesce(targetFiles)
          .write.mode("overwrite").parquet(staged.toString) // writes _SUCCESS on commit
        fs.delete(d.getPath, true)
        fs.rename(staged, d.getPath): Unit
      }
    }
  }
}
