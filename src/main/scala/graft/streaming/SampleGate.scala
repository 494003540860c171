package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

/** Streaming WEIGHTED sampler: p11's Efraimidis-Spirakis top-N-by-key
  * sample maintained continuously over an unbounded ingest stream —
  * the follow-through on p11's docstring claim that exponential keys
  * make the sample "incrementally maintainable".
  *
  * Mergeable-state design (TrendingTopK's recipe, not a keyed store):
  * each micro-batch writes the top-N keys OF THAT BATCH as its own
  * batch-scoped generation; the standing sample is the top-N over the
  * UNION of all generations at read time. This is exact, not
  * approximate: every global top-N key is by definition in its own
  * batch's top-N, so the union always contains the true answer —
  * combine-on-read loses nothing. The properties fall out:
  *
  *  - replay-safe: a generation is a pure function of its batch alone
  *    (no read-modify-write against standing state), so replays
  *    re-land identical partitions and generation ORDER never matters;
  *  - O(N) rows per generation regardless of batch size, and the
  *    combine reads N x generations rows — folded to N by the shared
  *    [[LakeCompact]] recipe when generations accumulate (the fold
  *    concatenates rows, and top-N over a concatenation is unchanged,
  *    so compaction can even pre-trim to the fold's top-N);
  *  - deterministic: keys are the p11 6-dp pow(u, 1/w) images with
  *    doc_id tiebreak, so the streamed sample equals the batch p11
  *    answer over the same documents exactly (SampleGateSpec asserts
  *    equality against the oracle-checked catalog entry).
  */
object SampleGate {

  final case class Config(n: Int = 100, autoFoldGenerations: Int = 64)

  /** the p11 key: round(pow(u, 1/n_chars), 6) with the p01 unit hash */
  private def key =
    round(pow(
      graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast("string")) /
        lit(1152921504606846976.0), // 2^60
      lit(1.0) / col("n_chars")), 6)

  /** One incremental step: append this batch's top-n candidate keys as
    * a batch-scoped generation under `stateDir`.
    */
  def step(
      spark: SparkSession,
      batchDocs: DataFrame,
      batchTag: String,
      stateDir: String,
      cfg: Config = Config()): Unit = {
    LakeCompact.assertNoLease(spark, stateDir)
    batchDocs
      .select(col("doc_id"), col("source"),
        length(col("text")).cast(LongType).as("n_chars"))
      .withColumn("key", key)
      .orderBy(col("key").desc, col("doc_id").asc)
      .limit(cfg.n)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/batch=$batchTag")
    if (cfg.autoFoldGenerations > 0) {
      val p = new org.apache.hadoop.fs.Path(stateDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gens =
        if (fs.exists(p))
          fs.listStatus(p).count(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch="))
        else 0
      if (gens > cfg.autoFoldGenerations) compact(spark, stateDir)
    }
  }

  /** The standing sample: exact top-n over every generation's
    * candidates, ranked like p11 (combine-on-read).
    */
  def sample(spark: SparkSession, stateDir: String, cfg: Config = Config()): DataFrame = {
    // a doc admitted by several generations (overlapping batches,
    // replays of re-sliced inputs) appears once per generation in the
    // union; its rows are identical (key is a pure function of the
    // doc), so distinct() collapses them before the top-n
    val pool = spark.read.parquet(stateDir)
      .select("doc_id", "source", "n_chars", "key")
      .distinct()
      .orderBy(col("key").desc, col("doc_id").asc)
      .limit(cfg.n)
    val w = Window.orderBy(col("key").desc, col("doc_id").asc)
    pool.withColumn("rank", row_number().over(w).cast(LongType))
  }

  /** Generation fold under the shared lease window. */
  def compact(spark: SparkSession, stateDir: String): Unit =
    LakeCompact.withLeases(spark, Seq(stateDir)) {
      LakeCompact.foldGenerations(spark, stateDir, assumeLeased = true)
    }

  /** Streaming entry point: JSON doc drop dir in, standing-sample state
    * out (query it any time with [[sample]]), checkpointed resume.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      stateDir: String,
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
        step(spark, batch, s"$token-$batchId", stateDir, cfg)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }
}
