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

  /** `reserve`: RUNNER-UP candidates kept per generation beyond the
    * top-n (default -1 = n, i.e. each generation persists its top-2n).
    * The reserve is what makes [[forget]] exact: a forgotten winner's
    * replacement must come from its own batch's discarded tail, which
    * only exists if the generation kept it. The budget is global and
    * monotone — every forget burns `max per-generation evictions`
    * slots, tracked in a `_reserve` marker — and when it is exhausted
    * [[forget]] refuses rather than silently shrinking the sample.
    */
  final case class Config(
      n: Int = 100, autoFoldGenerations: Int = 64, reserve: Int = -1) {
    def effectiveReserve: Int = if (reserve < 0) n else reserve
  }

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
      .limit(cfg.n + cfg.effectiveReserve)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/batch=$batchTag")
    initReserve(spark, stateDir, cfg)
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

  // -- right-to-be-forgotten ------------------------------------------

  private def reservePath(stateDir: String) =
    new org.apache.hadoop.fs.Path(s"$stateDir/_reserve")

  /** record the remaining forget budget once, when the state is born
    * (create-if-absent: a replayed first batch must not reset a budget
    * a forget already burned)
    */
  private def initReserve(spark: SparkSession, stateDir: String, cfg: Config): Unit = {
    val p = reservePath(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      try {
        val out = fs.create(p, false)
        try out.write(s"${cfg.effectiveReserve}\n".getBytes("UTF-8"))
        finally out.close()
      } catch { case _: java.io.IOException => () /* racing writer won */ }
  }

  private def readReserve(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String, cfg: Config): Long = {
    val p = reservePath(stateDir)
    if (!fs.exists(p)) cfg.effectiveReserve.toLong
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** RIGHT-TO-BE-FORGOTTEN on the standing sample, EXACT while the
    * reserve lasts: consolidate the generations with the predicate's
    * rows removed (the [[GateForget]] fold — sample state is row-shaped
    * throughout). Exactness argument: [[sample]] is the global top-n
    * over the union of per-generation candidate lists, and a
    * post-forget global top-n doc must rank within top-(n + evicted
    * from its generation) of its own batch — so as long as the
    * cumulative per-generation evictions stay within the persisted
    * reserve, the discarded runner-up a forgotten winner re-elects is
    * still in the pool. The budget burns CONSERVATIVELY (the max
    * evictions in any one generation, debited before the fold so a
    * crash never over-permits) and [[forget]] refuses once it is gone:
    * the honest fallback is re-deriving the sample from the lake (p11
    * over the surviving corpus), not silently returning a sample
    * smaller than n.
    */
  def forget(
      spark: SparkSession,
      stateDir: String,
      pred: org.apache.spark.sql.Column,
      cfg: Config = Config()): Unit = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val worst = spark.read.parquet(stateDir).filter(pred)
      .groupBy("batch").count().agg(max("count")).head()
    val k = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    if (k == 0) return
    val remaining = readReserve(fs, stateDir, cfg)
    require(k <= remaining,
      s"sample reserve exhausted: this forget evicts up to $k candidates " +
        s"from one generation but only $remaining reserve slots remain — " +
        "re-derive the sample from the lake (p11 over the surviving corpus)")
    val out = fs.create(reservePath(stateDir), true)
    try out.write(s"${remaining - k}\n".getBytes("UTF-8")) finally out.close()
    GateForget.fold(spark, pred, Seq((stateDir, None)))
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
