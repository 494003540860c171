package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming CDC apply — q53's MERGE run continuously: a change stream
  * (key, op U|D, value, version) folds into a standing keyed SNAPSHOT
  * lake, micro-batch by micro-batch.
  *
  * Each batch:
  *  1. collapses its own rows to latest-per-key (q51's recipe —
  *     version desc, ties broken deterministically), so out-of-order
  *     intra-batch changes apply in version order regardless of
  *     arrival order;
  *  2. full-outer joins the collapsed delta against the CURRENT
  *     snapshot generation and applies the three-arm merge: matched+U
  *     update (version-gated: an older replayed change never clobbers
  *     a newer applied one), matched+D drop, unmatched+U insert,
  *     unmatched snapshot rows carry over;
  *  3. writes the result as a NEW immutable generation dir
  *     `gen=<batchId>`, then flips the `_current` manifest to it.
  *
  * Idempotence (restart-from-checkpoint replays the last batch): a
  * replayed batch finds its completed generation (`_SUCCESS`) and only
  * re-flips the manifest — the merge never re-runs, so the snapshot
  * cannot double-apply. Crash windows: before `_SUCCESS` → the partial
  * gen dir is overwritten by the replay (mode overwrite); between
  * `_SUCCESS` and the manifest flip → the replay just flips. The
  * manifest is written staged-then-rename (LakeCompact's swap
  * contract): readers see the old snapshot or the new one, never a
  * partial.
  *
  * 100 TB shape: each generation is one key-partitioned full-outer
  * join (the q53 plan) — at scale the snapshot side becomes a
  * partition-pruned merge (only files whose key zone-maps intersect
  * the delta rewrite, z01's layout machinery), and old generations
  * compact away with the LakeCompact lease protocol. Single-writer by
  * contract, like every sink in this package.
  */
object MergeApply {

  /** change-stream wire schema */
  val ChangeSchema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("version", LongType, nullable = false)))

  private val SnapshotSchema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("version", LongType, nullable = false)))

  private def manifestPath(lakeDir: String) = new java.io.File(lakeDir, "_current")

  /** current snapshot generation id, -1 if none committed yet */
  def currentGen(lakeDir: String): Long = {
    val m = manifestPath(lakeDir)
    if (!m.exists()) -1L
    else scala.io.Source.fromFile(m, "UTF-8").getLines().next().trim.toLong
  }

  /** read the standing snapshot (empty, schema-stable, if none yet) */
  def read(spark: SparkSession, lakeDir: String): DataFrame = {
    val gen = currentGen(lakeDir)
    if (gen < 0)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], SnapshotSchema)
    else spark.read.parquet(s"$lakeDir/gen=$gen")
  }

  private def flipManifest(lakeDir: String, batchId: Long): Unit = {
    new java.io.File(lakeDir).mkdirs()
    val staged = new java.io.File(lakeDir, s"_current.staging-$batchId")
    java.nio.file.Files.writeString(staged.toPath, s"$batchId\n")
    java.nio.file.Files.move(staged.toPath, manifestPath(lakeDir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  /** one micro-batch of the apply; public so tests (and batch backfill)
    * can drive it directly
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, lakeDir: String, batchId: Long): Unit = {
    val genDir = s"$lakeDir/gen=$batchId"
    if (new java.io.File(genDir, "_SUCCESS").exists()) {
      // replayed batch: generation already complete — only the flip
      // can have been lost, and re-flipping is idempotent
      if (currentGen(lakeDir) < batchId) flipManifest(lakeDir, batchId)
      return
    }
    // 1. collapse the batch to latest-per-key (version desc; op/value
    //    as deterministic tie-breakers for pathological equal-version
    //    feeds — the apply must be a function of the batch's CONTENT)
    val wk = Window.partitionBy("k")
      .orderBy(col("version").desc, col("op").desc, col("value").desc_nulls_last)
    val delta = batch
      .withColumn("rn", row_number().over(wk)).filter(col("rn") === 1).drop("rn")
      .select(col("k"), col("op").as("d_op"), col("value").as("d_value"),
        col("version").as("d_version"))
    // 2. three-arm merge against the current snapshot, version-gated
    val snap = read(spark, lakeDir)
    // a change is FRESH against the snapshot row when the key is new
    // or its version is strictly newer; stale changes (checkpoint
    // replays, out-of-order feeds) lose to the applied state
    val fresh = col("version").isNull || (col("d_version") > col("version"))
    val merged = snap.join(delta, Seq("k"), "full_outer")
      // drop only rows killed by a FRESH tombstone; coalesce keeps the
      // d_op-null (untouched snapshot) rows through SQL's 3-valued logic
      .filter(coalesce(!(col("d_op") === "D" && fresh), lit(true)))
      .select(
        col("k"),
        when(col("d_op") === "U" && fresh, col("d_value"))
          .otherwise(col("value")).as("value"),
        when(col("d_op") === "U" && fresh, col("d_version"))
          .otherwise(col("version")).as("version"))
    // 3. immutable generation, then the atomic flip
    merged.write.mode("overwrite").parquet(genDir)
    flipManifest(lakeDir, batchId)
  }

  /** start the continuous apply over a json change-file drop dir */
  def start(
      spark: SparkSession,
      srcDir: String,
      lakeDir: String,
      ckptDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(ChangeSchema).json(srcDir)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, lakeDir, batchId)
      }
      .trigger(trigger)
      .start()
}
