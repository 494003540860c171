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

  // manifest/_SUCCESS/generation I/O goes through the Hadoop FileSystem
  // of lakeDir like every sibling gate (ContamGate, SampleGate,
  // LakeCompact): java.io.File silently resolves any non-local lake URI
  // to a nonexistent local path, so currentGen() would always read -1
  // and each batch would merge against an EMPTY snapshot — discarding
  // the standing rows without an error.
  private def hconf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsOf(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(hconf()), p)
  }

  /** current snapshot generation id, -1 if none committed yet */
  def currentGen(lakeDir: String): Long = {
    val (fs, root) = fsOf(lakeDir)
    val m = new org.apache.hadoop.fs.Path(root, "_current")
    if (!fs.exists(m)) -1L
    else {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().next().trim.toLong
      finally in.close()
    }
  }

  /** read the standing snapshot (empty, schema-stable, if none yet) */
  def read(spark: SparkSession, lakeDir: String): DataFrame = {
    val gen = currentGen(lakeDir)
    if (gen < 0)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], SnapshotSchema)
    else spark.read.parquet(s"$lakeDir/gen=$gen")
  }

  private def flipManifest(lakeDir: String, batchId: Long): Unit = {
    val (fs, root) = fsOf(lakeDir)
    fs.mkdirs(root)
    val staged = new org.apache.hadoop.fs.Path(root, s"_current.staging-$batchId")
    val out = fs.create(staged, true)
    try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
    // FileContext rename with OVERWRITE is the atomic replace on both
    // the local fs and HDFS (FileSystem.rename refuses an existing
    // destination on some schemes, and delete-then-rename would open a
    // no-manifest window in which readers see an empty snapshot)
    org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, hconf()).rename(
      staged, new org.apache.hadoop.fs.Path(root, "_current"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** committed generation ids present on disk, ascending */
  private[graft] def listGens(lakeDir: String): Seq[Long] = {
    val (fs, root) = fsOf(lakeDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong).sorted
  }

  /** Generation retention under the LakeCompact lease: delete snapshot
    * generations no reader or replay can still need. Retained: the
    * current generation, anything NEWER than it (a crash between
    * `_SUCCESS` and the flip leaves a completed-but-unflipped gen the
    * checkpoint replay will flip), and the newest prior generation (an
    * in-flight reader that resolved the manifest just before the flip
    * may still be scanning it). Unlike the sibling gates' additive
    * `batch=` roots, each gen here is a FULL snapshot, so folding is
    * deletion, not union.
    */
  def compact(spark: SparkSession, lakeDir: String): Unit =
    LakeCompact.withLease(spark, lakeDir) {
      val cur = currentGen(lakeDir)
      val gens = listGens(lakeDir)
      val priorKept = gens.filter(_ < cur).lastOption
      val (fs, root) = fsOf(lakeDir)
      for (g <- gens if g < cur && !priorKept.contains(g))
        fs.delete(new org.apache.hadoop.fs.Path(root, s"gen=$g"), true): Unit
    }

  /** one micro-batch of the apply; public so tests (and batch backfill)
    * can drive it directly
    */
  def applyBatch(
      spark: SparkSession,
      batch: DataFrame,
      lakeDir: String,
      batchId: Long,
      autoFoldGenerations: Int = 64): Unit = {
    LakeCompact.assertNoLease(spark, lakeDir)
    val genDir = s"$lakeDir/gen=$batchId"
    val (fs, _) = fsOf(lakeDir)
    if (fs.exists(new org.apache.hadoop.fs.Path(genDir, "_SUCCESS"))) {
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
    if (autoFoldGenerations > 0 && listGens(lakeDir).size > autoFoldGenerations)
      compact(spark, lakeDir)
  }

  /** start the continuous apply over a json change-file drop dir */
  def start(
      spark: SparkSession,
      srcDir: String,
      lakeDir: String,
      ckptDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      autoFoldGenerations: Int = 64): StreamingQuery =
    spark.readStream.schema(ChangeSchema).json(srcDir)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, lakeDir, batchId, autoFoldGenerations)
      }
      .trigger(trigger)
      .start()
}
