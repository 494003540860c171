package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming heavy-hitters: the micro-batch form of q47's two-phase
  * mergeable top-k, run continuously. The reference's consumer keeps no
  * analytics state at all (it re-reads the stream, consumer
  * `main.rs:652-669`); here each micro-batch folds into a bounded
  * sketch so "top items so far" is O(capacity) state no matter how much
  * stream has passed — the shape that survives an unbounded feed.
  *
  * State layout mirrors [[NearDupGate]]'s signature index: APPEND-ONLY
  * `batch=<tag>` generations, each holding the batch's OWN
  * approx_top_k accumulate state (one sketch-sized row). The current
  * ranking is `approx_top_k_combine` over all generations — legal in
  * any order because combine is associative and commutative — so a
  * replayed micro-batch that overwrites its own generation is merged
  * exactly once, never double-counted. [[LakeCompact.foldGenerations]]
  * compacts the state dir without changing semantics (combine never
  * cared which generation a state row came from).
  *
  * Like the gate's `_buckets` marker, `_capacity` records the sketch
  * capacity the state was built with; a step configured differently
  * refuses instead of silently merging incompatible sketches.
  *
  * 100 TB notes: the per-batch accumulate is a map-side fold to ONE
  * sketch row (partial aggregation happens per partition, the combine
  * of partials is sketch-sized); the state read is rows-of-sketches —
  * one per un-folded generation, periodically folded to a single file.
  * Nothing here scales with distinct-item cardinality beyond
  * `capacity`, and nothing scales with stream length at all.
  */
object TrendingTopK {

  final case class Config(
      k: Int = 10,
      capacity: Int = 1024,
      itemCol: String = "item",
      // combine-on-read is O(un-folded generations): past this many,
      // step() folds the state dir itself (under the maintenance lease)
      // before reading, so an unattended long-running stream never pays
      // a slowly-growing read waiting for an operator to call compact().
      // 0 disables (manual compaction only).
      autoFoldGenerations: Int = 64,
      // snapshot retention: keep only the newest N ranking snapshots in
      // the out dir (the per-batch history is useful for audits but
      // grows one directory per micro-batch forever on an unattended
      // stream). 0 keeps everything. Only ever prunes generations
      // STRICTLY older than the current batch's, so crash-replay of the
      // newest batch is unaffected.
      keepSnapshots: Int = 0)

  /** Refuse to merge sketches built at a different capacity: combine
    * requires a uniform maxItemsTracked, and a silent mismatch would
    * either throw mid-merge or skew estimates. Same recipe as
    * NearDupGate's persisted `_buckets` marker.
    */
  private def checkCapacity(spark: SparkSession, stateDir: String, capacity: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$stateDir/_capacity")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readExisting(): Int = {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }
    if (fs.exists(p)) {
      val existing = readExisting()
      require(existing == capacity,
        s"trending state at $stateDir was built with capacity=$existing, " +
          s"refusing to merge at capacity=$capacity")
    } else {
      // two sessions can race the first write: losing create-if-absent
      // is fine iff the winner recorded the same capacity — re-read and
      // apply the normal mismatch rule instead of surfacing a raw
      // already-exists error
      try {
        val out = fs.create(p, false)
        try out.write(s"$capacity\n".getBytes("UTF-8")) finally out.close()
      } catch {
        case _: java.io.IOException =>
          val existing = readExisting()
          require(existing == capacity,
            s"trending state at $stateDir was built with capacity=$existing, " +
              s"refusing to merge at capacity=$capacity")
      }
    }
  }

  /** One micro-batch: fold the batch into its own state generation,
    * then snapshot the merged ranking. Both writes are batch-scoped
    * overwrites — a crash anywhere in the window replays to the same
    * result.
    */
  def step(
      spark: SparkSession,
      batch: DataFrame,
      batchTag: String,
      stateDir: String,
      outDir: String,
      cfg: Config = Config()): Unit = {
    LakeCompact.assertNoLease(spark, stateDir)
    LakeCompact.assertNoLease(spark, outDir)
    checkCapacity(spark, stateDir, cfg.capacity)
    batch
      .selectExpr(s"approx_top_k_accumulate(${cfg.itemCol}, ${cfg.capacity}) AS st")
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/batch=$batchTag")
    // auto-fold: semantics-preserving by construction (combine is
    // associative/commutative and never cared which generation a state
    // row came from — TrendingSpec asserts fold-vs-control bytes), and
    // replay-safe because the fold never touches the newest generation
    // (the one this step just wrote and a crash would rewrite)
    if (cfg.autoFoldGenerations > 0) {
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gens =
        if (fs.exists(sp))
          fs.listStatus(sp).count(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch="))
        else 0
      if (gens > cfg.autoFoldGenerations) compact(spark, stateDir)
    }
    spark.read.parquet(stateDir)
      .filter("st IS NOT NULL") // an empty batch accumulates a null state
      .selectExpr(s"approx_top_k_estimate(approx_top_k_combine(st, ${cfg.capacity}), ${cfg.k}) AS top")
      .selectExpr("posexplode(top) AS (rank0, t)")
      .selectExpr(
        "CAST(rank0 + 1 AS BIGINT) AS rank",
        "t.item AS item",
        "CAST(t.count AS BIGINT) AS est_count")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchTag")
    if (cfg.keepSnapshots > 0) {
      val op = new org.apache.hadoop.fs.Path(outDir)
      val ofs = op.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // same (mtime, name) ordering current() resolves "newest" with
      val snaps = ofs.listStatus(op)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .sortBy(s => (s.getModificationTime, s.getPath.getName))
      snaps.dropRight(cfg.keepSnapshots).foreach(s => ofs.delete(s.getPath, true))
    }
  }

  /** Latest ranking: the snapshot of the newest generation. */
  def current(spark: SparkSession, outDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
    require(gens.nonEmpty, s"no trending snapshots under $outDir")
    // lexically-last tag is newest for a single run's zero-padded ids;
    // cross-run, newest mtime wins — with the name as tiebreaker so two
    // generations landing in the same filesystem-mtime tick still
    // resolve deterministically
    val newest = fs.listStatus(p).filter(_.isDirectory)
      .maxBy(s => (s.getModificationTime, s.getPath.getName)).getPath.toString
    spark.read.parquet(newest)
  }

  /** Fold the state generations (newest protected, as always). The
    * snapshot dir is deliberately NOT folded: its generations are the
    * ranking history, one per batch.
    */
  def compact(spark: SparkSession, stateDir: String): Unit =
    LakeCompact.foldGenerations(spark, stateDir)

  /** RIGHT-TO-BE-FORGOTTEN on sketch state — the REBUILD form, because
    * approx_top_k state is a lossy aggregate with no retraction:
    * a frequent-items sketch cannot subtract an item's contribution,
    * and negative partials do not exist for it (contrast s22's BM25
    * retraction, exact only because that state is linear sums; and the
    * row-shaped gates, where a filtered rewrite is exact). So deletion
    * here re-accumulates ONE consolidated generation from the surviving
    * source and publishes it crash-atomically over every old generation
    * ([[FoldCommit]]), then purges the items from the snapshot HISTORY
    * (row-shaped → filtered rewrite, relative order preserved, original
    * mtimes restored so [[current]]'s newest-snapshot resolution is
    * untouched). Cost ∝ surviving source size — inherent to sketches,
    * which is exactly why the linear/row-shaped surfaces get cheaper
    * folds. Runs under the same lease window as compaction; a crash
    * mid-history-purge re-runs idempotently (forgetting an absent item
    * rewrites nothing).
    */
  def forget(
      spark: SparkSession,
      srcDir: String,
      stateDir: String,
      outDir: String,
      items: Seq[String],
      cfg: Config = Config(),
      schema: StructType = StructType(Seq(StructField("item", StringType)))): Unit =
    LakeCompact.withLeases(spark, Seq(stateDir, outDir)) {
      import org.apache.spark.sql.functions._
      val conf = spark.sparkContext.hadoopConfiguration
      val sp = new org.apache.hadoop.fs.Path(stateDir)
      val fs = sp.getFileSystem(conf)
      if (fs.exists(sp)) {
        FoldCommit.heal(fs, sp)
        checkCapacity(spark, stateDir, cfg.capacity)
        val gens = fs.listStatus(sp).toSeq
          .filter(d => d.isDirectory && d.getPath.getName.startsWith("batch="))
          .map(_.getPath.getName)
        if (gens.nonEmpty) {
          val token = java.util.UUID.randomUUID().toString.take(8)
          FoldCommit.publish(fs, sp, s"batch=forget-$token", gens) { staging =>
            spark.read.schema(schema).json(srcDir)
              .filter(!col(cfg.itemCol).isin(items: _*))
              .selectExpr(
                s"approx_top_k_accumulate(${cfg.itemCol}, ${cfg.capacity}) AS st")
              .write.mode(SaveMode.Overwrite).parquet(staging)
          }
        }
      }
      val op = new org.apache.hadoop.fs.Path(outDir)
      val ofs = op.getFileSystem(conf)
      if (ofs.exists(op)) {
        FoldCommit.heal(ofs, op)
        // rewrite the history oldest-first and restore each snapshot's
        // original mtime, so the (mtime, name) order current() resolves
        // "newest" with survives the purge
        val snaps = ofs.listStatus(op)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
          .sortBy(s => (s.getModificationTime, s.getPath.getName))
        for (snap <- snaps) {
          val name = snap.getPath.getName
          val dirty = !spark.read.parquet(snap.getPath.toString)
            .filter(col("item").isin(items: _*)).isEmpty
          if (dirty) {
            FoldCommit.publish(ofs, op, name, Nil) { staging =>
              import org.apache.spark.sql.expressions.Window
              spark.read.parquet(snap.getPath.toString)
                .filter(!col("item").isin(items: _*))
                .withColumn("rank", row_number()
                  .over(Window.orderBy(col("rank").asc)).cast("bigint"))
                .select("rank", "item", "est_count")
                .write.mode(SaveMode.Overwrite).parquet(staging)
            }
            ofs.setTimes(new org.apache.hadoop.fs.Path(op, name),
              snap.getModificationTime, -1)
          }
        }
      }
    }

  /** Streaming entry point: JSON drop dir in, per-batch ranking
    * snapshots out. Same checkpoint-lineage token recipe as
    * [[NearDupGate.start]] so replays rewrite their own generations.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      stateDir: String,
      outDir: String,
      checkpointDir: String,
      cfg: Config = Config(),
      schema: StructType = StructType(Seq(StructField("item", StringType))),
      availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 64)
      .json(srcDir)
    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(spark, batch, f"$token-$batchId%09d", stateDir, outDir, cfg)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }
}
