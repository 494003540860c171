package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared lake-maintenance protocol: fold a streaming sink's
  * accumulated `batch=*` generations (one per micro-batch — the
  * idempotent-replay unit) into a single compacted generation, with
  * crash recovery and no table format.
  *
  * The staged-swap protocol:
  *  1. the compacted copy lands in a dot-prefixed staging dir
  *     (invisible to Spark readers);
  *  2. an `_inputs.manifest` (one input batch dir name per line,
  *     underscore-prefixed so readers skip it) is written LAST into
  *     the staging dir — it is the commit gate;
  *  3. the staging dir is renamed to its visible `batch=` name, THEN
  *     the manifest's input dirs are deleted, then the manifest.
  *
  * A crash at any point is repaired by the recovery pass at the next
  * call: staging without a manifest is an incomplete write and is
  * discarded; staging with one is renamed in and its inputs removed; a
  * visible batch dir still carrying a manifest (crash mid-delete) has
  * its remaining inputs and the manifest removed. Without the staging
  * dir, a crash mid-write would leave a PARTIAL visible generation
  * that re-compaction would bake in as real rows. Readers racing a
  * healthy swap see duplicates at worst for the rename window, never
  * loss; run compaction with the stream quiesced (appends racing the
  * input deletes would be lost — the standard maintenance-window
  * contract for file-based lakes).
  */
object LakeCompact {
  private val Manifest = "_inputs.manifest"

  /** Fold `root`'s batch=* generations into one, re-partitioned inside
    * the compacted generation by `partitionCols` (e.g. lang for the
    * doc lake, block_date for blocks).
    */
  def foldGenerations(
      spark: SparkSession,
      root: String,
      partitionCols: Seq[String] = Nil,
      shrink: Int = 16): Unit = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def readManifest(dir: org.apache.hadoop.fs.Path): Seq[String] = {
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, Manifest))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    def finishSwap(visible: org.apache.hadoop.fs.Path): Unit = {
      for (name <- readManifest(visible)) {
        val p = new org.apache.hadoop.fs.Path(path, name)
        if (fs.exists(p)) fs.delete(p, true)
      }
      fs.delete(new org.apache.hadoop.fs.Path(visible, Manifest), false): Unit
    }

    // recovery pass: repair whatever a previous run left behind
    if (!fs.exists(path)) return
    for (s <- fs.listStatus(path) if s.isDirectory) {
      val name = s.getPath.getName
      if (name.startsWith(".compact-")) {
        if (fs.exists(new org.apache.hadoop.fs.Path(s.getPath, Manifest))) {
          val visible = new org.apache.hadoop.fs.Path(path, "batch=" + name.stripPrefix(".compact-"))
          fs.rename(s.getPath, visible)
          finishSwap(visible)
        } else fs.delete(s.getPath, true): Unit
      } else if (name.startsWith("batch=") &&
          fs.exists(new org.apache.hadoop.fs.Path(s.getPath, Manifest))) {
        finishSwap(s.getPath)
      }
    }

    val gens = fs.listStatus(path).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("batch="))
    // NEVER fold the newest generation: it may be a written-but-
    // uncommitted tail whose micro-batch the stream will REPLAY after
    // restart — folding it would resurrect its rows as duplicates when
    // the replay recreates the dir ("quiesced" does not mean "cleanly
    // committed"). Steady state is therefore two generations: the
    // compacted fold plus the live tail.
    val foldable = gens.sortBy(_.getModificationTime).dropRight(1)
    if (foldable.length <= 1) return
    // basePath keeps partition discovery rooted at the lake while the
    // scan reads ONLY the foldable generations (never the live tail)
    val df = spark.read.option("basePath", root)
      .parquet(foldable.map(_.getPath.toString).toIndexedSeq: _*)
      .drop("batch")
    val w = df.coalesce(math.max(1, foldable.length / shrink)).write.mode("overwrite")
    val compactTag = s"compact-${System.currentTimeMillis()}"
    val staged = new org.apache.hadoop.fs.Path(path, s".compact-$compactTag")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staged.toString)
    // the manifest is the commit gate, so its write must be atomic: a
    // crash mid-write would otherwise leave a TRUNCATED input list that
    // recovery honors, renaming the fold in while unlisted inputs
    // survive as permanent duplicates. Write-then-rename commits it.
    val tmp = new org.apache.hadoop.fs.Path(staged, Manifest + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(foldable.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new org.apache.hadoop.fs.Path(staged, Manifest))
    val visible = new org.apache.hadoop.fs.Path(path, s"batch=$compactTag")
    fs.rename(staged, visible)
    finishSwap(visible)
  }
}
