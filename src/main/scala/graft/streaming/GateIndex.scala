package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Two-tier (LSM-shaped) layout for the streaming gates' signature
  * indexes ([[NearDupGate]] bands/shingles, [[SemanticGate]]
  * bands/vectors, [[PhashGate]] bands):
  *
  * {{{
  *   root/batch=<tag>/part-N.parquet   DELTA generations — one per
  *                                     micro-batch, bucket as a DATA
  *                                     column, NO bucket subdirs
  *   root/_base/bucket=K/part-N        BASE — the compacted corpus,
  *                                     bucket as a PARTITION column
  * }}}
  *
  * Why two tiers: the per-batch probe needs `bucket` dir pruning only
  * where it pays — the corpus-sized base (at 100 TB, reading 3 of 64
  * bucket directories instead of the whole index is the difference
  * between a delta-sized probe and a corpus scan). Delta generations
  * are micro-batch-sized, so pruning them saves nothing, while WRITING
  * them bucket-partitioned cost a 64-directory commit per micro-batch
  * (~64 file creates + renames + a listing — the bench's commit canary
  * measures that exact sequence at ~0.5 s on this box; it dominated
  * the semantic gate's per-batch cost). A delta now lands as the
  * batch's own few parquet files; compaction folds deltas into the
  * dir-partitioned base, where pruning matters.
  *
  * Read-side: [[read]] unions the two tiers with `bucket` and `batch`
  * as ordinary columns; Catalyst pushes the caller's
  * `bucket.isin(...)` filter through the union — partition pruning on
  * the base side, a parquet data filter on the (tiny) delta side. The
  * base never contains the live batch's tag (only
  * older-than-newest generations fold — see [[foldIntoBase]]), so the
  * crash-replay self-exclusion `batch =!= tag` only has to bite on the
  * delta tier; base rows carry `batch = "_base"`.
  *
  * Crash-atomicity of every base swap rides [[FoldCommit]] (staging +
  * commit-marker + single-rename publish + retire), under the caller's
  * [[LakeCompact]] lease.
  */
private[streaming] object GateIndex {

  val BaseName = "_base"

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** does the index exist at all (either tier)? */
  def exists(spark: SparkSession, root: String): Boolean = {
    val (fs, p) = fsOf(spark, root)
    fs.exists(p) && (fs.exists(new Path(p, BaseName)) || deltaGens(spark, root).nonEmpty)
  }

  private def deltaGens(spark: SparkSession, root: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val (fs, p) = fsOf(spark, root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
  }

  /** delta-generation count — the auto-fold trigger's input */
  def deltaGenerationCount(spark: SparkSession, root: String): Int =
    deltaGens(spark, root).size

  /** Both tiers as one relation: (data columns..., bucket, batch).
    * Callers filter `batch =!= liveTag` (bites on deltas only — the
    * base can never hold the live tag) and `bucket.isin(touched)`
    * (dir-pruned on the base, a data filter on the deltas).
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (fs, p) = fsOf(spark, root)
    val basePath = new Path(p, BaseName)
    val deltas = deltaGens(spark, root)
    val deltaDf =
      if (deltas.isEmpty) None
      else Some(spark.read.option("basePath", root)
        .parquet(deltas.map(_.getPath.toString): _*)
        .withColumn("batch", col("batch").cast("string")))
    val baseDf =
      if (!fs.exists(basePath)) None
      else Some(spark.read.parquet(basePath.toString)
        .withColumn("batch", lit(BaseName)))
    (deltaDf, baseDf) match {
      case (Some(d), Some(b)) => d.unionByName(b)
      case (Some(d), None) => d
      case (None, Some(b)) => b
      case (None, None) =>
        throw new IllegalStateException(s"gate index at $root has neither tier")
    }
  }

  /** land one micro-batch's rows as a delta generation — same-tag
    * overwrite, so a crash-replay rewrites its own directory
    */
  def writeDelta(df: DataFrame, root: String, tag: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/batch=$tag")

  /** Fold every delta generation EXCEPT the live one (the possibly
    * written-but-uncommitted tail a stream restart replays — folding
    * it would resurrect its rows as duplicates next to the replay's
    * same-tag rewrite, and worse: base rows carry `batch = "_base"`,
    * so the replay's `batch =!= tag` self-exclusion could no longer
    * see them as its own — every replayed row would drop as a corpus
    * dup while the same-tag lake overwrite empties the batch)
    * plus the current base into a fresh `_base`. Caller holds the
    * root's lease; the swap itself is [[FoldCommit]]-atomic, so a
    * crash at any point heals to the pre- or post-fold image.
    *
    * `liveTag`: the auto-fold path (called from inside a gate step)
    * passes the batch tag it just wrote, and that generation is
    * excluded BY NAME — exact on every store. When absent (a manual
    * quiesced compaction), the newest-by-mtime generation is excluded
    * instead; that fallback is only decisive where the store reports
    * real directory mtimes (object stores listing prefixes with
    * mtime 0 would fall back to lexicographic order, where
    * `batch=tok-10` sorts before `batch=tok-9` — never rely on it
    * from a live stream).
    */
  def foldIntoBase(spark: SparkSession, root: String,
      liveTag: Option[String] = None): Unit = {
    val (fs, p) = fsOf(spark, root)
    if (!fs.exists(p)) return
    FoldCommit.heal(fs, p)
    val gens = deltaGens(spark, root)
    val foldable = liveTag match {
      case Some(tag) => gens.filterNot(_.getPath.getName == s"batch=$tag")
      case None => gens.sortBy(_.getModificationTime).dropRight(1)
    }
    if (foldable.isEmpty) return
    val deltaDf = spark.read.option("basePath", root)
      .parquet(foldable.map(_.getPath.toString): _*).drop("batch")
    val basePath = new Path(p, BaseName)
    val all =
      if (fs.exists(basePath)) deltaDf.unionByName(spark.read.parquet(basePath.toString))
      else deltaDf
    FoldCommit.publish(fs, p, BaseName, foldable.map(_.getPath.getName)) { staging =>
      // one file per non-empty bucket dir, not (tasks x buckets)
      all.repartition(col("bucket"))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging)
    }
  }

  /** REPLACE the whole relation (both tiers) with `df` — the
    * band-width rebuild path. One crash-atomic publish: the new base
    * becomes visible and every delta generation retires with the old
    * base. Caller holds the lease.
    */
  def replaceAll(spark: SparkSession, root: String, df: DataFrame): Unit = {
    val (fs, p) = fsOf(spark, root)
    FoldCommit.heal(fs, p)
    FoldCommit.publish(fs, p, BaseName,
      deltaGens(spark, root).map(_.getPath.getName)) { staging =>
      df.repartition(col("bucket"))
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging)
    }
  }

  /** RIGHT-TO-BE-FORGOTTEN rewrite: drop `pred`'s rows from both
    * tiers. The base is rewritten in place (keeping the bucket dirs);
    * the deltas consolidate into one `batch=forget-<token>` generation
    * (the probe's `batch =!= tag` treats the new tag as just another
    * string).
    *
    * Crash atomicity: BOTH tiers' filtered rewrites are STAGED before
    * either commits ([[FoldCommit.stage]]), then the two commit
    * markers land back-to-back, then both publish. Once the second
    * marker is written, a crash anywhere heals by rolling both tiers
    * forward — the torn window where only one tier has forgotten is
    * two metadata writes, not a distributed rewrite job. A crash
    * INSIDE that window (after the base's marker, before the deltas')
    * still publishes the base alone; the fold is an idempotent
    * filtered rewrite, so RE-RUNNING the forget completes it — ledger-
    * driven takedowns ([[Takedown]]) re-drive automatically,
    * and the gates' public `forget()` entry points document the same
    * re-run-on-crash requirement for direct callers. Caller holds the
    * lease.
    */
  def forgetRewrite(spark: SparkSession, root: String,
      pred: org.apache.spark.sql.Column): Unit = {
    val (fs, p) = fsOf(spark, root)
    if (!fs.exists(p)) return
    FoldCommit.heal(fs, p)
    val basePath = new Path(p, BaseName)
    val gens = deltaGens(spark, root)
    val stagedBase =
      if (!fs.exists(basePath)) None
      else {
        val kept = spark.read.parquet(basePath.toString).filter(!pred)
        Some(FoldCommit.stage(fs, p, BaseName, Nil) { staging =>
          kept.repartition(col("bucket"))
            .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging)
        })
      }
    val stagedDeltas =
      if (gens.isEmpty) None
      else {
        val token = java.util.UUID.randomUUID().toString.take(8)
        val kept = spark.read.option("basePath", root)
          .parquet(gens.map(_.getPath.toString): _*).drop("batch").filter(!pred)
        Some(FoldCommit.stage(fs, p, s"batch=forget-$token",
          gens.map(_.getPath.getName)) { staging =>
          kept.write.mode(SaveMode.Overwrite).parquet(staging)
        })
      }
    val staged = stagedBase.toSeq ++ stagedDeltas.toSeq
    staged.foreach(FoldCommit.commitStaged(fs, _))
    staged.foreach(FoldCommit.finishStaged(fs, _))
  }
}
