package graft.streaming

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared RIGHT-TO-BE-FORGOTTEN fold for the streaming gates'
  * batch-generation roots ([[NearDupGate.forget]],
  * [[SemanticGate.forget]]) — the d18/s22 deletion story applied to
  * gate state, which is row-shaped throughout (lake rows, signature
  * rows, vector rows), so a filtered rewrite is exact.
  *
  * Mechanism, per root: every `batch=` generation is consolidated into
  * ONE `batch=forget-<token>` generation with the predicate's rows
  * removed, then the old generations are deleted. The probe's
  * `batch =!= batchTag` self-exclusion treats the new tag as just
  * another string (the same reason compaction tags work), and the
  * bucketed roots keep their `bucket=` partition layout, so the pruned
  * probe is untouched.
  *
  * Crash safety is [[FoldCommit]]'s: the consolidation stages under an
  * underscore-prefixed dir (invisible to parquet partition discovery),
  * commits with a `_folded_inputs` marker listing the generations it
  * replaces, publishes with one rename, then retires the inputs — and
  * heal-on-entry finishes (or rolls back, if compaction consumed the
  * input generations while a crashed holder's lease was stale) whatever
  * an interruption left behind. Runs under one [[LakeCompact]] lease
  * window spanning all roots, so micro-batches are fenced for the fold.
  *
  * ==Crash-re-run contract==
  * Each root's rewrite is individually crash-atomic (and
  * [[GateIndex.forgetRewrite]] stages BOTH of its tiers before
  * committing either), but a process death BETWEEN roots leaves the
  * predicate's rows still present in the not-yet-rewritten roots with
  * nothing recording the half-done forget. The fold is an idempotent
  * filtered rewrite, so the caller MUST re-run the same forget after a
  * crash until it completes. [[Takedown]]-ledger-driven
  * takedowns re-drive automatically (the ledger row stays pending);
  * direct callers of the gates' `forget()` entry points own the retry.
  */
private[streaming] object GateForget {

  /** `roots`: (rootDir, optional bucket partition column). `pred`
    * selects the rows to FORGET (e.g. `col("doc_id").isin(...)`).
    * A `Some(bucket)` root is a two-tier [[GateIndex]] relation (the
    * signature indexes): both tiers rewrite, the base keeping its
    * `bucket=` dirs. A `None` root is a flat batch-generation lake.
    */
  def fold(
      spark: SparkSession,
      pred: org.apache.spark.sql.Column,
      roots: Seq[(String, Option[String])]): Unit =
    LakeCompact.withLeases(spark, roots.map(_._1)) {
      val conf = spark.sparkContext.hadoopConfiguration
      for ((root, bucket) <- roots) {
        val rp = new org.apache.hadoop.fs.Path(root)
        val fs = rp.getFileSystem(conf)
        if (fs.exists(rp)) bucket match {
          case Some(_) => GateIndex.forgetRewrite(spark, root, pred)
          case None =>
            // heal BEFORE listing generations, so a crashed fold's
            // consolidation is either visible (and its inputs gone) or
            // rolled back by the time this fold picks its input set
            FoldCommit.heal(fs, rp)
            val gens = fs.listStatus(rp).toSeq
              .filter(d => d.isDirectory && d.getPath.getName.startsWith("batch="))
              .map(_.getPath.getName)
            if (gens.nonEmpty) {
              val token = java.util.UUID.randomUUID().toString.take(8)
              FoldCommit.publish(fs, rp, s"batch=forget-$token", gens) { staging =>
                spark.read.parquet(root).filter(!pred).drop("batch")
                  .write.mode(SaveMode.Overwrite).parquet(staging)
              }
            }
        }
      }
    }
}
