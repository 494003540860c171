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
  * Crash safety: the staging dir is underscore-prefixed (invisible to
  * parquet partition discovery) and carries a `_folded_inputs` marker
  * (underscore file — invisible to readers) listing the generations it
  * replaces, so the atomic rename publishes the data and its recovery
  * information together. A crash after the rename but before the old
  * generations die leaves duplicate rows that [[finishPending]] heals
  * on the next fold's entry; a crash before the rename leaves only an
  * invisible staging dir. Runs under one [[LakeCompact]] lease window
  * spanning all roots, so micro-batches are fenced for the fold.
  */
private[streaming] object GateForget {

  /** `roots`: (rootDir, optional bucket partition column). `pred`
    * selects the rows to FORGET (e.g. `col("doc_id").isin(...)`).
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
        if (fs.exists(rp)) {
          finishPending(fs, rp)
          val gens = fs.listStatus(rp).toSeq
            .filter(d => d.isDirectory && d.getPath.getName.startsWith("batch="))
            .map(_.getPath.getName)
          if (gens.nonEmpty) {
            val token = java.util.UUID.randomUUID().toString.take(8)
            val staging = new org.apache.hadoop.fs.Path(rp, s"_forget-$token.staging")
            val kept = spark.read.parquet(root).filter(!pred).drop("batch")
            (bucket match {
              case Some(b) => kept.repartition(col(b)).write.partitionBy(b)
              case None => kept.write
            }).mode(SaveMode.Overwrite).parquet(staging.toString)
            val mf = fs.create(new org.apache.hadoop.fs.Path(staging, "_folded_inputs"), true)
            try mf.write(gens.mkString("\n").getBytes("UTF-8")) finally mf.close()
            require(
              fs.rename(staging, new org.apache.hadoop.fs.Path(rp, s"batch=forget-$token")),
              s"forget generation swap failed for $root")
            finishPending(fs, rp)
          }
        }
      }
    }

  /** finish any interrupted fold: delete the generations a visible
    * forget generation's marker lists, then the marker itself
    */
  private def finishPending(
      fs: org.apache.hadoop.fs.FileSystem, rp: org.apache.hadoop.fs.Path): Unit =
    for (g <- fs.listStatus(rp)
         if g.isDirectory && g.getPath.getName.startsWith("batch=forget-")) {
      val mark = new org.apache.hadoop.fs.Path(g.getPath, "_folded_inputs")
      if (fs.exists(mark)) {
        val in = fs.open(mark)
        val listed =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        listed.filter(_ != g.getPath.getName)
          .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(rp, n), true): Unit)
        fs.delete(mark, false): Unit
      }
    }
}
