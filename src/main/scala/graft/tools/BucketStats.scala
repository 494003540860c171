package graft.tools

import org.apache.spark.sql.functions._

import graft.{SparkSessions, Tables}
import graft.llm.{Dedup, LlmQueries}

/** LSH band-bucket cardinality stats across corpus scales — the
  * diagnostic behind the degenerate-bucket cap. A bucket of size s
  * yields s·(s-1)/2 candidate pairs, so the candidate count is the sum
  * of that term over buckets: a handful of oversized buckets dominates
  * the verify cost while carrying ~no similarity signal (everything
  * collides there — the band value is a stop-word of the signature
  * space, the banding analog of shingleIndex's MaxDf stop-shingles).
  *
  * Usage: tools/run.sh graft.tools.BucketStats <dir> [dir ...]
  */
object BucketStats {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSessions.local("graft-bucketstats", 32)
    dirs.foreach { d =>
      val docs = Tables.documents(spark, d)
      val sh = Dedup.shingleIndex(Dedup.shingles(docs), LlmQueries.MaxDf).cache()
      val sigs = Dedup.minhashSigs(sh, LlmQueries.K)
      Seq(1, 2).foreach { r =>
        val sizes = Dedup.bandTable(sigs, LlmQueries.K, r)
          .groupBy("band", "bv").agg(count(lit(1)).as("s"))
        val st = sizes.agg(
          count(lit(1)).as("buckets"),
          max("s").as("max_s"),
          sum(expr("s * (s - 1) / 2")).as("pairs"),
          sum(when(col("s") > 64, expr("s * (s - 1) / 2")).otherwise(lit(0))).as("pairs_gt64"),
          sum(when(col("s") > 256, expr("s * (s - 1) / 2")).otherwise(lit(0))).as("pairs_gt256"),
          count(when(col("s") > 64, lit(1))).as("buckets_gt64"),
          count(when(col("s") > 256, lit(1))).as("buckets_gt256")).collect()(0)
        println(s"""{"dir":"$d","r":$r,"buckets":${st.getLong(0)},"max":${st.getLong(1)},""" +
          s""""pairs":${st.getAs[Any](2)},"pairs_from_gt64":${st.getAs[Any](3)},""" +
          s""""pairs_from_gt256":${st.getAs[Any](4)},"n_gt64":${st.getLong(5)},"n_gt256":${st.getLong(6)}}""")
      }
      sh.unpersist()
    }
    spark.stop()
  }
}
