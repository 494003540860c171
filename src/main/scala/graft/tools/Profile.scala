package graft.tools

import graft.{SparkSessions, Tables}
import graft.llm.{Dedup, LlmQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local-iteration stage profiler for the dedup pipeline (not part of
  * the driver contract). Times each sub-stage of d05 in isolation so
  * regressions can be pinned to a stage instead of guessed at.
  */
object Profile {
  private def t(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSessions.local("graft-profile", 32)
    val docs = Tables.documents(spark, sfDir)

    t("shingles")(Dedup.shingles(docs))
    val sh0 = Dedup.shingleIndex(Dedup.shingles(docs), LlmQueries.MaxDf)
    t("shingleIndex")(sh0)
    val sh = sh0.cache()
    t("index materialize (cache)")(sh)
    t("minhashSigs")(Dedup.minhashSigs(sh, LlmQueries.K))
    val candD05 = Dedup.lshCandidates(Dedup.minhashSigs(sh, LlmQueries.K), LlmQueries.K, 1)
    t("lshCandidates r=1")(candD05)
    t("jaccard on r=1 cands")(
      Dedup.jaccard(candD05, sh).filter(col("jac") >= 0.5))
    spark.stop()
  }
}
