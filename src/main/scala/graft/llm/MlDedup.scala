package graft.llm

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed near-dup path (SURVEY §2.2 north-star row): shingles ->
  * HashingTF sparse vectors -> MinHashLSH -> approxSimilarityJoin.
  *
  * This is the off-the-shelf alternative to [[Dedup]]'s md5 pipeline.
  * Tradeoffs, measured here and worth knowing when choosing:
  *  - MLlib's hash family is seeded engine-internally, so results are
  *    NOT reproducible by an external oracle (rows-only checking);
  *    the md5 pipeline is byte-reproducible anywhere.
  *  - approxSimilarityJoin thresholds on JACCARD DISTANCE estimated
  *    from signatures, while [[Dedup.jaccard]] verifies exactly.
  *  - HashingTF buckets shingles into `numFeatures` slots (hash
  *    collisions inflate similarity slightly); the md5 pipeline keeps
  *    exact shingle identity.
  */
object MlDedup {

  /** near-dup pairs with estimated Jaccard distance <= maxDistance.
    *
    * Self-join cost notes (approxSimilarityJoin explodes every hash
    * table into a full self-join): the shingle string array is dropped
    * before the join — only (doc_id, features) rows travel through the
    * hash-explode shuffle, which is the dominant cost at any scale —
    * and 4 hash tables (not 8) halve the exploded row count; at the
    * 0.2-distance operating point the md5 pipeline (d03) remains the
    * production path, this is the off-the-shelf cross-check.
    */
  def nearDupPairs(docs: DataFrame, maxDistance: Double = 0.2): DataFrame = {
    val sh = Dedup
      .shingles(docs)
      .groupBy("doc_id")
      .agg(collect_list(col("shingle")).as("sh"))
    val tf = new HashingTF()
      .setInputCol("sh").setOutputCol("features").setNumFeatures(1 << 18)
    val vectors = tf.transform(sh).select("doc_id", "features")
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes").setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(vectors)
    model
      .approxSimilarityJoin(vectors, vectors, maxDistance, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("d1"),
        col("datasetB.doc_id").as("d2"),
        round(col("jaccard_dist"), 4).as("jaccard_dist"))
      .filter(col("d1") < col("d2"))
  }
}
