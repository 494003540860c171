package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for LLM training-data pipelines, all
  * expressed as shuffle-bounded DataFrame plans (never O(n^2) over the
  * corpus):
  *
  *  - exact: hash-groupBy on the raw text (one shuffle on text).
  *  - fingerprint: md5 over normalized text — catches
  *    whitespace/case-variant dups at the same cost.
  *  - MinHash+LSH banding: per-doc k-minhash signature (map-side only),
  *    banded into k/r buckets; only bucket-colliding pairs are verified
  *    with exact Jaccard. Candidate generation is linear in corpus +
  *    bucket collisions.
  *  - SimHash: 48-bit signature per doc via weighted bit-votes of word
  *    hashes — computed entirely with higher-order array functions
  *    (zero shuffle, whole-stage codegen).
  *  - n-gram Jaccard: exact pairwise similarity through a shingle
  *    inverted index with a document-frequency cap on join keys (the
  *    stop-shingle guard that keeps the join from exploding at scale).
  *
  * All hashing uses md5 so the DuckDB oracle can replicate signatures
  * bit-for-bit.
  */
object Dedup {

  /** distinct word n-gram shingles per doc */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(
        col("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
          .as("shingle"))
      .distinct()

  /** shingle -> docs inverted index with stop-shingle cap: shingles in
    * more than maxDf docs carry no similarity signal but quadratic join
    * cost, so they are dropped (deterministically — the oracle applies
    * the same HAVING).
    */
  def shingleIndex(sh: DataFrame, maxDf: Int): DataFrame = {
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
    sh.join(rare.select("shingle"), "shingle")
  }

  /** k md5-minhash signature columns mh0..mh{k-1} per doc */
  def minhashSigs(sh: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(p =>
      min(md5(concat(lit(s"$p|"), col("shingle")))).as(s"mh$p"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: rows of r signature values concatenated into band
    * keys; returns candidate pairs (d1 < d2) colliding in >= 1 band
    */
  def lshCandidates(sigs: DataFrame, k: Int, r: Int): DataFrame = {
    val bandStructs = (0 until k / r).map { b =>
      struct(
        lit(b).as("band"),
        concat((0 until r).map(i => col(s"mh${b * r + i}")): _*).as("bv"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bv").as("bv"))
    val a = bands.select(col("band"), col("bv"), col("doc_id").as("d1"))
    val b = bands.select(col("band"), col("bv"), col("doc_id").as("d2"))
    a.join(b, Seq("band", "bv"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2")
      .distinct()
  }

  /** exact Jaccard for given candidate pairs over the shingle sets */
  def jaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val s1 = sh.select(col("doc_id").as("d1"), col("shingle"))
    val s2 = sh.select(col("doc_id").as("d2"), col("shingle"))
    cand
      .join(s1, "d1")
      .join(s2, Seq("d2", "shingle"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac",
        round(col("inter").cast(DoubleType) / (col("n1") + col("n2") - col("inter")), 4))
  }

  /** 48-bit SimHash per doc — no shuffle, pure higher-order functions.
    * Word hash = first 15 md5 hex chars as a 60-bit int; bit b of the
    * signature is the sign of the +/-1 vote sum over word-hash bit b.
    */
  def simhash(docs: DataFrame, bits: Int = 48): Column =
    expr(s"""
      aggregate(
        sequence(0, ${bits - 1}),
        0L,
        (acc, b) -> acc + IF(
          aggregate(
            transform(split(text, ' '),
                      w -> cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint)),
            0L,
            (a2, h) -> a2 + IF(((shiftright(h, b) & 1) = 1), 1L, -1L)) > 0,
          shiftleft(1L, b), 0L))
    """)
}
