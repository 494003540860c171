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

  /** Positions considered per document — must stay in sync with the
    * oracle CTE's range() bound; docs longer than this have their tail
    * shingles ignored on BOTH sides (a deliberate, documented cap).
    */
  val MaxShinglePositions = 1000

  /** distinct word n-gram shingles per doc (first
    * [[MaxShinglePositions]] positions), with the 60-bit md5 image
    * `h64` computed once here — downstream minhash consumers read the
    * long instead of re-hashing the string (and when the index is
    * cached, the digest cost is paid exactly once).
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(
        col("doc_id"),
        // distinct-per-doc ≡ global DISTINCT(doc_id, shingle), but
        // array_distinct runs inside the scan stage — the round-1
        // `.distinct()` here shuffled the full (doc, shingle) explosion,
        // the single biggest intermediate of the dedup family
        explode(expr(
          s"array_distinct(transform(sequence(0, least(size(toks) - $n, ${MaxShinglePositions - 1})), " +
            s"i -> concat_ws(' ', slice(toks, i + 1, $n))))"))
          .as("shingle"))
      .withColumn("h64", graft.functions.ColumnFns.md5_prefix64(col("shingle")))

  /** The h64-ONLY form of [[shingles]] — the (doc_id, h64) relation
    * every hash-keyed consumer ([[shingleIndex]], [[minhashSigs]],
    * [[jaccard]]) actually reads. The whole shingle+hash step runs as
    * ONE compiled [[graft.functions.ShingleH64s]] pass per doc row
    * (distinct-by-string, first-occurrence order — bit-identical rows
    * to exploding [[shingles]] and dropping the string, pinned by
    * CurationKernelSpec), where the expression form allocated a sliced
    * array and a joined string per position through interpreted
    * higher-order nodes before the per-row md5. Consumers that need
    * the shingle STRING (the contamination family, MlDedup) keep
    * calling [[shingles]].
    */
  def shingleH64(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(graft.functions.ColumnFns.shingle_h64s(
          col("toks"), n, MaxShinglePositions)).as("h64"))

  /** shingle-hash -> docs inverted index with stop-shingle cap:
    * shingles in more than maxDf docs carry no similarity signal but
    * quadratic join cost, so they are dropped (deterministically — the
    * oracle applies the same HAVING).
    *
    * Everything downstream of this point — the df aggregation, the
    * anti join, the Jaccard intersection joins — keys on the 60-bit
    * `h64` image, NOT the shingle string: the widest shuffles of the
    * dedup family carry 8-byte longs instead of n-gram text (the
    * string exists only inside the scan stage that hashes it). The
    * oracle joins on the identical md5-derived hash, so parity is
    * bit-for-bit; a 60-bit collision would merge two shingles on both
    * engines alike (P < 1e-8 at 1e6 distinct shingles per capped df
    * group — and the hash gate would surface it).
    *
    * The cap is applied as a broadcast ANTI join against the *stop* set
    * (df > maxDf): by construction that set is tiny (stop-ngrams are a
    * vanishing fraction of distinct shingles at any corpus size), where
    * the round-1 inner join against the *rare* set shuffled the whole
    * index a second time. At extreme scale swap the broadcast for a
    * bloom filter of stop hashes — same plan shape.
    */
  def shingleIndex(sh: DataFrame, maxDf: Int): DataFrame = {
    val narrow = sh.select("doc_id", "h64")
    val stops = narrow.groupBy("h64").agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
    narrow.join(broadcast(stops.select("h64")), Seq("h64"), "left_anti")
  }

  /** deterministic 60-bit permutation constant for minhash perm p,
    * shared with the oracle (md5-derived, so DuckDB computes the same)
    */
  def permConst(p: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"perm|$p".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** k minhash signature columns mh0..mh{k-1} per doc.
    * One md5 per shingle (not per shingle x perm; precomputed as the
    * index's `h64`): the base 60-bit hash is permuted by XOR with k
    * md5-derived constants — same bucketing power, still
    * oracle-reproducible.
    */
  def minhashSigs(sh: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(p =>
      min(col("h64").bitwiseXOR(lit(permConst(p)))).as(s"mh$p"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band table: one row per (doc, band) with the band key `bv`
    * (r signature values concatenated). The joinable unit for both the
    * self-join (corpus dedup) and the asymmetric delta-vs-corpus join
    * (incremental dedup).
    */
  def bandTable(sigs: DataFrame, k: Int, r: Int): DataFrame = {
    val bandStructs = (0 until k / r).map { b =>
      struct(
        lit(b).as("band"),
        concat_ws("_", (0 until r).map(i => col(s"mh${b * r + i}")): _*).as("bv"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bv").as("bv"))
  }

  /** candidate pairs (d1 < d2) colliding in >= 1 band of a prebuilt
    * (possibly filtered) band table — the canonical pair-generation
    * step shared by the batch dedup family and the streaming gate
    */
  def bandPairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("bv"), col("doc_id").as("d1"))
    val b = bands.select(col("band"), col("bv"), col("doc_id").as("d2"))
    a.join(b, Seq("band", "bv"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2")
      .distinct()
  }

  /** LSH banding: rows of r signature values concatenated into band
    * keys; returns candidate pairs (d1 < d2) colliding in >= 1 band
    */
  def lshCandidates(sigs: DataFrame, k: Int, r: Int): DataFrame =
    bandPairs(bandTable(sigs, k, r))

  /** Exact Jaccard for given candidate pairs over the shingle sets:
    * candidate-bounded equi-join on the inverted index.
    *
    * Both index sides are first cut to candidate docs with broadcast
    * semi-joins, so the (doc, h64) equi-join shuffles only
    * candidate-doc shingles (|cand| x shingles-per-doc rows), never the
    * full corpus index — the property that keeps verification cost
    * proportional to collisions, not corpus size. (A doc-grain
    * array_intersect variant was measured and lost: the eager stop-set
    * job plus per-band interpreted HOF folds broke single-DAG fusion.)
    */
  def jaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    // the candidate set is referenced 5x below (pair join + two
    // semi-filters + sizes); cache it or every broadcast re-runs the
    // whole signature/banding pipeline that produced it
    val c = cand.cache()
    val candDocs = c.select(col("d1").as("doc_id"))
      .union(c.select(col("d2").as("doc_id"))).distinct()
    val sizes = sh.join(broadcast(candDocs), Seq("doc_id"), "leftsemi")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val s1 = sh.select(col("doc_id").as("d1"), col("h64"))
      .join(broadcast(c.select("d1").distinct()), Seq("d1"), "leftsemi")
    val s2 = sh.select(col("doc_id").as("d2"), col("h64"))
      .join(broadcast(c.select("d2").distinct()), Seq("d2"), "leftsemi")
    s1.join(broadcast(c), "d1")
      .join(s2, Seq("d2", "h64"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("doc_id").as("d1"), col("n").as("n1"))), "d1")
      .join(broadcast(sizes.select(col("doc_id").as("d2"), col("n").as("n2"))), "d2")
      .withColumn("jac",
        round(col("inter").cast(DoubleType) / (col("n1") + col("n2") - col("inter")), 4))
  }

  /** 48-bit SimHash Column — resolves `text` on whatever DataFrame it
    * is selected over. No shuffle. Word hash = first 15 md5 hex chars
    * as a 60-bit int; bit b of the signature is the sign of the +/-1
    * vote sum over word-hash bit b. Computed by the native codegen
    * [[graft.functions.SimHash48]] expression: one static call per row,
    * no per-word array allocation (the interpreted HOF form it replaces
    * is kept below as [[simhashHof]] for the parity cross-check).
    */
  def simhash(): Column =
    graft.functions.ColumnFns.simhash48(col("text"))

  /** The original higher-order-function formulation of [[simhash]] —
    * retained as the executable spec the native expression is tested
    * against (LlmSpec cross-checks them row-for-row).
    *
    * Loop order matters for performance: the fold runs over the word
    * hashes ONCE (one md5 per word), accumulating a 48-wide vote
    * vector with zip_with, and the finish lambda packs the sign bits.
    * The inverted form (fold over bits, inner fold over words) re-runs
    * the md5 transform per bit — measured 8x slower.
    */
  def simhashHof(bits: Int = 48): Column =
    expr(s"""
      aggregate(
        transform(split(text, ' '), w -> md5_prefix64(w)),
        array_repeat(0L, $bits),
        (acc, h) -> zip_with(
          acc,
          transform(sequence(0, ${bits - 1}),
                    b -> IF(((shiftright(h, b) & 1) = 1), 1L, -1L)),
          (a, v) -> a + v),
        counts -> aggregate(
          sequence(0, ${bits - 1}),
          0L,
          (acc2, b) -> acc2 + IF(element_at(counts, b + 1) > 0, shiftleft(1L, b), 0L)))
    """)
}
