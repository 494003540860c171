package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BATCHED hybrid retrieval serving — the x10 composition (RQ-refined
  * dense arm + BM25 lexical arm + RRF fusion + MMR diversification)
  * generalized from one hardwired query to a query FRAME, the shape
  * [[graft.streaming.ServeGate]] runs per micro-batch against a frozen
  * hybrid release.
  *
  * Parity contract with the x10 catalog query (pinned by
  * ServeGateSpec): with `nProbe = nCentroids` (probe every posting
  * list — the spec's setting) the dense arm's member set, level-1/2
  * ADC decimal sums, wide/narrow tie-breaks and exact re-rank
  * reproduce [[Similarity.rqRefineTopKWith]] exactly; the lexical
  * formulas are byte-shared with x09/x10's bm25 arm; the fusion and
  * greedy constants are the s25 literals. Production serving sets
  * `nProbe < nCentroids`, which prunes the dense scan to
  * nProbe/nCentroids of the code index — the approximation budget,
  * same as the dense-only ServeGate mode.
  *
  * 100 TB shape: queries/probes/ADC tables broadcast; ONE cid-keyed
  * posting join; floats first touched at the exact re-rank of the
  * per-query narrow cut (k·|batch| rows against the release's `embs`
  * relation); the lexical candidate set is posting-list-bounded by the
  * ≤ 4 query terms; fusion pools are ≤ 20 rows per query, and the MMR
  * greedy runs INSIDE a per-query group task (never a driver collect —
  * the batch form's driver-side greedy does not scale to a query
  * stream).
  */
object HybridServe {

  /** the s25 MMR literals (μ is NOT derived as 1 − λ: `1 - 0.7` is
    * 0.30000000000000004 in IEEE — both engines hardcode 0.3)
    */
  val MmrLambda = 0.7
  val MmrMu = 0.3
  val MmrK = 10

  /** Greedy maximal-marginal-relevance selection (s25, Carbonell &
    * Goldstein 1998): pick 1 is argmax relevance; pick i maximizes
    * λ·rel − μ·max(sim to already-picked), ties to the lower id. All
    * inputs are 6-dp-rounded, so the selection is deterministic and
    * engine-portable. Pool sizes are bounded (≤ 20 fused members), so
    * the loop is O(k·n²) over tiny n — safe on a driver OR inside a
    * per-query group task.
    */
  private[graft] def mmrGreedy(
      rel: Seq[(Long, Double)],
      sim: scala.collection.Map[(Long, Long), Double]): Seq[(Long, Long)] = {
    val relMap = rel.toMap
    val selected = scala.collection.mutable.ArrayBuffer[Long]()
    val remaining = scala.collection.mutable.LinkedHashSet[Long](rel.map(_._1): _*)
    while (selected.size < MmrK && remaining.nonEmpty) {
      val best = remaining.toSeq.map { v =>
        val score =
          if (selected.isEmpty) relMap(v)
          else MmrLambda * relMap(v) - MmrMu * selected.map(p => sim((v, p))).max
        (score, v)
      }.minBy { case (score, v) => (-score, v) }._2
      selected += best
      remaining -= best
    }
    selected.toSeq.zipWithIndex.map { case (v, i) => (v, (i + 1).toLong) }
  }

  /** Spark's `round(col, 6)` on a double, reproduced locally:
    * BigDecimal.valueOf (the Double.toString canonical representation)
    * then HALF_UP — the exact codegen Spark's Round emits, so a local
    * pairwise cosine and the Catalyst one round to the same bits.
    */
  private[graft] def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** [[graft.functions.CosineSimilarity]]'s exact operation order
    * (dot/norms accumulate in array order as doubles, result =
    * dot / (√na · √nb)) run locally — the per-query MMR group task's
    * pairwise kernel. Bit-identical to the Catalyst expression the
    * batch fusion uses.
    */
  private[graft] def cosineLocal(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** per-query top-4 terms by (tf desc, term asc) — x08/x09/x10's
    * query-side derivation with the query frame's id as the partition
    */
  private def queryTerms(queries: DataFrame): DataFrame = {
    val wq = Window.partitionBy("query_id").orderBy(col("tf").desc, col("term"))
    queries
      .select(col("query_id"),
        explode(graft.functions.ColumnFns.term_counts(split(col("qtext"), " "))).as("tc"))
      .select(col("query_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .withColumn("qr", row_number().over(wq)).filter(col("qr") <= 4)
      .select("query_id", "term")
  }

  /** the lexical arm, batched: x09/x10's BM25 scoring formulas over the
    * frozen partial-aggregate relations, per-query top-10. The partials
    * merge at read (associative sums) exactly as `bm25ArmAt` does.
    */
  private def bm25Batch(
      queries: DataFrame,
      postings: DataFrame,
      dfPartials: DataFrame,
      dl: DataFrame,
      stats: DataFrame,
      excludeSelf: Boolean): DataFrame = {
    val st = stats.agg(sum(col("n")).as("n"), sum(col("s")).as("s")).head()
    val nCorpus = st.getLong(0).toDouble
    val sumDl = st.getLong(1).toDouble
    val dfr = dfPartials.groupBy("term").agg(sum(col("df")).as("df"))
    val idf = (lit(nCorpus) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val lenNorm = lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) * lit(nCorpus) / lit(sumDl)
    val tfNorm = col("tf").cast(DoubleType) * lit(2.2) /
      (col("tf").cast(DoubleType) + lit(1.2) * lenNorm)
    val contrib = round(idf * tfNorm, 6).cast(DecimalType(18, 6))
    val wl = Window.partitionBy("query_id").orderBy(col("sdec").desc, col("corpus_doc"))
    val cand = broadcast(queryTerms(queries))
      .join(postings.withColumnRenamed("doc_id", "corpus_doc"), "term")
      .join(dfr, "term")
      .join(dl.withColumnRenamed("doc_id", "corpus_doc"), "corpus_doc")
    (if (excludeSelf) cand.filter(col("corpus_doc") =!= col("query_id")) else cand)
      .groupBy("query_id", "corpus_doc").agg(sum(contrib).as("sdec"))
      .withColumn("lex_rank", row_number().over(wl).cast(LongType))
      .filter(col("lex_rank") <= 10)
      .select("query_id", "corpus_doc", "lex_rank")
  }

  /** the dense arm, batched: the IVFADC+R ladder
    * ([[Similarity.ivfPqRefineServeBatch]] — level-1 wide shortlist,
    * level-2 residual refine, narrow cut) finished with the exact-
    * cosine re-rank of the narrow rows against the release's float
    * vectors — the FIRST float touch in the whole serve.
    */
  private def denseBatch(
      queries: DataFrame,
      rows: DataFrame,
      cents: DataFrame,
      books1: DataFrame,
      books2: DataFrame,
      embs: DataFrame,
      k: Int, nProbe: Int, wide: Int, narrow: Int,
      excludeSelf: Boolean): DataFrame = {
    val narrowSet = Similarity.ivfPqRefineServeBatch(
      queries.select("query_id", "qv"), rows, cents, books1, books2,
      narrow, nProbe, wide, excludeSelf)
    val wd = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_doc"))
    // the corpus-sized embs relation is probed with the BOUNDED narrow
    // set broadcast — the float scan is one semi-join-shaped pass, no
    // corpus shuffle
    embs.select(col("vec_id").as("corpus_doc"), col("embedding"))
      .join(broadcast(narrowSet.select(col("query_id"), col("vec_id").as("corpus_doc"))),
        "corpus_doc")
      .join(broadcast(queries.select(col("query_id"), col("qv"))), "query_id")
      .select(col("query_id"), col("corpus_doc"),
        round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
      .withColumn("vec_rank", row_number().over(wd).cast(LongType))
      .filter(col("vec_rank") <= k)
      .select("query_id", "corpus_doc", "vec_rank")
  }

  /** Answer a hybrid query frame `(query_id, qv, qtext)` against one
    * frozen hybrid release. Output: one row per (query, pick) —
    * `(query_id, corpus_doc, lex_rank, vec_rank, rrf, rank)`, x10's
    * columns with the query id prepended.
    */
  def hybridServeBatch(
      queries: DataFrame,
      rows: DataFrame,
      cents: DataFrame,
      books1: DataFrame,
      books2: DataFrame,
      embs: DataFrame,
      postings: DataFrame,
      dfPartials: DataFrame,
      dl: DataFrame,
      stats: DataFrame,
      k: Int = 10,
      nProbe: Int = 4,
      wide: Int = 50,
      narrow: Int = 20,
      excludeSelf: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val lex = bm25Batch(queries, postings, dfPartials, dl, stats, excludeSelf)
    val dense = denseBatch(queries, rows, cents, books1, books2, embs,
      k, nProbe, wide, narrow, excludeSelf)
    // RRF fusion — x10's formula and rounding, keyed by query
    val rrfRaw = coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0))
    val fused = lex.join(dense, Seq("query_id", "corpus_doc"), "full_outer")
      .withColumn("rrf", round(rrfRaw, 6))
    val pool = embs.select(col("vec_id").as("doc"), col("embedding"))
      .join(broadcast(fused.select(col("query_id"),
        col("corpus_doc").as("doc"), col("rrf").as("rel"))), "doc")
    val picks = mmrPicks(pool)
      .select(col("query_id"), col("doc").as("corpus_doc"), col("rank"))
    fused.join(broadcast(picks), Seq("query_id", "corpus_doc"))
      .select(col("query_id"), col("corpus_doc"),
        col("lex_rank"), col("vec_rank"), col("rrf"), col("rank"))
  }

  /** The shared MMR diversification stage — the batch s25/x08/x09/x10
    * entries and the streaming hybrid serve all run THIS kernel.
    * `pool` carries one row per (query, candidate):
    * (query_id, doc, rel, embedding); the pairwise cosines and the
    * greedy run INSIDE each query's group task over the
    * shortlist-bounded pool (≤ 20 fused members per query) with the
    * Catalyst expression's exact arithmetic — no driver collect
    * anywhere, queries diversify in parallel. Returns
    * (query_id, doc, rank).
    */
  private[llm] def mmrPicks(pool: DataFrame): DataFrame = {
    val spark = pool.sparkSession
    import spark.implicits._
    pool
      .select(col("query_id"), col("doc"), col("rel"), col("embedding"))
      .as[(Long, Long, Double, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.toIndexedSeq
        val sim = scala.collection.mutable.Map[(Long, Long), Double]()
        for (i <- cands.indices; j <- (i + 1) until cands.length) {
          val s = round6(cosineLocal(cands(i)._4, cands(j)._4))
          sim((cands(i)._2, cands(j)._2)) = s
          sim((cands(j)._2, cands(i)._2)) = s
        }
        mmrGreedy(cands.map(r => r._2 -> r._3), sim)
          .map { case (d, rk) => (qid, d, rk) }
      }
      .toDF("query_id", "doc", "rank")
  }
}
