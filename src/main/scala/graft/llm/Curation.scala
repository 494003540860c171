package graft.llm

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data curation operators — the pipeline stages between "raw
  * corpus" and "training batches" that the dedup/similarity family
  * (LlmQueries) doesn't cover: deterministic splits, stratified
  * sampling, sequence packing, TF-IDF term scoring, repetition/
  * boilerplate scoring, and cross-document passage dedup.
  *
  * Design rules shared by every operator here:
  *  - determinism end-to-end: all randomness is md5-derived from the
  *    data itself (reshuffling the corpus or rerunning the job cannot
  *    change any assignment), which also makes every operator
  *    DuckDB-oracle-checkable;
  *  - map-side first: p01/p02 are zero-shuffle; the rest shuffle only
  *    aggregated or per-key rows;
  *  - outputs are long/double/string only (driver-harness hash rules).
  */
object Curation {

  /** 60-bit uniform hash in [0, 1) from a column's string image —
    * md5-based so DuckDB reproduces it bit-for-bit (same expression as
    * the t2-proven md5_prefix64 / conv path, divided by 2^60).
    */
  private def unitHash(c: org.apache.spark.sql.Column) =
    graft.functions.ColumnFns.md5_prefix64(c.cast(StringType)) / lit(1152921504606846976.0) // 2^60

  private val duckUnitHash =
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) / 1152921504606846976.0"

  /** [[duckUnitHash]] with a qualified doc_id, for multi-table scopes */
  private def duckUnitHashOf(q: String) = duckUnitHash.replace("doc_id", q + ".doc_id")

  // -- p01: deterministic train/val/test split. Pure projection (zero
  //    shuffle, zero state): the assignment is a function of doc_id
  //    alone, so it is stable under corpus growth, repartitioning, and
  //    replays — the property a 100 TB ingest needs so that adding a
  //    shard never flips an existing doc's split.
  private val p01 = Q(
    "p01_split_assign",
    (s, d) => {
      val u = unitHash(col("doc_id"))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          round(u, 6).as("u"),
          when(u < 0.9, "train").when(u < 0.95, "val").otherwise("test").as("split"))
    },
    Some(s"""
      SELECT doc_id,
             round($duckUnitHash, 6) AS u,
             CASE WHEN $duckUnitHash < 0.9 THEN 'train'
                  WHEN $duckUnitHash < 0.95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    """.trim))

  // -- p02: deterministic stratified sampling — per-language rates
  //    (simulating per-source curation weights). Same zero-shuffle
  //    map-side shape as p01; the rate table is a literal map (in a
  //    real pipeline: a broadcast dimension).
  private val p02 = Q(
    "p02_stratified_sample",
    (s, d) => {
      val rate = when(col("lang") === "en", 0.5)
        .when(col("lang") === "de", 0.25)
        .otherwise(0.1)
      Tables.documents(s, d)
        .withColumn("rate", rate)
        .filter(unitHash(col("doc_id")) < col("rate"))
        .select(col("doc_id"), col("lang"), col("rate"))
    },
    Some(s"""
      SELECT doc_id, lang,
             CAST(CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 0.25 ELSE 0.1 END AS DOUBLE) AS rate
      FROM documents
      WHERE $duckUnitHash <
            CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 0.25 ELSE 0.1 END
    """.trim))

  /** token budget per packed training sequence (p03) */
  val PackBudget = 512L

  // -- p03: sequence packing — assign docs to fixed-token-budget bins
  //    by running token count, partitioned by lang (the parallel unit;
  //    at lake scale the partition key is the ingest shard, giving one
  //    independent packing stream per shard — a global order would
  //    serialize the sort). floor(cumsum_before / budget) packs bins
  //    contiguously; a doc may straddle a boundary (documented,
  //    standard for fixed-stride packing).
  private val p03 = Q(
    "p03_pack_sequences",
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(
          col("doc_id"),
          col("lang"),
          col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / lit(PackBudget)).as("bin"))
    },
    Some(s"""
      SELECT doc_id, lang, n_tokens,
             CAST(floor((cum - n_tokens) / $PackBudget) AS BIGINT) AS bin
      FROM (SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                     OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM documents)
    """.trim))

  // -- t05: TF-IDF top terms per document. Two aggregations (term
  //    frequency per (doc, term); document frequency per term) + a
  //    broadcast of the df table (vocabulary-sized — small relative to
  //    the corpus at any scale; beyond broadcast range it becomes the
  //    bucketed side of a shuffle join) + a per-doc top-k window.
  //    idf uses the rational (N+1)/(df+1) form: exact IEEE division on
  //    both engines, no ln() last-ulp parity risk.
  private val t05 = Q(
    "t05_tfidf_terms",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val n = docs.count() // corpus size: one cheap metadata count
      // the compiled in-row TermCounts fold — tf is a pure map over
      // the doc scan (the old explode + groupBy(doc_id, term) shuffled
      // the full token stream); df then ships partial-agg-sized rows
      val tf = docs
        .select(col("doc_id"),
          explode(graft.functions.ColumnFns.term_counts(split(col("text"), " "))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      // rank on the RAW score (identical IEEE arithmetic both engines);
      // emit the rounded image — ranking on the rounded value could
      // break ties differently than the oracle
      val raw = col("tf") * (lit(n + 1.0) / (col("df") + lit(1.0)))
      val w = Window.partitionBy("doc_id").orderBy(raw.desc, col("term"))
      tf.join(broadcast(df), "term")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), round(raw, 6).as("score"),
          col("rank").cast(LongType).as("rank"))
    },
    Some(s"""
      WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
      tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
      dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      scored AS (SELECT doc_id, term,
                        round(tf * ((n + 1.0) / (df + 1.0)), 6) AS score,
                        row_number() OVER (PARTITION BY doc_id
                                           ORDER BY tf * ((n + 1.0) / (df + 1.0)) DESC, term) AS rank
                 FROM tfc JOIN dfc USING (term) CROSS JOIN n)
      SELECT doc_id, term, score, CAST(rank AS BIGINT) AS rank
      FROM scored WHERE rank <= 3
    """.trim))

  // -- t06: repetition / boilerplate scoring (C4-style quality gate):
  //    per-doc duplicate-bigram ratio and most-frequent-bigram share.
  //    One explode + two map-side-combined aggregations; no corpus-wide
  //    state, linear at any scale.
  /** Library entry point for t06: works on any (doc_id, text) frame. */
  def repetitionScore(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val bi = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(
          col("doc_id"),
          explode(expr(
            "transform(sequence(0, size(toks) - 2), i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))"))
            .as("bigram"))
      bi.groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(
          sum(col("c")).as("n_bigrams"),
          count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_c"))
        .select(
          col("doc_id"),
          col("n_bigrams"),
          round(lit(1.0) - col("n_distinct") / col("n_bigrams").cast(DoubleType), 6).as("dup_ratio"),
          round(col("top_c") / col("n_bigrams").cast(DoubleType), 6).as("top_share"))
  }

  private val t06 = Q(
    "t06_repetition_score",
    (s, d) => repetitionScore(Tables.documents(s, d)),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      bi AS (SELECT doc_id, toks[i.i+1] || ' ' || toks[i.i+2] AS bigram
             FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) i
             WHERE len(toks) >= 2 AND i.i <= len(toks) - 2),
      c AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY 1, 2)
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_bigrams,
             round(1.0 - count(*) / CAST(SUM(c) AS DOUBLE), 6) AS dup_ratio,
             round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_share
      FROM c GROUP BY doc_id
    """.trim))

  // -- t07: unigram-surprisal scoring — the perplexity-filter stand-in
  //    (docs whose tokens are uniformly high-frequency are boilerplate;
  //    very high mean surprisal is gibberish). True -ln p needs a float
  //    log whose last ulp differs between engines, so the score uses
  //    integer floor-log2: surprisal(term) = floor(log2(total // cnt))
  //    computed as length(bin(n)) - 1 — pure integer/string ops, exact
  //    on both engines, order-invariant under aggregation. Monotone in
  //    the true surprisal (1-bit granularity), which is all a filter
  //    threshold needs.
  private val t07 = Q(
    "t07_surprisal_score",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val terms = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val freq = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(terms.agg(count(lit(1)).as("total"))))
      terms.join(broadcast(freq), "term")
        .withColumn("surprisal", expr("length(bin(total DIV cnt)) - 1"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          round(avg(col("surprisal")), 6).as("mean_surprisal"),
          max(col("surprisal")).cast(LongType).as("max_surprisal"))
    },
    Some("""
      WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      freq AS (SELECT term, count(*) AS cnt FROM terms GROUP BY term),
      total AS (SELECT count(*) AS total FROM terms),
      sc AS (SELECT t.doc_id, length(bin(total.total // f.cnt)) - 1 AS surprisal
             FROM terms t JOIN freq f USING (term) CROSS JOIN total)
      SELECT doc_id, count(*) AS n_tokens,
             round(avg(surprisal), 6) AS mean_surprisal,
             CAST(max(surprisal) AS BIGINT) AS max_surprisal
      FROM sc GROUP BY doc_id
    """.trim))

  // -- t12: bigram-LM surprisal — t07's perplexity filter upgraded to
  //    the CONDITIONAL form a real LM filter uses (CCNet/Gopher score
  //    docs with an n-gram LM: formulaic word TRANSITIONS score low
  //    even when the words themselves are rare, and improbable
  //    transitions mark gibberish that unigram statistics miss). The
  //    in-corpus MLE is p(w2|w1) = c(w1 w2) / c(w1 ·), so
  //    surprisal(w1 w2) = floor(log2(c(w1 ·) DIV c(w1 w2))) — t07's
  //    integer floor-log2 image (pure integer/string ops, exact on
  //    both engines, monotone in the true -log2 p at 1-bit
  //    granularity). Every scored bigram occurs in the corpus, so
  //    counts are >= 1 and no smoothing term is needed. Scale shape:
  //    two aggregation passes (bigram counts; left-context totals
  //    derived from them, never a second corpus scan) + one join back
  //    to the stream — the bigram relation grows with vocab², so it
  //    deliberately stays a shuffle join (t05's broadcast note applies
  //    only to the vocab-sized unigram side).
  /** t12's per-doc bigram-LM score, shared with t14's bucketing head:
    * (doc_id, n_bigrams, mean_surprisal, max_surprisal) over every doc
    * with at least one bigram
    */
  private def bigramDocScores(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val bi = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(element_at(toks, i + 1) AS w1, element_at(toks, i + 2) AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bc = bi.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    val cc = bc.groupBy("w1").agg(sum(col("bc")).as("cc"))
    bi.join(bc, Seq("w1", "w2"))
      .join(broadcast(cc), "w1")
      .withColumn("surprisal", expr("length(bin(cc DIV bc)) - 1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(col("surprisal")), 6).as("mean_surprisal"),
        max(col("surprisal")).cast(LongType).as("max_surprisal"))
  }

  /** the shared DuckDB CTE chain ending in the per-doc score relation
    * `ds(doc_id, n_bigrams, mean_surprisal, max_surprisal)` (t12/t14)
    */
  private val bigramScoreCtes = """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      bi AS (SELECT doc_id, toks[i.i+1] AS w1, toks[i.i+2] AS w2
             FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) i
             WHERE len(toks) >= 2 AND i.i <= len(toks) - 2),
      bc AS (SELECT w1, w2, count(*) AS bc FROM bi GROUP BY 1, 2),
      cc AS (SELECT w1, SUM(bc) AS cc FROM bc GROUP BY 1),
      sc AS (SELECT bi.doc_id, length(bin(cc.cc // bc.bc)) - 1 AS surprisal
             FROM bi JOIN bc USING (w1, w2) JOIN cc USING (w1)),
      ds AS (SELECT doc_id, count(*) AS n_bigrams,
                    round(avg(surprisal), 6) AS mean_surprisal,
                    CAST(max(surprisal) AS BIGINT) AS max_surprisal
             FROM sc GROUP BY doc_id)"""

  private val t12 = Q(
    "t12_bigram_surprisal",
    (s, d) => bigramDocScores(s, d),
    Some(s"""
      $bigramScoreCtes
      SELECT doc_id, n_bigrams, mean_surprisal, max_surprisal FROM ds
    """.trim))

  // -- t14: perplexity BUCKETING — the data-selection head over t12's
  //    bigram-LM score (the CCNet recipe, Wenzek et al. 2020
  //    arXiv:1911.00359: rank Common Crawl docs by LM perplexity PER
  //    LANGUAGE, split into head/middle/tail terciles, train on
  //    head+middle — absolute perplexity thresholds don't transfer
  //    across languages, ranks do). Buckets are ntile(3) over the
  //    deterministic (mean_surprisal, doc_id) order, so tie groups
  //    split identically on both engines; keep = bucket <= 2. Scale
  //    shape: t12's two aggregation passes + one lang-partitioned
  //    window over DOC-level rows (corpus-sized but narrow — three
  //    longs and a double per doc; the per-language rank is the
  //    operator's defining semantics, and ntile needs the partition's
  //    total count, so this window is irreducible. At 100 TB the
  //    honest cheaper variant is approx percentile boundaries — q36b's
  //    sketch — traded against CCNet's exact-tercile contract).
  private val t14 = Q(
    "t14_perplexity_buckets",
    (s, d) => {
      val w = Window.partitionBy("lang")
        .orderBy(col("mean_surprisal"), col("doc_id"))
      bigramDocScores(s, d)
        .join(Tables.documents(s, d).select("doc_id", "lang"), "doc_id")
        .withColumn("bucket", ntile(3).over(w).cast(LongType))
        .select(
          col("doc_id"), col("lang"), col("mean_surprisal"),
          col("bucket"), (col("bucket") <= 2).as("keep"))
    },
    Some(s"""
      $bigramScoreCtes,
      bk AS (SELECT ds.doc_id, doc.lang, ds.mean_surprisal,
                    CAST(ntile(3) OVER (PARTITION BY doc.lang
                      ORDER BY ds.mean_surprisal, ds.doc_id) AS BIGINT) AS bucket
             FROM ds JOIN documents doc USING (doc_id))
      SELECT doc_id, lang, mean_surprisal, bucket, bucket <= 2 AS keep FROM bk
    """.trim))

  /** words per dedup passage (d08) */
  val PassageWords = 10

  // -- d08: cross-document passage dedup (CCNet-shape): chunk every doc
  //    into fixed 10-word passages, fingerprint each, count global
  //    occurrences, and report per-doc how much material survives
  //    first-occurrence dedup (keeper = min (doc_id, idx) per
  //    fingerprint). The passage table shuffles once on the fingerprint
  //    (map-side combined) and once per-doc — both aggregation-shaped,
  //    no pairwise joins anywhere.
  private val d08 = Q(
    "d08_passage_dedup",
    (s, d) => {
      val p = PassageWords
      val passages = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          posexplode(expr(
            s"transform(sequence(0, cast(ceil(size(toks) / $p.0) as int) - 1), " +
              s"i -> concat_ws(' ', slice(toks, i * $p + 1, $p)))"))
            .as(Seq("idx", "passage")))
        .withColumn("fp", md5(col("passage")))
      val keeper = Window.partitionBy("fp")
      val marked = passages
        .withColumn("n_copies", count(lit(1)).over(keeper))
        .withColumn("keep_doc", min(col("doc_id")).over(keeper))
        // second window pass: the conditional min needs keep_doc
        // materialized (window-in-window is illegal in one expression)
        .withColumn("keep_idx",
          min(when(col("doc_id") === col("keep_doc"), col("idx"))).over(keeper))
        .withColumn("keep",
          col("doc_id") === col("keep_doc") && col("idx") === col("keep_idx"))
      marked
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_passages"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("kept_ratio", round(col("n_kept") / col("n_passages").cast(DoubleType), 6))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      p AS (SELECT doc_id, i.i AS idx,
                   md5(array_to_string(toks[i.i * $PassageWords + 1 : i.i * $PassageWords + $PassageWords], ' ')) AS fp
            FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) i
            WHERE i.i < ceil(len(toks) / ${PassageWords}.0)),
      m1 AS (SELECT doc_id, idx, fp,
                    count(*) OVER (PARTITION BY fp) AS n_copies,
                    min(doc_id) OVER (PARTITION BY fp) AS keep_doc
             FROM p),
      m AS (SELECT *,
                   min(CASE WHEN doc_id = keep_doc THEN idx END)
                     OVER (PARTITION BY fp) AS keep_idx
            FROM m1)
      SELECT doc_id,
             count(*) AS n_passages,
             CAST(SUM(CASE WHEN doc_id = keep_doc AND idx = keep_idx THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             round(SUM(CASE WHEN doc_id = keep_doc AND idx = keep_idx THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS kept_ratio
      FROM m GROUP BY doc_id
    """.trim))

  /** n-gram width for the contamination check (c01) */
  val ContamN = 5

  // -- c01: train/test contamination — train-split docs sharing any
  //    5-gram with a test-split doc (the leak check every eval pipeline
  //    needs before training). Reuses the p01 hash split and the dedup
  //    family's capped shingle machinery. The test side is a small
  //    fixed fraction of the corpus, so it broadcasts at bench scale;
  //    at 100 TB swap the broadcast for a bloom filter of test-shingle
  //    hashes (same plan shape, same output).
  private val c01 = Q(
    "c01_contamination",
    (s, d) => {
      val sh = Dedup.shingles(Tables.documents(s, d), ContamN)
        // u is a pure function of doc_id: recompute post-explode rather
        // than joining the split assignment back (saves a shuffle)
        .withColumn("u", unitHash(col("doc_id")))
      val testSh = sh.filter(col("u") >= 0.95)
        .select(col("doc_id").as("test_doc"), col("shingle"))
      val trainSh = sh.filter(col("u") < 0.9)
        .select(col("doc_id").as("train_doc"), col("shingle"))
      trainSh.join(broadcast(testSh), "shingle")
        .groupBy("train_doc", "test_doc")
        .agg(count(lit(1)).as("n_shared"))
    },
    Some(contamOracle))

  /** Shared oracle for c01/c02: both compute the exact train×test
    * shared-shingle counts (c02's bloom stage is a prefilter only — it
    * never changes the result, just where the work happens).
    */
  private lazy val contamOracle = s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, $duckUnitHash AS u
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, u,
                    ${(0 until ContamN).map(k => s"toks[i.i+${k + 1}]").mkString(" || ' ' || ")} AS shingle
             FROM t, (SELECT unnest(range(${Dedup.MaxShinglePositions})) AS i) i
             WHERE len(toks) >= $ContamN AND i.i <= len(toks) - $ContamN)
      SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc, count(*) AS n_shared
      FROM sh tr JOIN sh te USING (shingle)
      WHERE tr.u < 0.9 AND te.u >= 0.95
      GROUP BY 1, 2
    """.trim

  // -- c02: the 100-TB shape of c01. The test split is tiny but its
  //    shingle *relation* is still too wide to broadcast-join against
  //    every train shingle at full corpus scale, so: (1) sketch the
  //    test shingles into a bloom filter (~1.8 MB at fpp 1e-3 for 2^20
  //    items — constant-size no matter the corpus); (2) drop >99.9% of
  //    train shingles MAP-SIDE against the broadcast sketch — no
  //    shuffle touches the non-matching bulk; (3) exact-verify the
  //    survivors with the same equi-join as c01. Bloom false positives
  //    die in step 3, so the output is bit-identical to c01 (same
  //    oracle) while the shuffled volume scales with the contamination
  //    rate, not the corpus size.
  private val c02 = Q(
    "c02_contamination_bloom",
    (s, d) => {
      val sh = Dedup.shingles(Tables.documents(s, d), ContamN)
        .withColumn("u", unitHash(col("doc_id")))
      val testSh = sh.filter(col("u") >= 0.95)
        .select(col("doc_id").as("test_doc"), col("shingle"))
      val trainSh = sh.filter(col("u") < 0.9)
        .select(col("doc_id").as("train_doc"), col("shingle"))
      // two-pass by design: pass 1 aggregates the test shingles into a
      // fixed-size sketch on the driver; pass 2 streams the train side.
      // Both passes use Spark's native codegen bloom expressions (the
      // same pair Catalyst's runtime-filter rewrite injects): the probe
      // stays inside whole-stage codegen on the full train-side scan
      // instead of breaking it with a per-row ScalaUDF.
      import org.apache.spark.sql.graftbridge.Bridge
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      val nItems = 1L << 20
      val nBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(nItems, 1e-3)
      val bfAgg = Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(col("shingle"))),
        Literal(nItems), Literal(nBits)).toAggregateExpression())
      val bfBytes = testSh.select(bfAgg.as("bf")).head().getAs[Array[Byte]](0)
      val mightContain = Bridge.column(BloomFilterMightContain(
        Literal.create(bfBytes, BinaryType),
        Bridge.expression(xxhash64(col("shingle")))))
      trainSh.filter(col("shingle").isNotNull && mightContain)
        .join(broadcast(testSh), "shingle")
        .groupBy("train_doc", "test_doc")
        .agg(count(lit(1)).as("n_shared"))
    },
    Some(contamOracle))

  /** c03 verdict threshold: a train doc is flagged when >= 20% of its
    * distinct 5-grams appear anywhere in the test split.
    */
  val ContamRatio = 0.2

  // -- c03: per-document contamination RATIO + verdict — the doc-level
  //    decision layer over c01/c02's pair counts (the published
  //    decontamination recipes drop a train doc when the overlapping
  //    fraction of its n-grams crosses a threshold, not on first
  //    collision). The test split's distinct shingle HASHES collapse
  //    to one corpus-independent set (tiny: |test shingles|, not
  //    |test docs| x positions) broadcast against the train side, so
  //    the verdict is one map-side left join + one doc-keyed
  //    aggregation — no train x test pair blow-up at any corpus size;
  //    at 100 TB the broadcast set swaps for c02's bloom prefilter
  //    with an exact-verify tail, same output. The ratio is one
  //    bigint/bigint double division (exact IEEE both engines) and
  //    the verdict compares that raw double against the threshold —
  //    rounding only the emitted image (t05's rank-on-raw rule).
  private val c03 = Q(
    "c03_contamination_ratio",
    (s, d) => {
      // h64-only consumer: the compiled one-pass shingle+hash kernel
      // (Dedup.shingleH64) — no shingle strings ever materialize
      val sh = Dedup.shingleH64(Tables.documents(s, d), ContamN)
        .withColumn("u", unitHash(col("doc_id")))
      val testSet = sh.filter(col("u") >= 0.95)
        .select(col("h64")).distinct()
        .withColumn("hit", lit(1L))
      val ratio = col("n_hit") / col("n_shingles")
      sh.filter(col("u") < 0.9)
        .join(broadcast(testSet), Seq("h64"), "left")
        .groupBy(col("doc_id").as("train_doc"))
        .agg(
          count(lit(1)).as("n_shingles"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
        .select(
          col("train_doc"), col("n_shingles"), col("n_hit"),
          round(ratio, 6).as("hit_ratio"),
          (ratio >= lit(ContamRatio)).as("contaminated"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, $duckUnitHash AS u
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, u,
                    CAST(concat('0x', substr(md5(
                      ${(0 until ContamN).map(k => s"toks[i.i+${k + 1}]").mkString(" || ' ' || ")}
                    ), 1, 15)) AS BIGINT) AS h64
             FROM t, (SELECT unnest(range(${Dedup.MaxShinglePositions})) AS i) i
             WHERE len(toks) >= $ContamN AND i.i <= len(toks) - $ContamN),
      te AS (SELECT DISTINCT h64 FROM sh WHERE u >= 0.95),
      agg AS (SELECT tr.doc_id AS train_doc,
                     count(*) AS n_shingles,
                     SUM(CASE WHEN te.h64 IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
              FROM sh tr LEFT JOIN te ON tr.h64 = te.h64
              WHERE tr.u < 0.9
              GROUP BY 1)
      SELECT train_doc, n_shingles, CAST(n_hit AS BIGINT) AS n_hit,
             round(CAST(n_hit AS DOUBLE) / n_shingles, 6) AS hit_ratio,
             CAST(n_hit AS DOUBLE) / n_shingles >= $ContamRatio AS contaminated
      FROM agg
    """.trim))

  /** c05's excision kernel, shared VERBATIM with the streaming gate's
    * excise arm ([[graft.streaming.ContamGate]]) so batch ≡ stream is
    * structural, not a re-implementation: per-POSITION shingles under
    * the same start cap and md5 image as c01's machinery
    * (Dedup.shingles dedups strings, so it cannot carry positions).
    * Input needs (doc_id, toks); output (doc_id, start, h64).
    */
  private[graft] def positionShingles(docsWithToks: DataFrame): DataFrame =
    docsWithToks.filter(size(col("toks")) >= ContamN)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, least(size(toks) - $ContamN, ${Dedup.MaxShinglePositions - 1})), " +
          s"i -> concat_ws(' ', slice(toks, i + 1, $ContamN)))")).as(Seq("start", "shingle")))
      .withColumn("h64", graft.functions.ColumnFns.md5_prefix64(col("shingle")))

  /** the other half of the shared kernel: the map-side indexed filter
    * that drops every token covered by a hit 5-gram window — needs
    * `toks` and `hit_starts` in scope
    */
  private[graft] def exciseKept: Column = expr(
    s"filter(toks, (t, p) -> NOT exists(hit_starts, x -> p >= x AND p <= x + ${ContamN - 1}))")

  // -- c05: contamination span EXCISION — the surgical counterpart of
  //    c03's drop verdict: published decontamination recipes REMOVE
  //    the matched n-gram spans and keep the rest of the document
  //    (dropping whole docs at crawl scale wastes the clean 99%). A
  //    train token is excised when ANY test 5-gram window covers it.
  //    Per-POSITION shingles (same start cap and md5 image as c01's
  //    machinery — Dedup.shingles dedups strings, so it cannot carry
  //    positions) semi-join the broadcast test-hash set; the hit
  //    STARTS collect per doc (contamination-bounded, the c02
  //    argument — a clean corpus collects nothing); the excision
  //    itself is one map-side indexed filter over the token array,
  //    exists(hit_starts, x -> x <= p <= x+4). Shuffled volume
  //    follows the contamination rate, never the corpus; every train
  //    doc emits exactly one row (untouched docs excise zero tokens,
  //    clean_text = the rejoined original).
  private val c05 = Q(
    "c05_contamination_excise",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("u", unitHash(col("doc_id")))
      val testH = Dedup.shingleH64(
          Tables.documents(s, d)
            .withColumn("u", unitHash(col("doc_id"))).filter(col("u") >= 0.95), ContamN)
        .select("h64").distinct()
      val hits = positionShingles(docs.filter(col("u") < 0.9))
        .join(broadcast(testH), "h64")
        .groupBy("doc_id").agg(collect_set(col("start")).as("hit_starts"))
      docs.filter(col("u") < 0.9)
        .join(hits, Seq("doc_id"), "left")
        .withColumn("hit_starts", coalesce(col("hit_starts"), expr("CAST(array() AS array<int>)")))
        .select(
          col("doc_id"),
          size(col("toks")).cast(LongType).as("n_toks"),
          (size(col("toks")) - size(exciseKept)).cast(LongType).as("n_removed"),
          array_join(exciseKept, " ").as("clean_text"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, $duckUnitHash AS u
                 FROM documents),
      sh AS (SELECT doc_id, u, i.i AS s,
                    CAST(concat('0x', substr(md5(
                      ${(0 until ContamN).map(k => s"toks[i.i+${k + 1}]").mkString(" || ' ' || ")}
                    ), 1, 15)) AS BIGINT) AS h64
             FROM t, (SELECT unnest(range(${Dedup.MaxShinglePositions})) AS i) i
             WHERE len(toks) >= $ContamN AND i.i <= len(toks) - $ContamN),
      te AS (SELECT DISTINCT h64 FROM sh WHERE u >= 0.95),
      hits AS (SELECT DISTINCT tr.doc_id, tr.s FROM sh tr JOIN te USING (h64)
               WHERE tr.u < 0.9),
      rm AS (SELECT DISTINCT h.doc_id, h.s + k.k AS p
             FROM hits h, (SELECT unnest(range($ContamN)) AS k) k),
      train AS (SELECT doc_id, toks FROM t WHERE u < 0.9),
      tok AS (SELECT doc_id, unnest(range(len(toks))) AS p FROM train),
      keep AS (SELECT tk.doc_id, tk.p FROM tok tk
               ANTI JOIN rm ON rm.doc_id = tk.doc_id AND rm.p = tk.p),
      clean AS (SELECT k.doc_id, count(*) AS n_kept,
                       array_to_string(list(tr.toks[k.p + 1] ORDER BY k.p), ' ') AS clean_text
                FROM keep k JOIN train tr USING (doc_id) GROUP BY 1)
      SELECT tr.doc_id, CAST(len(tr.toks) AS BIGINT) AS n_toks,
             CAST(len(tr.toks) - coalesce(c.n_kept, 0) AS BIGINT) AS n_removed,
             coalesce(c.clean_text, '') AS clean_text
      FROM train tr LEFT JOIN clean c USING (doc_id)
    """.trim))

  // -- v01: corpus vocabulary — top-1000 terms by frequency (the
  //    tokenizer-training view). The window runs over the POST-agg
  //    vocabulary (distinct terms), not the corpus: a global top-k on
  //    agg output is a single-reduce TakeOrdered at any corpus size.
  private val v01 = Q(
    "v01_vocab_topk",
    (s, d) => {
      val terms = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("cnt").desc, col("term"))
      terms
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 1000)
    },
    Some("""
      SELECT * FROM (
        SELECT term, count(*) AS cnt,
               CAST(row_number() OVER (ORDER BY count(*) DESC, term) AS BIGINT) AS rank
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY term)
      WHERE rank <= 1000
    """.trim))

  // -- v07: vocabulary COVERAGE — per-source OOV rate against the
  //    v01-style frequency-ranked vocabulary, truncated to the top
  //    [[V07VocabSize]] types (deliberately smaller than the corpus
  //    type count so coverage is non-trivial). The question a tokenizer
  //    team asks before shipping a vocab: which sources fall outside
  //    it, and by how much. 100 TB shape: the vocab is an aggregate
  //    (type-count rows) broadcast to a map-side left join over the
  //    token stream; one corpus-wide shuffle for the type counts, one
  //    map-side-combined groupBy(source) — no token-keyed join against
  //    anything corpus-sized. oov_rate follows the 6-dp rounding
  //    parity discipline (computed on exact BIGINT counts).
  private val V07VocabSize = 16
  private val v07 = Q(
    "v07_vocab_coverage",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val w = Window.orderBy(col("cnt").desc, col("term"))
      val vocab = docs
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= V07VocabSize)
        .select(col("term"), lit(1L).as("in_vocab"))
      docs
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .join(broadcast(vocab), Seq("term"), "left")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(coalesce(col("in_vocab"), lit(0L))).as("n_in_vocab"),
          countDistinct(when(col("in_vocab").isNull, col("term"))).as("oov_types"))
        .withColumn("oov_rate",
          round((col("n_tokens") - col("n_in_vocab")) / col("n_tokens").cast(DoubleType), 6))
        .select("source", "n_tokens", "n_in_vocab", "oov_types", "oov_rate")
    },
    Some(s"""
      WITH vocab AS (
        SELECT term FROM (
          SELECT term, row_number() OVER (ORDER BY count(*) DESC, term) AS rank
          FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
          GROUP BY term)
        WHERE rank <= $V07VocabSize),
      toks AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
      SELECT t.source,
             count(*) AS n_tokens,
             CAST(SUM(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
             CAST(count(DISTINCT CASE WHEN v.term IS NULL THEN t.term END) AS BIGINT) AS oov_types,
             round(CAST(count(*) - SUM(CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*), 6) AS oov_rate
      FROM toks t LEFT JOIN vocab v ON v.term = t.term
      GROUP BY t.source
    """.trim))

  // -- p04: domain-mixing weights — per-(source, lang) token shares and
  //    the sampling weight that would flatten the mixture to uniform
  //    across strata (weight = target_share / actual_share; a target
  //    mixture table would be a broadcast dim in production). One
  //    map-side-combined aggregation over the corpus; the weight math
  //    runs on the aggregate (strata-sized) frame.
  private val p04 = Q(
    "p04_source_mix",
    (s, d) => {
      val agg = Tables.documents(s, d)
        .groupBy("source", "lang")
        .agg(
          count(lit(1)).as("docs"),
          sum(size(split(col("text"), " ")).cast(LongType)).as("tokens"))
      val w = Window.partitionBy(lit(1))
      agg
        .withColumn("token_share",
          round(col("tokens") / sum(col("tokens")).over(w).cast(DoubleType), 6))
        .withColumn("weight",
          round((lit(1.0) / count(lit(1)).over(w)) /
            (col("tokens") / sum(col("tokens")).over(w).cast(DoubleType)), 6))
        .select("source", "lang", "docs", "tokens", "token_share", "weight")
    },
    Some("""
      WITH agg AS (SELECT source, lang, count(*) AS docs,
                          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
                   FROM documents GROUP BY 1, 2)
      SELECT source, lang, docs, tokens,
             round(tokens / CAST(SUM(tokens) OVER () AS DOUBLE), 6) AS token_share,
             round((1.0 / COUNT(*) OVER ()) /
                   (tokens / CAST(SUM(tokens) OVER () AS DOUBLE)), 6) AS weight
      FROM agg
    """.trim))

  // -- p05: sequence-length bucketing — equal-population token-length
  //    buckets (ntile semantics ordered by (n_tokens, doc_id)) plus the
  //    per-bucket padding-waste fraction, the metric that says how much
  //    batch compute padding burns if batches form within the bucket.
  //    Scale design: NO global single-partition window. A doc's global
  //    position decomposes as cum_before(its length) + rank within its
  //    length: the rank window is key-partitioned by n_tokens, and the
  //    cumulative window runs over the distinct-length frame (bounded by
  //    max doc length, corpus-size-independent, broadcast back). The
  //    bucket is then pure arithmetic on (pos, N) — exact ntile, zero
  //    global sorts at any corpus size.
  private val p05 = Q(
    "p05_length_buckets",
    (s, d) => {
      val B = 8
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      val rn = toks.withColumn("rn",
        row_number().over(Window.partitionBy("n_tokens").orderBy("doc_id")).cast(LongType))
      val lenCum = toks.groupBy("n_tokens").agg(count(lit(1)).as("cnt"))
        .withColumn("cum_before",
          coalesce(sum("cnt").over(
            Window.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("n_tokens", "cum_before")
      val totals = toks.agg(count(lit(1)).as("n_total"))
      rn.join(broadcast(lenCum), "n_tokens")
        .crossJoin(broadcast(totals))
        .withColumn("pos", col("cum_before") + col("rn") - 1)
        // exact ntile(B): first (N % B) buckets hold (N DIV B)+1 rows
        .withColumn("bucket", expr(
          s"""CAST(CASE WHEN pos < (n_total % $B) * (n_total DIV $B + 1)
                        THEN pos DIV (n_total DIV $B + 1)
                        ELSE (n_total % $B) +
                             (pos - (n_total % $B) * (n_total DIV $B + 1)) DIV (n_total DIV $B)
                   END + 1 AS BIGINT)"""))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          min("n_tokens").as("min_tokens"),
          max("n_tokens").as("max_tokens"),
          round(lit(1.0) -
            sum("n_tokens").cast(DoubleType) / (max("n_tokens") * count(lit(1))), 6)
            .as("padding_frac"))
    },
    Some("""
      WITH toks AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
      b AS (SELECT doc_id, n_tokens,
                   ntile(8) OVER (ORDER BY n_tokens, doc_id) AS bucket
            FROM toks)
      SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
             min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
             round(1 - CAST(SUM(n_tokens) AS DOUBLE) / (MAX(n_tokens) * COUNT(*)), 6) AS padding_frac
      FROM b GROUP BY 1
    """.trim))

  // -- v02: BPE merge candidates — adjacent character-pair frequencies
  //    over the corpus vocabulary (the first iteration of byte-pair
  //    encoding, the tokenizer-training primitive). Pair counting runs
  //    over the DISTINCT vocabulary weighted by word frequency, so the
  //    explode is vocab-sized, not corpus-sized — at 100 TB the vocab
  //    aggregate is the only corpus-wide pass; the per-word char loop
  //    is a HOF over ≤ vocab rows.
  private val v02 = Q(
    "v02_bpe_top_pairs",
    (s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("wc"))
        .filter(length(col("word")) >= 2)
      val pairs = vocab
        .select(col("wc"),
          explode(expr(
            "transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")).as("pair"))
        .groupBy("pair").agg(sum(col("wc")).as("cnt"))
      val w = Window.orderBy(col("cnt").desc, col("pair"))
      pairs.withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 20)
    },
    Some("""
      WITH vocab AS (SELECT word, count(*) AS wc
                     FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
                     GROUP BY word),
      pairs AS (SELECT substr(word, i.i, 2) AS pair, CAST(SUM(wc) AS BIGINT) AS cnt
                FROM vocab, (SELECT unnest(range(1, 1000)) AS i) i
                WHERE len(word) >= 2 AND i.i <= len(word) - 1
                GROUP BY 1)
      SELECT * FROM (
        SELECT pair, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank
        FROM pairs)
      WHERE rank <= 20
    """.trim))

  // -- v03: collocation extraction — adjacent-bigram LIFT over unigram
  //    frequencies (observed/expected co-occurrence), the standard
  //    measure behind multi-word-token and tokenizer-merge decisions.
  //    Lift instead of PMI keeps the oracle bit-exact: PMI's ln()
  //    differs in the last ulp across engines' libm, while lift is a
  //    chain of double multiplies in the same association order on both
  //    engines (each count cast to double individually BEFORE the
  //    product, so nothing overflows Long at corpus scale). 100 TB shape:
  //    two hash aggregations (bigram + unigram counts) and a broadcast
  //    of the unigram table slice the candidates touch; the explode is
  //    map-side.
  // -- v04: one BPE merge ROUND — the iterative step v02's pair counts
  //    feed: pick the most frequent adjacent pair (lexicographic
  //    tie-break), merge its occurrences greedily left-to-right, and
  //    recount pairs over the merged stream (the input to the next
  //    round). Greedy non-overlap is expressed position-algebraically
  //    so both engines compute the identical merge: consecutive match
  //    positions form islands (i - running_match_count is constant per
  //    island), and a match merges iff its island offset is even —
  //    exactly left-to-right consumption, covering the w1 = w2 run
  //    case ("x x x x" merges twice, not thrice). 100 TB shape: two
  //    window passes partitioned by doc_id + a 1-row broadcast of the
  //    chosen pair; every shuffle is doc-keyed, nothing global but the
  //    final top-20.
  /** v04's merge round over any (doc_id, text) frame — public so the
    * planted-fixture spec can pin the greedy semantics ("x x x x"
    * merges twice, never thrice) on hand-built corpora.
    */
  def bpeMergeRound(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val wDoc = Window.partitionBy("doc_id").orderBy("i")
      val toks = docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
      val top = toks
        .withColumn("wn", lead(col("w"), 1).over(wDoc))
        .filter(col("wn").isNotNull)
        .groupBy(col("w").as("p1"), col("wn").as("p2")).agg(count(lit(1)).as("tc"))
        .orderBy(col("tc").desc, col("p1"), col("p2")).limit(1)
        .select("p1", "p2")
      val wIsl = Window.partitionBy("doc_id", "island").orderBy("i")
      val stream = toks
        .withColumn("wn", lead(col("w"), 1).over(wDoc))
        .crossJoin(broadcast(top))
        .withColumn("m",
          coalesce(col("w") === col("p1") && col("wn") === col("p2"), lit(false)))
        .withColumn("mrn", sum(when(col("m"), 1L).otherwise(0L)).over(wDoc))
        .withColumn("island", when(col("m"), col("i") - col("mrn")))
        .withColumn("rel", when(col("m"), row_number().over(wIsl) - 1))
        .withColumn("start", col("m") && col("rel") % 2 === 0)
        .withColumn("consumed", coalesce(lag(col("start"), 1).over(wDoc), lit(false)))
        .filter(!col("consumed"))
        .withColumn("tok",
          when(col("start"), concat(col("p1"), lit("_"), col("p2"))).otherwise(col("w")))
      val wr = Window.orderBy(col("pc").desc, col("w1"), col("w2"))
      stream
        .withColumn("nw", lead(col("tok"), 1).over(wDoc))
        .filter(col("nw").isNotNull)
        .groupBy(col("tok").as("w1"), col("nw").as("w2")).agg(count(lit(1)).as("pc"))
        .withColumn("rank", row_number().over(wr).cast(LongType))
        .filter(col("rank") <= 20)
        .select("rank", "w1", "w2", "pc")
  }

  private val v04 = Q(
    "v04_bpe_merge_round",
    (s, d) => bpeMergeRound(Tables.documents(s, d)),
    Some("""
      WITH t AS (SELECT doc_id, i.i AS i, toks[i.i+1] AS w
                 FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
                      (SELECT unnest(range((SELECT max(len(string_split(text, ' '))) FROM documents))) AS i) i
                 WHERE i.i < len(toks)),
      pr AS (SELECT w, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS wn FROM t),
      top AS (SELECT w AS p1, wn AS p2 FROM pr WHERE wn IS NOT NULL
              GROUP BY 1, 2 ORDER BY count(*) DESC, 1, 2 LIMIT 1),
      m1 AS (SELECT t.doc_id, t.i, t.w, top.p1, top.p2,
                    coalesce(t.w = top.p1 AND
                             lead(t.w) OVER (PARTITION BY t.doc_id ORDER BY t.i) = top.p2,
                             false) AS m
             FROM t, top),
      m2 AS (SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY i) AS mrn FROM m1),
      m3 AS (SELECT *, CASE WHEN m THEN i - mrn END AS island FROM m2),
      m4 AS (SELECT *, CASE WHEN m THEN row_number()
                         OVER (PARTITION BY doc_id, island ORDER BY i) - 1 END AS rel FROM m3),
      m5 AS (SELECT *, coalesce(m AND rel % 2 = 0, false) AS start FROM m4),
      m6 AS (SELECT *, coalesce(lag(start) OVER (PARTITION BY doc_id ORDER BY i), false) AS consumed
             FROM m5),
      s AS (SELECT doc_id, i,
                   CASE WHEN start THEN p1 || '_' || p2 ELSE w END AS tok
            FROM m6 WHERE NOT consumed),
      r AS (SELECT tok AS w1, lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS w2 FROM s),
      c AS (SELECT w1, w2, count(*) AS pc FROM r WHERE w2 IS NOT NULL GROUP BY 1, 2)
      SELECT * FROM (
        SELECT CAST(row_number() OVER (ORDER BY pc DESC, w1, w2) AS BIGINT) AS rank,
               w1, w2, CAST(pc AS BIGINT) AS pc
        FROM c) WHERE rank <= 20
    """.trim))

  // -- p10: fractional-EPOCH repetition schedule — data recipes assign
  //    per-source epoch factors like "src0 x 2.3" (high-quality sources
  //    repeat, low-quality subsample): every doc emits floor(f) copies
  //    plus one more iff an independent '#e'-salted doc hash falls
  //    under the fractional part, so a 2.3-factor source contributes
  //    EXACTLY its docs twice plus a deterministic 30% third-epoch
  //    subset — in expectation and replay-stably (pure function of
  //    doc_id, the p01/p08 discipline). Factors are (whole, frac)
  //    literal pairs, so no engine computes frac(2.3) in floats. The
  //    copy fan-out is a map-side explode of a bounded sequence; no
  //    shuffle anywhere — the schedule runs at scan speed at any
  //    corpus size.
  private val p10 = Q(
    "p10_epoch_schedule",
    (s, d) => {
      val whole = when(col("source") === "src0", 2L)
        .when(col("source") === "src1", 1L)
        .when(col("source") === "src2", 0L)
        .otherwise(1L)
      val frac = when(col("source") === "src0", 0.3)
        .when(col("source") === "src1", 0.0)
        .when(col("source") === "src2", 0.4)
        .otherwise(0.5)
      val u = graft.functions.ColumnFns.md5_prefix64(
        concat(col("doc_id").cast(StringType), lit("#e"))) /
        lit(1152921504606846976.0) // 2^60, the house unit hash
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          (whole + (u < frac).cast(LongType)).as("n_copies"))
        .filter(col("n_copies") > 0L)
        .select(col("doc_id"), col("source"), col("n_copies"),
          explode(expr("sequence(0L, n_copies - 1)")).as("epoch_idx"))
    },
    Some(s"""
      WITH a AS (SELECT doc_id, source,
          CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
                      WHEN 'src2' THEN 0 ELSE 1 END
          + CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#e'), 1, 15)) AS BIGINT)
                      / 1152921504606846976.0
                   < CASE source WHEN 'src0' THEN 0.3 WHEN 'src1' THEN 0.0
                                 WHEN 'src2' THEN 0.4 ELSE 0.5 END
                 THEN 1 ELSE 0 END AS n_copies
        FROM documents)
      SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
             CAST(e.e AS BIGINT) AS epoch_idx
      FROM a, (SELECT unnest(range(4)) AS e) e
      WHERE n_copies > 0 AND e.e < n_copies
    """.trim))

  /** the pair-frequency argmax of one BPE round, over a stream whose
    * `toks` column holds each doc's CURRENT token array: adjacent
    * pairs are exploded map-side (the v03 pair idiom — the `size >= 2`
    * guard keeps `sequence` off its descending branch), partially
    * aggregated, and reduced to the single (tc desc, p1, p2) winner.
    * Multiset-identical to the old exploded-stream `lead` formulation
    * (per doc of n tokens, its n-1 adjacent pairs), with the same tie
    * order — but with NO doc_id exchange and NO window sort: the only
    * shuffle is the distinct-pair partial-aggregate merge.
    */
  private def pairTop(in: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    in.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS p1, toks[i+1] AS p2))")).as("p"))
      .select(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("tc"))
      .orderBy(col("tc").desc, col("p1"), col("p2")).limit(1)

  /** Drive `rounds` BPE merge rounds over a (…, toks) stream of
    * per-doc token ARRAYS with bounded cache residency. Each round:
    * persist the stream, collect the 1-row winning pair (which
    * populates the cache — the pair aggregate scans it fully), release
    * the PREVIOUS round's cache, then rewrite the stream as a pure map
    * with the pair compiled into ONE
    * [[graft.functions.BpeMergeGreedy]] expression (the merge is
    * greedy-left-to-right — CurationKernelSpec pins it row-for-row
    * against the window-algebra island election this replaces; the
    * generated oracle CTEs still run that algebra verbatim, so parity
    * is oracle-checked every round). An empty winner (no adjacent pair
    * anywhere) leaves the round a no-op — the image of the old LEFT
    * join's null-pair branch.
    *
    * The per-round persist is load-bearing exactly as before: both the
    * next round's pair count and the final consumer read each stream,
    * and without the barrier round r would re-run round r-1's lineage
    * twice (2^rounds corpus scans by the last round). MEMORY_AND_DISK
    * spills corpus-sized rounds; the 100 TB shape checkpoints each
    * round to the lake. Per-round cost drops from (full-stream doc_id
    * exchange + two window sorts over every token ROW) to (map-side
    * pair explode + distinct-pair aggregate + compiled array rewrite)
    * — the token stream itself never shuffles in any round.
    *
    * Returns (collected (round, p1, p2, tc) rows, the final merged
    * stream, the final round's still-cached handle — at most ONE
    * cached round per run; callers that don't consume the stream
    * (v05) unpersist the handle immediately).
    */
  private def mergeRounds(toks: org.apache.spark.sql.DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long)], org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    var stream = toks
    var prev: org.apache.spark.sql.DataFrame = null
    val rows = Seq.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val in = stream.persist()
      val winner = pairTop(in).collect()
      for (row <- winner)
        rows += ((r.toLong, row.getString(0), row.getString(1), row.getLong(2)))
      if (prev != null) prev.unpersist()
      prev = in
      stream = winner.headOption match {
        case Some(row) => in.withColumn("toks",
          graft.functions.ColumnFns.bpe_merge(
            col("toks"), row.getString(0), row.getString(1)))
        case None => in
      }
    }
    (rows.result(), stream, prev)
  }

  /** rounds of BPE training v05 runs (and its oracle mirrors) */
  val BpeRounds = 3

  /** shared oracle scaffolding for v05/v06: the positional token CTE
    * `t0` plus [[BpeRounds]] chained merge-round CTE blocks ending in
    * `t<BpeRounds>` (and per-round `top<r>` winners) — generated by
    * the same loop that drives the engine rounds.
    */
  private lazy val bpeRoundsCte: String = {
    val base = """t0 AS (SELECT doc_id, i.i AS i, toks[i.i+1] AS w
                 FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
                      (SELECT unnest(range((SELECT max(len(string_split(text, ' '))) FROM documents))) AS i) i
                 WHERE i.i < len(toks))"""
    val rounds = (1 to BpeRounds).map { r =>
      val in = s"t${r - 1}"
      s"""
      pr$r AS (SELECT w, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS wn FROM $in),
      top$r AS (SELECT w AS p1, wn AS p2, count(*) AS tc FROM pr$r WHERE wn IS NOT NULL
              GROUP BY 1, 2 ORDER BY count(*) DESC, 1, 2 LIMIT 1),
      m1$r AS (SELECT t.doc_id, t.i, t.w, top$r.p1, top$r.p2,
                    coalesce(t.w = top$r.p1 AND
                             lead(t.w) OVER (PARTITION BY t.doc_id ORDER BY t.i) = top$r.p2,
                             false) AS m
             FROM $in t LEFT JOIN top$r ON true),
      m2$r AS (SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY i) AS mrn FROM m1$r),
      m3$r AS (SELECT *, CASE WHEN m THEN i - mrn END AS island FROM m2$r),
      m4$r AS (SELECT *, CASE WHEN m THEN row_number()
                         OVER (PARTITION BY doc_id, island ORDER BY i) - 1 END AS rel FROM m3$r),
      m5$r AS (SELECT *, coalesce(m AND rel % 2 = 0, false) AS start FROM m4$r),
      m6$r AS (SELECT *, coalesce(lag(start) OVER (PARTITION BY doc_id ORDER BY i), false) AS consumed
             FROM m5$r),
      t$r AS (SELECT doc_id, i,
                   CASE WHEN start THEN p1 || '_' || p2 ELSE w END AS w
            FROM m6$r WHERE NOT consumed)"""
    }.mkString(",")
    s"$base,$rounds"
  }

  // -- p11: WEIGHTED sampling without replacement (the A-ES /
  //    Efraimidis-Spirakis exponential-key scheme): every doc gets key
  //    u^(1/w) with u = the deterministic unit hash and w = n_chars
  //    (longer docs carry more training tokens, so length-proportional
  //    inclusion is the natural prior); the sample is the global
  //    top-100 keys. This IS distributed weighted reservoir sampling:
  //    keys are map-side pure functions, the top-N is a single-reduce
  //    TakeOrdered (no global sort, no driver state), and the same
  //    keys make the sample incrementally maintainable (a new batch's
  //    keys compete against the standing sample's min key). Parity:
  //    pow is transcendental, so both engines compare the 6-dp-rounded
  //    key image with doc_id tiebreak (the x05 keep-rate discipline) —
  //    rank ties resolve identically on both sides.
  private val p11 = Q(
    "p11_weighted_sample",
    (s, d) => {
      val key = round(
        pow(unitHash(col("doc_id")), lit(1.0) / col("n_chars")), 6)
      val pool = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"), key.as("key"))
        .orderBy(col("key").desc, col("doc_id").asc)
        .limit(100)
      val w = Window.orderBy(col("key").desc, col("doc_id").asc)
      pool.withColumn("rank", row_number().over(w).cast(LongType))
    },
    Some(s"""
      WITH keyed AS (SELECT doc_id, source, n_chars,
                       round(pow($duckUnitHash, 1.0 / n_chars), 6) AS key
                     FROM documents),
      pool AS (SELECT * FROM keyed ORDER BY key DESC, doc_id ASC LIMIT 100)
      SELECT doc_id, source, n_chars, key,
             CAST(row_number() OVER (ORDER BY key DESC, doc_id ASC) AS BIGINT) AS rank
      FROM pool
    """.trim))

  /** p12 window geometry: 64-token windows every 48 tokens (16-token
    * overlap); a non-first window must cover at least W - S = 16 fresh
    * tokens or it is dropped as a sliver
    */
  val WindowToks = 64
  val WindowStride = 48

  // -- p12: overlapping CONTEXT-WINDOW chunking — the long-document
  //    counterpart of p03's packing and the text image of m05's
  //    hop < window audio framing: split each doc's token stream into
  //    fixed windows (64 tokens, stride 48 — the overlap that keeps a
  //    boundary sentence inside at least one window, the recipe both
  //    long-context pretraining chunkers and RAG indexers use),
  //    emitting per window its index, token offset, width and the
  //    materialized slice. A window is kept when it is the doc's first
  //    or contributes at least ONE fresh token (remaining > W - S: the
  //    previous window, stride S back and W wide, already covers the
  //    next W - S tokens, so a tail window with exactly W - S left is
  //    100% redundant content — dropped; anything with a fresh token
  //    is kept, so no text is silently dropped) — and because starts
  //    ascend, the filter only ever trims the tail, so window
  //    indexes stay dense. Pure map-side explode over sequence():
  //    no shuffle, no corpus state, linear at any scale.
  private val p12 = Q(
    "p12_context_windows",
    (s, d) => {
      val (w, st) = (WindowToks, WindowStride)
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n"), col("toks"),
          posexplode(expr(
            s"filter(sequence(0, size(toks) - 1, $st), x -> x = 0 OR size(toks) - x > ${w - st})"))
            .as(Seq("win_idx", "start_tok")))
        .select(
          col("doc_id"),
          col("win_idx").cast(LongType).as("win_idx"),
          col("start_tok").cast(LongType).as("start_tok"),
          least(lit(w), col("n") - col("start_tok")).cast(LongType).as("win_toks"),
          expr(s"array_join(slice(toks, start_tok + 1, least($w, n - start_tok)), ' ')")
            .as("win_text"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g AS (SELECT doc_id, len(toks) AS n, toks,
                   unnest(range(0, len(toks), $WindowStride)) AS start
            FROM t),
      w AS (SELECT doc_id, n, toks, start,
              row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS win_idx
            FROM g WHERE start = 0 OR n - start > ${WindowToks - WindowStride})
      SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
             CAST(start AS BIGINT) AS start_tok,
             CAST(least($WindowToks, n - start) AS BIGINT) AS win_toks,
             array_to_string(toks[start + 1 : start + least($WindowToks, n - start)], ' ') AS win_text
      FROM w
    """.trim))

  // -- v05: MULTI-ROUND BPE training — v04's single greedy merge round
  //    iterated to a merge LIST, the actual tokenizer-training loop
  //    (count pairs -> adopt the winner -> re-merge the stream ->
  //    recount). Emits each round's learned merge with its pre-merge
  //    frequency: the merge table a BPE tokenizer ships. Every round
  //    runs over per-doc token ARRAYS — a map-side pair explode for
  //    the count and one compiled merge expression for the rewrite
  //    ([[mergeRounds]]), so a round costs one stream pass with no
  //    stream shuffle at any corpus size and the loop is rounds x
  //    linear (rounds is the vocab-size knob, corpus-independent). The
  //    oracle chains the equivalent window-algebra CTE block per round
  //    — the greedy-merge parity is oracle-checked on every run (plus
  //    CurationKernelSpec's row-level pin of the compiled kernel).
  private val v05 = Q(
    "v05_bpe_train",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val (rows, _, lastHandle) = mergeRounds(toks, BpeRounds)
      // v05's output is only the merge list — the final stream is never
      // consumed, so the last round's cache is released right away and
      // the result is the BpeRounds collected 1-row winners (the
      // iterative-algorithm driver pattern: per-round barriers ARE
      // driver-coordinated, and a 1-row collect per round is bounded)
      if (lastHandle != null) lastHandle.unpersist()
      import s.implicits._
      rows.toDF("round", "p1", "p2", "tc")
    },
    Some {
      val union = (1 to BpeRounds)
        .map(r => s"SELECT CAST($r AS BIGINT) AS round, p1, p2, CAST(tc AS BIGINT) AS tc FROM top$r")
        .mkString(" UNION ALL ")
      s"WITH $bpeRoundsCte\n      $union".trim
    })

  // -- v06: APPLY the trained tokenizer — v05's loop re-run with the
  //    merged stream carried through to the end, reporting per-doc
  //    token counts before and after the learned merges (the
  //    compression the tokenizer actually buys, the number a data
  //    team watches per source). Training and application share
  //    [[mergeRounds]] verbatim, so v05/v06 cannot drift apart; the
  //    oracle reuses the identical generated CTE chain with a per-doc
  //    count tail instead of the merge-list head. n_raw rides the
  //    stream from round 0 (size of the pre-merge array == t0's
  //    per-doc cardinality) and n_bpe is the final array's size, so
  //    the whole report is a pure map over the last round's cache —
  //    the groupBy(doc_id) count and the raw-side join are gone.
  private val v06 = Q(
    "v06_bpe_apply",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n_raw", size(col("toks")).cast(LongType))
      val (_, stream, _) = mergeRounds(toks, BpeRounds)
      stream
        .select(col("doc_id"), col("n_raw"),
          size(col("toks")).cast(LongType).as("n_bpe"))
        .select(col("doc_id"), col("n_raw"), col("n_bpe"),
          (col("n_raw") - col("n_bpe")).as("n_saved"))
    },
    Some {
      s"""WITH $bpeRoundsCte,
      raw AS (SELECT doc_id, count(*) AS n_raw FROM t0 GROUP BY 1),
      bpe AS (SELECT doc_id, count(*) AS n_bpe FROM t$BpeRounds GROUP BY 1)
      SELECT doc_id, CAST(n_raw AS BIGINT) AS n_raw, CAST(n_bpe AS BIGINT) AS n_bpe,
             CAST(n_raw - n_bpe AS BIGINT) AS n_saved
      FROM raw JOIN bpe USING (doc_id)""".trim
    })

  // -- v08: tokenizer FERTILITY report — the per-language equity
  //    metric every multilingual tokenizer paper tables (tokens per
  //    word, chars per token): a tokenizer that fragments one
  //    language 2x harder than another silently halves that
  //    language's effective context window and doubles its training
  //    cost per document. Reuses the v05/v06 merge stream verbatim
  //    (same [[mergeRounds]] — the report cannot drift from the
  //    tokenizer it reports on), then one lang-keyed aggregate over
  //    doc-count-sized rows; ratios are divisions of exact longs,
  //    6-dp-rounded on both engines.
  private val v08 = Q(
    "v08_tokenizer_fertility",
    (s, d) => {
      // lang/n_chars/n_raw ride the token stream from round 0 (the v06
      // carry), so the per-doc join with a separate n_bpe aggregate is
      // gone — the report is the final round's cache straight into the
      // lang-keyed (map-side-combined) aggregate
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          split(col("text"), " ").as("toks"))
        .withColumn("n_raw", size(col("toks")).cast(LongType))
      val (_, stream, _) = mergeRounds(toks, BpeRounds)
      stream
        .select(col("lang"), col("n_raw"), col("n_chars"),
          size(col("toks")).cast(LongType).as("n_bpe"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_raw").as("words"),
          sum("n_bpe").as("tokens"),
          sum("n_chars").as("chars"))
        .select(
          col("lang"), col("n_docs"), col("words"), col("tokens"),
          round(col("tokens").cast(DoubleType) / col("words"), 6).as("fertility"),
          round(col("chars").cast(DoubleType) / col("tokens"), 6).as("chars_per_token"))
    },
    Some {
      s"""WITH $bpeRoundsCte,
      raw AS (SELECT doc_id, count(*) AS n_raw FROM t0 GROUP BY 1),
      bpe AS (SELECT doc_id, count(*) AS n_bpe FROM t$BpeRounds GROUP BY 1)
      SELECT d.lang, count(*) AS n_docs,
             CAST(SUM(r.n_raw) AS BIGINT) AS words,
             CAST(SUM(b.n_bpe) AS BIGINT) AS tokens,
             round(SUM(b.n_bpe) / CAST(SUM(r.n_raw) AS DOUBLE), 6) AS fertility,
             round(SUM(d.n_chars) / CAST(SUM(b.n_bpe) AS DOUBLE), 6) AS chars_per_token
      FROM documents d JOIN raw r USING (doc_id) JOIN bpe b ON b.doc_id = d.doc_id
      GROUP BY 1""".trim
    })

  // -- x07: the TOKENIZER pipeline composed — train the BPE merges
  //    (v05's loop), apply them corpus-wide (v06's stream), then pack
  //    sequences into training bins by the REAL tokenizer's counts
  //    (p03's cumulative packing, but over n_bpe instead of whitespace
  //    tokens — the difference between provisioning bins for the
  //    token budget the model actually sees vs a proxy that drifts
  //    ~20% after merges). One chain: the merge rounds are the v05/v06
  //    persisted streams, the packing adds one source-partitioned
  //    window over the doc-count-sized aggregate.
  private val x07 = Q(
    "x07_tokenizer_pipeline",
    (s, d) => {
      // source rides the stream from round 0, so the packing window
      // reads the final round's cache directly — no per-doc count
      // aggregate, no join back to documents
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      val (_, stream, _) = mergeRounds(toks, BpeRounds)
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      stream
        .select(col("doc_id"), col("source"),
          size(col("toks")).cast(LongType).as("n_bpe"))
        .withColumn("cum", sum(col("n_bpe")).over(w))
        .select(col("doc_id"), col("source"), col("n_bpe"),
          floor((col("cum") - col("n_bpe")) / lit(PackBudget)).as("bin"))
    },
    Some(s"""
      WITH $bpeRoundsCte,
      counts AS (SELECT doc_id, count(*) AS n_bpe FROM t$BpeRounds GROUP BY 1),
      j AS (SELECT d.doc_id, d.source, c.n_bpe
            FROM documents d JOIN counts c USING (doc_id))
      SELECT doc_id, source, CAST(n_bpe AS BIGINT) AS n_bpe,
             CAST(floor((SUM(n_bpe) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bpe)
                        / $PackBudget) AS BIGINT) AS bin
      FROM j
    """.trim))

  private val v03 = Q(
    "v03_collocations",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(split(col("text"), " ").as("toks"))
      val uni = toks
        .select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("uc"))
      val bi = toks
        // single-token docs would make sequence(0, -1) yield [0, -1] and
        // toks[i+1] trap under ANSI — guard exactly like the oracle's
        // WHERE len(toks) >= 2
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("pc"))
        .filter(col("pc") >= 25)
        .cache() // feeds both the m total and the ranked output
      // 1-row total frames broadcast into the candidate set (the house
      // scalar pattern — no driver collect on the query path)
      val nDf = uni.agg(sum(col("uc")).as("n"))
      val mDf = bi.agg(sum(col("pc")).as("m"))
      val w = Window.orderBy(col("lift").desc, col("w1"), col("w2"))
      bi
        .join(broadcast(uni.select(col("w").as("w1"), col("uc").as("uc1"))), "w1")
        .join(broadcast(uni.select(col("w").as("w2"), col("uc").as("uc2"))), "w2")
        .crossJoin(broadcast(nDf)).crossJoin(broadcast(mDf))
        // cast each factor to double BEFORE multiplying: long products
        // n*n and m*uc1*uc2 overflow past ~3e9 total tokens (tens of GB
        // of text), far below the 100 TB target; the ~1e-16 relative
        // error of double factors is invisible at the 6-decimal round
        .withColumn("lift",
          round(col("pc").cast(DoubleType) *
            (col("n").cast(DoubleType) * col("n").cast(DoubleType)) /
            (col("m").cast(DoubleType) * col("uc1").cast(DoubleType) *
              col("uc2").cast(DoubleType)), 6))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 20)
        .select("rank", "w1", "w2", "pc", "lift")
    },
    Some("""
      WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      uni AS (SELECT w, count(*) AS uc
              FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
      bi AS (SELECT toks[i.i+1] AS w1, toks[i.i+2] AS w2, count(*) AS pc
             FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) i
             WHERE len(toks) >= 2 AND i.i <= len(toks) - 2
             GROUP BY 1, 2
             HAVING count(*) >= 25),
      n AS (SELECT SUM(uc) AS n FROM uni),
      m AS (SELECT SUM(pc) AS m FROM bi)
      SELECT * FROM (
        SELECT CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS BIGINT) AS rank,
               w1, w2, pc, lift
        FROM (SELECT bi.w1, bi.w2, bi.pc,
                     round(CAST(bi.pc AS DOUBLE) * (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE))
                           / (CAST(m.m AS DOUBLE) * CAST(u1.uc AS DOUBLE) * CAST(u2.uc AS DOUBLE)), 6) AS lift
              FROM bi, n, m
              JOIN uni u1 ON u1.w = bi.w1
              JOIN uni u2 ON u2.w = bi.w2))
      WHERE rank <= 20
    """.trim))

  /** x01 quality-gate thresholds */
  val MinTokens = 10L
  val MaxTokens = 10000L
  val MaxDupRatio = 0.5

  // -- x01: the end-to-end curation gate — every linear-cost stage of a
  //    production training-data pipeline composed into one plan: split
  //    assignment (p01), fingerprint dedup keeper (d02), length +
  //    repetition quality gates (t03/t06), and train-set contamination
  //    (c01), emitting one disposition per document. First matching rule
  //    wins: dup -> length -> repetitive -> contaminated -> kept.
  //    Everything here is aggregation/broadcast-shaped (no pairwise
  //    joins): the O(n log n) LSH family (d03/d09) runs as its own
  //    offline job feeding a drop-list, exactly as it would at 100 TB.
  private val x01 = Q(
    "x01_curation_pipeline",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = docs.withColumn("fp", TextAnalysis.contentFingerprint)
      val keepers = fp.groupBy("fp").agg(min("doc_id").as("keeper_id"))
      val qual = repetitionScore(docs).select(col("doc_id"), col("dup_ratio"))
      val contamDocs = c01.run(s, d)
        .select(col("train_doc").as("doc_id")).distinct()
        .withColumn("contaminated", lit(1L))
      val u = unitHash(col("doc_id"))
      fp.join(keepers, "fp")
        .join(qual, Seq("doc_id"), "left")
        .join(contamDocs, Seq("doc_id"), "left")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
        .withColumn("split",
          when(u < 0.9, "train").when(u < 0.95, "val").otherwise("test"))
        .withColumn("disposition",
          when(col("doc_id") =!= col("keeper_id"), "dup")
            .when(col("n_tokens") < MinTokens || col("n_tokens") > MaxTokens, "length")
            .when(col("dup_ratio") > MaxDupRatio, "repetitive")
            .when(col("contaminated") === 1L && col("split") === "train", "contaminated")
            .otherwise("kept"))
        .select("doc_id", "split", "n_tokens", "disposition")
    },
    Some(s"""
      WITH $dispCtes
      SELECT doc_id, split, n_tokens, disposition FROM disp
    """.trim))

  /** x01's oracle body as a reusable CTE chain ending in
    * `disp(doc_id, split, n_tokens, disposition)` — consumed by x01
    * itself and composed further by x02's assembly oracle.
    */
  private lazy val dispCtes = s"""fp AS (SELECT doc_id, text,
                    md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
                  FROM documents),
      keepers AS (SELECT fp, MIN(doc_id) AS keeper_id FROM fp GROUP BY fp),
      t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      bi AS (SELECT doc_id, toks[i.i+1] || ' ' || toks[i.i+2] AS bigram
             FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) i
             WHERE len(toks) >= 2 AND i.i <= len(toks) - 2),
      bc AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY 1, 2),
      qual AS (SELECT doc_id, 1.0 - count(*) / CAST(SUM(c) AS DOUBLE) AS dup_ratio
               FROM bc GROUP BY doc_id),
      csh AS (SELECT DISTINCT doc_id, $duckUnitHash AS u,
                     ${(0 until ContamN).map(k => s"toks[i.i+${k + 1}]").mkString(" || ' ' || ")} AS shingle
              FROM t, (SELECT unnest(range(${Dedup.MaxShinglePositions})) AS i) i
              WHERE len(toks) >= $ContamN AND i.i <= len(toks) - $ContamN),
      contam AS (SELECT DISTINCT tr.doc_id AS doc_id
                 FROM csh tr JOIN csh te USING (shingle)
                 WHERE tr.u < 0.9 AND te.u >= 0.95),
      disp AS (SELECT f.doc_id,
             CASE WHEN ${duckUnitHashOf("f")} < 0.9 THEN 'train'
                  WHEN ${duckUnitHashOf("f")} < 0.95 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(len(string_split(f.text, ' ')) AS BIGINT) AS n_tokens,
             CASE WHEN f.doc_id <> k.keeper_id THEN 'dup'
                  WHEN len(string_split(f.text, ' ')) < $MinTokens
                       OR len(string_split(f.text, ' ')) > $MaxTokens THEN 'length'
                  WHEN q.dup_ratio > $MaxDupRatio THEN 'repetitive'
                  WHEN c.doc_id IS NOT NULL
                       AND ${duckUnitHashOf("f")} < 0.9 THEN 'contaminated'
                  ELSE 'kept' END AS disposition
      FROM fp f
      JOIN keepers k USING (fp)
      LEFT JOIN qual q ON q.doc_id = f.doc_id
      LEFT JOIN contam c ON c.doc_id = f.doc_id)"""

  // -- x02: the full training-data ASSEMBLY — documents in, packed
  //    train sequences out, composed from already-verified operators:
  //    x01's linear gates (split/dup/length/repetitive/contaminated),
  //    the LSH near-dup cluster contraction (d03 pairs -> d09
  //    components) as a drop-list, and p03's fixed-budget packing over
  //    the survivors. The composition is what's under test here: a
  //    reference user's end-to-end pipeline as ONE catalog entry.
  //    100 TB shape: gates are broadcast/agg-shaped, the pair graph and
  //    contraction touch only near-dup docs, packing is one window per
  //    lang partition over the kept train split — no stage is new, so
  //    no new scale risk.
  /** x02/x04 shared stage: the gated, near-dup-free train split with
    * lang + source attached — gates (x01 dispositions) + d03→d09
    * cluster drop-list, keepers only.
    */
  private def trainSurvivors(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.documents(s, d)
    val disp = x01.run(s, d)
    val clusters = Clusters.connectedComponents(
      docs.select("doc_id"), LlmQueries.nearDupPairs(s, d))
    val nd = clusters.filter(col("cluster") =!= col("doc_id"))
      .select(col("doc_id")).withColumn("neardup", lit(1L))
    disp
      .join(nd, Seq("doc_id"), "left")
      .withColumn("final_disposition",
        when(col("disposition") =!= "kept", col("disposition"))
          .when(col("neardup") === 1L, "neardup")
          .otherwise("kept"))
      .filter(col("final_disposition") === "kept" && col("split") === "train")
      .join(docs.select("doc_id", "lang", "source"), "doc_id")
      .select("doc_id", "lang", "source", "n_tokens")
  }

  private val x02 = Q(
    "x02_training_assembly",
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      trainSurvivors(s, d)
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / lit(PackBudget)).as("seq_bin"))
    },
    Some(s"""
      WITH RECURSIVE $dispCtes,
      ${LlmQueries.pairsCtes},
      edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.d2 FROM reach r JOIN edges e ON r.dst = e.d1
      ),
      cl AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY src),
      train AS (SELECT dp.doc_id, dc.lang, dp.n_tokens
                FROM disp dp
                JOIN cl ON cl.doc_id = dp.doc_id
                JOIN documents dc ON dc.doc_id = dp.doc_id
                WHERE dp.split = 'train'
                  AND dp.disposition = 'kept'
                  AND cl.cluster = dp.doc_id)
      SELECT doc_id, lang, n_tokens,
             CAST(floor((cum - n_tokens) / $PackBudget) AS BIGINT) AS seq_bin
      FROM (SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM train)
    """.trim))

  // -- x04: x02 with the mixing curriculum inserted — the COMPLETE
  //    modern pipeline as one oracle-checked entry: quality/length/
  //    repetition/contamination gates (x01) -> near-dup cluster drop
  //    (d03 pairs -> d09 keepers) -> tau = 0.5 temperature resampling
  //    over the SURVIVORS (p06's rule, shares computed post-cleaning —
  //    mixing before dedup would let duplicate mass set the targets) ->
  //    fixed-budget sequence packing (p03). Adds one survivor-sized
  //    aggregate and a source-cardinality broadcast on top of x02.
  private val x04 = Q(
    "x04_mixed_assembly",
    (s, d) => {
      val t = trainSurvivors(s, d).cache()
      val w1 = Window.partitionBy(lit(1))
      // p_keep is COMPUTED from order-sensitive double sums (window sums
      // here, scalar subqueries in DuckDB) and then compared against
      // unitHash — round it to 6 dp on BOTH engines so a last-ulp sum
      // difference at a hash boundary can never flip a doc's keep bit
      // (the rounding discipline constants-thresholded p06 gets for free)
      val pk = t.groupBy("source").agg(sum(col("n_tokens")).as("tokens"))
        .withColumn("share", col("tokens") / sum(col("tokens")).over(w1).cast(DoubleType))
        .withColumn("tshare", sqrt(col("share")) / sum(sqrt(col("share"))).over(w1))
        .withColumn("p_keep",
          round((col("tshare") / col("share")) / max(col("tshare") / col("share")).over(w1), 6))
        .select("source", "p_keep")
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.join(broadcast(pk), "source")
        .filter(unitHash(col("doc_id")) < col("p_keep"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / lit(PackBudget)).as("seq_bin"))
    },
    Some(s"""
      WITH RECURSIVE $dispCtes,
      ${LlmQueries.pairsCtes},
      edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.d2 FROM reach r JOIN edges e ON r.dst = e.d1
      ),
      cl AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY src),
      train AS (SELECT dp.doc_id, dc.lang, dc.source, dp.n_tokens
                FROM disp dp
                JOIN cl ON cl.doc_id = dp.doc_id
                JOIN documents dc ON dc.doc_id = dp.doc_id
                WHERE dp.split = 'train'
                  AND dp.disposition = 'kept'
                  AND cl.cluster = dp.doc_id),
      agg2 AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tokens
               FROM train GROUP BY 1),
      sh2 AS (SELECT source,
                     tokens / CAST((SELECT SUM(tokens) FROM agg2) AS DOUBLE) AS share
              FROM agg2),
      ts2 AS (SELECT source, share,
                     sqrt(share) / (SELECT SUM(sqrt(share)) FROM sh2) AS tshare
              FROM sh2),
      pk2 AS (SELECT source,
                     round((tshare / share) / (SELECT MAX(tshare / share) FROM ts2), 6) AS p_keep
              FROM ts2),
      mixed AS (SELECT t.doc_id, t.lang, t.source, t.n_tokens
                FROM train t JOIN pk2 ON pk2.source = t.source
                WHERE ${duckUnitHashOf("t")} < pk2.p_keep)
      SELECT doc_id, lang, source, n_tokens,
             CAST(floor((cum - n_tokens) / $PackBudget) AS BIGINT) AS seq_bin
      FROM (SELECT doc_id, lang, source, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM mixed)
    """.trim))

  // -- x05: cluster-balanced mixing — p06's tau = 0.5 temperature rule
  //    applied along the SEMANTIC axis instead of the source label:
  //    documents are assigned to embedding-space clusters by the IVF
  //    quantizer (d14's partitioner; vec_id ≡ doc_id, the d10
  //    convention), and per-CLUSTER token shares are flattened toward
  //    sqrt-share targets. Provenance labels under-segment real
  //    corpora — one "web" source spans many semantic regions — so the
  //    production curriculum mixes over learned clusters; this is that
  //    recipe as one oracle-checked entry. 100 TB shape: one
  //    broadcast-centroid assignment scan (no corpus shuffle), one
  //    cluster-keyed aggregate, and a centroid-cardinality broadcast
  //    back onto the membership test — the same plan family as p06
  //    with cid for source.
  private val x05 = Q(
    "x05_cluster_mix",
    (s, d) => {
      val docs = Tables.documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      val assign = Similarity
        .ivfAssign(Tables.embeddings(s, d), 16)
        .select(col("vec_id").as("doc_id"), col("cid"))
      val dc = docs.join(assign, "doc_id")
      val w = Window.partitionBy(lit(1))
      val shares = dc.groupBy("cid")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
        .withColumn("share", col("tokens") / sum(col("tokens")).over(w).cast(DoubleType))
        .withColumn("tshare", sqrt(col("share")) / sum(sqrt(col("share"))).over(w))
        // 6-dp rounding before the unitHash compare — see x04's pk note
        .withColumn("p_keep",
          round((col("tshare") / col("share")) / max(col("tshare") / col("share")).over(w), 6))
      val kept = dc
        .join(broadcast(shares.select("cid", "p_keep")), "cid")
        .groupBy("cid")
        .agg(sum(when(unitHash(col("doc_id")) < col("p_keep"), 1L).otherwise(0L)).as("n_kept"))
      shares.join(kept, "cid").select(
        col("cid"), col("n_docs"), col("n_kept"),
        round(col("share"), 6).as("token_share"),
        round(col("tshare"), 6).as("target_share"),
        round(col("p_keep"), 6).as("keep_rate"))
    },
    Some(s"""
      WITH ${LlmQueries.ivfAssignCte},
      d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
      dc AS (SELECT d.doc_id, a.cid, d.n_tokens
             FROM d JOIN assign a ON a.vec_id = d.doc_id),
      agg AS (SELECT cid, count(*) AS n_docs,
                     CAST(SUM(n_tokens) AS BIGINT) AS tokens
              FROM dc GROUP BY 1),
      sh AS (SELECT cid, n_docs,
                    tokens / CAST((SELECT SUM(tokens) FROM agg) AS DOUBLE) AS share
             FROM agg),
      ts AS (SELECT cid, n_docs, share,
                    sqrt(share) / (SELECT SUM(sqrt(share)) FROM sh) AS tshare
             FROM sh),
      pk AS (SELECT cid, n_docs, share, tshare,
                    round((tshare / share) / (SELECT MAX(tshare / share) FROM ts), 6) AS p_keep
             FROM ts),
      k AS (SELECT dc.cid,
                   SUM(CASE WHEN $duckUnitHash < pk.p_keep THEN 1 ELSE 0 END) AS n_kept
            FROM dc JOIN pk ON pk.cid = dc.cid GROUP BY 1)
      SELECT pk.cid, pk.n_docs, CAST(k.n_kept AS BIGINT) AS n_kept,
             round(pk.share, 6) AS token_share,
             round(pk.tshare, 6) AS target_share,
             round(pk.p_keep, 6) AS keep_rate
      FROM pk JOIN k ON k.cid = pk.cid
    """.trim))

  // -- d13: INTRA-document passage dedup — the boilerplate-removal
  //    TRANSFORM next to d08's cross-doc report: repeated passages
  //    within one document (templated headers, navigation chrome,
  //    copy-paste runs) are dropped keeping the first occurrence, and
  //    the cleaned text is reconstructed in original order. Output
  //    carries the cleaned text's md5 (not the text) so the result
  //    stays row-per-doc sized. 100 TB shape: one window keyed on
  //    (doc_id, fp) and one per-doc aggregate — both partition by
  //    doc_id, so the whole op is a single corpus shuffle; the per-doc
  //    collect_list is bounded by passages-per-doc, never corpus-sized.
  private val d13 = Q(
    "d13_intradoc_dedup",
    (s, d) => {
      val p = PassageWords
      val passages = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          posexplode(expr(
            s"transform(sequence(0, cast(ceil(size(toks) / $p.0) as int) - 1), " +
              s"i -> concat_ws(' ', slice(toks, i * $p + 1, $p)))"))
            .as(Seq("idx", "passage")))
        .withColumn("fp", md5(col("passage")))
      val w = Window.partitionBy("doc_id", "fp")
      passages
        .withColumn("first_idx", min(col("idx")).over(w))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_passages"),
          sum(when(col("idx") === col("first_idx"), 1L).otherwise(0L)).as("n_kept"),
          expr("""array_join(transform(
                    array_sort(collect_list(CASE WHEN idx = first_idx
                                            THEN struct(idx, passage) END)),
                    x -> x.passage), ' ')""").as("clean_text"))
        .select(
          col("doc_id"), col("n_passages"), col("n_kept"),
          size(split(col("clean_text"), " ")).cast(LongType).as("n_clean_tokens"),
          md5(col("clean_text")).as("clean_fp"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      p AS (SELECT doc_id, i.i AS idx,
                   array_to_string(toks[i.i * $PassageWords + 1 : i.i * $PassageWords + $PassageWords], ' ') AS passage
            FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) i
            WHERE i.i < ceil(len(toks) / ${PassageWords}.0)),
      m AS (SELECT doc_id, idx, passage,
                   min(idx) OVER (PARTITION BY doc_id, md5(passage)) AS first_idx
            FROM p),
      c AS (SELECT doc_id,
                   string_agg(CASE WHEN idx = first_idx THEN passage END, ' ' ORDER BY idx) AS clean_text
            FROM m GROUP BY doc_id)
      SELECT m.doc_id,
             count(*) AS n_passages,
             CAST(SUM(CASE WHEN m.idx = m.first_idx THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(len(string_split(any_value(c.clean_text), ' ')) AS BIGINT) AS n_clean_tokens,
             md5(any_value(c.clean_text)) AS clean_fp
      FROM m JOIN c ON c.doc_id = m.doc_id
      GROUP BY m.doc_id
    """.trim))

  // -- p06: temperature-flattened source resampling — the multi-domain
  //    mixing op (the tau = 0.5 sampling rule used for multilingual /
  //    multi-source corpora): target_share_s ∝ share_s^tau upweights
  //    the tail sources, then each source is deterministically
  //    subsampled (the same md5 unit hash as p01/p02, so membership is
  //    replay-stable and partitioning-independent) at a rate normalized
  //    so the most-upweighted source keeps everything. Output is the
  //    mixing table an operator reviews: observed share, temperature
  //    target, keep rate, and the realized kept counts. 100 TB shape:
  //    one token-count aggregate, a source-cardinality-sized broadcast
  //    of rates, and a map-side hash filter — no corpus shuffle beyond
  //    the first groupBy.
  private val p06 = Q(
    "p06_temperature_mix",
    (s, d) => {
      val docs = Tables.documents(s, d).select(
        col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      val w = Window.partitionBy(lit(1))
      val shares = docs
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
        .withColumn("share", col("tokens") / sum(col("tokens")).over(w).cast(DoubleType))
        .withColumn("tshare", sqrt(col("share")) / sum(sqrt(col("share"))).over(w))
        // 6-dp rounding before the unitHash compare — see x04's pk note
        .withColumn("p_keep",
          round((col("tshare") / col("share")) / max(col("tshare") / col("share")).over(w), 6))
      val kept = docs
        .join(broadcast(shares.select("source", "p_keep")), "source")
        .groupBy("source")
        .agg(sum(when(unitHash(col("doc_id")) < col("p_keep"), 1L).otherwise(0L)).as("n_kept"))
      shares.join(kept, "source").select(
        col("source"), col("n_docs"), col("n_kept"),
        round(col("share"), 6).as("token_share"),
        round(col("tshare"), 6).as("target_share"),
        round(col("p_keep"), 6).as("keep_rate"))
    },
    Some(s"""
      WITH d AS (SELECT doc_id, source,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents),
      agg AS (SELECT source, count(*) AS n_docs,
                     CAST(SUM(n_tokens) AS BIGINT) AS tokens
              FROM d GROUP BY 1),
      sh AS (SELECT source, n_docs,
                    tokens / CAST((SELECT SUM(tokens) FROM agg) AS DOUBLE) AS share
             FROM agg),
      ts AS (SELECT source, n_docs, share,
                    sqrt(share) / (SELECT SUM(sqrt(share)) FROM sh) AS tshare
             FROM sh),
      pk AS (SELECT source, n_docs, share, tshare,
                    round((tshare / share) / (SELECT MAX(tshare / share) FROM ts), 6) AS p_keep
             FROM ts),
      k AS (SELECT d.source,
                   SUM(CASE WHEN $duckUnitHash < pk.p_keep THEN 1 ELSE 0 END) AS n_kept
            FROM d JOIN pk ON pk.source = d.source GROUP BY 1)
      SELECT pk.source, pk.n_docs, CAST(k.n_kept AS BIGINT) AS n_kept,
             round(pk.share, 6) AS token_share,
             round(pk.tshare, 6) AS target_share,
             round(pk.p_keep, 6) AS keep_rate
      FROM pk JOIN k ON k.source = pk.source
    """.trim))

  // -- p07: exact token-budget assembly — "give me up to B tokens per
  //    source, reproducibly": docs are ordered by a deterministic md5
  //    hash of doc_id (replay-stable, partitioning-independent, and
  //    unbiased by ingestion order — taking the FIRST doc_ids would
  //    bias toward whatever was crawled first) and taken while the
  //    running token sum stays within the budget. This is the corpus
  //    sizing cut every pretraining run performs; determinism means
  //    the same corpus and budget yield byte-identical selections on
  //    any cluster layout. 100 TB shape: map-side token counts + md5,
  //    then ONE hash exchange on source for the per-source running
  //    sum; the window sort runs inside each source's partition. (A
  //    single mega-source at real scale range-partitions the window
  //    key — the plan shape is unchanged.)
  private val p07 = Q(
    "p07_token_budget",
    (s, d) => {
      val budget = 800L
      val w = Window.partitionBy(col("source"))
        .orderBy(col("ord"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
          md5(col("doc_id").cast(StringType)).as("ord"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= budget)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
    },
    Some("""
      SELECT doc_id, source, n_tokens, cum_tokens FROM (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source
                 ORDER BY ord, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM (SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     md5(CAST(doc_id AS VARCHAR)) AS ord
              FROM documents))
      WHERE cum_tokens <= 800
    """.trim))

  // -- p08: deterministic GLOBAL SHUFFLE + shard assignment — the final
  //    write step of training-data assembly: every epoch reader needs
  //    the corpus in a pseudo-random order, split into N balanced
  //    shards. The naive spec (`ORDER BY random()` + row_number) is
  //    both non-deterministic and a single-partition global sort — a
  //    scale-killer. This shape gets the same statistical guarantee
  //    with NO global sort: shard = floor(u·N) from one doc_id hash
  //    (map-side, balanced in expectation), intra-shard position from a
  //    SECOND independent hash via a per-shard window (N parallel
  //    sorts, each 1/N of the corpus), and a round-robin interleave
  //    `global_pos = (pos-1)·N + shard` that defines a total
  //    pseudo-random read order without ever materializing one
  //    partition. Replay-stable: assignments are pure functions of
  //    doc_id, so re-runs, repartitions, and corpus appends never
  //    reshuffle existing rows' shards. At 100 TB: N scales with
  //    corpus/shard-size, writes partition by shard, and the window
  //    sort runs inside each shard's hash partition.
  private val p08 = Q(
    "p08_shard_shuffle",
    (s, d) => {
      val nShards = 8
      val shard = floor(unitHash(col("doc_id")) * nShards).cast(LongType)
      // independent order hash: a '#o'-salted doc_id image, so shard
      // membership and intra-shard order are decorrelated
      val ordU = graft.functions.ColumnFns.md5_prefix64(
        concat(col("doc_id").cast(StringType), lit("#o")))
      val w = Window.partitionBy(col("shard")).orderBy(col("ou"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), shard.as("shard"), ordU.as("ou"))
        .withColumn("pos", row_number().over(w).cast(LongType))
        .select(
          col("doc_id"), col("shard"), col("pos"),
          ((col("pos") - 1L) * nShards + col("shard")).as("global_pos"))
    },
    Some(s"""
      WITH a AS (SELECT doc_id,
          CAST(floor($duckUnitHash * 8) AS BIGINT) AS shard,
          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#o'), 1, 15)) AS BIGINT) AS ou
        FROM documents),
      r AS (SELECT doc_id, shard,
          CAST(row_number() OVER (PARTITION BY shard ORDER BY ou, doc_id) AS BIGINT) AS pos
        FROM a)
      SELECT doc_id, shard, pos, (pos - 1) * 8 + shard AS global_pos FROM r
    """.trim))

  // -- p09: curriculum ordering — the stage-sequenced read order
  //    quality-curriculum training uses (clean docs first, noisier
  //    later). Stage is a CONSTANT-thresholded bin on the stopword
  //    ratio (t01's quality proxy; thresholds are literals, so the
  //    stage is a map-side pure function — no global quantile pass),
  //    and the within-stage pseudo-random order is p08's recipe
  //    re-partitioned by (stage, shard): each window sorts one
  //    stage-shard slice (never a whole stage, never the corpus), and
  //    `(rank-1)·nShards + shard` interleaves the shards into a total
  //    per-stage order. global_pos = stage·2^40 + pos_in_stage is an
  //    ORDER KEY (sparse, not dense — same contract as p08's
  //    interleave): 2^40 caps a stage at ~10^12 positions, beyond any
  //    single curriculum stage. Everything is a pure function of
  //    (doc_id, text), so appends and re-runs never reorder existing
  //    rows.
  private val p09 = Q(
    "p09_curriculum",
    (s, d) => {
      val nShards = 8
      val stopR = TextAnalysis.stopwordRatio()
      val stage = when(stopR >= 0.15, 0L).when(stopR >= 0.10, 1L)
        .when(stopR >= 0.05, 2L).otherwise(3L)
      val shard = floor(unitHash(col("doc_id")) * nShards).cast(LongType)
      val ordU = graft.functions.ColumnFns.md5_prefix64(
        concat(col("doc_id").cast(StringType), lit("#c")))
      val w = Window.partitionBy(col("stage"), col("shard")).orderBy(col("ou"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), stage.as("stage"), shard.as("shard"), ordU.as("ou"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .select(
          col("doc_id"), col("stage"), col("shard"),
          ((col("rk") - 1L) * nShards + col("shard")).as("pos_in_stage"))
        .withColumn("global_pos", col("stage") * lit(1L << 40) + col("pos_in_stage"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '),
               x -> list_contains(['the','a','of','and','to','in','is','for','on','with'], x)))
            AS DOUBLE) / len(string_split(text, ' ')) AS sr
        FROM documents),
      a AS (SELECT doc_id,
          CASE WHEN sr >= 0.15 THEN 0 WHEN sr >= 0.10 THEN 1
               WHEN sr >= 0.05 THEN 2 ELSE 3 END AS stage,
          CAST(floor($duckUnitHash * 8) AS BIGINT) AS shard,
          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#c'), 1, 15)) AS BIGINT) AS ou
        FROM t),
      r AS (SELECT doc_id, CAST(stage AS BIGINT) AS stage, shard,
          CAST(row_number() OVER (PARTITION BY stage, shard ORDER BY ou, doc_id) AS BIGINT) AS rk
        FROM a)
      SELECT doc_id, stage, shard, (rk - 1) * 8 + shard AS pos_in_stage,
             stage * ${1L << 40} + (rk - 1) * 8 + shard AS global_pos
      FROM r
    """.trim))

  // -- x06: MULTIMODAL assembly — the composed pipeline for a corpus
  //    whose documents carry audio + image + text together: REAL WAV
  //    decode (m06's RIFF/PCM parser) and REAL PPM decode (m07's
  //    raster parser) feed per-modality quality gates, joined 1:1 on
  //    doc_id with the text stats, and the three-way survivors pack
  //    into p03's lang-partitioned token bins. Every gate is INTEGER
  //    arithmetic (crossings floor; brightness band as
  //    100·3·w·h <= sum_rgb <= 160·3·w·h, division-free; token-count
  //    band), so the composite carries zero float-parity surface. The
  //    joins are doc_id-keyed 1:1 (co-partitionable at any scale); the
  //    decode stages are per-row map partitions; the only window is
  //    p03's per-lang cumulative — the whole composite is one shuffle
  //    family deep. Dropped docs keep their verdict row (bin NULL):
  //    audit output, not just the survivor set.
  private val x06 = Q(
    "x06_multimodal_assembly",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val wav = Multimodal.wavFeatures(s, Multimodal.wavTable(s, docs)).toDF()
        .select(col("media_id").as("doc_id"), col("peak"), col("crossings"))
      val img = Multimodal.ppmFeatures(s, Multimodal.ppmTable(s, docs), maxDim = 8).toDF()
        .select(col("media_id").as("doc_id"), col("width"), col("height"),
          (col("sum_r") + col("sum_g") + col("sum_b")).as("sum_rgb"))
      val txt = docs.select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      val j = txt.join(wav, "doc_id").join(img, "doc_id")
        .withColumn("audio_ok", col("crossings") >= 5L)
        .withColumn("image_ok",
          col("sum_rgb") >= lit(100L) * 3L * col("width") * col("height") &&
            col("sum_rgb") <= lit(160L) * 3L * col("width") * col("height"))
        .withColumn("text_ok", col("n_tokens").between(8L, 400L))
        .withColumn("keep", col("audio_ok") && col("image_ok") && col("text_ok"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      j.withColumn("cum_kept",
          sum(when(col("keep"), col("n_tokens")).otherwise(0L)).over(w))
        .select(
          col("doc_id"), col("lang"), col("n_tokens"),
          col("audio_ok"), col("image_ok"), col("text_ok"), col("keep"),
          when(col("keep"),
            floor((col("cum_kept") - col("n_tokens")) / lit(PackBudget)))
            .cast(LongType).as("bin"))
    },
    Some(s"""
      WITH wp AS (SELECT doc_id AS media_id, 8000 AS sr,
                         400 + doc_id % 200 AS n, 100 + doc_id % 400 AS f
                  FROM documents),
      sm AS (SELECT media_id, sr, n, i.i AS i,
               ((i.i * f) % sr) * 24000 // sr - 12000 AS v
             FROM wp, (SELECT unnest(range(600)) AS i) i WHERE i.i < n),
      lg AS (SELECT *, lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv FROM sm),
      wav AS (SELECT media_id AS doc_id,
                SUM(CASE WHEN i > 0 AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END) AS crossings
              FROM lg GROUP BY media_id),
      ip AS (SELECT doc_id AS media_id,
                    16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
             FROM documents),
      img AS (SELECT media_id AS doc_id, w, h,
                SUM((x.x * 3 + y.y * 5 + media_id) % 256)
                + SUM((x.x * 7 + y.y + 2 * media_id) % 256)
                + SUM((x.x + y.y * 11 + 3 * media_id) % 256) AS sum_rgb
              FROM ip, (SELECT unnest(range(32)) AS x) x, (SELECT unnest(range(20)) AS y) y
              WHERE x.x < w AND y.y < h GROUP BY media_id, w, h),
      txt AS (SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents),
      g AS (SELECT t.doc_id, t.lang, t.n_tokens,
              wav.crossings >= 5 AS audio_ok,
              img.sum_rgb >= 100 * 3 * img.w * img.h
                AND img.sum_rgb <= 160 * 3 * img.w * img.h AS image_ok,
              t.n_tokens BETWEEN 8 AND 400 AS text_ok
            FROM txt t JOIN wav ON wav.doc_id = t.doc_id
                       JOIN img ON img.doc_id = t.doc_id),
      k AS (SELECT *, audio_ok AND image_ok AND text_ok AS keep,
              SUM(CASE WHEN audio_ok AND image_ok AND text_ok THEN n_tokens ELSE 0 END)
                OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_kept
            FROM g)
      SELECT doc_id, lang, n_tokens, audio_ok, image_ok, text_ok, keep,
             CASE WHEN keep
                  THEN CAST(floor((cum_kept - n_tokens) / $PackBudget) AS BIGINT)
             END AS bin
      FROM k
    """.trim))

  def queries: Seq[Q] = Seq(p01, p02, p03, p04, p05, p06, p07, p08, p09, p10, p11, p12, t05, t06, t07, t12, t14, d08, d13, c01, c02, c03, c05, v01, v02, v03, v04, v05, v06, v07, v08, x01, x02, x04, x05, x06, x07)
}
