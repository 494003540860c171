package graft.llm

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-training-data pipeline operators over the documents/embeddings
  * tables: dedup family, similarity search, text analysis, multimodal
  * plumbing. Signature hashing is md5-based everywhere so the DuckDB
  * oracle reproduces byte-identical signatures (engine-internal hashes
  * would be unverifiable).
  */
object LlmQueries {

  private[graft] val MaxDf = 1000
  private[graft] val K = 8 // minhash permutations
  private val R = 2 // rows per LSH band
  /** amplified permutation count for the 0.5-threshold family (d05 /
    * x03's jaccard05): 16 perms in 8 bands of r=2. The r=1 banding it
    * replaces collided at the corpus's BACKGROUND Jaccard j₀ (the
    * incidental shingle overlap of unrelated docs), so candidates grew
    * ~j₀·bands·n²/2 — measured n^1.95 on the 10x scale probe
    * (tools/ScaleProbe: 86k pairs at 5k docs → 7.8M at 50k). Banding
    * r=2 squares the background term (j₀² ≈ 1e-6 here) while OR-ing 8
    * bands keeps recall at the 0.5 target: 1-(1-j²)^8 = 90% at j=0.5,
    * 99.97% at j=0.8 — the documented trade for collision-bounded
    * candidate growth (measured 86k → 2.2k at sf0.1, and ~n^1.2 on the
    * probe). At 100 TB raise K2 (more bands) to buy recall back:
    * candidates stay ∝ j₀²·n² with a 1e-6 constant instead of 1e-3.
    */
  private[graft] val K2 = 16

  /** shared DuckDB CTE: distinct 3-gram shingles, hashed to the 60-bit
    * md5 image, + stop-shingle cap — `sh(doc_id, h)`. Downstream CTEs
    * join on `h`, mirroring the engine's long-keyed shuffles
    * ([[Dedup.shingleIndex]]): both sides merge 60-bit collisions
    * identically, so parity holds bit-for-bit.
    */
  private val shingleCte = s"""
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh0 AS (SELECT DISTINCT doc_id, t[i.i+1] || ' ' || t[i.i+2] || ' ' || t[i.i+3] AS shingle
            FROM toks, (SELECT unnest(range(${Dedup.MaxShinglePositions})) AS i) i
            WHERE len(t) >= 3 AND i.i <= len(t) - 3),
    hh0 AS (SELECT doc_id, CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT) AS h
            FROM sh0),
    rare AS (SELECT h FROM hh0 GROUP BY h HAVING count(*) <= $MaxDf),
    sh AS (SELECT hh0.doc_id, hh0.h FROM hh0 JOIN rare USING (h))"""

  // -- d01: exact dedup — keeper (min doc_id) per distinct text.
  private val d01 = Q(
    "d01_dedup_exact",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .select("keeper_id", "n_copies"),
    Some("""
      SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      FROM documents GROUP BY text
    """.trim))

  // -- d02: fingerprint dedup — md5 of normalized text.
  private val d02 = Q(
    "d02_dedup_fingerprint",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("fp", TextAnalysis.contentFingerprint)
        .groupBy("fp")
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies")),
    Some("""
      SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
             MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      FROM documents GROUP BY 1
    """.trim))

  /** shared DuckDB CTE (follows `sh`): 60-bit md5 shingle hash + the
    * K-permutation minhash signature per doc — the oracle image of
    * [[Dedup.minhashSigs]], used by d03 and d05.
    */
  private val sigCte = s"""
    sigs AS (SELECT doc_id,
      ${(0 until K).map(p => s"min(xor(h, ${Dedup.permConst(p)})) AS mh$p").mkString(", ")}
      FROM sh GROUP BY doc_id)"""

  /** [[sigCte]] at the amplified [[K2]] permutation count (same CTE
    * name — the downstream band/jaccard CTEs are shared)
    */
  private val sigCteK2 = s"""
    sigs AS (SELECT doc_id,
      ${(0 until K2).map(p => s"min(xor(h, ${Dedup.permConst(p)})) AS mh$p").mkString(", ")}
      FROM sh GROUP BY doc_id)"""

  /** shared DuckDB band CTE: `nPerms` minhashes in r=2 bands named
    * `cteName(doc_id, band, bv)` — the oracle image of
    * [[Dedup.bandTable]](k, 2)
    */
  private def bandCteR2(cteName: String, nPerms: Int) = s"""
      $cteName AS (${(0 until nPerms / 2)
    .map(b => s"SELECT doc_id, $b AS band, mh${b * 2} || '_' || mh${b * 2 + 1} AS bv FROM sigs")
    .mkString(" UNION ALL ")})"""

  /** shared DuckDB tail (follows `sh` + a `cand(d1,d2)` CTE): exact
    * Jaccard over the candidate pairs at `minJac` — the oracle image of
    * [[Dedup.jaccard]].
    */
  private val jaccardCtes = s"""
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT c.d1, c.d2, count(*) AS i
                FROM cand c
                JOIN sh s1 ON s1.doc_id = c.d1
                JOIN sh s2 ON s2.doc_id = c.d2 AND s2.h = s1.h
                GROUP BY c.d1, c.d2)"""

  private def jaccardSelect(minJac: Double) = s"""
      SELECT d1, d2, round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) AS jac
      FROM inter JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
      WHERE round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) >= $minJac"""

  private def jaccardTail(minJac: Double) = s"""$jaccardCtes
      ${jaccardSelect(minJac)}"""

  /** The d03 pipeline as a reusable DataFrame: verified near-dup pairs
    * (d1 < d2, jac >= 0.8). Consumed by d03 itself and by the
    * cluster-contraction stage (d09 in [[Clusters]]).
    */
  private[llm] def nearDupPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    // the shingle index feeds signature building AND jaccard verify —
    // cache it (at lake scale: persist DISK_ONLY or checkpoint)
    val sh = Dedup.shingleIndex(Dedup.shingleH64(Tables.documents(s, d)), MaxDf).cache()
    val cand = Dedup.lshCandidates(Dedup.minhashSigs(sh, K), K, R)
    Dedup.jaccard(cand, sh).filter(col("jac") >= 0.8).select("d1", "d2", "jac")
  }

  /** DuckDB CTE chain ending in `pairs(d1, d2, jac)` — the oracle image
    * of [[nearDupPairs]], shared by d03's and d09's oracles.
    */
  private[llm] val pairsCtes = s"""$shingleCte,
      $sigCte,
      bands AS (${(0 until K / R)
        .map(b => s"SELECT doc_id, $b AS band, mh${b * R} || '_' || mh${b * R + 1} AS bv FROM sigs")
        .mkString(" UNION ALL ")}),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      $jaccardCtes,
      pairs AS (${jaccardSelect(0.8)})"""

  // -- d03: MinHash-LSH near-dup pairs, exact-Jaccard verified >= 0.8.
  private val d03 = Q(
    "d03_minhash_lsh",
    (s, d) => nearDupPairs(s, d),
    Some(s"""
      WITH $pairsCtes
      SELECT d1, d2, jac FROM pairs
    """.trim))

  // -- d04: 48-bit SimHash signature per doc (shuffle-free HOFs).
  private val d04 = Q(
    "d04_simhash",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Dedup.simhash().as("simhash")),
    Some("""
      WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      h AS (SELECT doc_id, CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv FROM w),
      bits AS (SELECT doc_id, b.b AS b,
                 CASE WHEN SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
                      THEN 1 ELSE 0 END AS bit
               FROM h, (SELECT unnest(range(48)) AS b) b GROUP BY doc_id, b.b)
      SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    """.trim))

  // -- d12: exact hamming-neighbor pairs over the 48-bit SimHash.
  //    Pigeonhole banding: split the signature into 4 x 12-bit bands —
  //    a pair within hamming distance 3 has at most 3 flipped bits, so
  //    it agrees EXACTLY on >= 1 band. The 4 band-equality self-joins
  //    are therefore a lossless candidate generator (this is the
  //    deterministic cousin of d03's probabilistic minhash bands), and
  //    the bit_count verify makes the operator exact: ALL pairs at
  //    hamming <= 3, no recall loss. 100 TB shape: each band join is
  //    an equi-shuffle on a 12-bit-bucketed long key; candidates are
  //    bounded by band-bucket occupancy (near-uniform for simhash),
  //    never all-pairs.
  private val d12 = Q(
    "d12_simhash_neardup",
    (s, d) => {
      val sigs = Tables.documents(s, d)
        .select(col("doc_id"), Dedup.simhash().as("sig"))
      val bands = sigs.select(col("doc_id"), col("sig"),
        explode(expr(
          "transform(sequence(0, 3), b -> struct(b AS band, shiftright(sig, b * 12) & 4095 AS v))")).as("bv"))
        .select(col("doc_id"), col("sig"), col("bv.band").as("band"), col("bv.v").as("v"))
      val l = bands.select(col("band"), col("v"), col("doc_id").as("d1"), col("sig").as("s1"))
      val r = bands.select(col("band"), col("v"), col("doc_id").as("d2"), col("sig").as("s2"))
      l.join(r, Seq("band", "v"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          bit_count(col("s1").bitwiseXOR(col("s2"))).cast(LongType).as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
    },
    Some("""
      WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      h AS (SELECT doc_id, CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS hv FROM w),
      bits AS (SELECT doc_id, b.b AS b,
                 CASE WHEN SUM(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
                      THEN 1 ELSE 0 END AS bit
               FROM h, (SELECT unnest(range(48)) AS b) b GROUP BY doc_id, b.b),
      sig AS (SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS sig
              FROM bits GROUP BY doc_id),
      bands AS (SELECT doc_id, sig, b.b AS band, (sig >> (b.b * 12)) & 4095 AS v
                FROM sig, (SELECT unnest(range(4)) AS b) b),
      cand AS (SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2, l.sig AS s1, r.sig AS s2
               FROM bands l JOIN bands r ON l.band = r.band AND l.v = r.v AND l.doc_id < r.doc_id)
      SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(s1, s2)) <= 3
    """.trim))

  // -- d05: n-gram Jaccard pairs >= 0.5 — exact Jaccard computed only
  //    on LSH candidates from amplified banding ([[K2]] = 16 perms in 8
  //    r=2 bands; see K2's docstring for the measured scaling argument
  //    vs the r=1 banding this replaces: background-Jaccard collisions
  //    made r=1 candidates quadratic in the corpus). The round-1 full
  //    shingle self-join was Σdf² — correct but quadratic in the df cap
  //    at scale; candidate-bounding makes the verify cost linear in
  //    collisions. The oracle applies the identical candidate
  //    generation, so the check stays exact.
  private val d05 = Q(
    "d05_ngram_jaccard",
    (s, d) => {
      val sh = Dedup.shingleIndex(Dedup.shingleH64(Tables.documents(s, d)), MaxDf).cache()
      val cand = Dedup.lshCandidates(Dedup.minhashSigs(sh, K2), K2, R)
      Dedup.jaccard(cand, sh).filter(col("jac") >= 0.5).select("d1", "d2", "jac")
    },
    Some(s"""
      WITH $shingleCte,
      $sigCteK2,
      ${bandCteR2("bands", K2)},
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      ${jaccardTail(0.5)}
    """.trim))

  // -- d17: CONTAINMENT triage of the near-dup candidate set — for
  //    every LSH candidate pair, the asymmetric containment score
  //    i/min(|A|,|B|) next to the symmetric Jaccard, with a relation
  //    verdict (near_exact / near_dup / contained / weak). Jaccard
  //    under-reports small-in-big duplication (a 100-line doc quoted
  //    whole inside a 10k-line doc has jac ~ 0.01 but containment 1.0);
  //    the triage tells a dedup pipeline which rule fired so the keep
  //    policy can differ (drop the copy vs trim the span — d16 extracts
  //    the spans themselves). Honest recall note: minhash banding is
  //    Jaccard-tuned, so extreme-ratio containment pairs may not reach
  //    the candidate set at all — this entry classifies the pairs the
  //    banded generator surfaces; span-level detection of the rest is
  //    d16's job. Cost: identical to d05 plus two scalar columns.
  private val d17 = Q(
    "d17_containment",
    (s, d) => {
      val sh = Dedup.shingleIndex(Dedup.shingleH64(Tables.documents(s, d)), MaxDf).cache()
      val cand = Dedup.lshCandidates(Dedup.minhashSigs(sh, K2), K2, R)
      Dedup.jaccard(cand, sh)
        .withColumn("containment",
          round(col("inter").cast(DoubleType) / least(col("n1"), col("n2")), 4))
        .withColumn("relation",
          when(col("jac") >= 0.8, "near_exact")
            .when(col("jac") >= 0.5, "near_dup")
            .when(col("containment") >= 0.8, "contained")
            .otherwise("weak"))
        .select("d1", "d2", "jac", "containment", "relation")
    },
    Some(s"""
      WITH $shingleCte,
      $sigCteK2,
      ${bandCteR2("bands", K2)},
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      $jaccardCtes
      SELECT d1, d2,
             round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) AS jac,
             round(CAST(i AS DOUBLE) / least(n1.n, n2.n), 4) AS containment,
             CASE WHEN round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) >= 0.8 THEN 'near_exact'
                  WHEN round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) >= 0.5 THEN 'near_dup'
                  WHEN round(CAST(i AS DOUBLE) / least(n1.n, n2.n), 4) >= 0.8 THEN 'contained'
                  ELSE 'weak' END AS relation
      FROM inter JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
    """.trim))

  // -- c04: FUZZY train/test contamination — c01's exact shared-shingle
  //    check catches verbatim leakage; paraphrased or lightly-edited
  //    test documents slip it. This is the published fuzzy variant:
  //    minhash-banded candidates restricted to cross-split pairs, exact
  //    Jaccard on the survivors, jac >= 0.5 = contaminated. Lives in
  //    LlmQueries (not Curation with c01-c03) because it is the d05
  //    machinery applied across the split boundary — the shingle index,
  //    signatures, and banding are shared verbatim. Scale: the
  //    cross-split filter runs on the BANDED candidate set (collision-
  //    bounded), never on train x test; at 100 TB the self-banding
  //    swaps for d11's delta-probe shape (band only the tiny test side,
  //    probe the standing train index) with identical semantics.
  private val c04 = Q(
    "c04_fuzzy_contamination",
    (s, d) => {
      val uOf = (c: org.apache.spark.sql.Column) =>
        graft.functions.ColumnFns.md5_prefix64(c.cast(StringType)) /
          lit(1152921504606846976.0) // 2^60, the p01/c01 unit hash
      val sh = Dedup.shingleIndex(Dedup.shingleH64(Tables.documents(s, d)), MaxDf).cache()
      val cand = Dedup.lshCandidates(Dedup.minhashSigs(sh, K2), K2, R)
        .withColumn("u1", uOf(col("d1")))
        .withColumn("u2", uOf(col("d2")))
        .filter((col("u1") < 0.9 && col("u2") >= 0.95) ||
          (col("u2") < 0.9 && col("u1") >= 0.95))
        .select("d1", "d2")
      Dedup.jaccard(cand, sh)
        .filter(col("jac") >= 0.5)
        .withColumn("u1", uOf(col("d1")))
        .select(
          when(col("u1") < 0.9, col("d1")).otherwise(col("d2")).as("train_doc"),
          when(col("u1") < 0.9, col("d2")).otherwise(col("d1")).as("test_doc"),
          col("jac"))
    },
    Some(s"""
      WITH $shingleCte,
      $sigCteK2,
      ${bandCteR2("bands", K2)},
      uh AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(concat('0x', substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 / 1152921504606846976.0 AS u1,
               CAST(concat('0x', substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 / 1152921504606846976.0 AS u2
             FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      cand AS (SELECT DISTINCT d1, d2 FROM uh
               WHERE (u1 < 0.9 AND u2 >= 0.95) OR (u2 < 0.9 AND u1 >= 0.95)),
      $jaccardCtes,
      jpairs AS (SELECT d1, d2, round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) AS jac,
                   CAST(concat('0x', substr(md5(CAST(d1 AS VARCHAR)), 1, 15)) AS BIGINT)
                     / 1152921504606846976.0 AS u1
                 FROM inter JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
                 WHERE round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) >= 0.5)
      SELECT CASE WHEN u1 < 0.9 THEN d1 ELSE d2 END AS train_doc,
             CASE WHEN u1 < 0.9 THEN d2 ELSE d1 END AS test_doc,
             jac
      FROM jpairs
    """.trim))

  // -- x03: the dedup suite as ONE pass — the production shape. The
  //    catalog's d01/d02/d03/d05 are deliberately self-contained (each
  //    independently oracle-verified), which means each rebuilds the
  //    shingle index from the corpus. A real 100 TB pipeline computes
  //    that index ONCE: here one scan builds one cached index + one
  //    signature table, and three dedup families read from it —
  //    exact-fingerprint pairs, high-precision minhash pairs (r=2 over
  //    perms 0..7, jac>=0.8), and high-recall n-gram pairs (r=2 over
  //    all K2=16 perms, jac>=0.5) — so the suite costs about as much as
  //    its single most expensive member instead of the sum. Because
  //    d03's 4 bands are a PREFIX of d05's 8 (same perm pairs 0..7),
  //    cand03 ⊆ cand05, and the expensive shingle-intersection verify
  //    runs ONCE over cand05: the minhash08 slice is the jac>=0.8 cut
  //    of that one pass semi-joined to its own candidate set (Jaccard
  //    is pair-deterministic, so the slice equals standalone d03 —
  //    LlmSpec asserts it). (At lake scale the cache() becomes a
  //    persisted silver table; the plan shape is identical.)
  private val x03 = Q(
    "x03_dedup_suite",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = Dedup.shingleIndex(Dedup.shingleH64(docs), MaxDf).cache()
      val sigs = Dedup.minhashSigs(sh, K2).cache()
      val jacAll = Dedup.jaccard(Dedup.lshCandidates(sigs, K2, R), sh).cache()
      val sigs8 = sigs.select(col("doc_id") +: (0 until K).map(i => col(s"mh$i")): _*)
      val p03 = jacAll
        .join(Dedup.lshCandidates(sigs8, K, R), Seq("d1", "d2"), "leftsemi")
        .filter(col("jac") >= 0.8)
        .select(lit("minhash08").as("family"), col("d1"), col("d2"), col("jac"))
      val p05 = jacAll
        .filter(col("jac") >= 0.5)
        .select(lit("jaccard05").as("family"), col("d1"), col("d2"), col("jac"))
      val fp = docs.select(col("doc_id"), TextAnalysis.contentFingerprint.as("f"))
      val pex = fp.as("a")
        .join(fp.as("b"), col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
        .select(lit("exact").as("family"), col("a.doc_id").as("d1"),
          col("b.doc_id").as("d2"), lit(1.0).as("jac"))
      p03.unionByName(p05).unionByName(pex)
    },
    Some(s"""
      WITH $shingleCte,
      $sigCteK2,
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      ${bandCteR2("bands2", K)},
      cand2 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                FROM bands2 a JOIN bands2 b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      inter2 AS (SELECT c.d1, c.d2, count(*) AS i
                 FROM cand2 c
                 JOIN sh s1 ON s1.doc_id = c.d1
                 JOIN sh s2 ON s2.doc_id = c.d2 AND s2.h = s1.h
                 GROUP BY c.d1, c.d2),
      p03 AS (SELECT d1, d2, round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) AS jac
              FROM inter2 JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
              WHERE round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) >= 0.8),
      ${bandCteR2("bands1", K2)},
      cand1 AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
                FROM bands1 a JOIN bands1 b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      inter1 AS (SELECT c.d1, c.d2, count(*) AS i
                 FROM cand1 c
                 JOIN sh s1 ON s1.doc_id = c.d1
                 JOIN sh s2 ON s2.doc_id = c.d2 AND s2.h = s1.h
                 GROUP BY c.d1, c.d2),
      p05 AS (SELECT d1, d2, round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) AS jac
              FROM inter1 JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2
              WHERE round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) >= 0.5),
      fp AS (SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS f
             FROM documents),
      pex AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(1.0 AS DOUBLE) AS jac
              FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id)
      SELECT 'minhash08' AS family, d1, d2, jac FROM p03
      UNION ALL SELECT 'jaccard05' AS family, d1, d2, jac FROM p05
      UNION ALL SELECT 'exact' AS family, d1, d2, jac FROM pex
    """.trim))

  /** shared DuckDB CTE: corpus-adaptive banded hyperplane-LSH
    * candidate pairs (v1 < v2) — the oracle image of
    * [[Similarity.bandedCandidates]](4·bits, bits) at
    * bits = [[Similarity.adaptiveBandBits]](n) (4 bands always; the
    * integer GREATEST(4, LENGTH(BIN((n+127)//128 - 1))) is that
    * function's exact DuckDB image — see its docstring for why float
    * log2 is avoided). At every graded SF n <= 2048 so bits = 4 and
    * the CTE degenerates to the historical 16-plane/4-bit form; used
    * by d06, s03, and d10.
    */
  private val bandCteA = s"""
    nb AS (SELECT GREATEST(4, LENGTH(BIN(CAST((COUNT(*) + 127) // 128 - 1 AS BIGINT)))) AS bits
           FROM embeddings),
    w16 AS (SELECT p.p AS p, d.d AS d,
            CASE WHEN CAST(concat('0x', substr(md5(p.p || '|' || d.d), 1, 1)) AS INT) % 2 = 0
                 THEN 1.0 ELSE -1.0 END AS wt
          FROM (SELECT unnest(range(4 * (SELECT bits FROM nb))) AS p) p,
               (SELECT unnest(range(${Similarity.Dims})) AS d) d),
    proj AS (SELECT vec_id, w16.p AS p, SUM(CAST(embedding[w16.d+1] AS DOUBLE) * w16.wt) AS pr
             FROM embeddings, w16 GROUP BY vec_id, w16.p),
    bands AS (SELECT vec_id, p // (SELECT bits FROM nb) AS band,
                CAST(SUM(CASE WHEN pr > 0 THEN (1 << (p % (SELECT bits FROM nb))) ELSE 0 END) AS BIGINT) AS bv
              FROM proj GROUP BY vec_id, p // (SELECT bits FROM nb)),
    cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id)"""

  // -- d06: embedding-cosine near-dup pairs — banded hyperplane-LSH
  //    candidates (4 bands of adaptiveBandBits sign bits — 16/4 at
  //    every graded SF, widening with corpus cardinality so band-bucket
  //    occupancy stays bounded; the 10x probe measured the fixed config
  //    quadratic) verified at cosine >= 0.4 (this corpus's near-dup
  //    band; the semantic-dedup counterpart of d03's lexical pairs).
  //    The count() that sizes the banding is corpus cardinality — at
  //    lake scale it comes from table stats, not a scan.
  private val d06 = Q(
    "d06_embedding_neardup",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val bits = Similarity.adaptiveBandBits(emb.count())
      val cand = Similarity.bandedCandidates(emb, planes = 4 * bits, bandBits = bits)
      val e1 = emb.select(col("vec_id").as("v1"), col("embedding").as("e1"))
      val e2 = emb.select(col("vec_id").as("v2"), col("embedding").as("e2"))
      cand
        .join(e1, "v1")
        .join(e2, "v2")
        .select(col("v1"), col("v2"), round(Similarity.cosine(col("e1"), col("e2")), 6).as("cos"))
        .filter(col("cos") >= 0.4)
        .select("v1", "v2", "cos")
    },
    Some(s"""
      WITH $bandCteA,
      cs AS (SELECT c.v1, c.v2,
               SUM(CAST(e1.embedding[d.d+1] AS DOUBLE) * CAST(e2.embedding[d.d+1] AS DOUBLE)) AS dt,
               SUM(CAST(e1.embedding[d.d+1] AS DOUBLE) * CAST(e1.embedding[d.d+1] AS DOUBLE)) AS na,
               SUM(CAST(e2.embedding[d.d+1] AS DOUBLE) * CAST(e2.embedding[d.d+1] AS DOUBLE)) AS nb
             FROM cand c
             JOIN embeddings e1 ON e1.vec_id = c.v1
             JOIN embeddings e2 ON e2.vec_id = c.v2,
             (SELECT unnest(range(64)) AS d) d
             GROUP BY c.v1, c.v2)
      SELECT v1, v2, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM cs WHERE round(dt / (sqrt(na) * sqrt(nb)), 6) >= 0.4
    """.trim))

  /** shared DuckDB CTE chain ending in `asim(vec_id, cid, sim)` and
    * `assign(vec_id, cid)` — the oracle image of
    * [[Similarity.ivfAssign]] over the deterministic sampled quantizer
    * (nCentroids = 16), used by s04's probe search, d14's
    * cluster-partitioned dedup, and x05's cluster-balanced mixing.
    */
  private[llm] val ivfAssignCte = s"""dims AS (SELECT unnest(range(${Similarity.Dims})) AS d),
      cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
      asim AS (SELECT e.vec_id, c.cid,
            round(SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(c.cv[d.d+1] AS DOUBLE))
              / (sqrt(SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)))
               * sqrt(SUM(CAST(c.cv[d.d+1] AS DOUBLE) * CAST(c.cv[d.d+1] AS DOUBLE)))), 6) AS sim
          FROM embeddings e, cents c, dims d GROUP BY e.vec_id, c.cid),
      assign AS (SELECT vec_id, cid FROM asim
                 QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) = 1)"""

  /** d14's similarity radius: the corpus's near-dup band (same 0.4 the
    * LSH-verified d06 pairs use), applied to the 6-dp-rounded cosine on
    * both engines so the boundary set is tie-free.
    */
  private val SemTau = 0.4

  // -- d14: SemDeDup-style cluster-partitioned semantic dedup (the
  //    cluster-then-dedup recipe of Abbas et al. 2023, arXiv:2303.09540):
  //    coarse-cluster the embedding space with the IVF quantizer, then
  //    dedup ONLY within clusters — the cluster id bounds the quadratic
  //    pairwise term that makes corpus-wide semantic dedup intractable.
  //    Where d06/d10 REPORT near-dup pairs via LSH candidates, d14 is
  //    the production partition-then-drop shape: every vector labeled
  //    with its cluster and a keep flag, drop = "a lower-id cluster-mate
  //    sits within the similarity radius" (the deterministic image of
  //    SemDeDup's arbitrary-keeper rule; transitive-closure semantics
  //    are d09's contraction, composable on top).
  //    100 TB shape: assignment is one broadcast-centroid scan
  //    (ivfAssign — no corpus shuffle beyond the per-vector argmax);
  //    the pair stage is an equi-join on cid, never a cross join, and
  //    nCentroids is the operational knob: set it ~corpus/target-
  //    cluster-size and BOTH the quadratic term and the join's
  //    parallelism grain stay constant per cluster as the corpus grows.
  private val d14 = Q(
    "d14_semdedup",
    (s, d) => {
      // assign feeds both pair sides and the output labeling — cache,
      // or the broadcast-argmax scan runs three times
      val assign = Similarity.ivfAssign(Tables.embeddings(s, d), 16).cache()
      val a = assign.select(col("cid"), col("vec_id").as("v1"), col("embedding").as("e1"))
      val b = assign.select(col("cid"), col("vec_id").as("v2"), col("embedding").as("e2"))
      val dropped = a.join(b, "cid")
        .filter(col("v1") < col("v2") &&
          round(Similarity.cosine(col("e1"), col("e2")), 6) >= SemTau)
        .select(col("v2").as("vec_id")).distinct()
      assign
        .join(dropped.withColumn("dropped", lit(1L)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"),
          when(col("dropped") === 1L, 0L).otherwise(1L).as("keep"))
    },
    Some(s"""
      WITH $ivfAssignCte,
      cs AS (SELECT a1.vec_id AS v1, a2.vec_id AS v2,
               SUM(CAST(e1.embedding[d.d+1] AS DOUBLE) * CAST(e2.embedding[d.d+1] AS DOUBLE)) AS dt,
               SUM(CAST(e1.embedding[d.d+1] AS DOUBLE) * CAST(e1.embedding[d.d+1] AS DOUBLE)) AS na,
               SUM(CAST(e2.embedding[d.d+1] AS DOUBLE) * CAST(e2.embedding[d.d+1] AS DOUBLE)) AS nb
             FROM assign a1
             JOIN assign a2 ON a2.cid = a1.cid AND a1.vec_id < a2.vec_id
             JOIN embeddings e1 ON e1.vec_id = a1.vec_id
             JOIN embeddings e2 ON e2.vec_id = a2.vec_id,
             dims d
             GROUP BY a1.vec_id, a2.vec_id),
      drops AS (SELECT DISTINCT v2 AS vec_id FROM cs
                WHERE round(dt / (sqrt(na) * sqrt(nb)), 6) >= $SemTau)
      SELECT a.vec_id, a.cid,
             CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM assign a LEFT JOIN drops dr ON dr.vec_id = a.vec_id
    """.trim))

  // -- s01: brute-force cosine top-10 against vec 0 (the ANN baseline).
  private val s01 = Q(
    "s01_cosine_topk",
    (s, d) => Similarity.topK(Tables.embeddings(s, d), 0L, 10),
    Some("""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      x AS (SELECT e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e, q, (SELECT unnest(range(64)) AS d) d
            WHERE e.vec_id <> 0 GROUP BY e.vec_id, e.label)
      SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM x ORDER BY cos DESC, vec_id ASC LIMIT 10
    """.trim))

  // -- s07: RANGE search — every vector within a similarity radius of
  //    the query (threshold retrieval), the dual of s01's top-k: k-NN
  //    bounds the result count, range search bounds the quality. The
  //    brute scan here is the verifier shape; at scale the same
  //    predicate composes with the LSH (s03) or IVF (s04) candidate
  //    generators, which bound the scan before the exact filter. The
  //    threshold applies to the 6-decimal-rounded cosine on both
  //    engines, so the boundary row set is tie-free.
  private val s07 = Q(
    "s07_range_search",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
      emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .filter(col("cos") >= 0.2)
    },
    Some("""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      x AS (SELECT e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e, q, (SELECT unnest(range(64)) AS d) d
            WHERE e.vec_id <> 0 GROUP BY e.vec_id, e.label)
      SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM x WHERE round(dt / (sqrt(na) * sqrt(nb)), 6) >= 0.2
    """.trim))

  /** shared DuckDB CTE: md5-derived random-hyperplane buckets (lazy:
    * referenced by d06 which is declared earlier in the file)
    */
  private lazy val bucketCte = s"""
    w AS (SELECT p.p AS p, d.d AS d,
            CASE WHEN CAST(concat('0x', substr(md5(p.p || '|' || d.d), 1, 1)) AS INT) % 2 = 0
                 THEN 1.0 ELSE -1.0 END AS wt
          FROM (SELECT unnest(range(${Similarity.Planes})) AS p) p,
               (SELECT unnest(range(${Similarity.Dims})) AS d) d),
    proj AS (SELECT vec_id, w.p AS p, SUM(CAST(embedding[w.d+1] AS DOUBLE) * w.wt) AS pr
             FROM embeddings, w GROUP BY vec_id, w.p),
    bkt AS (SELECT vec_id,
              CAST(SUM(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
            FROM proj GROUP BY vec_id)"""

  // -- s02: LSH signature per vector (the scale path: buckets bound the
  //    join).
  private val s02 = Q(
    "s02_lsh_buckets",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.bucket(col("embedding")).as("bucket")),
    Some(s"WITH $bucketCte SELECT vec_id, bucket FROM bkt".trim))

  // -- s03: ANN join — best banded-LSH-candidate neighbor per vector
  //    (4 bands of adaptiveBandBits, same candidate machinery as d06;
  //    replaces the round-1 single-8-bit-bucket join whose 256-bucket
  //    key capped parallelism and recall at scale).
  private val s03 = Q(
    "s03_ann_join",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val bits = Similarity.adaptiveBandBits(emb.count())
      Similarity.annJoin(emb, planes = 4 * bits, bandBits = bits)
    },
    Some(s"""
      WITH $bandCteA,
      pairs AS (SELECT v1 AS vec_id, v2 AS neighbor_id FROM cand
                UNION ALL
                SELECT v2 AS vec_id, v1 AS neighbor_id FROM cand),
      cs AS (SELECT p.vec_id, p.neighbor_id,
               SUM(CAST(e1.embedding[d.d+1] AS DOUBLE) * CAST(e2.embedding[d.d+1] AS DOUBLE)) AS dt,
               SUM(CAST(e1.embedding[d.d+1] AS DOUBLE) * CAST(e1.embedding[d.d+1] AS DOUBLE)) AS na,
               SUM(CAST(e2.embedding[d.d+1] AS DOUBLE) * CAST(e2.embedding[d.d+1] AS DOUBLE)) AS nb
             FROM pairs p
             JOIN embeddings e1 ON e1.vec_id = p.vec_id
             JOIN embeddings e2 ON e2.vec_id = p.neighbor_id,
             (SELECT unnest(range(64)) AS d) d
             GROUP BY p.vec_id, p.neighbor_id),
      ranked AS (SELECT vec_id, neighbor_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY round(dt / (sqrt(na) * sqrt(nb)), 6) DESC,
                                               neighbor_id ASC) AS rk
                 FROM cs)
      SELECT vec_id, neighbor_id, cos FROM ranked WHERE rk = 1
    """.trim))

  // -- d11: incremental near-dup — the "new batch vs existing corpus"
  //    form of d03, the shape a 100 TB pipeline actually runs daily
  //    (you never re-dedup the world; you LSH-join the delta against
  //    the corpus's standing band index). Corpus/delta split is the
  //    deterministic doc_id hash (u < 0.8 = corpus, else delta); the
  //    band join is asymmetric (delta x corpus, never corpus x corpus),
  //    so candidate cost scales with |delta|, not |corpus|^2.
  /** shared oracle for d11 (in-query index) and d15 (standing parquet
    * index): both compute the exact corpus-vs-delta banded near-dup
    * pairs, and an index over the whole corpus answers identically to
    * the in-query rebuild — one oracle covers both, the s10/s09 twin
    * recipe applied to the lexical family.
    */
  private lazy val incrementalNearDupOracle: String = {
    def uh(q: String) =
      s"CAST(concat('0x', substr(md5(CAST($q.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) / 1152921504606846976.0"
    s"""
      WITH $shingleCte,
      $sigCte,
      bands AS (${(0 until K / R)
        .map(b => s"SELECT doc_id, $b AS band, mh${b * R} || '_' || mh${b * R + 1} AS bv FROM sigs")
        .mkString(" UNION ALL ")}),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
               WHERE ${uh("a")} < 0.8 AND ${uh("b")} >= 0.8),
      $jaccardCtes
      SELECT d1 AS corpus_doc, d2 AS delta_doc, jac
      FROM (${jaccardSelect(0.8)})
      """.trim
  }

  /** d18's oracle: [[incrementalNearDupOracle]] with the forgotten docs
    * (doc_id % 10 = 3) excluded from the corpus side of the candidate
    * join — the exact image of "an index rebuilt without them". The
    * shingle/sig CTEs stay corpus-wide because the frozen stop set (and
    * therefore every surviving doc's encoding) is unchanged by a
    * membership deletion.
    */
  private lazy val forgetNearDupOracle: String = {
    def uh(q: String) =
      s"CAST(concat('0x', substr(md5(CAST($q.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) / 1152921504606846976.0"
    s"""
      WITH $shingleCte,
      $sigCte,
      bands AS (${(0 until K / R)
        .map(b => s"SELECT doc_id, $b AS band, mh${b * R} || '_' || mh${b * R + 1} AS bv FROM sigs")
        .mkString(" UNION ALL ")}),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
               WHERE ${uh("a")} < 0.8 AND a.doc_id % 10 <> 3 AND ${uh("b")} >= 0.8),
      $jaccardCtes
      SELECT d1 AS corpus_doc, d2 AS delta_doc, jac
      FROM (${jaccardSelect(0.8)})
      """.trim
  }

  private val d11 = Q(
    "d11_incremental_neardup",
    (s, d) => {
      val sh = Dedup.shingleIndex(Dedup.shingleH64(Tables.documents(s, d)), MaxDf).cache()
      val bands = Dedup.bandTable(Dedup.minhashSigs(sh, K), K, R)
      val u = graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast(org.apache.spark.sql.types.StringType)) /
        lit(1152921504606846976.0) // 2^60, same unit hash as p01
      val corpus = bands.filter(u < 0.8)
        .select(col("band"), col("bv"), col("doc_id").as("d1"))
      val delta = bands.filter(u >= 0.8)
        .select(col("band"), col("bv"), col("doc_id").as("d2"))
      val cand = corpus.join(delta, Seq("band", "bv")).select("d1", "d2").distinct()
      Dedup.jaccard(cand, sh).filter(col("jac") >= 0.8)
        .select(col("d1").as("corpus_doc"), col("d2").as("delta_doc"), col("jac"))
    },
    Some(incrementalNearDupOracle))

  // -- d15: near-dup against a STANDING lexical index — s10's recipe
  //    applied to the MinHash family, closing the same honest gap d11
  //    carried (it re-shingles and re-signs the corpus inside the
  //    query). The persisted index holds the two tables a production
  //    dedup service keeps warm: the capped (doc_id, h64) shingle
  //    inverted index and the (doc_id, band, bv) LSH band table. Both
  //    are per-doc pure functions, and the one corpus-wide input — the
  //    stop-shingle set — is FROZEN at build time as versioned index
  //    state (exactly s10's frozen quantizer/codebook), so a delta
  //    batch appended against the frozen stops is provably identical
  //    to a full rebuild. The search: encode ONLY the delta (shingle +
  //    sign against frozen stops), band-join it against the standing
  //    parquet bands, Jaccard-verify candidates with corpus shingle
  //    sets read from the index — the corpus text is never touched.
  //    Index over the whole corpus => same answers as d11's in-query
  //    rebuild => same oracle.
  /** d16 span n-gram width */
  private val SpanN = 8

  // -- d16: exact duplicated-SPAN extraction — the suffix-array-family
  //    dedup (find every maximal text span that also occurs in another
  //    document, the "memorized passage" remover), re-expressed as
  //    positional-shingle run coalescing: POSITIONAL 8-gram shingles
  //    (not the dedup family's distinct sets), cross-doc df to mark
  //    shingles seen in >= 2 documents, then per-doc island detection
  //    (pos - row_number) merges consecutive duplicated positions into
  //    maximal spans [start, start + len). Span length in tokens =
  //    last_pos - first_pos + N. Scale: the df aggregation and the
  //    mark join both key on the 60-bit h64 (never text); the island
  //    windows are doc_id-partitioned; nothing is all-pairs — cost is
  //    one token-stream pass + one hash-keyed join, the map-reduce
  //    analog of the suffix-array pipeline. Integer-only output.
  private val d16 = Q(
    "d16_dup_spans",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // positional shingles: every position, hashed — repeats kept
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= SpanN)
        .select(col("doc_id"),
          posexplode(expr(
            s"transform(sequence(0, least(size(toks) - $SpanN, ${Dedup.MaxShinglePositions - 1})), " +
              s"i -> concat_ws(' ', slice(toks, i + 1, $SpanN)))")).as(Seq("pos", "shingle")))
        .select(col("doc_id"), col("pos"),
          graft.functions.ColumnFns.md5_prefix64(col("shingle")).as("h64"))
      // shingles that occur in >= 2 distinct documents
      val dup = sh.groupBy("h64")
        .agg(count_distinct(col("doc_id")).as("ndocs"))
        .filter(col("ndocs") >= 2).select("h64")
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      sh.join(dup, "h64")
        .withColumn("rn", row_number().over(wDoc))
        .withColumn("island", col("pos") - col("rn"))
        .groupBy("doc_id", "island")
        .agg(
          min(col("pos")).cast(LongType).as("span_start"),
          (max(col("pos")) - min(col("pos")) + SpanN).cast(LongType).as("span_tokens"),
          count(lit(1)).cast(LongType).as("n_shingles"))
        .drop("island")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sh AS (SELECT doc_id, i.i AS pos,
               CAST(concat('0x', substr(md5(
                 ${(0 until SpanN).map(k => s"toks[i.i+${k + 1}]").mkString(" || ' ' || ")}
               ), 1, 15)) AS BIGINT) AS h64
             FROM t, (SELECT unnest(range(${Dedup.MaxShinglePositions})) AS i) i
             WHERE len(toks) >= $SpanN AND i.i <= len(toks) - $SpanN),
      dup AS (SELECT h64 FROM sh GROUP BY h64 HAVING count(DISTINCT doc_id) >= 2),
      mk AS (SELECT sh.doc_id, sh.pos,
               CAST(row_number() OVER (PARTITION BY sh.doc_id ORDER BY sh.pos) AS BIGINT) AS rn
             FROM sh JOIN dup USING (h64))
      SELECT doc_id,
             CAST(MIN(pos) AS BIGINT) AS span_start,
             CAST(MAX(pos) - MIN(pos) + $SpanN AS BIGINT) AS span_tokens,
             CAST(count(*) AS BIGINT) AS n_shingles
      FROM (SELECT doc_id, pos, pos - rn AS island FROM mk)
      GROUP BY doc_id, island
    """.trim))

  /** the p01/d11 unit hash, u in [0, 1) as a pure function of doc_id */
  private def unitU = graft.functions.ColumnFns
    .md5_prefix64(col("doc_id").cast(org.apache.spark.sql.types.StringType)) /
    lit(1152921504606846976.0) // 2^60

  private def d15IdxDir =
    new java.io.File("target/graft_idx/d15_neardup").getAbsolutePath

  /** d15 BUILD: freeze the corpus-wide stop set (df > MaxDf) to parquet
    * next to the index — the "frozen index state" is now literally on
    * disk, which is what lets the probe run in a different process —
    * then write the standing shingle/band parquet the production way:
    * base batch overwritten, a later batch APPENDED against the same
    * frozen stops. One shingle explosion feeds stops, base and tail
    * (d11's cache reasoning; text is the widest intermediate).
    */
  private[graft] def d15Build(s: SparkSession, d: String): Unit =
    d15BuildAt(s, d, d15IdxDir)

  private[graft] def d15BuildAt(s: SparkSession, d: String, idxDir: String): Unit = {
    // a (re)build supersedes any crashed fold's staged/retired state —
    // rolling a stale fold forward over fresh relations would corrupt
    // them (the cross-run poisoning mode documented on s13BuildAt)
    val root = new org.apache.hadoop.fs.Path(idxDir)
    graft.streaming.FoldCommit.clearResidue(
      root.getFileSystem(s.sparkContext.hadoopConfiguration), root)
    val shAll = Dedup.shingleH64(Tables.documents(s, d)).cache()
    try {
      shAll.groupBy("h64").agg(count(lit(1)).as("df"))
        .filter(col("df") > MaxDf).select("h64")
        .write.mode("overwrite").parquet(s"$idxDir/stops")
      val stops = s.read.parquet(s"$idxDir/stops")
      def encode(pred: org.apache.spark.sql.Column) = {
        val sh = shAll.filter(pred).join(broadcast(stops), Seq("h64"), "left_anti")
        (sh, Dedup.bandTable(Dedup.minhashSigs(sh, K), K, R))
      }
      val u = unitU
      val (shBase, bdBase) = encode(u < 0.8 && col("doc_id") % 10 =!= 7)
      shBase.write.mode("overwrite").parquet(s"$idxDir/shingles")
      bdBase.write.mode("overwrite").parquet(s"$idxDir/bands")
      val (shTail, bdTail) = encode(u < 0.8 && col("doc_id") % 10 === 7)
      shTail.write.mode("append").parquet(s"$idxDir/shingles")
      bdTail.write.mode("append").parquet(s"$idxDir/bands")
    } finally shAll.unpersist(): Unit
  }

  /** d15 PROBE: encode only the delta docs (u >= 0.8) against the
    * persisted stop set, probe the standing band parquet for
    * candidates, verify by Jaccard over standing ∪ delta shingles.
    * The corpus text outside the delta is never touched.
    */
  private[graft] def d15Probe(s: SparkSession, d: String): DataFrame =
    d15ProbeAt(s, d, d15IdxDir)

  private[graft] def d15ProbeAt(s: SparkSession, d: String, idxDir: String): DataFrame = {
    val stops = s.read.parquet(s"$idxDir/stops")
    val shDelta = Dedup.shingleH64(Tables.documents(s, d).filter(unitU >= 0.8))
      .join(broadcast(stops), Seq("h64"), "left_anti")
    val bdDelta = Dedup.bandTable(Dedup.minhashSigs(shDelta, K), K, R)
    val cand = s.read.parquet(s"$idxDir/bands")
      .select(col("band"), col("bv"), col("doc_id").as("d1"))
      .join(bdDelta.select(col("band"), col("bv"), col("doc_id").as("d2")),
        Seq("band", "bv"))
      .select("d1", "d2").distinct()
    val sh = s.read.parquet(s"$idxDir/shingles").unionByName(shDelta)
    Dedup.jaccard(cand, sh).filter(col("jac") >= 0.8)
      .select(col("d1").as("corpus_doc"), col("d2").as("delta_doc"), col("jac"))
  }

  /** RIGHT-TO-BE-FORGOTTEN fold on a standing lexical index: delete
    * every row belonging to the predicate's doc_ids from the persisted
    * shingle and band relations (staged rewrite + atomic-ish swap, run
    * under the [[graft.streaming.LakeCompact]] lease so probes and
    * appends are fenced for the window — the rebuildBands recipe on
    * the MinHash family). The frozen STOP SET is deliberately NOT
    * recomputed: stop statistics are corpus-release state like the
    * quantizer tables, and a membership deletion must not change how
    * the surviving docs were encoded — which is exactly what makes the
    * post-forget search provably identical to an index rebuilt without
    * the forgotten docs against the same stops (d18's oracle).
    */
  private[graft] def forgetDocs(
      s: SparkSession, idxDir: String, pred: org.apache.spark.sql.Column): Unit =
    forgetRows(s, idxDir, Seq("shingles", "bands"), pred)

  /** the generic row-filter forget fold: any standing index whose
    * relations are row-shaped (one row belongs to one id) deletes by
    * filtered rewrite — d15's shingle/band tables, s10's
    * (vec_id, cid, pq) posting rows, s19's code rows. The frozen
    * derived tables (stop set, quantizer centroids, codebooks) are
    * untouched by the same encode-invariance argument throughout;
    * aggregate-shaped state (s13's df/stats) instead needs the
    * [[s13Forget]] retraction form. Each relation swap goes through
    * [[graft.streaming.FoldCommit]] (stage → marker → displace →
    * publish → retire), so a crash at any point heals on the next
    * maintenance entry instead of stranding the relation — and a
    * re-entered fold over a healed (already-folded) image is a no-op,
    * because the filtered rewrite is idempotent.
    */
  private[graft] def forgetRows(
      s: SparkSession, idxDir: String, parts: Seq[String],
      pred: org.apache.spark.sql.Column): Unit =
    graft.streaming.LakeCompact.withLease(s, idxDir) {
      val root = new org.apache.hadoop.fs.Path(idxDir)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      for (part <- parts)
        graft.streaming.FoldCommit.publish(fs, root, part, Nil) { staging =>
          s.read.parquet(s"$idxDir/$part").filter(!pred)
            .write.mode("overwrite").parquet(staging)
        }
    }

  // -- d18: the deletion half of standing-index maintenance — build the
  //    d15 index, FORGET a doc slice (takedown / right-to-be-forgotten,
  //    the operation a 100 TB training-data pipeline must run without
  //    re-encoding the world), then run the d15 search. The oracle is
  //    the d11/d15 exact computation with the forgotten docs excluded
  //    from the corpus side — so the entry proves forget ≡ rebuild-
  //    without-them (stop set frozen on both sides, the encode
  //    invariance argument in [[forgetDocs]]'s doc).
  private val d18 = Q(
    "d18_forget_neardup",
    (s, d) => {
      val idxDir = new java.io.File("target/graft_idx/d18_forget").getAbsolutePath
      d15BuildAt(s, d, idxDir)
      forgetDocs(s, idxDir, col("doc_id") % 10 === 3)
      d15ProbeAt(s, d, idxDir)
    },
    Some(forgetNearDupOracle))

  private val d15 = Q(
    "d15_standing_neardup",
    (s, d) => { d15Build(s, d); d15Probe(s, d) },
    Some(incrementalNearDupOracle))

  // -- e01: int8 scalar quantization of the embedding column — the
  //    compression step an ANN index at 100 TB runs before storage
  //    (4x smaller vectors, one map-side pass, no shuffle). Per-vector
  //    symmetric scale = 127/max|x|; quantized value = floor(x*scale)
  //    (floor, not round: IEEE-exact on both engines, no half-ulp
  //    tie-break parity risk). The harness-facing output projects the
  //    int8 vector to scalars (sum/min/max); the library shape would
  //    keep the array column.
  private val e01 = Q(
    "e01_quantize_int8",
    (s, d) =>
      Tables.embeddings(s, d)
        .withColumn("mx", expr("array_max(transform(embedding, x -> abs(cast(x as double))))"))
        .filter(col("mx") > 0)
        .withColumn("scale", lit(127.0) / col("mx"))
        .select(
          col("vec_id"),
          round(col("scale"), 6).as("scale"),
          expr("aggregate(embedding, cast(0 as bigint), (acc, x) -> acc + cast(floor(cast(x as double) * scale) as bigint))").as("qsum"),
          expr("cast(array_min(transform(embedding, x -> floor(cast(x as double) * scale))) as bigint)").as("qmin"),
          expr("cast(array_max(transform(embedding, x -> floor(cast(x as double) * scale))) as bigint)").as("qmax")),
    Some("""
      WITH m AS (SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
                 FROM embeddings),
      sc AS (SELECT vec_id, embedding, 127.0 / mx AS scale FROM m WHERE mx > 0)
      SELECT vec_id, round(scale, 6) AS scale,
             CAST(list_sum(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT))) AS BIGINT) AS qsum,
             CAST(list_min(list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * scale))) AS BIGINT) AS qmin,
             CAST(list_max(list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * scale))) AS BIGINT) AS qmax
      FROM sc
    """.trim))

  /** shared DuckDB CTE chain ending in `best(vec_id, s, code)` — the
    * oracle image of [[Similarity.pqEncode]]'s per-subspace argmin
    * (8 subspaces x 16 sampled codewords, squared-L2, ties to the
    * lower code). Used by e02 and s08.
    */
  private val pqCte = s"""cw AS (SELECT vec_id AS code, embedding AS cv
            FROM embeddings WHERE vec_id < ${Similarity.PqCodewords}),
      sub AS (SELECT unnest(range(${Similarity.PqM})) AS s),
      d8 AS (SELECT unnest(range(${Similarity.Dims / Similarity.PqM})) AS i),
      dist AS (SELECT e.vec_id, s.s, c.code,
                 round(SUM(pow(CAST(e.embedding[s.s*8+i.i+1] AS DOUBLE)
                             - CAST(c.cv[s.s*8+i.i+1] AS DOUBLE), 2)), 6) AS dd
               FROM embeddings e, cw c, sub s, d8 i
               GROUP BY e.vec_id, s.s, c.code),
      best AS (SELECT vec_id, s, code FROM dist
               QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dd ASC, code ASC) = 1)"""

  // -- e02: product-quantization encode — every 64-float vector
  //    compressed to ONE BIGINT of 8 4-bit codes (64x compression), the
  //    storage layer of billion-scale IVF-PQ ANN (next to e01's int8
  //    scalar quantization, which only compresses 4x). Codebooks are
  //    the deterministic sampled quantizer per subspace; s08 searches
  //    this code space.
  private val e02 = Q(
    "e02_pq_encode",
    (s, d) => Similarity.pqEncode(Tables.embeddings(s, d)),
    Some(s"""
      WITH $pqCte
      SELECT vec_id,
             CAST(SUM(code * (CAST(1 AS BIGINT) << (4 * s))) AS BIGINT) AS pq
      FROM best GROUP BY vec_id
    """.trim))

  // -- e04: RESIDUAL (two-level) product quantization — the RQ rung
  //    between e02's single-level PQ and a trained additive quantizer:
  //    level 2 re-encodes the level-1 residual against residual
  //    codebooks (the level-1 residuals of vectors 16..31 — the
  //    sampled-quantizer recipe one level down), doubling the bits and
  //    shrinking reconstruction error. Both errors are OUTPUT columns
  //    (sums of 6-dp-rounded per-subspace distances as exact decimals,
  //    so both engines agree bit-for-bit), which makes the refinement
  //    measurable: LlmSpec's e04 case asserts strict improvement of
  //    the MEAN error plus exact zeroing on the codebook-donor
  //    vectors. Per-vector err2 <= err1 is NOT guaranteed (the level-2
  //    codebook has no zero codeword, so a residual codeword can
  //    overshoot where the zero estimate was already close — see
  //    Similarity.scala's rq doc). No corpus shuffle: two broadcast
  //    cross-joins with map-side-combined per-vector aggregates.
  /** the e04 residual-quantization CTE chain (assumes $pqCte is in
    * scope): level-1 best codes with distances (bd), per-dim residuals
    * (res), the level-2 codebooks (cw2 — residuals of vectors 16..31),
    * and the level-2 argmin (best2). Shared by e04 and s26.
    */
  private val rqCte = s"""bd AS (SELECT b.vec_id, b.s, b.code, d.dd
             FROM best b JOIN dist d
               ON d.vec_id = b.vec_id AND d.s = b.s AND d.code = b.code),
      res AS (SELECT e.vec_id, b.s, i.i,
                CAST(e.embedding[b.s*8+i.i+1] AS DOUBLE)
                  - CAST(c.cv[b.s*8+i.i+1] AS DOUBLE) AS rv
              FROM embeddings e
              JOIN best b ON b.vec_id = e.vec_id
              JOIN cw c ON c.code = b.code, d8 i),
      cw2 AS (SELECT vec_id - ${Similarity.PqCodewords} AS code2, s, i, rv
              FROM res
              WHERE vec_id >= ${Similarity.PqCodewords}
                AND vec_id < ${2 * Similarity.PqCodewords}),
      dist2 AS (SELECT r.vec_id, r.s, w.code2,
                  round(SUM(pow(r.rv - w.rv, 2)), 6) AS dd
                FROM res r JOIN cw2 w ON w.s = r.s AND w.i = r.i
                GROUP BY r.vec_id, r.s, w.code2),
      best2 AS (SELECT vec_id, s, code2, dd FROM dist2
                QUALIFY row_number() OVER (PARTITION BY vec_id, s
                  ORDER BY dd ASC, code2 ASC) = 1)"""

  private val e04 = Q(
    "e04_residual_pq",
    (s, d) => Similarity.residualPqEncode(Tables.embeddings(s, d)),
    Some(s"""
      WITH $pqCte,
      $rqCte
      SELECT b.vec_id,
             CAST(SUM(b.code * (CAST(1 AS BIGINT) << (4 * b.s))) AS BIGINT) AS pq,
             CAST(SUM(b2.code2 * (CAST(1 AS BIGINT) << (4 * b2.s))) AS BIGINT) AS pq2,
             CAST(SUM(CAST(b.dd AS DECIMAL(18,6))) AS DOUBLE) AS err1,
             CAST(SUM(CAST(b2.dd AS DECIMAL(18,6))) AS DOUBLE) AS err2
      FROM bd b JOIN best2 b2 ON b2.vec_id = b.vec_id AND b2.s = b.s
      GROUP BY b.vec_id
    """.trim))

  // -- s26: RQ-REFINED search, the "+R" of IVFADC+R — what e04's
  //    second level is FOR: rank the corpus by level-1 ADC (s08's
  //    float-free pass), keep a WIDE shortlist, refine those
  //    candidates with the level-2 residual ADC partials
  //    (score = q·cw1 + q·cw2 — still no float vectors), cut to a
  //    NARROW shortlist, then pay exact cosines only there. The
  //    refinement buys narrow-shortlist recall at the cost of one
  //    broadcast lookup over `wide` rows (LlmSpec measures the recall
  //    gain against the unrefined cut). Decimal-summed partials keep
  //    every shortlist boundary tie-free against the oracle.
  /** the s26/s27 oracle: both search the same frozen sampled
    * codebooks over the whole corpus, so the standing index changes
    * the PLAN (no re-encode, parquet scan), never the answer
    */
  private lazy val rqRefineOracle = s"""
      WITH $pqCte,
      $rqCte,
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      adc1 AS (SELECT c.code, s.s,
                 CAST(round(SUM(CAST(c.cv[s.s*8+i.i+1] AS DOUBLE)
                              * CAST(q.qv[s.s*8+i.i+1] AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS p
               FROM cw c, q, sub s, d8 i GROUP BY c.code, s.s),
      w1 AS (SELECT b.vec_id, SUM(a.p) AS score1
             FROM best b JOIN adc1 a ON a.s = b.s AND a.code = b.code
             WHERE b.vec_id <> 0 GROUP BY b.vec_id
             ORDER BY score1 DESC, vec_id ASC LIMIT 50),
      adc2 AS (SELECT w.code2, w.s,
                 CAST(round(SUM(w.rv * CAST(q.qv[w.s*8+w.i+1] AS DOUBLE)), 6)
                      AS DECIMAL(18,6)) AS p2
               FROM cw2 w, q GROUP BY w.code2, w.s),
      nar AS (SELECT b2.vec_id
              FROM best2 b2
              JOIN adc2 a2 ON a2.s = b2.s AND a2.code2 = b2.code2
              JOIN w1 ON w1.vec_id = b2.vec_id
              GROUP BY b2.vec_id, w1.score1
              ORDER BY (w1.score1 + SUM(a2.p2)) DESC, b2.vec_id ASC LIMIT 20),
      dims AS (SELECT unnest(range(${Similarity.Dims})) AS d),
      x AS (SELECT e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e JOIN nar sh ON sh.vec_id = e.vec_id, q, dims d
            GROUP BY e.vec_id, e.label)
      SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM x ORDER BY cos DESC, vec_id ASC LIMIT 10
    """.trim

  private val s26 = Q(
    "s26_rq_refine",
    (s, d) => Similarity.rqRefineTopK(Tables.embeddings(s, d), 0L, 10, 50, 20),
    Some(rqRefineOracle))

  // -- s27: the RQ-refined search against a STANDING index — s26's
  //    production form (the s09->s10 move on the residual family):
  //    frozen level-1 + level-2 codebooks and the (vec_id, pq, pq2)
  //    code table persisted once, a delta batch APPENDED against the
  //    same frozen books (append ≡ rebuild because both assignments
  //    are per-row — LlmSpec pins it), then the search reads the index
  //    back: two broadcast ADC lookups over the code parquet, float
  //    vectors touched only at the exact re-rank. Index covers the
  //    whole corpus => same oracle as s26.
  private def s27IdxDir =
    new java.io.File("target/graft_idx/s27_rq").getAbsolutePath

  private[graft] def s27Build(s: SparkSession, d: String): Unit =
    s27BuildAt(s, d, s27IdxDir)

  private[graft] def s27BuildAt(s: SparkSession, d: String, idxDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(idxDir)
    graft.streaming.FoldCommit.clearResidue(
      root.getFileSystem(s.sparkContext.hadoopConfiguration), root)
    val emb = Tables.embeddings(s, d)
    Similarity.sampledCodebooks(emb)
      .write.mode("overwrite").parquet(s"$idxDir/books")
    Similarity.residualCodebooksWide(emb, Similarity.sampledCodebooks(emb))
      .write.mode("overwrite").parquet(s"$idxDir/books2")
    val books = s.read.parquet(s"$idxDir/books")
    val books2 = s.read.parquet(s"$idxDir/books2")
    Similarity.residualPqEncodeWith(emb.filter(col("vec_id") % 10 =!= 7), books, books2)
      .select("vec_id", "pq", "pq2")
      .write.mode("overwrite").parquet(s"$idxDir/rows")
    Similarity.residualPqEncodeWith(emb.filter(col("vec_id") % 10 === 7), books, books2)
      .select("vec_id", "pq", "pq2")
      .write.mode("append").parquet(s"$idxDir/rows")
  }

  private[graft] def s27Probe(s: SparkSession, d: String): DataFrame =
    s27ProbeAt(s, d, s27IdxDir)

  private[graft] def s27ProbeAt(s: SparkSession, d: String, idxDir: String): DataFrame =
    Similarity.rqRefineTopKWith(
      Tables.embeddings(s, d),
      s.read.parquet(s"$idxDir/rows"),
      s.read.parquet(s"$idxDir/books"),
      s.read.parquet(s"$idxDir/books2"),
      0L, 10, 50, 20)

  private val s27 = Q(
    "s27_rq_standing",
    (s, d) => { s27Build(s, d); s27Probe(s, d) },
    Some(rqRefineOracle))

  // -- s08: PQ-ADC approximate top-k with exact re-rank — the IVF-PQ
  //    search recipe (asymmetric distance computation): the raw query
  //    builds a (subspace, code) -> partial-dot lookup table (128 rows,
  //    broadcast), every vector scores as the DECIMAL-exact sum of its
  //    codes' partials, and only the 50-deep shortlist pays an exact
  //    cosine. Completes the quantized-search ladder: s05 re-ranks an
  //    int8 shortlist, s08 re-ranks a 32-bit PQ shortlist that never
  //    touches the float vectors until re-rank.
  private val s08 = Q(
    "s08_pq_topk",
    (s, d) => Similarity.pqTopK(Tables.embeddings(s, d), 0L, 10, 50),
    Some(s"""
      WITH $pqCte,
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      adc AS (SELECT c.code, s.s,
                CAST(round(SUM(CAST(c.cv[s.s*8+i.i+1] AS DOUBLE)
                             * CAST(q.qv[s.s*8+i.i+1] AS DOUBLE)), 6) AS DECIMAL(18,6)) AS p
              FROM cw c, q, sub s, d8 i GROUP BY c.code, s.s),
      approx AS (SELECT b.vec_id, SUM(a.p) AS score
                 FROM best b JOIN adc a ON a.s = b.s AND a.code = b.code
                 WHERE b.vec_id <> 0 GROUP BY b.vec_id),
      short AS (SELECT vec_id FROM approx
                ORDER BY score DESC, vec_id ASC LIMIT 50),
      dims AS (SELECT unnest(range(${Similarity.Dims})) AS d),
      x AS (SELECT e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e JOIN short sh ON sh.vec_id = e.vec_id, q, dims d
            GROUP BY e.vec_id, e.label)
      SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM x ORDER BY cos DESC, vec_id ASC LIMIT 10
    """.trim))

  /** shared Spark/oracle pieces for the binary-quantization family
    * (e03/s18): dims 0-31 packed into code_lo, 32-63 into code_hi —
    * two half-words so no engine ever shifts into a BIGINT sign bit
    * (DuckDB range-errors on 1<<63 where Spark wraps; 32-bit halves
    * sidestep the divergence entirely). The sign test is x > 0 on the
    * exact double image — no rounding, no ties.
    */
  private def binHalf(off: Int) = expr(
    s"cast(aggregate(sequence(0, 31), cast(0 as bigint), (acc, d) -> acc + " +
      s"IF(cast(element_at(embedding, d + ${off + 1}) as double) > 0, " +
      s"shiftleft(cast(1 as bigint), d), cast(0 as bigint))) as bigint)")

  private val binCodesCte = s"""bcodes AS (
        SELECT vec_id, label,
          CAST(SUM(CASE WHEN CAST(embedding[d.d+1] AS DOUBLE) > 0 AND d.d < 32
                        THEN (CAST(1 AS BIGINT) << d.d) ELSE 0 END) AS BIGINT) AS code_lo,
          CAST(SUM(CASE WHEN CAST(embedding[d.d+1] AS DOUBLE) > 0 AND d.d >= 32
                        THEN (CAST(1 AS BIGINT) << (d.d - 32)) ELSE 0 END) AS BIGINT) AS code_hi
        FROM embeddings, (SELECT unnest(range(${Similarity.Dims})) AS d) d
        GROUP BY vec_id, label)"""

  // -- e03: BINARY (sign-bit) quantization — each 64-float vector
  //    compressed to 64 BITS (32x vs float32; the most aggressive rung
  //    of the quantization ladder after e01's int8 and e02's PQ). One
  //    map-side pass, no shuffle; hamming distance on these codes
  //    approximates angle (P(bit differs) = theta/pi for random
  //    hyperplanes — here the coordinate axes), which s18 searches.
  private val e03 = Q(
    "e03_binary_quantize",
    (s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        binHalf(0).as("code_lo"),
        binHalf(32).as("code_hi"))
        .withColumn("n_pos",
          (bit_count(col("code_lo")) + bit_count(col("code_hi"))).cast(LongType)),
    Some(s"""
      WITH $binCodesCte
      SELECT vec_id, code_lo, code_hi,
             CAST(bit_count(code_lo) + bit_count(code_hi) AS BIGINT) AS n_pos
      FROM bcodes
    """.trim))

  // -- s18: HAMMING top-k over the binary codes with exact re-rank —
  //    the binary-quantization search recipe (popcount of XOR is ~1ns
  //    per vector; the modern memory-bound ANN first pass): score the
  //    whole corpus on the 8-byte codes only, shortlist the 50 nearest
  //    by hamming, exact-cosine re-rank the shortlist to top-10.
  //    Completes the quantized-search ladder: s05 re-ranks an int8
  //    shortlist, s08 a PQ shortlist, s18 a 64-bit binary shortlist —
  //    the float vectors are untouched until the 50-row re-rank.
  private val s18 = Q(
    "s18_hamming_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val codes = emb.select(col("vec_id"), col("label"),
        binHalf(0).as("code_lo"), binHalf(32).as("code_hi"))
      val qc = codes.filter(col("vec_id") === 0L)
        .select(col("code_lo").as("q_lo"), col("code_hi").as("q_hi"))
      val short = codes.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(qc))
        .select(col("vec_id"), col("label"),
          (bit_count(col("code_lo").bitwiseXOR(col("q_lo"))) +
            bit_count(col("code_hi").bitwiseXOR(col("q_hi")))).cast(LongType).as("hamming"))
        .orderBy(col("hamming").asc, col("vec_id").asc)
        .limit(50)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
      val wg = Window.orderBy(col("cos").desc, col("vec_id").asc)
      emb.join(broadcast(short.select("vec_id", "hamming")), "vec_id")
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"), col("hamming"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .withColumn("rank", row_number().over(wg).cast(LongType))
        .filter(col("rank") <= 10)
    },
    Some(hammingOracleWhere("")))

  /** `extraShort` is an extra `AND …` predicate on the code rows
    * (alias `b`) of the hamming first pass — "" for the full
    * corpus/index (s18/s19), a slice exclusion for the forget image
    * (s24). Codes are per-row pure functions of the vector, so
    * deletion carries no frozen-state subtlety on this family at all.
    */
  private def hammingOracleWhere(extraShort: String) = s"""
      WITH $binCodesCte,
      qc AS (SELECT code_lo AS q_lo, code_hi AS q_hi FROM bcodes WHERE vec_id = 0),
      short AS (SELECT b.vec_id, b.label,
                  CAST(bit_count(xor(b.code_lo, qc.q_lo))
                     + bit_count(xor(b.code_hi, qc.q_hi)) AS BIGINT) AS hamming
                FROM bcodes b, qc
                WHERE b.vec_id <> 0$extraShort
                ORDER BY hamming ASC, b.vec_id ASC LIMIT 50),
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      x AS (SELECT e.vec_id, sh.label, sh.hamming,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e JOIN short sh ON sh.vec_id = e.vec_id,
                 q, (SELECT unnest(range(${Similarity.Dims})) AS d) d
            GROUP BY e.vec_id, sh.label, sh.hamming)
      SELECT vec_id, label, hamming, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos,
             CAST(row_number() OVER (ORDER BY round(dt / (sqrt(na) * sqrt(nb)), 6) DESC,
                                     vec_id ASC) AS BIGINT) AS rank
      FROM x
      QUALIFY row_number() OVER (ORDER BY round(dt / (sqrt(na) * sqrt(nb)), 6) DESC,
                                 vec_id ASC) <= 10
    """.trim

  // -- s19: hamming search against a STANDING binary-code index — the
  //    d15/s10/s13 recipe applied to the e03 family: the 8-byte codes
  //    persisted as parquet (base batch + delta batch appended; codes
  //    are per-row pure functions of the vector, so append ≡ rebuild
  //    by construction — no frozen-state subtlety, asserted anyway),
  //    then the s18 search run against the index: the corpus-wide
  //    hamming pass scans ONLY the code parquet (8 bytes/vector, no
  //    float columns — the plan-audited point), floats touched first
  //    at the 50-row re-rank. Index covers the whole corpus => same
  //    oracle as s18.
  private def s19IdxDir =
    new java.io.File("target/graft_idx/s19_bincodes").getAbsolutePath

  /** s19 BUILD: persist the 8-byte binary codes (base + delta batch
    * appended; codes are per-row pure functions of the vector, so
    * append ≡ rebuild by construction — asserted in LlmSpec anyway)
    */
  private[graft] def s19Build(s: SparkSession, d: String): Unit =
    s19BuildAt(s, d, s19IdxDir)

  private[graft] def s19BuildAt(s: SparkSession, d: String, codesDir: String): Unit = {
    val emb = Tables.embeddings(s, d)
    val codes = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_id"), col("label"),
        binHalf(0).as("code_lo"), binHalf(32).as("code_hi"))
    codes(emb.filter(col("vec_id") % 10 =!= 7))
      .write.mode("overwrite").parquet(codesDir)
    codes(emb.filter(col("vec_id") % 10 === 7))
      .write.mode("append").parquet(codesDir)
  }

  /** s19 PROBE: the s18 search against the standing code parquet — the
    * corpus-wide hamming pass scans ONLY the 8-byte codes (no float
    * columns, the plan-audited point); floats are touched first at the
    * 50-row re-rank.
    */
  private[graft] def s19Probe(s: SparkSession, d: String): DataFrame =
    s19ProbeAt(s, d, s19IdxDir)

  private[graft] def s19ProbeAt(s: SparkSession, d: String, codesDir: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val idx = s.read.parquet(codesDir)
    val qc = idx.filter(col("vec_id") === 0L)
      .select(col("code_lo").as("q_lo"), col("code_hi").as("q_hi"))
    val short = idx.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(qc))
      .select(col("vec_id"), col("label"),
        (bit_count(col("code_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("code_hi").bitwiseXOR(col("q_hi")))).cast(LongType).as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
      .limit(50)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val wg = Window.orderBy(col("cos").desc, col("vec_id").asc)
    emb.join(broadcast(short.select("vec_id", "hamming")), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), col("hamming"),
        round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
      .withColumn("rank", row_number().over(wg).cast(LongType))
      .filter(col("rank") <= 10)
  }

  private val s19 = Q(
    "s19_hamming_standing",
    (s, d) => { s19Build(s, d); s19Probe(s, d) },
    s18.oracle)

  // -- s24: deletion on the binary-code standing index — the s23 story
  //    on the simplest family: codes are per-row pure functions of the
  //    vector, so the row-filter fold needs no frozen-state argument
  //    at all, and the oracle is s18's with the forgotten vectors
  //    excluded from the hamming first pass. The index root wraps the
  //    code parquet in a `codes` relation so the fold has a
  //    FoldCommit-managed child to stage against (the d15/s10 layout).
  private val s24 = Q(
    "s24_hamming_forget",
    (s, d) => {
      val idxDir = new java.io.File("target/graft_idx/s24_hamming_forget").getAbsolutePath
      val root = new org.apache.hadoop.fs.Path(idxDir)
      graft.streaming.FoldCommit.clearResidue(
        root.getFileSystem(s.sparkContext.hadoopConfiguration), root)
      s19BuildAt(s, d, s"$idxDir/codes")
      forgetRows(s, idxDir, Seq("codes"), col("vec_id") % 10 === 3)
      s19ProbeAt(s, d, s"$idxDir/codes")
    },
    Some(hammingOracleWhere(" AND b.vec_id % 10 <> 3")))

  // -- s09: IVF-PQ top-k — the two verified halves composed into the
  //    billion-scale production shape: the IVF coarse quantizer (s04's
  //    probe stage) restricts the search to 4 of 16 posting lists, and
  //    WITHIN those lists vectors rank by their 32-bit PQ codes via the
  //    decimal-exact ADC table (s08's scoring) before the exact cosine
  //    re-rank. The float vectors are touched only at index build and
  //    for the shortlist finalists.
  /** the IVF-PQ oracle (16 centroids, 4 probes, shortlist 50, k 10) —
    * shared by s09 (self-contained rebuild) and s10 (standing index):
    * an index over indexed∪delta = the whole corpus answers queries
    * identically to the in-query rebuild, so one oracle covers both.
    */
  /** `extraMembers` is an extra `AND …` predicate on the posting-list
    * member rows (alias `a`) — "" for the full index (s09/s10), a
    * doc-slice exclusion for the forget image (s23): only the members
    * change, because the quantizer CTEs are the oracle image of the
    * FROZEN cents/books tables, which a membership deletion never
    * touches (the encode-invariance argument on the vector family).
    */
  private def ivfPqOracleWhere(extraMembers: String) = s"""
      WITH $ivfAssignCte,
      $pqCte,
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      probes AS (SELECT cid FROM asim WHERE vec_id = 0
                 QUALIFY row_number() OVER (ORDER BY sim DESC, cid ASC) <= 4),
      members AS (SELECT a.vec_id FROM assign a
                  JOIN probes p ON p.cid = a.cid WHERE a.vec_id <> 0$extraMembers),
      adc AS (SELECT c.code, s.s,
                CAST(round(SUM(CAST(c.cv[s.s*8+i.i+1] AS DOUBLE)
                             * CAST(q.qv[s.s*8+i.i+1] AS DOUBLE)), 6) AS DECIMAL(18,6)) AS p
              FROM cw c, q, sub s, d8 i GROUP BY c.code, s.s),
      approx AS (SELECT b.vec_id, SUM(a.p) AS score
                 FROM best b
                 JOIN adc a ON a.s = b.s AND a.code = b.code
                 JOIN members m ON m.vec_id = b.vec_id
                 GROUP BY b.vec_id),
      short AS (SELECT vec_id FROM approx
                ORDER BY score DESC, vec_id ASC LIMIT 50),
      x AS (SELECT e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e JOIN short sh ON sh.vec_id = e.vec_id, q, dims d
            GROUP BY e.vec_id, e.label)
      SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM x ORDER BY cos DESC, vec_id ASC LIMIT 10
    """.trim

  private lazy val ivfPqOracle = ivfPqOracleWhere("")

  private val s09 = Q(
    "s09_ivfpq_topk",
    (s, d) => Similarity.ivfPqTopK(Tables.embeddings(s, d), 0L, 10, 16, 4, 50),
    Some(ivfPqOracle))

  // -- s10: IVF-PQ search against a STANDING index — the operator a
  //    100 TB deployment actually runs per query, closing the honest
  //    gap s08/s09 carried (they rebuild codes inside the query). The
  //    entry builds the persisted (vec_id, cid, pq) posting/code index
  //    the production way: base batch written once, a delta batch
  //    APPENDED against the same frozen quantizer+codebook (s06's
  //    incremental recipe applied to PQ — append ≡ rebuild because
  //    both assignments are per-row against frozen tables), then
  //    searches by reading the index back: probe 4/16 posting lists,
  //    ADC-score their 32-bit codes (no float vectors, no re-encode —
  //    the search plan scans the index parquet, plan-audited), exact
  //    re-rank of the 50-shortlist. Same parameters as s09, index
  //    covers the whole corpus => same oracle.
  private def s10IdxDir =
    new java.io.File("target/graft_idx/s10_ivfpq").getAbsolutePath

  /** s10 BUILD: freeze the quantizer tables (coarse centroids + PQ
    * codebooks) to parquet NEXT TO the posting/code index — everything
    * a query needs is now on disk, so the probe can run in a different
    * process (and the bench can time the halves separately) — then
    * write the (vec_id, cid, pq) rows the production way: base batch
    * overwritten, delta batch appended against the same frozen tables
    * (append ≡ rebuild because both assignments are per-row).
    */
  private[graft] def s10Build(s: SparkSession, d: String): Unit =
    s10BuildAt(s, d, s10IdxDir)

  private[graft] def s10BuildAt(s: SparkSession, d: String, idxDir: String): Unit = {
    val s10Root = new org.apache.hadoop.fs.Path(idxDir)
    graft.streaming.FoldCommit.clearResidue(
      s10Root.getFileSystem(s.sparkContext.hadoopConfiguration), s10Root)
    val emb = Tables.embeddings(s, d)
    Similarity.sampledCentroids(emb, 16)
      .write.mode("overwrite").parquet(s"$idxDir/cents")
    Similarity.sampledCodebooks(emb)
      .write.mode("overwrite").parquet(s"$idxDir/books")
    val cents = s.read.parquet(s"$idxDir/cents")
    val books = s.read.parquet(s"$idxDir/books")
    Similarity.ivfPqIndexRows(emb.filter(col("vec_id") % 10 =!= 7), cents, books)
      .write.mode("overwrite").parquet(s"$idxDir/rows")
    Similarity.ivfPqIndexRows(emb.filter(col("vec_id") % 10 === 7), cents, books)
      .write.mode("append").parquet(s"$idxDir/rows")
  }

  /** s10 PROBE: IVF-PQ search over the standing index — probe 4/16
    * posting lists, ADC-score their 32-bit codes (no float vectors, no
    * re-encode; the search plan scans only index parquet), exact
    * re-rank of the 50-shortlist.
    */
  private[graft] def s10Probe(s: SparkSession, d: String): DataFrame =
    s10ProbeAt(s, d, s10IdxDir)

  private[graft] def s10ProbeAt(s: SparkSession, d: String, idxDir: String): DataFrame =
    Similarity.ivfPqTopKStanding(
      Tables.embeddings(s, d),
      s.read.parquet(s"$idxDir/rows"),
      s.read.parquet(s"$idxDir/cents"),
      s.read.parquet(s"$idxDir/books"),
      0L, 10, 4, 50)

  private val s10 = Q(
    "s10_ivfpq_standing",
    (s, d) => { s10Build(s, d); s10Probe(s, d) },
    Some(ivfPqOracle))

  // -- s23: deletion on the IVF-PQ standing index — the row-filter
  //    forget fold (LlmSpec-proven ≡ rebuild since r11) promoted to an
  //    oracle-checked catalog entry, so the deletion matrix is
  //    oracle-gated on every standing-index family (d18 lexical
  //    near-dup, s22 BM25, s23 IVF-PQ, s24 binary hamming), not just
  //    the first two: build the s10 index, forget a vec slice under
  //    the lease, search. The oracle is the IVF-PQ oracle with the
  //    forgotten vectors excluded from the posting-list MEMBERS only —
  //    the quantizer CTEs stay corpus-wide because the frozen
  //    cents/books are corpus-release state a membership deletion
  //    never touches (the d18 encode-invariance argument on the
  //    vector family).
  private val s23 = Q(
    "s23_ivfpq_forget",
    (s, d) => {
      val idxDir = new java.io.File("target/graft_idx/s23_ivfpq_forget").getAbsolutePath
      s10BuildAt(s, d, idxDir)
      forgetRows(s, idxDir, Seq("rows"), col("vec_id") % 10 === 3)
      s10ProbeAt(s, d, idxDir)
    },
    Some(ivfPqOracleWhere(" AND a.vec_id % 10 <> 3")))

  // -- d10: cross-modal semantic dedup — embedding-LSH candidate pairs
  //    verified by cosine (the semantic signal) and annotated with
  //    textual n-gram Jaccard (the lexical signal) over the SAME ids
  //    (documents.doc_id ≡ embeddings.vec_id). The operator a 100 TB
  //    pipeline runs to catch paraphrase duplicates: high-cos/low-jac
  //    pairs are rewrites exact dedup can never see. Candidate
  //    generation is band-bounded (never all-pairs); the Jaccard
  //    annotate is candidate-bounded (left join, 0.0 when the pair
  //    shares no shingle).
  private val d10 = Q(
    "d10_semantic_dedup",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val bits = Similarity.adaptiveBandBits(emb.count())
      val cand = Similarity.bandedCandidates(emb, planes = 4 * bits, bandBits = bits)
      val e1 = emb.select(col("vec_id").as("v1"), col("embedding").as("e1"))
      val e2 = emb.select(col("vec_id").as("v2"), col("embedding").as("e2"))
      val cosPairs = cand
        .join(e1, "v1")
        .join(e2, "v2")
        .select(col("v1").as("d1"), col("v2").as("d2"),
          round(Similarity.cosine(col("e1"), col("e2")), 6).as("cos"))
        .filter(col("cos") >= 0.4)
      val sh = Dedup.shingleIndex(Dedup.shingleH64(Tables.documents(s, d)), MaxDf).cache()
      val jac = Dedup.jaccard(cosPairs.select("d1", "d2"), sh).select("d1", "d2", "jac")
      cosPairs.join(jac, Seq("d1", "d2"), "left")
        .select(col("d1"), col("d2"), col("cos"),
          coalesce(col("jac"), lit(0.0)).as("jac"))
    },
    Some(s"""
      WITH $bandCteA,
      cs AS (SELECT c.v1, c.v2,
               SUM(CAST(e1.embedding[d.d+1] AS DOUBLE) * CAST(e2.embedding[d.d+1] AS DOUBLE)) AS dt,
               SUM(CAST(e1.embedding[d.d+1] AS DOUBLE) * CAST(e1.embedding[d.d+1] AS DOUBLE)) AS na,
               SUM(CAST(e2.embedding[d.d+1] AS DOUBLE) * CAST(e2.embedding[d.d+1] AS DOUBLE)) AS nb
             FROM cand c
             JOIN embeddings e1 ON e1.vec_id = c.v1
             JOIN embeddings e2 ON e2.vec_id = c.v2,
             (SELECT unnest(range(64)) AS d) d
             GROUP BY c.v1, c.v2),
      cosp AS (SELECT v1 AS d1, v2 AS d2, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
               FROM cs WHERE round(dt / (sqrt(na) * sqrt(nb)), 6) >= 0.4),
      $shingleCte,
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT p.d1, p.d2, count(*) AS i
                FROM cosp p
                JOIN sh s1 ON s1.doc_id = p.d1
                JOIN sh s2 ON s2.doc_id = p.d2 AND s2.h = s1.h
                GROUP BY p.d1, p.d2),
      jac AS (SELECT d1, d2, round(CAST(i AS DOUBLE) / (n1.n + n2.n - i), 4) AS jac
              FROM inter JOIN sizes n1 ON n1.doc_id = d1 JOIN sizes n2 ON n2.doc_id = d2)
      SELECT p.d1, p.d2, p.cos, COALESCE(j.jac, 0.0) AS jac
      FROM cosp p LEFT JOIN jac j ON j.d1 = p.d1 AND j.d2 = p.d2
    """.trim))

  // -- s05: quantized-first top-k — the fourth ANN flavor (brute s01,
  //    LSH s02/s03, IVF s04): exact-integer int8 dot product over the
  //    whole corpus (the quantized index is 4x smaller than floats —
  //    e01's payoff), top-30 survivors re-ranked by exact cosine.
  //    Integer first-pass scores are bit-identical across engines, so
  //    the candidate cut is oracle-exact (no float-tie ambiguity).
  private val s05 = Q(
    "s05_quantized_topk",
    (s, d) => Similarity.quantizedTopK(Tables.embeddings(s, d), 0L, 10, 30),
    Some("""
      WITH dims AS (SELECT unnest(range(64)) AS d),
      qz AS (SELECT vec_id, label, embedding,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) *
                      (127.0 / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))))) AS BIGINT)) AS q
             FROM embeddings),
      qq AS (SELECT q, embedding AS qv FROM qz WHERE vec_id = 0),
      scored AS (SELECT z.vec_id, z.label, z.embedding,
                   (SELECT SUM(z.q[d.d+1] * qq.q[d.d+1]) FROM dims d, qq) AS qdot
                 FROM qz z WHERE z.vec_id <> 0),
      cand AS (SELECT vec_id, label, embedding FROM scored
               QUALIFY row_number() OVER (ORDER BY qdot DESC, vec_id ASC) <= 30),
      x AS (SELECT c.vec_id, c.label,
              SUM(CAST(c.embedding[d.d+1] AS DOUBLE) * CAST(qq.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(c.embedding[d.d+1] AS DOUBLE) * CAST(c.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(qq.qv[d.d+1] AS DOUBLE) * CAST(qq.qv[d.d+1] AS DOUBLE)) AS nb
            FROM cand c, qq, dims d GROUP BY c.vec_id, c.label)
      SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM x ORDER BY cos DESC, vec_id ASC LIMIT 10
    """.trim))

  // -- s04: IVF-flat top-k — sampled coarse quantizer (vec_id < 16),
  //    4-probe posting-list search, exact cosine re-rank. The third ANN
  //    flavor next to brute force (s01) and LSH (s02/s03): scanned
  //    fraction ≈ nProbe/nCentroids of the corpus.
  private val s04 = Q(
    "s04_ivf_topk",
    (s, d) => Similarity.ivfTopK(Tables.embeddings(s, d), 0L, 10, 16, 4),
    Some(s"""
      WITH $ivfAssignCte,
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      probes AS (SELECT cid FROM asim WHERE vec_id = 0
                 QUALIFY row_number() OVER (ORDER BY sim DESC, cid ASC) <= 4),
      x AS (SELECT e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e
            JOIN assign a ON a.vec_id = e.vec_id
            JOIN probes p ON p.cid = a.cid, q, dims d
            WHERE e.vec_id <> 0
            GROUP BY e.vec_id, e.label)
      SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM x ORDER BY cos DESC, vec_id ASC LIMIT 10
    """.trim))

  // -- s04b: IVF-flat top-k over the k-means-trained quantizer — the
  //    production index build next to s04's sampled one; identical
  //    probe path (ivfTopKWith). Lloyd means are engine-order float
  //    arithmetic, so the neighbor list itself is not DuckDB-
  //    expressible; the oracle-checkable image is a RECALL invariant
  //    emitted as the query output: the brute-force top-1 anchor
  //    (DuckDB recomputes it, s01's CTE) plus a boolean asserting the
  //    trained quantizer's recall@10 vs the exact s01 top-k is >= 8/10
  //    at nProbe=4/16. The floor is absolute, not vs-sampled: measured
  //    recall is 9-10/10 at sf0.001/0.01/0.1 but the sampled quantizer
  //    ties or edges it by one at some SFs (Lloyd on near-uniform
  //    synthetic vectors mostly reshuffles boundaries), so >=sampled
  //    would flap with regeneration; >=0.8 is the quality bar a 4/16
  //    probe IVF must clear at any corpus size.
  private val s04b = Q(
    "s04b_ivf_kmeans_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val bf = Similarity.topK(emb, 0L, 10)
      val bfIds = bf.select("vec_id")
      val kmHits = Similarity
        .ivfTopKWith(emb, 0L, 10, Similarity.kmeansCentroids(emb, 16, 2), 4)
        .select("vec_id").join(bfIds, "vec_id")
        .agg(count(lit(1)).as("km_hits"))
      bf.orderBy(col("cos").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id").as("bf_top1"))
        .crossJoin(broadcast(kmHits))
        .select(
          lit(10L).as("k"),
          col("bf_top1"),
          (col("km_hits") >= lit(8L)).cast(LongType).as("kmeans_recall_ok"))
    },
    Some("""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      x AS (SELECT e.vec_id,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e, q, (SELECT unnest(range(64)) AS d) d
            WHERE e.vec_id <> 0 GROUP BY e.vec_id)
      SELECT CAST(10 AS BIGINT) AS k, vec_id AS bf_top1,
             CAST(1 AS BIGINT) AS kmeans_recall_ok
      FROM x ORDER BY round(dt / (sqrt(na) * sqrt(nb)), 6) DESC, vec_id ASC
      LIMIT 1
    """.trim))

  // -- s11: metadata-FILTERED ANN top-k — the retrieval shape vector
  //    stores actually serve ("nearest WHERE <predicate>"), here the
  //    odd-label half of the corpus. Pre-filter semantics: the
  //    predicate prunes posting-list members between scan and distance
  //    computation, so the answer always holds k matching rows when the
  //    probed lists contain k — a post-filter on s04's output could
  //    return as few as k/2 here. Same standing quantizer, probe knob,
  //    and scan fraction as s04; selectivity trades recall, not plan
  //    shape.
  private val s11 = Q(
    "s11_filtered_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopKFiltered(
        emb, 0L, 10, Similarity.sampledCentroids(emb, 16), 4,
        col("label") % 2 === 1)
    },
    Some(s"""
      WITH $ivfAssignCte,
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      probes AS (SELECT cid FROM asim WHERE vec_id = 0
                 QUALIFY row_number() OVER (ORDER BY sim DESC, cid ASC) <= 4),
      x AS (SELECT e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e
            JOIN assign a ON a.vec_id = e.vec_id
            JOIN probes p ON p.cid = a.cid, q, dims d
            WHERE e.vec_id <> 0 AND e.label % 2 = 1
            GROUP BY e.vec_id, e.label)
      SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
      FROM x ORDER BY cos DESC, vec_id ASC LIMIT 10
    """.trim))

  // -- s12: BM25 lexical top-k retrieval — the term-match twin of the
  //    vector family (s01-s11), and the retrieval shape RAG /
  //    decontamination pipelines run against a lexical index. The
  //    corpus (u < 0.95) is flattened to the classic inverted-index
  //    relations — postings tf(doc, term), df(term), doc length
  //    dl(doc) — and each query doc (the u >= 0.99 slice: a query
  //    BATCH is operationally small and independent of corpus size)
  //    probes with its top-4 terms by (tf, term) so the posting join's
  //    cost is bounded by |queries| x qTerms x avg-posting-length,
  //    never |corpus|^2 — on this 31-term synthetic vocabulary every
  //    posting list is ~|corpus| long (df ≈ N), the worst case for
  //    lexical retrieval, which is exactly why the batch knob and the
  //    posting-truncation knob exist. At
  //    100 TB the postings partition by term (the join key), df
  //    broadcasts (vocabulary-sized), and the dl join is doc_id-keyed
  //    and bucketable; impact-ordered posting truncation is the knob
  //    this plan leaves open. Scoring is the RATIONAL-idf BM25 variant
  //    (t05's reasoning: (N-df+0.5)/(df+0.5) without the ln() wrapper
  //    — exact IEEE ops on both engines, no libm last-ulp parity
  //    risk); per-term contributions are rounded to 6dp and summed as
  //    DECIMAL(18,6) so the score is order-insensitive and the rank
  //    boundary engine-identical (the q50/x05 decimal discipline).
  /** shared oracle for s12 (in-query relations) and s13 (standing
    * parquet index): BM25's index relations — postings, df, dl, corpus
    * stats — are all associative aggregates, so an index built
    * base+append and merged at read answers identically to the
    * in-query rebuild; one oracle covers both (the d11/d15 twin rule).
    */
  private lazy val bm25Oracle: String = s"""
      WITH tf AS (SELECT doc_id,
                    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                      / 1152921504606846976.0 AS u,
                    unnest(string_split(text, ' ')) AS term
                  FROM documents),
      tfc AS (SELECT doc_id, u, term, count(*) AS tf FROM tf GROUP BY 1, 2, 3),
      ctf AS (SELECT doc_id, term, tf FROM tfc WHERE u < 0.95),
      dl AS (SELECT doc_id, SUM(tf) AS dl FROM ctf GROUP BY 1),
      dfc AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1),
      st AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS s FROM dl),
      qt AS (SELECT doc_id AS query_doc, term FROM tfc WHERE u >= 0.99
             QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) <= 4),
      contrib AS (SELECT q.query_doc, c.doc_id AS corpus_doc,
                    CAST(round(((st.n - dfc.df + 0.5) / (dfc.df + 0.5))
                      * (CAST(c.tf AS DOUBLE) * 2.2
                         / (CAST(c.tf AS DOUBLE)
                            + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) * st.n / st.s))), 6)
                      AS DECIMAL(18, 6)) AS contrib
                  FROM qt q
                  JOIN ctf c USING (term)
                  JOIN dfc USING (term)
                  JOIN dl ON dl.doc_id = c.doc_id
                  CROSS JOIN st),
      scored AS (SELECT query_doc, corpus_doc, SUM(contrib) AS sdec
                 FROM contrib GROUP BY 1, 2)
      SELECT query_doc, corpus_doc, CAST(sdec AS DOUBLE) AS score,
             CAST(row_number() OVER (PARTITION BY query_doc
                                     ORDER BY sdec DESC, corpus_doc ASC) AS BIGINT) AS rank
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY query_doc
                                 ORDER BY sdec DESC, corpus_doc ASC) <= 5
    """.trim

  private val s12 = Q(
    "s12_bm25_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val K1 = 1.2
      val B = 0.75
      val u = graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast(StringType)) /
        lit(1152921504606846976.0) // 2^60, the p01/d11 unit hash
      // one in-row term-counts pass for all four consumers (corpus
      // postings, df, dl, query-term selection) — the compiled
      // TermCounts fold; zero exchanges where the old explode +
      // groupBy(doc_id, u, term) shuffled the full token stream
      val tf = Tables.documents(s, d)
        .withColumn("u", u)
        .select(col("doc_id"), col("u"),
          explode(graft.functions.ColumnFns.term_counts(split(col("text"), " "))).as("tc"))
        .select(col("doc_id"), col("u"),
          col("tc.term").as("term"), col("tc.tf").as("tf"))
      val corpusTf = tf.filter(col("u") < 0.95).drop("u")
      val dl = corpusTf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      val df = corpusTf.groupBy("term").agg(count(lit(1)).as("df"))
      // corpus-wide scalars, frozen as literals (t05's count() shape):
      // exact integers so avgdl enters the formula as dl*N/sumdl —
      // one double division instead of an engine-specific AVG.
      val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
      val nCorpus = stats.getLong(0).toDouble
      val sumDl = stats.getLong(1).toDouble
      val wq = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
      val qTerms = tf.filter(col("u") >= 0.99)
        .withColumn("qr", row_number().over(wq))
        .filter(col("qr") <= 4)
        .select(col("doc_id").as("query_doc"), col("term"))
      val idf = (lit(nCorpus) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
      val lenNorm = lit(1.0 - B) + lit(B) * col("dl").cast(DoubleType) * lit(nCorpus) / lit(sumDl)
      val tfNorm = col("tf").cast(DoubleType) * lit(K1 + 1.0) /
        (col("tf").cast(DoubleType) + lit(K1) * lenNorm)
      val contrib = round(idf * tfNorm, 6).cast(DecimalType(18, 6))
      val scored = qTerms
        .join(corpusTf.withColumnRenamed("doc_id", "corpus_doc"), "term")
        .join(broadcast(df), "term")
        .join(broadcast(dl.withColumnRenamed("doc_id", "corpus_doc")), "corpus_doc")
        .groupBy("query_doc", "corpus_doc")
        .agg(sum(contrib).as("sdec"))
      val wr = Window.partitionBy("query_doc").orderBy(col("sdec").desc, col("corpus_doc"))
      scored
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 5)
        .select(col("query_doc"), col("corpus_doc"),
          col("sdec").cast(DoubleType).as("score"), col("rank").cast(LongType).as("rank"))
    },
    Some(bm25Oracle))

  // -- s13: BM25 against a STANDING persisted lexical search index —
  //    d15's standing-index recipe applied to s12 (as s10 is to s09).
  //    The persisted index holds the four relations a production
  //    lexical search service keeps warm: postings (doc, term, tf),
  //    df partials, dl, and corpus-stat partials (n, sum dl). Every
  //    one is an ASSOCIATIVE aggregate, so a delta batch appends its
  //    own partial rows and the search merges partials at read time —
  //    no rebuild, no frozen corpus-dependent state at all (unlike
  //    d15's stop set there is nothing to freeze: the query encode is
  //    a pure function of the query doc), append provably ≡ full
  //    rebuild, same oracle as s12. At 100 TB the postings files
  //    partition by term (the probe key), df/stats partials stay
  //    vocabulary-/constant-sized, and a compaction that pre-merges
  //    partials is an optimization, never a correctness step.
  private val s13 = Q(
    "s13_bm25_standing",
    (s, d) => { s13Build(s, d); s13Probe(s, d) },
    Some(bm25Oracle))

  private def s13IdxDir =
    new java.io.File("target/graft_idx/s13_bm25").getAbsolutePath

  /** (doc_id, term, tf) over a doc-level slice — the unit-hash filter
    * runs BEFORE the tokenize (tf is per-doc, so pre-filtering is
    * equivalent and skips counting the excluded docs). Shared by the
    * s13 build (corpus slice) and probe (query slice).
    *
    * The histogram is the compiled in-row
    * [[graft.functions.TermCounts]] fold — a pure map over the doc
    * scan. The old explode + groupBy(doc_id, term) shuffled the full
    * token stream to reassemble per-doc rows that were never apart;
    * the multiset of (doc_id, term, tf) rows is identical
    * (CurationKernelSpec pins the kernel against the aggregate form).
    */
  private def s13Tf(s: SparkSession, d: String,
      pred: org.apache.spark.sql.Column): DataFrame =
    Tables.documents(s, d)
      .withColumn("u", unitU).filter(pred)
      .select(col("doc_id"),
        explode(graft.functions.ColumnFns.term_counts(split(col("text"), " "))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))

  /** s13 BUILD: the standing BM25 index the production way — base batch
    * written once, a later batch APPENDED as its own partial-aggregate
    * rows (postings + df + dl + corpus stats, merged at read).
    */
  private[graft] def s13Build(s: SparkSession, d: String): Unit =
    s13BuildAt(s, d, s13IdxDir)

  private[graft] def s13BuildAt(s: SparkSession, d: String, idxDir: String): Unit = {
    // a (re)build OVERWRITES the index, so any standing retraction
    // state is invalidated with it — stale tombstones from a prior
    // corpus would silently anti-join docs the new build legitimately
    // indexed (caught live: the sf0.1 verify read the sf0.01 run's
    // forget generation)
    val fr = new org.apache.hadoop.fs.Path(s"$idxDir/forgets")
    val fs = fr.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(fr, true)
    // and any crashed fold's staged/retired residue at the index root
    graft.streaming.FoldCommit.clearResidue(
      fs, new org.apache.hadoop.fs.Path(idxDir))
    def writeBatch(pred: org.apache.spark.sql.Column, mode: String): Unit = {
      // persist the batch across its four index writes: without it
      // each write job re-runs the explode+agg (8 recomputes total
      // for the build; measured ~1.5s of the entry's time at sf0.1)
      val batch = s13Tf(s, d, col("u") < 0.95 && pred).persist()
      try {
        batch.write.mode(mode).parquet(s"$idxDir/postings")
        // (a coalesce(1) on the small df/dl writes was tried and
        // REVERTED: it propagates up and runs the whole agg pipeline
        // on one task — AQE's post-shuffle coalescing already keeps
        // these outputs to a handful of files without serializing
        // the aggregation)
        batch.groupBy("term").agg(count(lit(1)).as("df"))
          .write.mode(mode).parquet(s"$idxDir/df")
        val dlB = batch.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        dlB.write.mode(mode).parquet(s"$idxDir/dl")
        dlB.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
          .write.mode(mode).parquet(s"$idxDir/stats")
      } finally batch.unpersist(): Unit
    }
    writeBatch(col("doc_id") % 10 =!= 7, "overwrite")
    writeBatch(col("doc_id") % 10 === 7, "append")
  }

  /** complete (non-staging) forget-generation dirs under the index */
  private def s13Forgets(s: SparkSession, idxDir: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$idxDir/forgets")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.endsWith(".staging"))
      .map(_.getPath.toString)
  }

  /** Deletion on the BM25 standing index — the RETRACTION form of
    * right-to-be-forgotten, because this index is partial AGGREGATES:
    * df and the corpus stats carry no doc_ids, so they cannot be
    * row-filtered the way d18 filters shingles. Instead the fold
    * derives, from the index's own postings, (a) the tombstone doc_id
    * set and (b) NEGATIVE df/stats partial rows — the classic
    * mergeable-state retraction: the probe's existing SUM-merge of
    * partials absorbs them with no read-path special case beyond the
    * tombstone anti-join on postings/dl. All three relations land in
    * ONE staged `forgets/<token>` generation published atomically
    * through [[graft.streaming.FoldCommit]], so a crash mid-fold
    * leaves an invisible staging dir the next entry heals, and a
    * re-run (which derives its rows from postings MINUS the
    * already-visible tombstones) is idempotent — double-forgetting the
    * same docs retracts nothing twice.
    */
  private[graft] def s13Forget(
      s: SparkSession, idxDir: String, pred: org.apache.spark.sql.Column): Unit =
    graft.streaming.LakeCompact.withLease(s, idxDir) {
      val conf = s.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(s"$idxDir/forgets")
      val fs = root.getFileSystem(conf)
      // heal BEFORE reading the prior tombstones: a crashed-but-committed
      // generation must become visible first, or this fold would derive
      // `gone` without its deletes and retract those docs a second time
      graft.streaming.FoldCommit.heal(fs, root)
      val prior = s13Forgets(s, idxDir)
      val priorDeletes =
        if (prior.isEmpty) null
        else s.read.parquet(prior.map(_ + "/deletes"): _*)
      var gone = s.read.parquet(s"$idxDir/postings").filter(pred)
      if (priorDeletes != null)
        gone = gone.join(broadcast(priorDeletes), Seq("doc_id"), "left_anti")
      gone = gone.persist()
      try {
        val token = java.util.UUID.randomUUID().toString.take(8)
        graft.streaming.FoldCommit.publish(fs, root, token, Nil) { staging =>
          gone.groupBy("term").agg((-count(lit(1))).as("df"))
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/df")
          val dlGone = gone.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
          dlGone.agg((-count(lit(1))).as("n"), (-sum(col("dl"))).as("s"))
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/stats")
          gone.select("doc_id").distinct()
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/deletes")
        }
      } finally gone.unpersist(): Unit
    }

  /** COMPACT the forget generations away: physically rewrite postings
    * and dl without the tombstoned docs, fold the base + negative
    * df/stats partials into one consolidated generation each, then
    * drop `forgets/`. Probe results are identical before and after
    * (LlmSpec asserts it) — compaction trades read-side anti-joins for
    * a one-time rewrite, the same economics as LakeCompact.
    */
  private[graft] def s13FoldForgets(s: SparkSession, idxDir: String): Unit =
    graft.streaming.LakeCompact.withLease(s, idxDir) {
      val root = new org.apache.hadoop.fs.Path(idxDir)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      graft.streaming.FoldCommit.heal(fs, root)
      val forgets = s13Forgets(s, idxDir)
      if (forgets.nonEmpty) {
        val dels = s.read.parquet(forgets.map(_ + "/deletes"): _*)
        def rewrite(part: String, retires: Seq[String] = Nil)(
            make: String => DataFrame): Unit =
          graft.streaming.FoldCommit.publish(fs, root, part, retires) { staging =>
            make(s"$idxDir/$part").write.mode(SaveMode.Overwrite).parquet(staging)
          }
        // every step is IDEMPOTENT so a crash anywhere just re-runs:
        // postings/dl are anti-join rewrites (a second pass filters
        // nothing new), and df/stats are RECOMPUTED from the surviving
        // postings/dl rather than merged with the negative partials —
        // merging would double-subtract if a crash landed between the
        // df swap and the forgets/ delete. Exactness is free: df is an
        // integer row count per term, stats an integer count/sum.
        rewrite("postings")(p =>
          s.read.parquet(p).join(broadcast(dels), Seq("doc_id"), "left_anti"))
        rewrite("dl")(p =>
          s.read.parquet(p).join(broadcast(dels), Seq("doc_id"), "left_anti"))
        rewrite("df")(_ =>
          s.read.parquet(s"$idxDir/postings")
            .groupBy("term").agg(count(lit(1)).as("df")))
        // the LAST publication retires forgets/ through its marker, so
        // the tombstone generations die only once everything above is
        // visible — and heal finishes the delete if a crash interrupts
        rewrite("stats", retires = Seq("forgets"))(_ =>
          s.read.parquet(s"$idxDir/dl")
            .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")))
      }
    }

  /** s13 PROBE: extract the query docs' top terms, merge the standing
    * partials at read, score through the bounded posting join — the
    * corpus text outside the query slice is never touched.
    */
  private[graft] def s13Probe(s: SparkSession, d: String): DataFrame =
    s13ProbeAt(s, d, s13IdxDir)

  private[graft] def s13ProbeAt(s: SparkSession, d: String, idxDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K1 = 1.2
    val B = 0.75
    // forget-aware read side: tombstones anti-join the row relations
    // (postings, dl); the aggregate relations (df, stats) fold the
    // retraction generations' NEGATIVE partials through the SAME
    // sum-merge the base partials already use — deletion costs the
    // probe nothing structural
    val forgets = s13Forgets(s, idxDir)
    def tombstoned(p: String): DataFrame = {
      val base = s.read.parquet(p)
      if (forgets.isEmpty) base
      else base.join(
        broadcast(s.read.parquet(forgets.map(_ + "/deletes"): _*)),
        Seq("doc_id"), "left_anti")
    }
    val postings = tombstoned(s"$idxDir/postings")
    val df = s.read.parquet(s"$idxDir/df" +: forgets.map(_ + "/df"): _*)
      .groupBy("term").agg(sum(col("df")).as("df")).filter(col("df") > 0)
    val dl = tombstoned(s"$idxDir/dl")
    val st = s.read.parquet(s"$idxDir/stats" +: forgets.map(_ + "/stats"): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s")).head()
    val nCorpus = st.getLong(0).toDouble
    val sumDl = st.getLong(1).toDouble
    val wq = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
    val qTerms = s13Tf(s, d, col("u") >= 0.99)
      .withColumn("qr", row_number().over(wq))
      .filter(col("qr") <= 4)
      .select(col("doc_id").as("query_doc"), col("term"))
    val idf = (lit(nCorpus) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val lenNorm = lit(1.0 - B) + lit(B) * col("dl").cast(DoubleType) * lit(nCorpus) / lit(sumDl)
    val tfNorm = col("tf").cast(DoubleType) * lit(K1 + 1.0) /
      (col("tf").cast(DoubleType) + lit(K1) * lenNorm)
    val contrib = round(idf * tfNorm, 6).cast(DecimalType(18, 6))
    val scored = qTerms
      .join(postings.withColumnRenamed("doc_id", "corpus_doc"), "term")
      .join(broadcast(df), "term")
      .join(broadcast(dl.withColumnRenamed("doc_id", "corpus_doc")), "corpus_doc")
      .groupBy("query_doc", "corpus_doc")
      .agg(sum(contrib).as("sdec"))
    val wr = Window.partitionBy("query_doc").orderBy(col("sdec").desc, col("corpus_doc"))
    scored
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 5)
      .select(col("query_doc"), col("corpus_doc"),
        col("sdec").cast(DoubleType).as("score"), col("rank").cast(LongType).as("rank"))
  }

  // -- s22: deletion on the BM25 standing index — d18's right-to-be-
  //    forgotten run against partial-AGGREGATE state, where row
  //    filtering is impossible (df/stats carry no doc_ids) and the
  //    honest mechanism is tombstones + negative retraction partials
  //    folded through the probe's existing sum-merge. Build the s13
  //    index, forget a doc slice, search — the oracle recomputes BM25
  //    over the corpus WITHOUT the forgotten docs (df, doc-length
  //    norms and the corpus stats all shift), so the entry proves the
  //    retraction algebra exact, not just "the docs disappeared".
  private val s22 = Q(
    "s22_bm25_forget",
    (s, d) => {
      val idxDir = new java.io.File("target/graft_idx/s22_bm25_forget").getAbsolutePath
      s13BuildAt(s, d, idxDir)
      s13Forget(s, idxDir, col("doc_id") % 10 === 3)
      s13ProbeAt(s, d, idxDir)
    },
    Some(bm25Oracle.replace(
      "ctf AS (SELECT doc_id, term, tf FROM tfc WHERE u < 0.95)",
      "ctf AS (SELECT doc_id, term, tf FROM tfc WHERE u < 0.95 AND doc_id % 10 <> 3)")))

  // -- s14: HYBRID retrieval — BM25 lexical ranking fused with dense
  //    cosine ranking by reciprocal-rank fusion (RRF, k=60), the shape
  //    modern retrieval stacks actually serve (sparse recalls exact
  //    terms, dense recalls paraphrase; RRF needs no score
  //    calibration because it consumes RANKS, which also makes it
  //    parity-trivial: rrf = 1/(60+r_lex) + 1/(60+r_dense) is two
  //    exact IEEE divisions and one add). Queries are the u >= 0.99
  //    docs that carry an embedding (doc_id ≡ vec_id id space); each
  //    side ranks its own corpus (text u < 0.95 / vectors u < 0.95)
  //    top-10, and the fusion full-outer joins the two lists per query
  //    — a doc found by only one side still scores (coalesce 0 for
  //    the missing rank). Scale: the lexical side is s12's bounded
  //    posting join; the dense side broadcasts the query batch against
  //    the vector corpus (s07's shape — swap in the s04/s10 IVF probe
  //    beyond brute-force range); the fusion join touches only the
  //    2x top-10 lists per query.
  private val s14 = Q(
    "s14_hybrid_rrf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val K1 = 1.2
      val B = 0.75
      val u = graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast(StringType)) /
        lit(1152921504606846976.0) // 2^60, the p01/d11 unit hash
      val emb = Tables.embeddings(s, d)
      val uVec = graft.functions.ColumnFns.md5_prefix64(col("vec_id").cast(StringType)) /
        lit(1152921504606846976.0)
      // ---- lexical side: s12's relations, queries restricted to the
      //      embedded ids so both sides rank the same query batch
      // the compiled in-row TermCounts fold (the s12/s13 kernel) —
      // tf is a pure map over the doc scan, zero exchanges
      val tf = Tables.documents(s, d)
        .withColumn("u", u)
        .select(col("doc_id"), col("u"),
          explode(graft.functions.ColumnFns.term_counts(split(col("text"), " "))).as("tc"))
        .select(col("doc_id"), col("u"),
          col("tc.term").as("term"), col("tc.tf").as("tf"))
      val corpusTf = tf.filter(col("u") < 0.95).drop("u")
      val dl = corpusTf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      val df = corpusTf.groupBy("term").agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
      val nCorpus = stats.getLong(0).toDouble
      val sumDl = stats.getLong(1).toDouble
      val embIds = emb.select(col("vec_id"))
      val wq = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
      val qTerms = tf.filter(col("u") >= 0.99)
        .join(broadcast(embIds), col("doc_id") === col("vec_id"), "left_semi")
        .withColumn("qr", row_number().over(wq))
        .filter(col("qr") <= 4)
        .select(col("doc_id").as("query_doc"), col("term"))
      val idf = (lit(nCorpus) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
      val lenNorm = lit(1.0 - B) + lit(B) * col("dl").cast(DoubleType) * lit(nCorpus) / lit(sumDl)
      val tfNorm = col("tf").cast(DoubleType) * lit(K1 + 1.0) /
        (col("tf").cast(DoubleType) + lit(K1) * lenNorm)
      val contrib = round(idf * tfNorm, 6).cast(DecimalType(18, 6))
      val wl = Window.partitionBy("query_doc").orderBy(col("sdec").desc, col("corpus_doc"))
      val lex = qTerms
        .join(corpusTf.withColumnRenamed("doc_id", "corpus_doc"), "term")
        .join(broadcast(df), "term")
        .join(broadcast(dl.withColumnRenamed("doc_id", "corpus_doc")), "corpus_doc")
        .groupBy("query_doc", "corpus_doc")
        .agg(sum(contrib).as("sdec"))
        .withColumn("lex_rank", row_number().over(wl).cast(LongType))
        .filter(col("lex_rank") <= 10)
        .select("query_doc", "corpus_doc", "lex_rank")
      // ---- dense side: brute-force cosine of the query batch against
      //      the vector corpus, ranked on the 6-dp image (s01's rule)
      val qv = emb.filter(uVec >= 0.99)
        .select(col("vec_id").as("query_doc"), col("embedding").as("qv"))
      val cv = emb.filter(uVec < 0.95)
        .select(col("vec_id").as("corpus_doc"), col("embedding").as("cv"))
      val wd = Window.partitionBy("query_doc").orderBy(col("cos").desc, col("corpus_doc"))
      val dense = cv.crossJoin(broadcast(qv))
        .select(col("query_doc"), col("corpus_doc"),
          round(Similarity.cosine(col("cv"), col("qv")), 6).as("cos"))
        .withColumn("vec_rank", row_number().over(wd).cast(LongType))
        .filter(col("vec_rank") <= 10)
        .select("query_doc", "corpus_doc", "vec_rank")
      // ---- fusion: RRF over the union of both top-10 lists
      val rrf = coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0))
      val wr = Window.partitionBy("query_doc").orderBy(col("rrf_raw").desc, col("corpus_doc"))
      lex.join(dense, Seq("query_doc", "corpus_doc"), "full_outer")
        .withColumn("rrf_raw", rrf)
        .withColumn("rank", row_number().over(wr).cast(LongType))
        .filter(col("rank") <= 5)
        .select(col("query_doc"), col("corpus_doc"), col("lex_rank"), col("vec_rank"),
          round(col("rrf_raw"), 6).as("rrf"), col("rank"))
    },
    Some(s"""
      WITH tf AS (SELECT doc_id,
                    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                      / 1152921504606846976.0 AS u,
                    unnest(string_split(text, ' ')) AS term
                  FROM documents),
      tfc AS (SELECT doc_id, u, term, count(*) AS tf FROM tf GROUP BY 1, 2, 3),
      ctf AS (SELECT doc_id, term, tf FROM tfc WHERE u < 0.95),
      dl AS (SELECT doc_id, SUM(tf) AS dl FROM ctf GROUP BY 1),
      dfc AS (SELECT term, count(*) AS df FROM ctf GROUP BY 1),
      st AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS s FROM dl),
      qt AS (SELECT doc_id AS query_doc, term FROM tfc
             WHERE u >= 0.99 AND doc_id IN (SELECT vec_id FROM embeddings)
             QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) <= 4),
      contrib AS (SELECT q.query_doc, c.doc_id AS corpus_doc,
                    CAST(round(((st.n - dfc.df + 0.5) / (dfc.df + 0.5))
                      * (CAST(c.tf AS DOUBLE) * 2.2
                         / (CAST(c.tf AS DOUBLE)
                            + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) * st.n / st.s))), 6)
                      AS DECIMAL(18, 6)) AS contrib
                  FROM qt q
                  JOIN ctf c USING (term)
                  JOIN dfc USING (term)
                  JOIN dl ON dl.doc_id = c.doc_id
                  CROSS JOIN st),
      lexs AS (SELECT query_doc, corpus_doc, SUM(contrib) AS sdec
               FROM contrib GROUP BY 1, 2),
      lex AS (SELECT query_doc, corpus_doc,
                CAST(row_number() OVER (PARTITION BY query_doc
                                        ORDER BY sdec DESC, corpus_doc ASC) AS BIGINT) AS lex_rank
              FROM lexs
              QUALIFY row_number() OVER (PARTITION BY query_doc
                                         ORDER BY sdec DESC, corpus_doc ASC) <= 10),
      uv AS (SELECT vec_id, embedding,
               CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 / 1152921504606846976.0 AS u
             FROM embeddings),
      qvs AS (SELECT vec_id AS query_doc, embedding AS qv FROM uv WHERE u >= 0.99),
      cvs AS (SELECT vec_id AS corpus_doc, embedding AS cv FROM uv WHERE u < 0.95),
      dx AS (SELECT q.query_doc, c.corpus_doc,
               round(SUM(CAST(c.cv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE))
                 / (sqrt(SUM(CAST(c.cv[d.d+1] AS DOUBLE) * CAST(c.cv[d.d+1] AS DOUBLE)))
                  * sqrt(SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)))), 6) AS cos
             FROM cvs c, qvs q, (SELECT unnest(range(64)) AS d) d
             GROUP BY q.query_doc, c.corpus_doc),
      dense AS (SELECT query_doc, corpus_doc,
                  CAST(row_number() OVER (PARTITION BY query_doc
                                          ORDER BY cos DESC, corpus_doc ASC) AS BIGINT) AS vec_rank
                FROM dx
                QUALIFY row_number() OVER (PARTITION BY query_doc
                                           ORDER BY cos DESC, corpus_doc ASC) <= 10),
      fused AS (SELECT coalesce(l.query_doc, v.query_doc) AS query_doc,
                       coalesce(l.corpus_doc, v.corpus_doc) AS corpus_doc,
                       l.lex_rank, v.vec_rank,
                       coalesce(1.0 / (60.0 + CAST(l.lex_rank AS DOUBLE)), 0.0)
                         + coalesce(1.0 / (60.0 + CAST(v.vec_rank AS DOUBLE)), 0.0) AS rrf_raw
                FROM lex l FULL OUTER JOIN dense v
                  ON l.query_doc = v.query_doc AND l.corpus_doc = v.corpus_doc)
      SELECT query_doc, corpus_doc, lex_rank, vec_rank,
             round(rrf_raw, 6) AS rrf,
             CAST(row_number() OVER (PARTITION BY query_doc
                                     ORDER BY rrf_raw DESC, corpus_doc ASC) AS BIGINT) AS rank
      FROM fused
      QUALIFY row_number() OVER (PARTITION BY query_doc
                                 ORDER BY rrf_raw DESC, corpus_doc ASC) <= 5
    """.trim))

  // -- s15: DIVERSITY-capped top-k — retrieval result diversification:
  //    at most 2 results per label (the max-per-domain / max-per-source
  //    rule every production retrieval stack applies before serving).
  //    Two-stage shape: a global top-100 candidate pool first (a
  //    single-reduce TakeOrdered on the 6-dp cosine image — the only
  //    corpus-wide pass), THEN the per-label window and the final
  //    top-10 run on the 100-row pool. At 100 TB the pool stage swaps
  //    for the s04/s10 IVF probe unchanged; the diversity window never
  //    sees the corpus, so there is no label-keyed corpus shuffle.
  private val s15 = Q(
    "s15_diverse_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
      val pool = emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(100)
      val wl = Window.partitionBy("label").orderBy(col("cos").desc, col("vec_id").asc)
      val wg = Window.orderBy(col("cos").desc, col("vec_id").asc)
      pool
        .withColumn("label_rank", row_number().over(wl).cast(LongType))
        .filter(col("label_rank") <= 2)
        .withColumn("rank", row_number().over(wg).cast(LongType))
        .filter(col("rank") <= 10)
    },
    Some("""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      x AS (SELECT e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e, q, (SELECT unnest(range(64)) AS d) d
            WHERE e.vec_id <> 0 GROUP BY e.vec_id, e.label),
      pool AS (SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos
               FROM x ORDER BY cos DESC, vec_id ASC LIMIT 100),
      lr AS (SELECT vec_id, label, cos,
               CAST(row_number() OVER (PARTITION BY label
                                       ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS label_rank
             FROM pool
             QUALIFY row_number() OVER (PARTITION BY label
                                        ORDER BY cos DESC, vec_id ASC) <= 2)
      SELECT vec_id, label, cos, label_rank,
             CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rank
      FROM lr
      QUALIFY row_number() OVER (ORDER BY cos DESC, vec_id ASC) <= 10
    """.trim))

  // -- s16: MATRYOSHKA truncated-dimension retrieval — top-10 by
  //    cosine over only the FIRST 16 of 64 dimensions (the
  //    matryoshka-embedding serving trick: a prefix of the vector is
  //    itself a usable embedding, so the index scans a quarter of the
  //    floats), each hit flagged with whether the full-dimension
  //    top-10 agrees (in_full_topk — the per-query quality signal that
  //    decides how far a deployment can truncate). Scale: the prefix
  //    pass is the only corpus-wide scan and it reads 16/64ths of the
  //    vector bytes; the agreement join touches two 10-row lists.
  private val s16 = Q(
    "s16_matryoshka_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qv"), slice(col("embedding"), 1, 16).as("qv16"))
      val scored = emb.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      val full = scored
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
        .select(col("vec_id"), lit(1L).as("in_full_topk"))
      val wg = Window.orderBy(col("cos16").desc, col("vec_id").asc)
      scored
        .select(col("vec_id"), col("label"),
          round(Similarity.cosine(slice(col("embedding"), 1, 16), col("qv16")), 6).as("cos16"))
        .withColumn("rank", row_number().over(wg).cast(LongType))
        .filter(col("rank") <= 10)
        .join(broadcast(full), Seq("vec_id"), "left")
        .select(col("vec_id"), col("label"), col("cos16"), col("rank"),
          coalesce(col("in_full_topk"), lit(0L)).as("in_full_topk"))
    },
    Some("""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      x16 AS (SELECT e.vec_id, e.label,
               SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
               SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
               SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
             FROM embeddings e, q, (SELECT unnest(range(16)) AS d) d
             WHERE e.vec_id <> 0 GROUP BY e.vec_id, e.label),
      t16 AS (SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos16,
                CAST(row_number() OVER (ORDER BY round(dt / (sqrt(na) * sqrt(nb)), 6) DESC,
                                        vec_id ASC) AS BIGINT) AS rank
              FROM x16
              QUALIFY row_number() OVER (ORDER BY round(dt / (sqrt(na) * sqrt(nb)), 6) DESC,
                                         vec_id ASC) <= 10),
      x64 AS (SELECT e.vec_id,
               SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
               SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
               SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
             FROM embeddings e, q, (SELECT unnest(range(64)) AS d) d
             WHERE e.vec_id <> 0 GROUP BY e.vec_id),
      t64 AS (SELECT vec_id FROM
               (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM x64)
              ORDER BY cos DESC, vec_id ASC LIMIT 10)
      SELECT t16.vec_id, t16.label, t16.cos16, t16.rank,
             CAST(CASE WHEN t64.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_full_topk
      FROM t16 LEFT JOIN t64 ON t64.vec_id = t16.vec_id
    """.trim))

  /** s17's probe-width sweep (and its oracle's generated CTE blocks) */
  private val S17Probes = Seq(1, 2, 4, 8, 16)

  // -- s17: nProbe RECALL sweep — the index-tuning report an IVF
  //    deployment reads before picking its probe width: recall@10 of
  //    the s04 probe search vs the exact brute-force top-10, at every
  //    nProbe in {1,2,4,8,16} over the standing 16-centroid quantizer.
  //    nProbe=16 probes every list, so its row is a built-in soundness
  //    anchor (recall exactly 1.0 — asserted in LlmSpec). Scale: each
  //    probe run scans ~nProbe/16 of the corpus and the report is a
  //    5-row aggregate; the sweep shares one quantizer and one brute
  //    anchor (both cached), so the whole report costs ~2 corpus scans
  //    + the probed fractions, not 5 independent searches. The oracle
  //    chains one generated CTE block per probe width — the same loop
  //    drives both engines (the v05 discipline).
  private val s17 = Q(
    "s17_nprobe_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val bfIds = Similarity.topK(emb, 0L, 10).select("vec_id").cache()
      val cents = Similarity.sampledCentroids(emb, 16).cache()
      S17Probes.map { np =>
        Similarity.ivfTopKWith(emb, 0L, 10, cents, np)
          .select("vec_id").join(bfIds, "vec_id")
          .agg(count(lit(1)).as("hits"))
          .select(lit(np.toLong).as("n_probe"), col("hits"),
            round(col("hits") / lit(10.0), 6).as("recall_at_10"))
      }.reduce(_ unionByName _)
    },
    Some {
      val blocks = S17Probes.map { np =>
        s"""
      probes$np AS (SELECT cid FROM asim WHERE vec_id = 0
                    QUALIFY row_number() OVER (ORDER BY sim DESC, cid ASC) <= $np),
      x$np AS (SELECT e.vec_id,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
              FROM embeddings e
              JOIN assign a ON a.vec_id = e.vec_id
              JOIN probes$np p ON p.cid = a.cid, q, dims d
              WHERE e.vec_id <> 0
              GROUP BY e.vec_id),
      t$np AS (SELECT vec_id FROM
                (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM x$np)
               ORDER BY cos DESC, vec_id ASC LIMIT 10)"""
      }.mkString(",")
      val union = S17Probes.map { np =>
        s"""SELECT CAST($np AS BIGINT) AS n_probe,
             (SELECT count(*) FROM t$np JOIN bf USING (vec_id)) AS hits,
             round((SELECT count(*) FROM t$np JOIN bf USING (vec_id)) / 10.0, 6) AS recall_at_10"""
      }.mkString(" UNION ALL ")
      s"""
      WITH $ivfAssignCte,
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      xbf AS (SELECT e.vec_id,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
              FROM embeddings e, q, dims d
              WHERE e.vec_id <> 0 GROUP BY e.vec_id),
      bf AS (SELECT vec_id FROM
              (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM xbf)
             ORDER BY cos DESC, vec_id ASC LIMIT 10),
      $blocks
      $union""".trim
    })

  // -- s20: BATCHED IVF search — the serving shape: a whole query
  //    batch (the u >= 0.99 embedded slice, s14's convention) searched
  //    in ONE pass against the standing 16-centroid quantizer, top-5
  //    per query at nProbe=4. The single-query entries (s04..s11)
  //    price one search; a retrieval service amortizes the corpus
  //    assignment across N queries — here the corpus side is assigned
  //    once and each query joins only its 4 probed posting lists.
  //    Scale: queries broadcast twice (centroid ranking is queries x
  //    16 rows; scoring joins the batch into the pruned posting scan);
  //    the corpus is scanned once and shuffled only by cid. The
  //    per-query top-5 window partitions by query over posting-list-
  //    bounded candidates, never the corpus.
  private val s20 = Q(
    "s20_batched_ivf",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val uVec = graft.functions.ColumnFns.md5_prefix64(col("vec_id").cast(StringType)) /
        lit(1152921504606846976.0) // 2^60
      val queries = emb.filter(uVec >= 0.99)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val cents = Similarity.sampledCentroids(emb, 16)
      val wp = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cid").asc)
      val probes = cents.crossJoin(broadcast(queries))
        .select(col("query_id"), col("cid"),
          round(Similarity.cosine(col("cv"), col("qv")), 6).as("sim"))
        .withColumn("pr", row_number().over(wp))
        .filter(col("pr") <= 4)
        .select("query_id", "cid")
      val wr = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
      Similarity.ivfAssign(emb, 16)
        .join(broadcast(probes), "cid")
        .filter(col("vec_id") =!= col("query_id"))
        .join(broadcast(queries), "query_id")
        .select(col("query_id"), col("vec_id"), col("label"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .withColumn("rank", row_number().over(wr).cast(LongType))
        .filter(col("rank") <= 5)
    },
    Some(s"""
      WITH $ivfAssignCte,
      qids AS (SELECT vec_id AS query_id FROM embeddings
               WHERE CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
                     / 1152921504606846976.0 >= 0.99),
      probes AS (SELECT a.vec_id AS query_id, a.cid FROM asim a JOIN qids q ON q.query_id = a.vec_id
                 QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                            ORDER BY a.sim DESC, a.cid ASC) <= 4),
      x AS (SELECT p.query_id, e.vec_id, e.label,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(qe.embedding[d.d+1] AS DOUBLE)) AS dt,
              SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
              SUM(CAST(qe.embedding[d.d+1] AS DOUBLE) * CAST(qe.embedding[d.d+1] AS DOUBLE)) AS nb
            FROM embeddings e
            JOIN assign a ON a.vec_id = e.vec_id
            JOIN probes p ON p.cid = a.cid
            JOIN embeddings qe ON qe.vec_id = p.query_id,
            dims d
            WHERE e.vec_id <> p.query_id
            GROUP BY p.query_id, e.vec_id, e.label)
      SELECT query_id, vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY round(dt / (sqrt(na) * sqrt(nb)), 6) DESC,
                                     vec_id ASC) AS BIGINT) AS rank
      FROM x
      QUALIFY row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(dt / (sqrt(na) * sqrt(nb)), 6) DESC,
                                 vec_id ASC) <= 5
    """.trim))

  // -- s21: QUANTIZATION recall report — the compression ladder
  //    (e01 int8 / e02 PQ / e03 binary) scored on the question that
  //    decides which rung a deployment can afford: recall@10 of each
  //    method's re-ranked top-10 vs the exact brute-force answer, one
  //    row per method. The same shortlist parameters as the catalog
  //    entries (int8@30, PQ-ADC@50, hamming@50), so the report prices
  //    exactly what s05/s08/s18 serve. Scale: three code-width scans
  //    plus three 10-row intersections; the brute anchor is the only
  //    float-width pass and is shared (cached) across the three rows.
  private val s21 = Q(
    "s21_quantization_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val bf = Similarity.topK(emb, 0L, 10).select("vec_id").cache()
      def row(method: String, hitsDs: org.apache.spark.sql.DataFrame) =
        hitsDs.select("vec_id").join(bf, "vec_id")
          .agg(count(lit(1)).as("hits"))
          .select(lit(method).as("method"), col("hits"),
            round(col("hits") / lit(10.0), 6).as("recall_at_10"))
      // binary: the s18 pipeline (codes -> hamming shortlist -> exact
      // re-rank), inlined like the entries themselves
      val codes = emb.select(col("vec_id"), col("label"),
        binHalf(0).as("code_lo"), binHalf(32).as("code_hi"))
      val qc = codes.filter(col("vec_id") === 0L)
        .select(col("code_lo").as("q_lo"), col("code_hi").as("q_hi"))
      val bShort = codes.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(qc))
        .select(col("vec_id"),
          (bit_count(col("code_lo").bitwiseXOR(col("q_lo"))) +
            bit_count(col("code_hi").bitwiseXOR(col("q_hi")))).cast(LongType).as("hamming"))
        .orderBy(col("hamming").asc, col("vec_id").asc).limit(50)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
      val bTop = emb.join(broadcast(bShort.select("vec_id")), "vec_id")
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
      row("int8", Similarity.quantizedTopK(emb, 0L, 10, 30))
        .unionByName(row("pq_adc", Similarity.pqTopK(emb, 0L, 10, 50)))
        .unionByName(row("binary", bTop))
    },
    Some(s"""
      WITH $pqCte,
      $binCodesCte,
      dims AS (SELECT unnest(range(${Similarity.Dims})) AS d),
      q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      xbf AS (SELECT e.vec_id,
               SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
               SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
               SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
             FROM embeddings e, q, dims d WHERE e.vec_id <> 0 GROUP BY e.vec_id),
      bf AS (SELECT vec_id FROM
              (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM xbf)
             ORDER BY cos DESC, vec_id ASC LIMIT 10),
      qz AS (SELECT vec_id, embedding,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) *
                      (127.0 / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))))) AS BIGINT)) AS qc
             FROM embeddings),
      qq AS (SELECT qc, embedding AS qv FROM qz WHERE vec_id = 0),
      i_scored AS (SELECT z.vec_id, z.embedding,
                     (SELECT SUM(z.qc[d.d+1] * qq.qc[d.d+1]) FROM dims d, qq) AS qdot
                   FROM qz z WHERE z.vec_id <> 0),
      i_cand AS (SELECT vec_id, embedding FROM i_scored
                 QUALIFY row_number() OVER (ORDER BY qdot DESC, vec_id ASC) <= 30),
      i_x AS (SELECT c.vec_id,
                SUM(CAST(c.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(c.embedding[d.d+1] AS DOUBLE) * CAST(c.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
              FROM i_cand c, q, dims d GROUP BY c.vec_id),
      t_i AS (SELECT vec_id FROM
               (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM i_x)
              ORDER BY cos DESC, vec_id ASC LIMIT 10),
      adc AS (SELECT c.code, s.s,
                CAST(round(SUM(CAST(c.cv[s.s*8+i.i+1] AS DOUBLE)
                             * CAST(q.qv[s.s*8+i.i+1] AS DOUBLE)), 6) AS DECIMAL(18,6)) AS p
              FROM cw c, q, sub s, d8 i GROUP BY c.code, s.s),
      p_approx AS (SELECT b.vec_id, SUM(a.p) AS score
                   FROM best b JOIN adc a ON a.s = b.s AND a.code = b.code
                   WHERE b.vec_id <> 0 GROUP BY b.vec_id),
      p_short AS (SELECT vec_id FROM p_approx
                  ORDER BY score DESC, vec_id ASC LIMIT 50),
      p_x AS (SELECT e.vec_id,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
              FROM embeddings e JOIN p_short sh ON sh.vec_id = e.vec_id, q, dims d
              GROUP BY e.vec_id),
      t_p AS (SELECT vec_id FROM
               (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM p_x)
              ORDER BY cos DESC, vec_id ASC LIMIT 10),
      qcode AS (SELECT code_lo AS q_lo, code_hi AS q_hi FROM bcodes WHERE vec_id = 0),
      b_short AS (SELECT b.vec_id,
                    CAST(bit_count(xor(b.code_lo, qcode.q_lo))
                       + bit_count(xor(b.code_hi, qcode.q_hi)) AS BIGINT) AS hamming
                  FROM bcodes b, qcode WHERE b.vec_id <> 0
                  ORDER BY hamming ASC, b.vec_id ASC LIMIT 50),
      b_x AS (SELECT e.vec_id,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
              FROM embeddings e JOIN b_short sh ON sh.vec_id = e.vec_id, q, dims d
              GROUP BY e.vec_id),
      t_b AS (SELECT vec_id FROM
               (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM b_x)
              ORDER BY cos DESC, vec_id ASC LIMIT 10)
      SELECT 'int8' AS method,
             (SELECT count(*) FROM t_i JOIN bf USING (vec_id)) AS hits,
             round((SELECT count(*) FROM t_i JOIN bf USING (vec_id)) / 10.0, 6) AS recall_at_10
      UNION ALL
      SELECT 'pq_adc',
             (SELECT count(*) FROM t_p JOIN bf USING (vec_id)),
             round((SELECT count(*) FROM t_p JOIN bf USING (vec_id)) / 10.0, 6)
      UNION ALL
      SELECT 'binary',
             (SELECT count(*) FROM t_b JOIN bf USING (vec_id)),
             round((SELECT count(*) FROM t_b JOIN bf USING (vec_id)) / 10.0, 6)
    """.trim))

  /** s25 parameters: λ relevance / μ diversity weights as SEPARATE
    * literals (μ is NOT derived as 1 - λ: `1 - 0.7` is
    * 0.30000000000000004 in IEEE — deriving it on one engine and
    * hardcoding 0.3 on the other would flip near-tie selections),
    * shortlist 20, k 10.
    */
  // the canonical literals live in HybridServe (the serving kernel
  // shares them); referencing them here keeps oracle generation and
  // the greedy engine from ever drifting apart
  private val MmrLambda = HybridServe.MmrLambda
  private val MmrMu = HybridServe.MmrMu
  private val MmrShortlist = 20
  private val MmrK = HybridServe.MmrK

  /** Generated s25 oracle: shortlist + pairwise-cosine CTEs, then one
    * CTE block PER GREEDY PICK (the v05 recipe — the same loop that
    * drives the engine generates the oracle's rounds): pick 1 is
    * argmax qsim; pick i scores every unpicked candidate
    * λ·qsim − μ·max(sim to picked) and takes the argmax, ties to the
    * lower vec_id. All comparisons run on 6-dp-rounded cosines, so
    * both engines select from identical inputs with identical IEEE
    * arithmetic.
    */
  private lazy val mmrOracle = {
    val picks = (2 to MmrK).map { i =>
      s"""cand$i AS (SELECT s.*, $MmrLambda * s.qsim - $MmrMu *
              (SELECT max(p.sim) FROM mpairs p WHERE p.v1 = s.vec_id
                 AND p.v2 IN (SELECT vec_id FROM acc${i - 1})) AS sc
            FROM mshort s
            WHERE s.vec_id NOT IN (SELECT vec_id FROM acc${i - 1})),
      sel$i AS (SELECT vec_id, label, qsim, $i AS rank FROM cand$i
                ORDER BY sc DESC, vec_id ASC LIMIT 1),
      acc$i AS MATERIALIZED (SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM sel$i)"""
    }.mkString(",\n      ")
    s"""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      mdims AS (SELECT unnest(range(${Similarity.Dims})) AS d),
      mx AS MATERIALIZED (SELECT e.vec_id, e.label,
               SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS dt,
               SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
               SUM(CAST(q.qv[d.d+1] AS DOUBLE) * CAST(q.qv[d.d+1] AS DOUBLE)) AS nb
             FROM embeddings e, q, mdims d
             WHERE e.vec_id <> 0 GROUP BY e.vec_id, e.label),
      mshort AS MATERIALIZED (SELECT vec_id, label, round(dt / (sqrt(na) * sqrt(nb)), 6) AS qsim
                 FROM mx ORDER BY qsim DESC, vec_id ASC LIMIT $MmrShortlist),
      mpx AS MATERIALIZED (SELECT a.vec_id AS v1, b.vec_id AS v2,
                SUM(CAST(ea.embedding[d.d+1] AS DOUBLE) * CAST(eb.embedding[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(ea.embedding[d.d+1] AS DOUBLE) * CAST(ea.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(eb.embedding[d.d+1] AS DOUBLE) * CAST(eb.embedding[d.d+1] AS DOUBLE)) AS nb
              FROM mshort a JOIN embeddings ea ON ea.vec_id = a.vec_id,
                   mshort b JOIN embeddings eb ON eb.vec_id = b.vec_id,
                   mdims d
              WHERE a.vec_id < b.vec_id
              GROUP BY a.vec_id, b.vec_id),
      mpairs AS MATERIALIZED (SELECT v1, v2, round(dt / (sqrt(na) * sqrt(nb)), 6) AS sim FROM mpx
                 UNION ALL
                 SELECT v2, v1, round(dt / (sqrt(na) * sqrt(nb)), 6) FROM mpx),
      sel1 AS (SELECT vec_id, label, qsim, 1 AS rank FROM mshort
               ORDER BY qsim DESC, vec_id ASC LIMIT 1),
      acc1 AS MATERIALIZED (SELECT * FROM sel1),
      $picks
      SELECT vec_id, label, qsim, CAST(rank AS BIGINT) AS rank FROM acc$MmrK
    """.trim
  }

  // -- s25: MMR diversity re-rank — Maximal Marginal Relevance over
  //    the exact-cosine shortlist: the serving-layer answer to "the
  //    top 10 are 10 copies of the same document", complementing s15's
  //    label-capped rule with the metric-space form (no labels needed:
  //    a result is penalized by its similarity to what is already
  //    selected). Candidate generation is the s01 top-20 (swappable
  //    for the IVF/hamming probes like s15's pool stage); the
  //    pairwise sims and the O(k · shortlist) greedy run INSIDE one
  //    group task over the MmrShortlist-bounded pool (the shared
  //    HybridServe.mmrPicks kernel — nothing collects to the driver,
  //    so a stream of such queries diversifies in parallel across
  //    executors). Selection compares
  //    λ·qsim − μ·max(sim to selected) on 6-dp-rounded cosines; the
  //    oracle replays the identical greedy as generated per-pick CTEs.
  private val s25 = Q(
    "s25_mmr_rerank",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
      val short = emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("qsim"))
        .orderBy(col("qsim").desc, col("vec_id").asc)
        .limit(MmrShortlist)
      // pairwise sims + greedy run inside ONE group task over the
      // shortlist-bounded pool (the shared HybridServe.mmrPicks
      // kernel) — nothing is collected to the driver
      val pool = emb.select(col("vec_id").as("doc"), col("embedding"))
        .join(broadcast(short.select(col("vec_id").as("doc"),
          col("qsim").as("rel"))), "doc")
        .withColumn("query_id", lit(0L))
      val picks = HybridServe.mmrPicks(pool)
        .select(col("doc").as("vec_id"), col("rank"))
      short.join(broadcast(picks), "vec_id")
        .select(col("vec_id"), col("label"), col("qsim"), col("rank"))
    },
    Some(mmrOracle))

  /** x08/x09's generated oracle: the lexical arm, RRF fusion and the
    * s25-style MMR pick chain are shared; `denseBlock` supplies the
    * CTEs ending in `xdense(corpus_doc, vec_rank)` — exact cosine
    * top-10 for x08, the IVF-pruned ADC shortlist + exact re-rank for
    * x09 (the oracle models the approximation explicitly instead of
    * assuming its recall).
    */
  private def servingOracle(denseBlock: String) = {
    val picks = (2 to MmrK).map { i =>
      s"""xcand$i AS (SELECT f.*, $MmrLambda * f.rrf - $MmrMu *
              (SELECT max(p.sim) FROM xpairs p WHERE p.v1 = f.corpus_doc
                 AND p.v2 IN (SELECT corpus_doc FROM xacc${i - 1})) AS sc
            FROM fused f
            WHERE f.corpus_doc NOT IN (SELECT corpus_doc FROM xacc${i - 1})),
      xsel$i AS (SELECT corpus_doc, lex_rank, vec_rank, rrf, $i AS rank FROM xcand$i
                 ORDER BY sc DESC, corpus_doc ASC LIMIT 1),
      xacc$i AS MATERIALIZED (SELECT * FROM xacc${i - 1} UNION ALL SELECT * FROM xsel$i)"""
    }.mkString(",\n      ")
    s"""
      WITH xdocs AS MATERIALIZED (
        SELECT d.doc_id, d.text FROM documents d
        WHERE d.doc_id IN (SELECT vec_id FROM embeddings)),
      xtf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM xdocs),
      xtfc AS (SELECT doc_id, term, count(*) AS tf FROM xtf GROUP BY 1, 2),
      xctf AS (SELECT doc_id, term, tf FROM xtfc WHERE doc_id <> 0),
      xdl AS (SELECT doc_id, SUM(tf) AS dl FROM xctf GROUP BY 1),
      xdfc AS (SELECT term, count(*) AS df FROM xctf GROUP BY 1),
      xst AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS s FROM xdl),
      xqt AS (SELECT term FROM xtfc WHERE doc_id = 0
              QUALIFY row_number() OVER (ORDER BY tf DESC, term ASC) <= 4),
      xlex0 AS (SELECT c.doc_id AS corpus_doc,
                  SUM(CAST(round(((xst.n - xdfc.df + 0.5) / (xdfc.df + 0.5))
                    * (CAST(c.tf AS DOUBLE) * 2.2
                       / (CAST(c.tf AS DOUBLE)
                          + 1.2 * (0.25 + 0.75 * CAST(xdl.dl AS DOUBLE) * xst.n / xst.s))), 6)
                    AS DECIMAL(18, 6))) AS sdec
                FROM xqt q
                JOIN xctf c USING (term)
                JOIN xdfc USING (term)
                JOIN xdl ON xdl.doc_id = c.doc_id
                CROSS JOIN xst
                GROUP BY c.doc_id),
      xlex AS MATERIALIZED (
        SELECT corpus_doc,
               CAST(row_number() OVER (ORDER BY sdec DESC, corpus_doc ASC) AS BIGINT) AS lex_rank
        FROM xlex0
        QUALIFY row_number() OVER (ORDER BY sdec DESC, corpus_doc ASC) <= 10),
      xq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      xdims AS (SELECT unnest(range(${Similarity.Dims})) AS d),
      $denseBlock,
      fused AS MATERIALIZED (
        SELECT corpus_doc, l.lex_rank, v.vec_rank,
               round(COALESCE(1.0 / (60.0 + l.lex_rank), 0.0)
                   + COALESCE(1.0 / (60.0 + v.vec_rank), 0.0), 6) AS rrf
        FROM xlex l FULL OUTER JOIN xdense v USING (corpus_doc)),
      xpx AS (SELECT a.corpus_doc AS v1, b.corpus_doc AS v2,
                SUM(CAST(ea.embedding[d.d+1] AS DOUBLE) * CAST(eb.embedding[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(ea.embedding[d.d+1] AS DOUBLE) * CAST(ea.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(eb.embedding[d.d+1] AS DOUBLE) * CAST(eb.embedding[d.d+1] AS DOUBLE)) AS nb
              FROM fused a JOIN embeddings ea ON ea.vec_id = a.corpus_doc,
                   fused b JOIN embeddings eb ON eb.vec_id = b.corpus_doc,
                   xdims d
              WHERE a.corpus_doc < b.corpus_doc
              GROUP BY a.corpus_doc, b.corpus_doc),
      xpairs AS MATERIALIZED (
        SELECT v1, v2, round(dt / (sqrt(na) * sqrt(nb)), 6) AS sim FROM xpx
        UNION ALL
        SELECT v2, v1, round(dt / (sqrt(na) * sqrt(nb)), 6) FROM xpx),
      xsel1 AS (SELECT corpus_doc, lex_rank, vec_rank, rrf, 1 AS rank FROM fused
                ORDER BY rrf DESC, corpus_doc ASC LIMIT 1),
      xacc1 AS MATERIALIZED (SELECT * FROM xsel1),
      $picks
      SELECT corpus_doc, lex_rank, vec_rank, rrf, CAST(rank AS BIGINT) AS rank
      FROM xacc$MmrK
    """.trim
  }

  private lazy val x08Oracle = servingOracle(s"""xdx AS (SELECT e.vec_id,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(xq.qv[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(xq.qv[d.d+1] AS DOUBLE) * CAST(xq.qv[d.d+1] AS DOUBLE)) AS nb
              FROM embeddings e, xq, xdims d
              WHERE e.vec_id <> 0 GROUP BY e.vec_id),
      xdense AS MATERIALIZED (
        SELECT vec_id AS corpus_doc,
               CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS vec_rank
        FROM (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM xdx)
        QUALIFY row_number() OVER (ORDER BY cos DESC, vec_id ASC) <= 10)""")

  /** x09's dense arm in DuckDB: s09/s10's IVF-PQ oracle machinery
    * (ivfAssignCte / pqCte, probe 4/16, batched-ADC approx scores,
    * 50-shortlist, exact-cosine re-rank) producing the same
    * `xdense(corpus_doc, vec_rank)` interface x08's exact arm fills —
    * so the one oracle template pins the standing composition INCLUDING
    * the ADC shortlist's recall effect.
    */
  private lazy val x09Oracle = servingOracle(s"""$ivfAssignCte,
      $pqCte,
      xprobes AS (SELECT cid FROM asim WHERE vec_id = 0
                  QUALIFY row_number() OVER (ORDER BY sim DESC, cid ASC) <= 4),
      xmembers AS (SELECT a.vec_id FROM assign a
                   JOIN xprobes p ON p.cid = a.cid WHERE a.vec_id <> 0),
      xadc AS (SELECT c.code, s.s,
                 CAST(round(SUM(CAST(c.cv[s.s*8+i.i+1] AS DOUBLE)
                              * CAST(xq.qv[s.s*8+i.i+1] AS DOUBLE)), 6) AS DECIMAL(18,6)) AS p
               FROM cw c, xq, sub s, d8 i GROUP BY c.code, s.s),
      xapprox AS (SELECT b.vec_id, SUM(a.p) AS score
                  FROM best b
                  JOIN xadc a ON a.s = b.s AND a.code = b.code
                  JOIN xmembers m ON m.vec_id = b.vec_id
                  GROUP BY b.vec_id),
      xshort AS (SELECT vec_id FROM xapprox
                 ORDER BY score DESC, vec_id ASC LIMIT 50),
      xdx AS (SELECT e.vec_id,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(xq.qv[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(xq.qv[d.d+1] AS DOUBLE) * CAST(xq.qv[d.d+1] AS DOUBLE)) AS nb
              FROM embeddings e JOIN xshort sh ON sh.vec_id = e.vec_id, xq, xdims d
              GROUP BY e.vec_id),
      xdense AS MATERIALIZED (
        SELECT vec_id AS corpus_doc,
               CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS vec_rank
        FROM (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM xdx)
        QUALIFY row_number() OVER (ORDER BY cos DESC, vec_id ASC) <= 10)""")

  // -- x08: the retrieval SERVING stack composed end-to-end — lexical
  //    BM25 (s12's scoring) + dense cosine (s01) fused by
  //    reciprocal-rank fusion (s14's k=60 rule) and DIVERSIFIED by
  //    MMR (s25's greedy, relevance = the fused score), the four-stage
  //    answer a serving deployment actually returns for one query.
  //    The corpus restricts to the EMBEDDED collection — diversity
  //    needs a vector for every candidate, and at sf0.1 only 2 of 5
  //    documents are embedded, so the restriction is a real filter.
  //    Query = doc/vec 0 (doc_id ≡ vec_id, the d10 convention). Both
  //    retrieval arms are the proven catalog operators; everything
  //    downstream of the two top-10s is bounded (≤ 20 fused members),
  //    so fusion + greedy cost constant driver work at any corpus
  //    size, and each arm swaps for its standing-index form (s13/s10)
  //    without touching the fusion or diversification stages.
  private val x08 = Q(
    "x08_retrieval_serving",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val embIds = emb.select(col("vec_id"))
      val docs = Tables.documents(s, d)
        .join(broadcast(embIds), col("doc_id") === col("vec_id"), "left_semi")
      // the compiled in-row TermCounts fold (the s12/s13 kernel) —
      // tf is a pure map over the doc scan, zero exchanges
      val tf = docs.select(col("doc_id"),
          explode(graft.functions.ColumnFns.term_counts(split(col("text"), " "))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val corpusTf = tf.filter(col("doc_id") =!= 0L)
      val dl = corpusTf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      val dfr = corpusTf.groupBy("term").agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
      val nCorpus = stats.getLong(0).toDouble
      val sumDl = stats.getLong(1).toDouble
      val wq = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
      val qTerms = tf.filter(col("doc_id") === 0L)
        .withColumn("qr", row_number().over(wq)).filter(col("qr") <= 4)
        .select("term")
      val idf = (lit(nCorpus) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
      val lenNorm = lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) * lit(nCorpus) / lit(sumDl)
      val tfNorm = col("tf").cast(DoubleType) * lit(2.2) /
        (col("tf").cast(DoubleType) + lit(1.2) * lenNorm)
      val contrib = round(idf * tfNorm, 6).cast(DecimalType(18, 6))
      val wl = Window.orderBy(col("sdec").desc, col("corpus_doc"))
      val lex = broadcast(qTerms)
        .join(corpusTf.withColumnRenamed("doc_id", "corpus_doc"), "term")
        .join(broadcast(dfr), "term")
        .join(broadcast(dl.withColumnRenamed("doc_id", "corpus_doc")), "corpus_doc")
        .groupBy("corpus_doc").agg(sum(contrib).as("sdec"))
        .withColumn("lex_rank", row_number().over(wl).cast(LongType))
        .filter(col("lex_rank") <= 10)
        .select("corpus_doc", "lex_rank")
      val qv = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
      val wd = Window.orderBy(col("cos").desc, col("corpus_doc"))
      val dense = emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(qv))
        .select(col("vec_id").as("corpus_doc"),
          round(Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .withColumn("vec_rank", row_number().over(wd).cast(LongType))
        .filter(col("vec_rank") <= 10)
        .select("corpus_doc", "vec_rank")
      fuseAndDiversify(s, emb, lex, dense)
    },
    Some(x08Oracle))

  /** x08/x09's shared serving tail: RRF-fuse the two per-arm rank
    * lists (full-outer — a doc found by one arm still scores), then
    * the s25 MMR greedy over the fused pool — run inside a group task
    * via the shared [[HybridServe.mmrPicks]] kernel (pairwise sims
    * over the ≤ 20 fused members computed locally in the task, never
    * collected to the driver).
    */
  private def fuseAndDiversify(
      s: SparkSession, emb: DataFrame, lex: DataFrame, dense: DataFrame): DataFrame = {
    val rrfRaw = coalesce(lit(1.0) / (lit(60.0) + col("lex_rank")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0))
    val fused = lex.join(dense, Seq("corpus_doc"), "full_outer")
      .withColumn("rrf", round(rrfRaw, 6))
    val pool = emb.select(col("vec_id").as("doc"), col("embedding"))
      .join(broadcast(fused.select(col("corpus_doc").as("doc"),
        col("rrf").as("rel"))), "doc")
      .withColumn("query_id", lit(0L))
    val picks = HybridServe.mmrPicks(pool)
      .select(col("doc").as("corpus_doc"), col("rank"))
    fused.join(broadcast(picks), "corpus_doc")
      .select(col("corpus_doc"), col("lex_rank"), col("vec_rank"), col("rrf"), col("rank"))
  }

  // -- x09: x08's serving stack composed over the STANDING indexes —
  //    the amortized production shape: the BM25 arm reads the s13
  //    partial-aggregate layout back off disk (merge-at-read ≡ the
  //    direct aggregation, so the lexical answer is exactly x08's),
  //    the dense arm runs the s10 standing IVF-PQ probe (4/16 posting
  //    lists, batched-ADC 50-shortlist, exact-cosine re-rank — an
  //    APPROXIMATION x08's exact arm doesn't make, which the oracle
  //    models explicitly via the s09/s10 IVF CTEs rather than assuming
  //    recall), and the fusion + MMR tail is shared code
  //    ([[fuseAndDiversify]]), untouched. One query costs two index
  //    probes + constant driver work — nothing corpus-sized is built
  //    inside the query, which is the whole point of standing indexes.
  private def x09IdxDir =
    new java.io.File("target/graft_idx/x09_serving").getAbsolutePath

  /** x09 BUILD: both standing halves a serving deployment keeps warm —
    * the s10 IVF-PQ layout under `ivf/` (full embedded corpus; the
    * query vec is excluded at probe time) and the s13 partial-aggregate
    * BM25 layout under `bm25/` over x08's lexical corpus (embedded
    * docs, query doc excluded), base batch + appended delta both.
    */
  private[graft] def x09Build(s: SparkSession, d: String): Unit =
    x09BuildAt(s, d, x09IdxDir)

  private[graft] def x09BuildAt(s: SparkSession, d: String, idxDir: String): Unit = {
    s10BuildAt(s, d, s"$idxDir/ivf")
    bm25BuildAt(s, d, idxDir)
  }

  /** the standing BM25 half both serving builds (x09, x10) freeze:
    * s13's partial-aggregate layout over the embedded lexical corpus,
    * base batch + appended delta
    */
  private def bm25BuildAt(s: SparkSession, d: String, idxDir: String): Unit = {
    val embIds = Tables.embeddings(s, d).select(col("vec_id"))
    val corpus = Tables.documents(s, d)
      .join(broadcast(embIds), col("doc_id") === col("vec_id"), "left_semi")
      .filter(col("doc_id") =!= 0L)
    def writeBatch(pred: org.apache.spark.sql.Column, mode: String): Unit = {
      // the compiled in-row TermCounts fold (see s13Tf) — the postings
      // batch is a pure map over the corpus slice, zero exchanges
      val batch = corpus.filter(pred)
        .select(col("doc_id"),
          explode(graft.functions.ColumnFns.term_counts(split(col("text"), " "))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
        .persist()
      try {
        batch.write.mode(mode).parquet(s"$idxDir/bm25/postings")
        batch.groupBy("term").agg(count(lit(1)).as("df"))
          .write.mode(mode).parquet(s"$idxDir/bm25/df")
        val dlB = batch.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        dlB.write.mode(mode).parquet(s"$idxDir/bm25/dl")
        dlB.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
          .write.mode(mode).parquet(s"$idxDir/bm25/stats")
      } finally batch.unpersist(): Unit
    }
    writeBatch(col("doc_id") % 10 =!= 7, "overwrite")
    writeBatch(col("doc_id") % 10 === 7, "append")
  }

  /** x09 PROBE: one serving answer off the standing halves — BM25 off
    * the partial relations, dense off the IVF-PQ index, fused and
    * MMR-diversified by the shared tail.
    */
  private[graft] def x09Probe(s: SparkSession, d: String): DataFrame =
    x09ProbeAt(s, d, x09IdxDir)

  private[graft] def x09ProbeAt(s: SparkSession, d: String, idxDir: String): DataFrame = {
    // dense arm: the s10 standing probe — IVF 4/16, ADC shortlist 50,
    // exact re-rank top-10, ranked exactly as the re-rank orders
    val wd = Window.orderBy(col("cos").desc, col("corpus_doc"))
    val dense = s10ProbeAt(s, d, s"$idxDir/ivf")
      .select(col("vec_id").as("corpus_doc"), col("cos"))
      .withColumn("vec_rank", row_number().over(wd).cast(LongType))
      .select("corpus_doc", "vec_rank")
    fuseAndDiversify(s, Tables.embeddings(s, d), bm25ArmAt(s, d, idxDir), dense)
  }

  /** the lexical serving arm off the standing BM25 relations: x08's
    * scoring, inputs read back from disk (partials merged at read —
    * associative, so ≡ x08); shared by x09 and x10
    */
  private def bm25ArmAt(s: SparkSession, d: String, idxDir: String): DataFrame = {
    val postings = s.read.parquet(s"$idxDir/bm25/postings")
    val dfr = s.read.parquet(s"$idxDir/bm25/df")
      .groupBy("term").agg(sum(col("df")).as("df"))
    val dl = s.read.parquet(s"$idxDir/bm25/dl")
    val st = s.read.parquet(s"$idxDir/bm25/stats")
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s")).head()
    val nCorpus = st.getLong(0).toDouble
    val sumDl = st.getLong(1).toDouble
    val wq = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term"))
    val qTerms = Tables.documents(s, d).filter(col("doc_id") === 0L)
      .select(col("doc_id"),
        explode(graft.functions.ColumnFns.term_counts(split(col("text"), " "))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .withColumn("qr", row_number().over(wq)).filter(col("qr") <= 4)
      .select("term")
    val idf = (lit(nCorpus) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val lenNorm = lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) * lit(nCorpus) / lit(sumDl)
    val tfNorm = col("tf").cast(DoubleType) * lit(2.2) /
      (col("tf").cast(DoubleType) + lit(1.2) * lenNorm)
    val contrib = round(idf * tfNorm, 6).cast(DecimalType(18, 6))
    val wl = Window.orderBy(col("sdec").desc, col("corpus_doc"))
    val lex = broadcast(qTerms)
      .join(postings.withColumnRenamed("doc_id", "corpus_doc"), "term")
      .join(broadcast(dfr), "term")
      .join(broadcast(dl.withColumnRenamed("doc_id", "corpus_doc")), "corpus_doc")
      .groupBy("corpus_doc").agg(sum(contrib).as("sdec"))
      .withColumn("lex_rank", row_number().over(wl).cast(LongType))
      .filter(col("lex_rank") <= 10)
      .select("corpus_doc", "lex_rank")
    lex
  }

  private val x09 = Q(
    "x09_serving_standing",
    (s, d) => { x09Build(s, d); x09Probe(s, d) },
    Some(x09Oracle))

  // -- x10: the serving stack with the RQ-REFINED dense arm — x09's
  //    composition where the dense side runs the s27 standing
  //    residual-quantization search instead of the plain IVF-PQ probe:
  //    level-1 ADC ranks the standing code parquet (wide 50), the
  //    level-2 residual partials refine the wide set (narrow 20), and
  //    exact cosines are paid only on the narrow shortlist (s26
  //    measured the recall this buys; x10 is where serving collects
  //    it). The BM25 arm, RRF fusion and MMR tail are byte-shared with
  //    x09 (bm25BuildAt / bm25ArmAt / fuseAndDiversify), so the ONLY
  //    delta is the dense arm — exactly the swap a deployment makes
  //    when it upgrades its embedding index. The oracle models the
  //    full refinement chain explicitly (wide/refine/narrow CTEs), so
  //    the shortlist recall effects are pinned, not assumed.
  private def x10IdxDir =
    new java.io.File("target/graft_idx/x10_serving").getAbsolutePath

  private[graft] def x10Build(s: SparkSession, d: String): Unit = {
    s27BuildAt(s, d, s"$x10IdxDir/rq")
    bm25BuildAt(s, d, x10IdxDir)
  }

  private[graft] def x10Probe(s: SparkSession, d: String): DataFrame = {
    val wd = Window.orderBy(col("cos").desc, col("corpus_doc"))
    val dense = s27ProbeAt(s, d, s"$x10IdxDir/rq")
      .select(col("vec_id").as("corpus_doc"), col("cos"))
      .withColumn("vec_rank", row_number().over(wd).cast(LongType))
      .select("corpus_doc", "vec_rank")
    fuseAndDiversify(s, Tables.embeddings(s, d), bm25ArmAt(s, d, x10IdxDir), dense)
  }

  /** x10's dense arm in DuckDB: the s26/s27 RQ oracle machinery
    * (level-1 ADC wide-50, residual refine, narrow-20, exact re-rank)
    * producing the `xdense(corpus_doc, vec_rank)` interface the shared
    * serving template consumes.
    */
  private lazy val x10Oracle = servingOracle(s"""$pqCte,
      $rqCte,
      xadc1 AS (SELECT c.code, s.s,
                  CAST(round(SUM(CAST(c.cv[s.s*8+i.i+1] AS DOUBLE)
                               * CAST(xq.qv[s.s*8+i.i+1] AS DOUBLE)), 6)
                       AS DECIMAL(18,6)) AS p
                FROM cw c, xq, sub s, d8 i GROUP BY c.code, s.s),
      xw1 AS (SELECT b.vec_id, SUM(a.p) AS score1
              FROM best b JOIN xadc1 a ON a.s = b.s AND a.code = b.code
              WHERE b.vec_id <> 0 GROUP BY b.vec_id
              ORDER BY score1 DESC, vec_id ASC LIMIT 50),
      xadc2 AS (SELECT w.code2, w.s,
                  CAST(round(SUM(w.rv * CAST(xq.qv[w.s*8+w.i+1] AS DOUBLE)), 6)
                       AS DECIMAL(18,6)) AS p2
                FROM cw2 w, xq GROUP BY w.code2, w.s),
      xnar AS (SELECT b2.vec_id
               FROM best2 b2
               JOIN xadc2 a2 ON a2.s = b2.s AND a2.code2 = b2.code2
               JOIN xw1 ON xw1.vec_id = b2.vec_id
               GROUP BY b2.vec_id, xw1.score1
               ORDER BY (xw1.score1 + SUM(a2.p2)) DESC, b2.vec_id ASC LIMIT 20),
      xdx AS (SELECT e.vec_id,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(xq.qv[d.d+1] AS DOUBLE)) AS dt,
                SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)) AS na,
                SUM(CAST(xq.qv[d.d+1] AS DOUBLE) * CAST(xq.qv[d.d+1] AS DOUBLE)) AS nb
              FROM embeddings e JOIN xnar sh ON sh.vec_id = e.vec_id, xq, xdims d
              GROUP BY e.vec_id),
      xdense AS MATERIALIZED (
        SELECT vec_id AS corpus_doc,
               CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS vec_rank
        FROM (SELECT vec_id, round(dt / (sqrt(na) * sqrt(nb)), 6) AS cos FROM xdx)
        QUALIFY row_number() OVER (ORDER BY cos DESC, vec_id ASC) <= 10)""")

  private val x10 = Q(
    "x10_serving_rq",
    (s, d) => { x10Build(s, d); x10Probe(s, d) },
    Some(x10Oracle))

  // -- t01: language ID via marker-word density.
  private val t01 = Q(
    "t01_lang_id",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        col("lang"),
        TextAnalysis.nTokens.as("n_tokens"),
        round(TextAnalysis.stopwordRatio(), 6).as("stop_ratio"),
        TextAnalysis.langId().as("predicted")),
    Some("""
      SELECT doc_id, lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        round(CAST(len(list_filter(string_split(text, ' '),
                t -> list_contains(['the','a','of','and','to','in','is','for','on','with'], t)))
              AS DOUBLE) / len(string_split(text, ' ')), 6) AS stop_ratio,
        CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                t -> list_contains(['the','a','of','and','to','in','is','for','on','with'], t)))
              AS DOUBLE) / len(string_split(text, ' ')) >= 0.05
             THEN 'en' ELSE 'other' END AS predicted
      FROM documents
    """.trim))

  // -- t02: quality scoring.
  private val t02 = Q(
    "t02_quality_score",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.nTokens.as("n_tokens"),
        round(TextAnalysis.typeTokenRatio, 6).as("ttr"),
        round(TextAnalysis.punctRatio, 6).as("punct_ratio"),
        round(TextAnalysis.meanWordLen, 6).as("mean_word_len"),
        TextAnalysis.qualityScore.as("quality")),
    Some("""
      WITH b AS (SELECT doc_id, text,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) AS ttr,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
            / length(text) AS punct,
          CAST(len(list_filter(string_split(text, ' '),
               t -> list_contains(['the','a','of','and','to','in','is','for','on','with'], t)))
            AS DOUBLE) / len(string_split(text, ' ')) AS stop,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(string_split(text, ' ')) AS mwl
        FROM documents)
      SELECT doc_id, n_tokens, round(ttr, 6) AS ttr, round(punct, 6) AS punct_ratio,
        round(mwl, 6) AS mean_word_len,
        round(ttr * 0.4 + stop * 0.3 + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3
              - punct * 0.2, 6) AS quality
      FROM b
    """.trim))

  // -- t03: token counting — whitespace and BPE-ish regex.
  private val t03 = Q(
    "t03_token_count",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.nTokens.as("ws_tokens"),
        TextAnalysis.bpeTokenCount.as("bpe_tokens"),
        length(col("text")).cast(LongType).as("n_chars")),
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpe_tokens,
        CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    """.trim))

  // -- t04: document fingerprints — rolling polynomial + normalized md5.
  private val t04 = Q(
    "t04_fingerprint",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.rollingFingerprint.as("rolling_fp"),
        TextAnalysis.contentFingerprint.as("content_fp")),
    Some("""
      SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ' '),
                           w -> CAST(ascii(w) * 31 + length(w) AS BIGINT))),
          (acc, x) -> (acc * 131 + x) % 1000000007) AS rolling_fp,
        md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS content_fp
      FROM documents
    """.trim))

  // -- t13: hashed-feature LINEAR CLASSIFIER inference — the
  //    fasttext-style quality/domain filter pass crawl pipelines run
  //    over every document (a trained linear model over hashed
  //    bag-of-words features, the CCNet-recipe shape). The sandbox
  //    trains nothing, so the weight vector is a deterministic
  //    stand-in: bucket = md5_prefix64(token) mod 1024, weight =
  //    ((bucket * 2654435761) mod 1024 - 512) / 1024 — a fixed
  //    Knuth-multiplicative mix of the feature hash, keeping the SHAPE
  //    of real inference (hash -> weight lookup -> fold) while staying
  //    oracle-replayable. Weights are dyadic rationals (k/1024,
  //    |k| <= 512), so the running double sum is EXACT and
  //    order-insensitive: the engine folds them in token order through
  //    a zero-shuffle aggregate() over the token array while the
  //    oracle group-by-sums in whatever order DuckDB picks — identical
  //    bits either way, no rounding image needed before the final
  //    quotient. At 100 TB this is the ideal inference plan: map-only
  //    (PlanAuditSpec asserts zero exchanges), whole-stage codegen'd
  //    (Md5Prefix64 is a native expression), and a REAL trained vector
  //    swaps in as a 2^20-bucket broadcast array (~8 MB) without
  //    changing the plan shape.
  private val t13 = Q(
    "t13_classifier_score",
    (s, d) => {
      def w(t: org.apache.spark.sql.Column) =
        ((graft.functions.ColumnFns.md5_prefix64(t) % 1024L * 2654435761L) % 1024L - 512L)
          .cast(DoubleType) / 1024.0
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks).cast(LongType).as("n_toks"),
          aggregate(toks, lit(0.0), (acc, t) => acc + w(t)).as("z"))
        .select(
          col("doc_id"), col("n_toks"),
          round(col("z") / col("n_toks"), 6).as("score"),
          (col("z") > 0.0).cast(LongType).as("keep"))
    },
    Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      w AS (SELECT doc_id,
              CAST((CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 1024
                    * 2654435761) % 1024 - 512 AS DOUBLE) / 1024.0 AS w
            FROM tok),
      z AS (SELECT doc_id, SUM(w) AS z, count(*) AS n FROM w GROUP BY 1)
      SELECT doc_id, CAST(n AS BIGINT) AS n_toks, round(z / n, 6) AS score,
             CAST(z > 0 AS BIGINT) AS keep
      FROM z
    """.trim))

  // -- t08: Unicode NFC normalization — native codegen expression with
  //    an ASCII fast path (one byte scan, no decode) vs DuckDB's
  //    nfc_normalize. The corpus is ASCII, so each row gets a
  //    deterministic decomposed suffix (e + U+0301) appended by BOTH
  //    engines; composition must shorten it by exactly one codepoint.
  private val t08 = Q(
    "t08_normalize_unicode",
    (s, d) => {
      val aug = concat(col("text"), lit(" café"))
      Tables.documents(s, d).select(
        col("doc_id"),
        length(aug).cast(LongType).as("n_chars_raw"),
        length(graft.functions.ColumnFns.nfc_normalize(aug)).cast(LongType).as("n_chars_nfc"),
        graft.functions.ColumnFns.nfc_normalize(aug).as("norm_text"))
    },
    Some("""
      SELECT doc_id,
        length(text || ' cafe' || chr(769)) AS n_chars_raw,
        length(nfc_normalize(text || ' cafe' || chr(769))) AS n_chars_nfc,
        nfc_normalize(text || ' cafe' || chr(769)) AS norm_text
      FROM documents
    """.trim))

  // -- t09: PII redaction — email/IPv4/phone scrub with per-category
  //    counts. The corpus carries no PII, so each row is augmented with
  //    deterministic doc_id-derived PII by BOTH engines, then redacted;
  //    the oracle hash-checks the scrubbed text AND the counts. Pure
  //    regexp chain: codegen'd, shuffle-free, scan-speed at 100 TB.
  private val t09 = Q(
    "t09_pii_redact",
    (s, d) => {
      val aug = concat(
        col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@mail.example or 10.0."), col("doc_id") % 200,
        lit(".7 tel 555-867-"), lpad((col("doc_id") % 10000).cast(StringType), 4, "0"))
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_count(aug, lit(TextAnalysis.EmailRe)).cast(LongType).as("n_emails"),
        regexp_count(aug, lit(TextAnalysis.Ipv4Re)).cast(LongType).as("n_ips"),
        regexp_count(aug, lit(TextAnalysis.PhoneRe)).cast(LongType).as("n_phones"),
        TextAnalysis.piiRedact(aug).as("redacted"))
    },
    Some("""
      WITH a AS (SELECT doc_id,
          text || ' contact user' || doc_id || '@mail.example or 10.0.'
               || (doc_id % 200) || '.7 tel 555-867-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(aug, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(aug, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
        regexp_replace(
          regexp_replace(
            regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
          '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS redacted
      FROM a
    """.trim))

  // -- t10: Gopher-style quality RULE FLAGS (Rae et al. 2021,
  //    arXiv:2112.11446 §A1.1) — where t02 emits one blended score,
  //    real curation pipelines gate on named per-rule booleans so every
  //    rejection is attributable and thresholds tune independently.
  //    Word-count bounds, mean-word-length band, symbol-to-word ratio,
  //    min distinct stopwords; every rule compares against the
  //    6-dp-ROUNDED statistic on both engines so boundary rows are
  //    tie-free (repo decimal discipline). Pure per-row expressions:
  //    codegen'd, shuffle-free, scan-speed at 100 TB.
  private val t10 = Q(
    "t10_gopher_rules",
    (s, d) => {
      val nw = TextAnalysis.nTokens
      val mwl = round(TextAnalysis.meanWordLen, 6)
      val sym = round(TextAnalysis.symbolRatio, 6)
      val hits = TextAnalysis.stopwordHits()
      val rLen = (nw >= 50L && nw <= 100000L).cast(LongType)
      val rMwl = (mwl >= 3.0 && mwl <= 10.0).cast(LongType)
      val rSym = (sym <= 0.1).cast(LongType)
      val rStop = (hits >= 2L).cast(LongType)
      Tables.documents(s, d).select(
        col("doc_id"),
        nw.as("n_words"),
        mwl.as("mean_word_len"),
        sym.as("symbol_ratio"),
        hits.as("stop_hits"),
        rLen.as("r_len"),
        rMwl.as("r_word_len"),
        rSym.as("r_symbols"),
        rStop.as("r_stopwords"),
        (rLen * rMwl * rSym * rStop).as("gopher_pass"))
    },
    Some("""
      WITH b AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
          round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                / len(string_split(text, ' ')), 6) AS mwl,
          round(CAST((length(text) - length(replace(text, '#', ''))) +
                     (length(text) - length(replace(text, '...', ''))) / 3.0 AS DOUBLE)
                / len(string_split(text, ' ')), 6) AS sym,
          CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
               ['the','a','of','and','to','in','is','for','on','with'])) AS BIGINT) AS stop_hits
        FROM documents),
      r AS (SELECT *,
          CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_len,
          CAST(CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS BIGINT) AS r_word_len,
          CAST(CASE WHEN sym <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS r_symbols,
          CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stopwords
        FROM b)
      SELECT doc_id, n_words, mwl AS mean_word_len, sym AS symbol_ratio, stop_hits,
             r_len, r_word_len, r_symbols, r_stopwords,
             r_len * r_word_len * r_symbols * r_stopwords AS gopher_pass
      FROM r
    """.trim))

  // -- t11: per-source CORPUS DATASHEET — the summary table every
  //    dataset release publishes (datasheets-for-datasets practice):
  //    docs, tokens, distinct types, mean document length, and
  //    type-token ratio per source. One map-side-combined aggregation
  //    over the exploded token stream (the distinct-type count is the
  //    only term-keyed shuffle, and it carries (source, term) pairs —
  //    vocabulary-bounded, not corpus-bounded). Ratios are
  //    bigint/bigint IEEE divisions, 6-dp images (the t05 rule).
  private val t11 = Q(
    "t11_corpus_datasheet",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("source")
        .agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tokens"),
          countDistinct(col("term")).as("n_types"))
        .select(
          col("source"), col("n_docs"), col("n_tokens"), col("n_types"),
          round(col("n_tokens") / col("n_docs").cast(DoubleType), 6).as("mean_doc_tokens"),
          round(col("n_types") / col("n_tokens").cast(DoubleType), 6).as("type_token_ratio")),
    Some("""
      WITH toks AS (SELECT source, doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
      agg AS (SELECT source,
                count(DISTINCT doc_id) AS n_docs,
                count(*) AS n_tokens,
                count(DISTINCT term) AS n_types
              FROM toks GROUP BY source)
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(n_types AS BIGINT) AS n_types,
             round(CAST(n_tokens AS DOUBLE) / n_docs, 6) AS mean_doc_tokens,
             round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio
      FROM agg
    """.trim))

  // -- m01: multimodal metadata (binary column + typed meta) —
  //    oracle-checkable half of the media pipeline.
  private val m01 = Q(
    "m01_multimodal_meta",
    (s, d) => Multimodal.mediaMeta(Multimodal.mediaTable(Tables.documents(s, d))),
    Some("""
      SELECT doc_id AS media_id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        md5(text) AS checksum
      FROM documents
    """.trim))

  // -- m02: the REAL batched multi-kind decoder — one mapPartitions
  //    pass over real containers routed by kind (doc_id%3: PNG image /
  //    G.711 μ-law audio / animated-GIF video, the m08/m11/m10
  //    fixtures verbatim), each blob decoded by the JDK codec for its
  //    format and reduced to a unified integer feature row: frames,
  //    decoded units (pixels·frames / samples), value sum, peak. The
  //    oracle re-derives every number per kind from the fixture
  //    formulas (PNG and palette-GIF are lossless; μ-law expansion is
  //    deterministic integer math) and UNION ALLs the three arms — so
  //    the router's dispatch, not just each codec, is hash-gated: a
  //    row sent down the wrong arm throws or diverges. This is the
  //    production "decode the corpus" shape (per-partition codec
  //    reuse, one scan, zero exchanges — PlanAuditSpec); an MP3 or
  //    H.264 decoder, which this container does not ship, would drop
  //    into the matching arm without touching schema or plan.
  private val m02 = Q(
    "m02_media_features",
    (s, d) =>
      Multimodal
        .decodeRouted(s, Multimodal.realMediaTable(s, Tables.documents(s, d)))
        .toDF(),
    Some("""
      WITH img AS (SELECT doc_id AS media_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
                   FROM documents WHERE doc_id % 3 = 0),
      img_px AS (SELECT media_id, w, h,
                   SUM((x.x*3 + y.y*5 + media_id) % 256
                     + (x.x*7 + y.y + 2*media_id) % 256
                     + (x.x + y.y*11 + 3*media_id) % 256) AS s,
                   MAX(GREATEST((x.x*3 + y.y*5 + media_id) % 256,
                                (x.x*7 + y.y + 2*media_id) % 256,
                                (x.x + y.y*11 + 3*media_id) % 256)) AS p
                 FROM img, (SELECT unnest(range(32)) AS x) x, (SELECT unnest(range(20)) AS y) y
                 WHERE x.x < w AND y.y < h GROUP BY media_id, w, h),
      img_out AS (SELECT media_id, 'image' AS kind, 1 AS n_frames, w*h AS n_units,
                         s AS sum_vals, p AS peak FROM img_px),
      aud AS (SELECT doc_id AS media_id, 8000 AS sr,
                     400 + doc_id % 200 AS n, 100 + doc_id % 400 AS f
              FROM documents WHERE doc_id % 3 = 1),
      aud_sm AS (SELECT media_id, n, ((i.i * f) % sr) * 24000 // sr - 12000 AS v
                 FROM aud, (SELECT unnest(range(600)) AS i) i WHERE i.i < n),
      aud_en AS (SELECT *, LEAST(abs(v), 32635) + 132 AS m FROM aud_sm),
      aud_ex AS (SELECT *, length(bin(m)) - 8 AS e FROM aud_en),
      aud_de AS (SELECT media_id, n,
                   CASE WHEN v < 0 THEN 132 - ((((m >> (e + 3)) & 15) * 8 + 132) << e)
                        ELSE ((((m >> (e + 3)) & 15) * 8 + 132) << e) - 132 END AS dv
                 FROM aud_ex),
      aud_out AS (SELECT media_id, 'audio' AS kind, 1 AS n_frames, n AS n_units,
                         SUM(abs(dv)) AS sum_vals, MAX(abs(dv)) AS peak
                  FROM aud_de GROUP BY media_id, n),
      vid AS (SELECT doc_id AS media_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h,
                     2 + doc_id % 4 AS nf
              FROM documents WHERE doc_id % 3 = 2),
      vid_fr AS (SELECT media_id, w, h, nf, unnest(range(nf)) AS f FROM vid),
      vid_px AS (SELECT media_id, w, h, nf,
                   SUM(51 * ((x.x*3 + y.y*5 + media_id + 7*f) % 6)
                     + 51 * ((x.x*7 + y.y + 2*media_id + 3*f) % 6)
                     + 51 * ((x.x + y.y*11 + 3*media_id + 5*f) % 6)) AS s,
                   MAX(GREATEST(51 * ((x.x*3 + y.y*5 + media_id + 7*f) % 6),
                                51 * ((x.x*7 + y.y + 2*media_id + 3*f) % 6),
                                51 * ((x.x + y.y*11 + 3*media_id + 5*f) % 6))) AS p
                 FROM vid_fr, (SELECT unnest(range(16)) AS x) x, (SELECT unnest(range(12)) AS y) y
                 WHERE x.x < w AND y.y < h GROUP BY media_id, w, h, nf),
      vid_out AS (SELECT media_id, 'video' AS kind, nf AS n_frames, nf*w*h AS n_units,
                         s AS sum_vals, p AS peak FROM vid_px)
      SELECT media_id, kind,
             CAST(n_frames AS BIGINT) AS n_frames, CAST(n_units AS BIGINT) AS n_units,
             CAST(sum_vals AS BIGINT) AS sum_vals, CAST(peak AS BIGINT) AS peak
      FROM (SELECT * FROM img_out UNION ALL SELECT * FROM aud_out UNION ALL SELECT * FROM vid_out)
    """.trim))

  // -- m03: frame sampling over byte-math frame indexing — every 4th
  //    frame index per media blob with its byte offset (the container-
  //    agnostic sampling half: pick offsets WITHOUT decoding, the plan
  //    a 100 TB pipeline runs to avoid touching bytes it will drop).
  //    m10 is the companion that runs the SAME stride over frames a
  //    real decoder (JDK GIF) actually decompresses, with per-frame
  //    channel stats. Oracle recomputes the frame math via range() —
  //    Spark sequence(0, n-1, 4) ≡ DuckDB range(0, n, 4); the
  //    long-cast of the double division truncates, ≡ floor for
  //    positive values.
  private val m03 = Q(
    "m03_frame_sample",
    (s, d) =>
      Multimodal
        .mediaFrameMeta(Multimodal.mediaTable(Tables.documents(s, d)))
        .filter(col("n_frames") > 1)
        .select(
          col("media_id"),
          col("kind"),
          col("n_frames"),
          col("byte_len"),
          explode(expr("sequence(0, n_frames - 1, 4)")).as("frame_idx"))
        .withColumn("byte_offset", col("frame_idx") * (col("byte_len") / col("n_frames")).cast(LongType))
        .drop("byte_len"),
    Some(s"""
      WITH f AS (SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
          CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                    WHEN doc_id % 3 = 1 THEN octet_length(encode(text)) // 64 + 1
                    ELSE octet_length(encode(text)) // 32 + 1 END AS BIGINT) AS n_frames
        FROM documents),
      x AS (SELECT media_id, kind, n_frames, byte_len,
              unnest(range(0, n_frames, 4)) AS frame_idx
            FROM f WHERE n_frames > 1)
      SELECT media_id, kind, n_frames, frame_idx,
             frame_idx * CAST(floor(byte_len / n_frames) AS BIGINT) AS byte_offset
      FROM x
    """.trim))

  // -- m05: audio frame WINDOWING — the overlapped (hop < window)
  //    sibling of m03's strided video sampling: STFT-shaped windows of
  //    64 samples every 16, plus the sample -> milliseconds mapping at
  //    a nominal 16 kHz (integer floor math, identical both engines).
  //    Map-side generator over the audio rows only — rows multiply by
  //    windows-per-clip AFTER the scan, no shuffle anywhere; a real
  //    decoder swaps the stub's byte-length for the clip's true sample
  //    count without touching the windowing algebra.
  private val m05 = Q(
    "m05_audio_windows",
    (s, d) =>
      Multimodal
        .mediaFrameMeta(Multimodal.mediaTable(Tables.documents(s, d)))
        .filter(col("kind") === "audio")
        .select(col("media_id"), col("byte_len").as("n_samples"))
        .filter(col("n_samples") >= 64)
        .select(
          col("media_id"),
          col("n_samples"),
          explode(expr("sequence(0, ((n_samples - 64) div 16) * 16, 16)")).as("start_sample"))
        .select(
          col("media_id"),
          col("n_samples"),
          (col("start_sample") / 16).cast(LongType).as("window_idx"),
          col("start_sample"),
          (col("start_sample") + 64).as("end_sample"),
          floor((col("start_sample") + 32) * 1000 / 16000).as("center_ms")),
    Some("""
      WITH a AS (SELECT doc_id AS media_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_samples
        FROM documents WHERE doc_id % 3 = 1),
      w AS (SELECT media_id, n_samples,
              unnest(range(0, n_samples - 64 + 1, 16)) AS start_sample
            FROM a WHERE n_samples >= 64)
      SELECT media_id, n_samples,
             CAST(start_sample // 16 AS BIGINT) AS window_idx,
             start_sample,
             start_sample + 64 AS end_sample,
             CAST((start_sample + 32) * 1000 // 16000 AS BIGINT) AS center_ms
      FROM w
    """.trim))

  // (The MLlib MinHashLSH variant — formerly catalog entry d07 — lives
  // in [[MlDedup]] and is cross-checked against the md5 pipeline in
  // LlmSpec. It is deliberately NOT a catalog/bench entry: its hash
  // family is engine-internal (never oracle-checkable) and its
  // approxSimilarityJoin is strictly redundant with d03's banded LSH.)

  // -- m04: the REAL kind-routed downsampler — each modality reduced
  //    along its natural axis over the same real containers as m02,
  //    with the reduced content re-measured from actually-decoded
  //    bytes: images NN-resize into an aspect-preserving 8-px box
  //    (the m07 kernel on the decoded PNG raster), audio decimates
  //    every 3rd expanded μ-law sample, video keeps every 2nd decoded
  //    GIF frame. The oracle replays all three reductions from the
  //    fixture formulas (the image arm reuses m07's integer
  //    source-mapping sx = u·w//dw; the audio arm filters the sample
  //    CTE to i%3=0; the video arm strides the frame range) — the
  //    unified (src_extent, dst_extent, sum_out, peak_out) row is the
  //    size-accounting record a 100 TB re-encode job plans from.
  // -- m06: REAL audio decode — actual RIFF/PCM16 WAV files (real
  //    writer, real chunk-walking parser, no codec library needed for
  //    the uncompressed container) with integer-sawtooth content, so
  //    the oracle re-derives peak / total amplitude / zero crossings
  //    from the same formulas without touching binaries. Any header
  //    offset, endianness, or sample-decode bug in EITHER direction
  //    diverges the statistics and fails the hash gate. First rung of
  //    the real-codec ladder (m06 WAV, m07 PPM, m08 PNG, m09 JPEG).
  private val m06 = Q(
    "m06_wav_decode",
    (s, d) =>
      Multimodal
        .wavFeatures(s, Multimodal.wavTable(s, Tables.documents(s, d)))
        .toDF(),
    Some("""
      WITH p AS (SELECT doc_id AS media_id, 8000 AS sr,
                        400 + doc_id % 200 AS n, 100 + doc_id % 400 AS f
                 FROM documents),
      sm AS (SELECT media_id, sr, n, i.i AS i,
               ((i.i * f) % sr) * 24000 // sr - 12000 AS v
             FROM p, (SELECT unnest(range(600)) AS i) i WHERE i.i < n),
      lg AS (SELECT *, lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv FROM sm)
      SELECT media_id,
             CAST(sr AS BIGINT) AS sample_rate,
             CAST(n AS BIGINT) AS n_samples,
             CAST(max(abs(v)) AS BIGINT) AS peak,
             CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
             CAST(sum(CASE WHEN i > 0 AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END) AS BIGINT) AS crossings
      FROM lg GROUP BY media_id, sr, n
    """.trim))

  // -- m07: REAL image decode + resize — actual PPM P6 files parsed by
  //    a real header/raster reader (whitespace/comment handling, maxval
  //    contract), channel sums over the raster, then a REAL
  //    nearest-neighbor resize into an aspect-preserving 8-px box with
  //    integer source mapping (sx = u·w/dw) — every decoded and resized
  //    statistic byte-exactly reproduced by the oracle from the fixture
  //    formulas. Upgrades the m04 stub the same way as m06/m02.
  private val m07 = Q(
    "m07_ppm_decode",
    (s, d) =>
      Multimodal
        .ppmFeatures(s, Multimodal.ppmTable(s, Tables.documents(s, d)), maxDim = 8)
        .toDF(),
    Some("""
      WITH p AS (SELECT doc_id AS media_id,
                        16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
                 FROM documents),
      px AS (SELECT media_id, w, h,
               SUM((x.x * 3 + y.y * 5 + media_id) % 256) AS sum_r,
               SUM((x.x * 7 + y.y + 2 * media_id) % 256) AS sum_g,
               SUM((x.x + y.y * 11 + 3 * media_id) % 256) AS sum_b
             FROM p, (SELECT unnest(range(32)) AS x) x, (SELECT unnest(range(20)) AS y) y
             WHERE x.x < w AND y.y < h GROUP BY media_id, w, h),
      d AS (SELECT media_id, w, h,
              GREATEST(1, (w * 8) // GREATEST(w, h)) AS dw,
              GREATEST(1, (h * 8) // GREATEST(w, h)) AS dh
            FROM p),
      rz AS (SELECT d.media_id,
               SUM(((u.u * w // dw) * 3 + (v.v * h // dh) * 5 + d.media_id) % 256) AS rsum_r,
               SUM(((u.u * w // dw) * 7 + (v.v * h // dh) + 2 * d.media_id) % 256) AS rsum_g,
               SUM(((u.u * w // dw) + (v.v * h // dh) * 11 + 3 * d.media_id) % 256) AS rsum_b
             FROM d, (SELECT unnest(range(8)) AS u) u, (SELECT unnest(range(8)) AS v) v
             WHERE u.u < dw AND v.v < dh GROUP BY d.media_id),
      dm AS (SELECT media_id, w, h, dw, dh FROM d)
      SELECT px.media_id,
             CAST(px.w AS BIGINT) AS width, CAST(px.h AS BIGINT) AS height,
             CAST(px.sum_r AS BIGINT) AS sum_r, CAST(px.sum_g AS BIGINT) AS sum_g,
             CAST(px.sum_b AS BIGINT) AS sum_b,
             CAST(dm.dw AS BIGINT) AS dst_w, CAST(dm.dh AS BIGINT) AS dst_h,
             CAST(rz.rsum_r AS BIGINT) AS rsum_r, CAST(rz.rsum_g AS BIGINT) AS rsum_g,
             CAST(rz.rsum_b AS BIGINT) AS rsum_b
      FROM px JOIN dm ON dm.media_id = px.media_id
              JOIN rz ON rz.media_id = px.media_id
    """.trim))

  // -- m08: REAL COMPRESSED image decode — actual PNG files (zlib
  //    deflate + PNG filters, encoded and decoded by the JDK's own
  //    javax.imageio codec: no external library, and no stub). The
  //    fixtures share m07's raster formulas, so the oracle re-derives
  //    the channel sums with the same arithmetic — PNG being lossless
  //    is precisely what makes a compressed codec hash-checkable. This
  //    retires the last line of the m02/m04 stub story for images:
  //    uncompressed (PPM, m07) AND deflate-compressed (PNG, m08)
  //    decode are both real; only lossy codecs (JPEG et al.) remain
  //    out of oracle reach by nature, not by missing plumbing.
  private val m08 = Q(
    "m08_png_decode",
    (s, d) =>
      Multimodal
        .pngFeatures(s, Multimodal.pngTable(s, Tables.documents(s, d)))
        .toDF(),
    Some("""
      WITH p AS (SELECT doc_id AS media_id,
                        16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
                 FROM documents)
      SELECT media_id,
             CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             CAST(SUM((x.x * 3 + y.y * 5 + media_id) % 256) AS BIGINT) AS sum_r,
             CAST(SUM((x.x * 7 + y.y + 2 * media_id) % 256) AS BIGINT) AS sum_g,
             CAST(SUM((x.x + y.y * 11 + 3 * media_id) % 256) AS BIGINT) AS sum_b
      FROM p, (SELECT unnest(range(32)) AS x) x, (SELECT unnest(range(20)) AS y) y
      WHERE x.x < w AND y.y < h
      GROUP BY media_id, w, h
    """.trim))

  // -- m09: REAL LOSSY decode with bounded-error invariants — actual
  //    baseline JPEGs (JDK codec: DCT, quantization, chroma
  //    subsampling, Huffman) decoded for real, verdicted the only way
  //    a lossy codec can be oracle-checked: the q24b/s04b recipe. The
  //    fixtures are SMOOTH linear gradients (no mod-256 wrap — JPEG
  //    error lives at high-frequency edges), so the decoded channel
  //    means must land within ±4 of the exact formula means; the
  //    oracle recomputes the exact widths/heights and pins the three
  //    ok-booleans at 1, which the engine must EARN through the real
  //    inflate/IDCT round-trip. This closes the multimodal codec
  //    ladder: uncompressed (m06/m07) and lossless-compressed (m08)
  //    are hash-exact, lossy (m09) is bound-verified — nothing is a
  //    stub anymore except formats absent from the JDK itself.
  private val m09 = Q(
    "m09_jpeg_decode",
    (s, d) =>
      Multimodal
        .jpegFeatures(s, Multimodal.jpegTable(s, Tables.documents(s, d)))
        .toDF(),
    Some("""
      SELECT doc_id AS media_id,
             CAST(16 + doc_id % 16 AS BIGINT) AS width,
             CAST(12 + doc_id % 8 AS BIGINT) AS height,
             CAST(1 AS BIGINT) AS r_ok, CAST(1 AS BIGINT) AS g_ok,
             CAST(1 AS BIGINT) AS b_ok
      FROM documents
    """.trim))

  // -- m10: REAL multi-frame decode + frame sampling — m03's stride
  //    run over frames the JDK GIF reader actually LZW-decompresses
  //    from a real animated container (multi-frame, compressed, zero
  //    non-JDK libraries). Fixtures are palette-indexed web-safe
  //    rasters (6 levels/channel, value = level*51), so the GIF
  //    round-trip is LOSSLESS by construction and the oracle
  //    recomputes every sampled frame's channel sums exactly: the
  //    engine must earn the numbers through a real decode — the frame
  //    count comes from the container, and a disposal-compositing or
  //    channel-swap bug diverges the hash. Per-row mapPartitions,
  //    no shuffle; at 100 TB the blob column partitions by media_id
  //    like every codec entry in the m-family.
  private val m10 = Q(
    "m10_gif_frames",
    (s, d) =>
      Multimodal
        .gifFrameSample(s, Multimodal.gifTable(s, Tables.documents(s, d)))
        .toDF(),
    Some("""
      WITH p AS (SELECT doc_id AS media_id,
                        8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h,
                        2 + doc_id % 4 AS nf
                 FROM documents),
      fr AS (SELECT media_id, w, h, nf, unnest(range(0, nf, 2)) AS f FROM p)
      SELECT media_id,
             CAST(nf AS BIGINT) AS n_frames,
             CAST(f AS BIGINT) AS frame_idx,
             CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             CAST(51 * SUM((x.x * 3 + y.y * 5 + media_id + 7 * f) % 6) AS BIGINT) AS sum_r,
             CAST(51 * SUM((x.x * 7 + y.y + 2 * media_id + 3 * f) % 6) AS BIGINT) AS sum_g,
             CAST(51 * SUM((x.x + y.y * 11 + 3 * media_id + 5 * f) % 6) AS BIGINT) AS sum_b
      FROM fr, (SELECT unnest(range(16)) AS x) x, (SELECT unnest(range(12)) AS y) y
      WHERE x.x < w AND y.y < h
      GROUP BY media_id, nf, f, w, h
    """.trim))

  // -- m11: REAL COMPRESSED audio decode — G.711 μ-law, the telephony
  //    companding codec: encoded by the hand-written CCITT compressor
  //    (clip 32635, bias 0x84, floor-log2 segment, truncated 4-bit
  //    mantissa) and decoded by the JDK's OWN javax.sound codec stack
  //    (WaveFileReader walks the format-tag-7 RIFF container, the
  //    ULAW→PCM conversion provider expands to 16-bit linear — no
  //    external library, no stub). Extends the real-codec ladder to
  //    compressed AUDIO the way m08/PNG did for images — and although
  //    companding is LOSSY, the G.711 expansion is deterministic
  //    integer math, so the oracle replays encode∘decode per sample
  //    with `length(bin(m))-8` as the segment and checks every decoded
  //    statistic (peak / total amplitude / zero crossings) AND the
  //    companding-error image (sum/max |decoded − original|)
  //    byte-exactly. CodecSpec proves the JDK table ≡ the formula on
  //    all 256 codewords. After this rung only perceptual codecs
  //    (MP3/H.264-class) remain behind the m02 stub — they need codec
  //    libraries this container doesn't ship. Per-row mapPartitions,
  //    zero exchanges (PlanAuditSpec).
  private val m11 = Q(
    "m11_ulaw_decode",
    (s, d) =>
      Multimodal
        .ulawFeatures(s, Multimodal.ulawTable(s, Tables.documents(s, d)))
        .toDF(),
    Some("""
      WITH p AS (SELECT doc_id AS media_id, 8000 AS sr,
                        400 + doc_id % 200 AS n, 100 + doc_id % 400 AS f
                 FROM documents),
      sm AS (SELECT media_id, sr, n, i.i AS i,
               ((i.i * f) % sr) * 24000 // sr - 12000 AS v
             FROM p, (SELECT unnest(range(600)) AS i) i WHERE i.i < n),
      en AS (SELECT *, LEAST(abs(v), 32635) + 132 AS m FROM sm),
      ex AS (SELECT *, length(bin(m)) - 8 AS e FROM en),
      de AS (SELECT media_id, sr, n, i, v,
               CASE WHEN v < 0
                    THEN 132 - ((((m >> (e + 3)) & 15) * 8 + 132) << e)
                    ELSE ((((m >> (e + 3)) & 15) * 8 + 132) << e) - 132 END AS dv
             FROM ex),
      lg AS (SELECT *, lag(dv) OVER (PARTITION BY media_id ORDER BY i) AS pv FROM de)
      SELECT media_id,
             CAST(sr AS BIGINT) AS sample_rate,
             CAST(n AS BIGINT) AS n_samples,
             CAST(max(abs(dv)) AS BIGINT) AS peak,
             CAST(sum(abs(dv)) AS BIGINT) AS sum_abs,
             CAST(sum(CASE WHEN i > 0 AND ((dv >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END) AS BIGINT) AS crossings,
             CAST(sum(abs(dv - v)) AS BIGINT) AS sum_err,
             CAST(max(abs(dv - v)) AS BIGINT) AS max_err
      FROM lg GROUP BY media_id, sr, n
    """.trim))

  // -- m12: decoded-CONTENT media dedup — the d01 idea on the media
  //    axis, where it is NOT byte dedup: the same raster written as
  //    PNG (deflate stream) and as PPM (raw P6) is byte-different but
  //    decodes identically, so duplicate detection must hash what the
  //    codec DECODES. Candidate groups by the integer content
  //    signature (w, h, channel sums — the only shuffle, 6 longs per
  //    blob, rasters never leave their partition), exact verify inside
  //    each group by a 64-bit FNV digest of the decoded raster
  //    (engine-internal, never an output: the m09 earn-the-boolean
  //    recipe), keeper = lowest id's PNG. Ground truth is derivable
  //    because every fixture raster is a pure function of id mod 256
  //    (w/h periods divide 256 and each channel formula is
  //    (…+k·id) % 256, with k·256 ≡ 0 mod 256) — so ids 256 apart are
  //    TRUE duplicates across both containers, and the oracle replays
  //    group sizes and keepers from residue arithmetic that the engine
  //    must earn through decode + signature + digest verification.
  private val m12 = Q(
    "m12_media_content_dedup",
    (s, d) =>
      Multimodal.contentDedup(s, Tables.documents(s, d)).toDF(),
    Some("""
      WITH m AS (SELECT doc_id AS media_id, doc_id % 256 AS r,
                        16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
                 FROM documents),
      px AS (SELECT media_id, r, w, h,
               SUM((x.x*3 + y.y*5 + media_id) % 256) AS sum_r,
               SUM((x.x*7 + y.y + 2*media_id) % 256) AS sum_g,
               SUM((x.x + y.y*11 + 3*media_id) % 256) AS sum_b
             FROM m, (SELECT unnest(range(32)) AS x) x, (SELECT unnest(range(20)) AS y) y
             WHERE x.x < w AND y.y < h GROUP BY media_id, r, w, h),
      grp AS (SELECT r, count(*) AS n_ids, min(media_id) AS keeper FROM m GROUP BY r)
      SELECT px.media_id, c.container,
             CAST(px.w AS BIGINT) AS width, CAST(px.h AS BIGINT) AS height,
             CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
             CAST(sum_b AS BIGINT) AS sum_b,
             CAST(2 * grp.n_ids AS BIGINT) AS group_size,
             CAST(grp.keeper AS BIGINT) AS keeper_id,
             CAST(CASE WHEN px.media_id = grp.keeper AND c.container = 'png'
                       THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      FROM px JOIN grp ON grp.r = px.r
      CROSS JOIN (SELECT unnest(['png', 'ppm']) AS container) c
    """.trim))

  // -- m13: PERCEPTUAL media near-dup — the axis m12 cannot see. m12
  //    groups blobs whose decoded rasters are bit-identical; real
  //    crawl dedup also has to catch re-encodes that decode
  //    DIFFERENTLY but look the same: a brightness-shifted copy
  //    (every decoded byte differs) and a 2x upscale (the dimensions
  //    differ). The classic answer is the DCT perceptual hash, built
  //    here exactness-friendly (integer luma whose weights sum to
  //    256, floor-boundary 8x8 average pooling, DC dropped before the
  //    median threshold — see Multimodal.perceptualHash for why each
  //    choice makes the three variants hash IDENTICAL rather than
  //    merely close). The banded hamming join runs in distinct-hash
  //    space (a dup-heavy corpus collapses before the quadratic
  //    step), 8x8-bit bands make recall EXACT for hamming <= 7 by
  //    pigeonhole, and components ride the shared bounded union-find.
  //    Ground truth is residue arithmetic: rasters are pure functions
  //    of id mod 240, so the oracle replays group sizes and keepers
  //    the engine must EARN through write -> sniff -> decode -> pool
  //    -> DCT -> band-join -> verify -> contract. PhashSpec pins the
  //    fixture-free invariants (variant hash equality for all 240
  //    residues, cross-residue hamming > 7).
  private val m13 = Q(
    "m13_phash_neardup",
    (s, d) =>
      Multimodal.phashNearDup(s, Tables.documents(s, d)),
    Some("""
      WITH g AS (SELECT doc_id % 240 AS r, count(*) AS n_ids,
                        min(doc_id) AS keeper
                 FROM documents GROUP BY 1)
      SELECT d.doc_id AS media_id, v.variant,
             CAST(3 * g.n_ids AS BIGINT) AS group_size,
             CAST(g.keeper AS BIGINT) AS keeper_id,
             CAST(CASE WHEN d.doc_id = g.keeper AND v.variant = 'base'
                       THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      FROM documents d
      JOIN g ON g.r = d.doc_id % 240
      CROSS JOIN (SELECT unnest(['base', 'bright', 'scaled']) AS variant) v
    """.trim))

  // -- m14: ACOUSTIC fingerprint near-dup — m13's recipe on the audio
  //    modality (the chromaprint-family delta-sign idea made exact):
  //    decoded PCM windows to exact Long energies, bits from
  //    half-window balance + consecutive-window deltas, so a 2x-GAIN
  //    re-encode (every decoded sample differs) and an extra-LIST-chunk
  //    container (every byte differs, samples identical) fingerprint
  //    IDENTICALLY to the original — volume is invisible by integer
  //    arithmetic (energies scale by the same square; strict
  //    comparisons preserve), not by approximation. Same
  //    distinct-signature banding + election kernel as m13
  //    (Multimodal.hashNearDupGroups); same residue-arithmetic oracle;
  //    PhashSpec enumerates all 240 signals for variant equality and a
  //    cross-residue hamming floor of 13.
  private val m14 = Q(
    "m14_audio_fingerprint",
    (s, d) =>
      Multimodal.afpNearDup(s, Tables.documents(s, d)),
    Some("""
      WITH g AS (SELECT doc_id % 240 AS r, count(*) AS n_ids,
                        min(doc_id) AS keeper
                 FROM documents GROUP BY 1)
      SELECT d.doc_id AS media_id, v.variant,
             CAST(3 * g.n_ids AS BIGINT) AS group_size,
             CAST(g.keeper AS BIGINT) AS keeper_id,
             CAST(CASE WHEN d.doc_id = g.keeper AND v.variant = 'loud'
                       THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      FROM documents d
      JOIN g ON g.r = d.doc_id % 240
      CROSS JOIN (SELECT unnest(['pcm', 'loud', 'pad']) AS variant) v
    """.trim))

  private val m04 = Q(
    "m04_media_resize",
    (s, d) =>
      Multimodal
        .resizeRouted(s, Multimodal.realMediaTable(s, Tables.documents(s, d)))
        .toDF(),
    Some("""
      WITH img AS (SELECT doc_id AS media_id, 16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
                   FROM documents WHERE doc_id % 3 = 0),
      img_d AS (SELECT media_id, w, h,
                  GREATEST(1, (w * 8) // GREATEST(w, h)) AS dw,
                  GREATEST(1, (h * 8) // GREATEST(w, h)) AS dh
                FROM img),
      img_rz AS (SELECT media_id, w, h, dw, dh,
                   SUM(((u.u * w // dw) * 3 + (v.v * h // dh) * 5 + media_id) % 256
                     + ((u.u * w // dw) * 7 + (v.v * h // dh) + 2 * media_id) % 256
                     + ((u.u * w // dw) + (v.v * h // dh) * 11 + 3 * media_id) % 256) AS s,
                   MAX(GREATEST(((u.u * w // dw) * 3 + (v.v * h // dh) * 5 + media_id) % 256,
                                ((u.u * w // dw) * 7 + (v.v * h // dh) + 2 * media_id) % 256,
                                ((u.u * w // dw) + (v.v * h // dh) * 11 + 3 * media_id) % 256)) AS p
                 FROM img_d, (SELECT unnest(range(8)) AS u) u, (SELECT unnest(range(8)) AS v) v
                 WHERE u.u < dw AND v.v < dh GROUP BY media_id, w, h, dw, dh),
      img_out AS (SELECT media_id, 'image' AS kind, w*h AS src_extent, dw*dh AS dst_extent,
                         s AS sum_out, p AS peak_out FROM img_rz),
      aud AS (SELECT doc_id AS media_id, 8000 AS sr,
                     400 + doc_id % 200 AS n, 100 + doc_id % 400 AS f
              FROM documents WHERE doc_id % 3 = 1),
      aud_sm AS (SELECT media_id, n, ((i.i * f) % sr) * 24000 // sr - 12000 AS v
                 FROM aud, (SELECT unnest(range(0, 600, 3)) AS i) i WHERE i.i < n),
      aud_en AS (SELECT *, LEAST(abs(v), 32635) + 132 AS m FROM aud_sm),
      aud_ex AS (SELECT *, length(bin(m)) - 8 AS e FROM aud_en),
      aud_de AS (SELECT media_id, n,
                   CASE WHEN v < 0 THEN 132 - ((((m >> (e + 3)) & 15) * 8 + 132) << e)
                        ELSE ((((m >> (e + 3)) & 15) * 8 + 132) << e) - 132 END AS dv
                 FROM aud_ex),
      aud_out AS (SELECT media_id, 'audio' AS kind, n AS src_extent,
                         COUNT(*) AS dst_extent,
                         SUM(abs(dv)) AS sum_out, MAX(abs(dv)) AS peak_out
                  FROM aud_de GROUP BY media_id, n),
      vid AS (SELECT doc_id AS media_id, 8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h,
                     2 + doc_id % 4 AS nf
              FROM documents WHERE doc_id % 3 = 2),
      vid_fr AS (SELECT media_id, w, h, nf, unnest(range(0, nf, 2)) AS f FROM vid),
      vid_px AS (SELECT media_id, w, h, nf,
                   COUNT(DISTINCT f) AS kept,
                   SUM(51 * ((x.x*3 + y.y*5 + media_id + 7*f) % 6)
                     + 51 * ((x.x*7 + y.y + 2*media_id + 3*f) % 6)
                     + 51 * ((x.x + y.y*11 + 3*media_id + 5*f) % 6)) AS s,
                   MAX(GREATEST(51 * ((x.x*3 + y.y*5 + media_id + 7*f) % 6),
                                51 * ((x.x*7 + y.y + 2*media_id + 3*f) % 6),
                                51 * ((x.x + y.y*11 + 3*media_id + 5*f) % 6))) AS p
                 FROM vid_fr, (SELECT unnest(range(16)) AS x) x, (SELECT unnest(range(12)) AS y) y
                 WHERE x.x < w AND y.y < h GROUP BY media_id, w, h, nf),
      vid_out AS (SELECT media_id, 'video' AS kind, nf AS src_extent, kept AS dst_extent,
                         s AS sum_out, p AS peak_out FROM vid_px)
      SELECT media_id, kind,
             CAST(src_extent AS BIGINT) AS src_extent, CAST(dst_extent AS BIGINT) AS dst_extent,
             CAST(sum_out AS BIGINT) AS sum_out, CAST(peak_out AS BIGINT) AS peak_out
      FROM (SELECT * FROM img_out UNION ALL SELECT * FROM aud_out UNION ALL SELECT * FROM vid_out)
    """.trim))

  // -- s06: incremental IVF index append — the maintenance op the s04
  //    search path implies. New ("delta") vectors are assigned to the
  //    EXISTING coarse quantizer with no retrain; because IVF-flat
  //    assignment is per-row, the appended index is bit-identical to a
  //    full rebuild (LlmSpec asserts exactly that), so the entry runs
  //    the honest two-pass shape — assign the standing corpus, assign
  //    only the delta, union — and reports posting-list occupancy per
  //    centroid, the index-health signal an operator watches for list
  //    skew. 100 TB shape: the delta pass scans ONLY the delta
  //    (broadcast centroids, map-side argmax); the standing index is
  //    read, never recomputed, in production (recomputed here only so
  //    the entry is self-contained over the raw table).
  private val s06 = Q(
    "s06_ivf_append",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val indexed = emb.filter(col("vec_id") % 10 =!= 7)
      val delta = emb.filter(col("vec_id") % 10 === 7)
      val cents = indexed.orderBy("vec_id").limit(16)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      Similarity.ivfAssignWith(indexed, cents)
        .select(col("cid"), lit(1L).as("is_idx"))
        .union(Similarity.ivfAssignWith(delta, cents)
          .select(col("cid"), lit(0L).as("is_idx")))
        .groupBy("cid")
        .agg(
          sum(col("is_idx")).as("n_indexed"),
          sum(lit(1L) - col("is_idx")).as("n_delta"),
          count(lit(1)).as("n_total"))
    },
    Some("""
      WITH dims AS (SELECT unnest(range(64)) AS d),
      cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                WHERE vec_id % 10 <> 7
                QUALIFY row_number() OVER (ORDER BY vec_id) <= 16),
      asim AS (SELECT e.vec_id, c.cid,
            round(SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(c.cv[d.d+1] AS DOUBLE))
              / (sqrt(SUM(CAST(e.embedding[d.d+1] AS DOUBLE) * CAST(e.embedding[d.d+1] AS DOUBLE)))
               * sqrt(SUM(CAST(c.cv[d.d+1] AS DOUBLE) * CAST(c.cv[d.d+1] AS DOUBLE)))), 6) AS sim
          FROM embeddings e, cents c, dims d GROUP BY e.vec_id, c.cid),
      assign AS (SELECT vec_id, cid FROM asim
                 QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) = 1)
      SELECT cid,
        CAST(SUM(CASE WHEN vec_id % 10 <> 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_indexed,
        CAST(SUM(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
        CAST(count(*) AS BIGINT) AS n_total
      FROM assign GROUP BY cid
    """.trim))

  // -- m15: CROSS-CONTAINER lossless image decode — the m08 recipe run
  //    through every JDK-native lossless container at once: the SAME
  //    m07-formula raster encoded as PNG (deflate), BMP (raw 24-bit)
  //    and TIFF, each blob re-SNIFFED from magic bytes (BMP's
  //    DIB-revision check, TIFF's either-endian magic) and decoded by
  //    the routed ImageIO codec. The oracle replays ONE formula
  //    cross-joined with the container list: identical sums per
  //    container is what lossless means, so a mis-sniff, a mis-route,
  //    or any codec loss breaks the hash. This is the catalog image of
  //    the r16 codec-ladder extension (the gates accept the same
  //    containers — PhashGateSpec pins the cross-container drop).
  private val m15 = Q(
    "m15_image_containers",
    (s, d) =>
      Multimodal.imageContainerFeatures(s, Tables.documents(s, d)).toDF(),
    Some("""
      WITH p AS (SELECT doc_id AS media_id,
                        16 + doc_id % 16 AS w, 12 + doc_id % 8 AS h
                 FROM documents),
      px AS (SELECT media_id, w, h,
               SUM((x.x * 3 + y.y * 5 + media_id) % 256) AS sum_r,
               SUM((x.x * 7 + y.y + 2 * media_id) % 256) AS sum_g,
               SUM((x.x + y.y * 11 + 3 * media_id) % 256) AS sum_b
             FROM p, (SELECT unnest(range(32)) AS x) x, (SELECT unnest(range(20)) AS y) y
             WHERE x.x < w AND y.y < h GROUP BY media_id, w, h)
      SELECT media_id, c.container,
             CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
             CAST(sum_b AS BIGINT) AS sum_b
      FROM px CROSS JOIN (SELECT unnest(['png', 'bmp', 'tiff']) AS container) c
    """.trim))

  // -- m16: CROSS-CONTAINER audio decode — the m06 signal through every
  //    JDK-native audio container: RIFF/WAV parsed by the hand-written
  //    chunk walk, AIFF and Sun AU by javax.sound normalized to PCM16.
  //    PCM16 stores the samples exactly in all three, so the decoded
  //    peak / total-amplitude statistics are container-invariant and
  //    the oracle replays one formula cross-joined with the container
  //    list — the audio half of the r16 ladder extension.
  private val m16 = Q(
    "m16_audio_containers",
    (s, d) =>
      Multimodal.audioContainerFeatures(s, Tables.documents(s, d)).toDF(),
    Some("""
      WITH p AS (SELECT doc_id AS media_id, 8000 AS sr,
                        400 + doc_id % 200 AS n, 100 + doc_id % 400 AS f
                 FROM documents),
      sm AS (SELECT media_id, sr, n,
               ((i.i * f) % sr) * 24000 // sr - 12000 AS v
             FROM p, (SELECT unnest(range(600)) AS i) i WHERE i.i < n),
      st AS (SELECT media_id, sr, n,
               max(abs(v)) AS peak, sum(abs(v)) AS sum_abs
             FROM sm GROUP BY media_id, sr, n)
      SELECT media_id, c.container,
             CAST(sr AS BIGINT) AS sample_rate,
             CAST(n AS BIGINT) AS n_samples,
             CAST(peak AS BIGINT) AS peak,
             CAST(sum_abs AS BIGINT) AS sum_abs
      FROM st CROSS JOIN (SELECT unnest(['wav-pcm', 'aiff', 'au']) AS container) c
    """.trim))

  def queries: Seq[Q] =
    Seq(d01, d02, d03, d04, d05, d06, d10, d11, d12, d14, d15, d16, d17, d18, c04, x03, x08, x09, x10, s01, s02, s03, s04, s04b, s05, s06, s07, s08, s09, s10, s11, s12, s13, s14, s15, s16, s17, s18, s19, s20, s21, s22, s23, s24, s25, s26, s27, e01, e02, e03, e04, t01, t02, t03, t04, t08, t09, t10, t11, t13, m01, m02, m03, m04, m05, m06, m07, m08, m09, m10, m11, m12, m13, m14, m15, m16)

  /** Build/probe decomposition of the standing-index entries. Each
    * catalog `run` is exactly `build(); probe()` — the oracle contract
    * is unchanged — but the halves are exposed so the bench can time
    * one-time index construction separately from steady-state search
    * (a composite number conflates an operator event with the
    * per-query cost a serving deployment actually pays). Everything a
    * probe needs is PERSISTED by its build (stop set, quantizer
    * tables, codes, postings), so the halves run in different
    * processes.
    */
  /** build / forget-fold / probe split for the four deletion
    * composites — the catalog number is dominated by the honest index
    * build (the d15/s13 accounting), and these sub-metrics let the
    * bench certify the FOLD itself as `<name>_fold_s` next to the
    * build/probe halves, so the takedown cost is a committed number
    * instead of a residual. Each triple uses the entry's own predicate
    * and a dedicated index dir, so timing splits never race the
    * catalog entry's run.
    */
  def forgetSplits: Map[String,
      ((SparkSession, String) => Unit,
       (SparkSession, String) => Unit,
       (SparkSession, String) => DataFrame)] = {
    val d18Dir = new java.io.File("target/graft_idx/split_d18").getAbsolutePath
    val s22Dir = new java.io.File("target/graft_idx/split_s22").getAbsolutePath
    val s23Dir = new java.io.File("target/graft_idx/split_s23").getAbsolutePath
    val s24Dir = new java.io.File("target/graft_idx/split_s24").getAbsolutePath
    val pred = col("doc_id") % 10 === 3
    val vpred = col("vec_id") % 10 === 3
    Map(
      "d18_forget_neardup" -> ((
        (s: SparkSession, d: String) => d15BuildAt(s, d, d18Dir),
        (s: SparkSession, _: String) => forgetDocs(s, d18Dir, pred),
        (s: SparkSession, d: String) => d15ProbeAt(s, d, d18Dir))),
      "s22_bm25_forget" -> ((
        (s: SparkSession, d: String) => s13BuildAt(s, d, s22Dir),
        (s: SparkSession, _: String) => s13Forget(s, s22Dir, pred),
        (s: SparkSession, d: String) => s13ProbeAt(s, d, s22Dir))),
      "s23_ivfpq_forget" -> ((
        (s: SparkSession, d: String) => s10BuildAt(s, d, s23Dir),
        (s: SparkSession, _: String) => forgetRows(s, s23Dir, Seq("rows"), vpred),
        (s: SparkSession, d: String) => s10ProbeAt(s, d, s23Dir))),
      "s24_hamming_forget" -> ((
        (s: SparkSession, d: String) => {
          val root = new org.apache.hadoop.fs.Path(s24Dir)
          graft.streaming.FoldCommit.clearResidue(
            root.getFileSystem(s.sparkContext.hadoopConfiguration), root)
          s19BuildAt(s, d, s"$s24Dir/codes")
        },
        (s: SparkSession, _: String) => forgetRows(s, s24Dir, Seq("codes"), vpred),
        (s: SparkSession, d: String) => s19ProbeAt(s, d, s"$s24Dir/codes"))))
  }

  def standingSplits: Map[String,
      ((SparkSession, String) => Unit, (SparkSession, String) => DataFrame)] = Map(
    "d15_standing_neardup" -> ((d15Build _, d15Probe _)),
    "s10_ivfpq_standing" -> ((s10Build _, s10Probe _)),
    "s27_rq_standing" -> ((s27Build _, s27Probe _)),
    "s13_bm25_standing" -> ((s13Build _, s13Probe _)),
    "s19_hamming_standing" -> ((s19Build _, s19Probe _)),
    "x09_serving_standing" -> ((x09Build _, x09Probe _)),
    "x10_serving_rq" -> ((x10Build _, x10Probe _)))
}
