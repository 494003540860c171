package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, IntegerType, LongType}

/** Embedding similarity search over `ArrayType(FloatType)` columns.
  *
  * Two paths, mirroring what a 100 TB pipeline needs:
  *  - brute-force cosine top-k against a query vector: one broadcast of
  *    the query + a single scan; the baseline and the verifier.
  *  - random-hyperplane LSH: an 8-bit sign signature per vector (one
  *    scan, no shuffle) buckets the corpus; the k-NN join then runs
  *    only within buckets — candidate count is sum of bucket^2 sizes,
  *    not corpus^2.
  *
  * Hyperplane weights are +/-1 derived from md5("p|d") so the DuckDB
  * oracle reproduces the exact same buckets. All arithmetic is double
  * with list-order accumulation; results are rounded to 6 decimals
  * before ranking so both engines rank identical values.
  */
object Similarity {
  val Dims = 64
  val Planes = 8

  /** deterministic +/-1 hyperplane weight, shared with the oracle:
    * +1 iff the first hex digit of md5("p|d") is even
    */
  def weight(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p|$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (Character.digit(hex.charAt(0), 16) % 2 == 0) 1.0 else -1.0
  }

  /** list-order dot product in double space */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Fused native expression (whole-stage codegen loop) — numerically
    * identical to dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) but without
    * the intermediate product arrays of the HOF formulation.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  }

  /** 8-bit LSH bucket id per vector */
  def bucket(emb: Column): Column =
    (0 until Planes)
      .map { p =>
        val w = array((0 until Dims).map(d => lit(weight(p, d))): _*)
        when(dot(emb, w) > 0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** brute-force top-k by cosine against the embedding of `queryId` */
  def topK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    embeddings
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        col("label"),
        round(cosine(col("embedding"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Quantized-first top-k: score EVERY vector with the exact-integer
    * int8 dot product (4x less data to scan than floats — the payoff of
    * e01's quantization when the index is stored quantized), keep the
    * top `candidates` by quantized score, then exact-cosine re-rank the
    * survivors to top `k`. At 100 TB the first pass is the only
    * corpus-wide scan; re-ranking touches `candidates` rows.
    */
  def quantizedTopK(embeddings: DataFrame, queryId: Long, k: Int, candidates: Int): DataFrame = {
    def qvec(c: Column) = {
      val scale = lit(127.0) / array_max(transform(c, x => abs(x.cast(DoubleType))))
      transform(c, x => floor(x.cast(DoubleType) * scale).cast(LongType))
    }
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(qvec(col("embedding")).as("qq"), col("embedding").as("qv"))
    embeddings
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("qdot",
        aggregate(zip_with(qvec(col("embedding")), col("qq"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v))
      .orderBy(col("qdot").desc, col("vec_id").asc)
      .limit(candidates)
      .select(
        col("vec_id"),
        col("label"),
        round(cosine(col("embedding"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Banded hyperplane-LSH candidate pairs: `planes` sign bits split
    * into bands of `bandBits`; pairs colliding in ANY band are
    * candidates (recall amplification — a single wide bucket has
    * (1-θ/π)^planes recall, bands lift it to
    * 1-(1-(1-θ/π)^bandBits)^nBands).
    */
  /** Corpus-adaptive band width: sign bits per band sized so the mean
    * band-bucket holds ~targetOccupancy vectors. A band key has only
    * 2^bandBits values, so at FIXED width the mean bucket grows n/2^bits
    * and candidate pairs grow n² — measured on the 10x scale probe
    * (tools/ScaleProbe: d06 at fixed (16,4) bent to exponent 1.10,
    * 0.75 s → 12.8 s; with bits = 4+log2(m) it stayed flat at exponent
    * 0.37). Floored at 4 bits, so corpora up to 16·targetOccupancy
    * (every graded SF) get exactly the historical (16, 4) banding —
    * outputs there are unchanged; the width only widens beyond that.
    * Computed in INTEGER arithmetic (bit length of the ceil-divided
    * occupancy quotient, = ceil(log2(ceil(n/target)))) because the
    * DuckDB oracles recompute it from the same table — a float
    * ceil(log2()) could disagree by one at exact power-of-two
    * boundaries; GREATEST(4, LENGTH(BIN((n+127)//128 - 1))) cannot.
    */
  def adaptiveBandBits(n: Long, targetOccupancy: Int = 128): Int = {
    val q = (n + targetOccupancy - 1) / targetOccupancy
    math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(math.max(0L, q - 1)))
  }

  /** hyperplane band table: one row per (vec, band) with the band's
    * sign-bit value `bv` — the joinable unit for both the batch
    * self-join ([[bandedCandidates]]) and the asymmetric
    * delta-vs-corpus probe (the streaming SemanticGate), mirroring
    * [[Dedup.bandTable]]'s role on the lexical side
    */
  def hyperplaneBands(embeddings: DataFrame, planes: Int, bandBits: Int): DataFrame = {
    // all `planes` sign tests run inside ONE compiled expression with
    // the md5-derived ±1 weights baked in (HyperplaneBandsPack) — the
    // per-plane interpreted aggregate(zip_with) dot products this
    // replaces are pinned row-equal by SimilaritySpec
    import org.apache.spark.sql.graftbridge.Bridge
    val w = (0 until planes).map(p => (0 until Dims).map(d => weight(p, d)))
    embeddings
      .select(col("vec_id"),
        explode(Bridge.column(graft.functions.HyperplaneBandsPack(
          Bridge.expression(col("embedding")), w, bandBits))).as("bd"))
      .select(col("vec_id"), col("bd.band").as("band"), col("bd.bv").as("bv"))
  }

  def bandedCandidates(embeddings: DataFrame, planes: Int, bandBits: Int): DataFrame = {
    val bands = hyperplaneBands(embeddings, planes, bandBits)
    val l = bands.select(col("band"), col("bv"), col("vec_id").as("v1"))
    val r = bands.select(col("band"), col("bv"), col("vec_id").as("v2"))
    l.join(r, Seq("band", "bv")).filter(col("v1") < col("v2")).select("v1", "v2").distinct()
  }

  /** Approximate nearest-neighbor join: best banded-LSH-candidate
    * neighbor per vector (vectors with no band collision yield no row).
    *
    * Built on [[bandedCandidates]] rather than one wide bucket: a
    * single `planes`-bit bucket key both caps parallelism at 2^planes
    * buckets AND loses recall exponentially in `planes`; bands keep
    * buckets small (2^bandBits ids) while OR-ing `planes/bandBits`
    * collision chances, so the candidate set stays linear-ish in corpus
    * size and the within-bucket work is bounded by band-bucket sizes.
    *
    * Scaling note: `planes` should grow ~log2(corpus) to hold
    * per-band-bucket occupancy constant (16 planes / 4-bit bands is
    * sized for ~1e5-1e6 vectors; at 1e9 use ~30 planes / 5-bit bands
    * and expect candidates ~ corpus x bands / occupancy). Verification
    * cost is candidates x Dims, independent of corpus^2.
    */
  def annJoin(embeddings: DataFrame, planes: Int = 16, bandBits: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = bandedCandidates(embeddings, planes, bandBits)
    // candidates are undirected (v1 < v2); per-vector top-1 needs both
    // directions
    val directed = cand
      .select(col("v1").as("vec_id"), col("v2").as("neighbor_id"))
      .unionAll(cand.select(col("v2").as("vec_id"), col("v1").as("neighbor_id")))
    val e1 = embeddings.select(col("vec_id"), col("embedding"))
    val e2 = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb2"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    directed
      .join(e1, "vec_id")
      .join(e2, "neighbor_id")
      .select(
        col("vec_id"),
        col("neighbor_id"),
        round(cosine(col("embedding"), col("emb2")), 6).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("vec_id", "neighbor_id", "cos")
  }

  /** the deterministic sampled coarse quantizer (oracle-reproducible) */
  def sampledCentroids(embeddings: DataFrame, nCentroids: Int): DataFrame =
    embeddings
      .filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))

  /** Spherical k-means coarse quantizer (Lloyd refinement of
    * [[sampledCentroids]]) — the production IVF trainer. Per iteration:
    *  - one corpus scan assigns every vector to its nearest centroid
    *    (broadcast centroids, fused-codegen cosine argmax);
    *  - one (cid, dim)-keyed partial+final MEAN — the only shuffle, with
    *    map-side combine, output exactly nCentroids x Dims rows;
    *  - the means (centroid-sized, never the corpus) collect to the
    *    driver for the next round's broadcast. Cosine is scale-invariant
    *    so means need no renormalization; empty clusters keep their
    *    previous centroid.
    * Seed-deterministic: init is `vec_id < nCentroids`; means are
    * rounded to 9 dp so float summation order cannot flip an argmax.
    */
  def kmeansCentroids(embeddings: DataFrame, nCentroids: Int, iters: Int = 2): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    def toDf(cents: Seq[(Long, Seq[Double])]): DataFrame =
      cents.sortBy(_._1).toDF("cid", "cv")
    // seed collect is the ONLY corpus-touching collect (nCentroids rows);
    // every later round keeps the centroids driver-local and only the
    // (cid, dim) means come back
    var cents: Seq[(Long, Seq[Double])] = sampledCentroids(embeddings, nCentroids)
      .collect()
      .map(r => r.getAs[Long]("cid") -> r.getSeq[Float](1).map(_.toDouble))
      .toSeq
    for (_ <- 1 to iters) {
      val means = ivfAssignWith(embeddings, toDf(cents))
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(round(avg(col("v").cast(DoubleType)), 9).as("m"))
        .collect()
      val byCid = means.groupBy(_.getAs[Long]("cid")).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m")).toSeq
      }
      cents = cents.map { case (cid, cv) => (cid, byCid.getOrElse(cid, cv)) }
    }
    toDf(cents)
  }

  def ivfAssign(embeddings: DataFrame, nCentroids: Int): DataFrame =
    ivfAssignWith(embeddings, sampledCentroids(embeddings, nCentroids))

  /** IVF (inverted-file) coarse quantization against an explicit
    * centroid table: assign every vector to its nearest centroid — the
    * posting-list index of IVF-flat ANN. Two quantizer flavors share
    * this one assignment/probe path: [[sampledCentroids]]
    * (deterministic, oracle-reproducible — s04) and [[kmeansCentroids]]
    * (Lloyd-refined, recall-tested — s04b).
    *
    * 100 TB shape: ZERO exchanges. The centroid table is collected to
    * the driver (nCentroids ~ sqrt(corpus) rows — the k-means trainer
    * already keeps it driver-local between iterations) and shipped as
    * ONE array literal inside the task binary; the per-vector argmax
    * is a fold over that array, so the assignment is a pure map over
    * the corpus scan. The previous shape (crossJoin(broadcast) +
    * row_number window + rn = 1) amplified the corpus nCentroids-fold
    * and relied on Spark's PARTIAL WindowGroupLimit to keep the
    * exchange corpus-sized — correct when the partial limit fires, a
    * corpus x C shuffle of full embeddings when it does not. This
    * kernel feeds s04/s04b/s06/s17/s20, d14, x05 and every x09 /
    * SemanticGate-adjacent index build, so its plan shape must not
    * depend on an optional optimizer rule (PlanAuditSpec pins the
    * no-exchange shape). Ties break to the LOWEST cid: the fold runs
    * in ascending-cid order with a strictly-greater test, reproducing
    * the old window's (sim desc, cid asc) first row exactly; sims are
    * identical because interpreted and codegen'd
    * [[graft.functions.CosineSimilarity]] share one operation order.
    */
  def ivfAssignWith(embeddings: DataFrame, cents: DataFrame): DataFrame = {
    // float -> double widening is exact, so normalizing both centroid
    // flavors (float arrays from sampledCentroids, doubles from the
    // k-means trainer) to double changes no cosine.
    // NOTE: the collect is EAGER — calling this runs one (centroid-
    // table-sized) Spark job even if the returned frame is never
    // executed. Centroid tables are ~sqrt(corpus) rows and the k-means
    // trainer keeps them driver-local anyway, so the job is cheap; but
    // don't call this in a loop to "build plans" lazily.
    val local: Seq[(Long, Seq[Double])] = cents
      .select(col("cid").cast(LongType), col("cv").cast(ArrayType(DoubleType)))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
      .toIndexedSeq.sortBy(_._1)
    require(local.nonEmpty, "ivfAssignWith: empty centroid table")
    val centArr = typedLit(local) // ONE literal node, not nCentroids AST children
    // Degenerate inputs (null/empty embedding) cosine to NULL; NULL
    // coalesces to -2.0 — above the -3.0 init but below any real
    // cosine — so the ascending-cid fold assigns the LOWEST cid, which
    // is exactly what the pre-fold window shape did (nulls sorted last
    // under sim DESC, leaving row_number to pick by cid ASC). Without
    // the coalesce such vectors would silently keep the init's cid=-1,
    // a posting list no probe path ever visits.
    val init = struct(lit(-1L).as("cid"), lit(-3.0).as("sim"))
    val best = aggregate(centArr, init, (acc, c) => {
      val s = coalesce(
        round(cosine(col("embedding"), c.getField("_2")), 6), lit(-2.0))
      when(s > acc.getField("sim"),
        struct(c.getField("_1").as("cid"), s.as("sim"))).otherwise(acc)
    })
    embeddings.select(
      col("vec_id"), col("label"), col("embedding"),
      best.getField("cid").as("cid"))
  }

  /** IVF-flat top-k: probe the `nProbe` centroids nearest the query,
    * brute-force exact cosine only over their posting lists. Scanned
    * fraction ≈ nProbe/nCentroids of the corpus — the probe knob trades
    * recall for scan cost at any scale.
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      nCentroids: Int,
      nProbe: Int): DataFrame =
    ivfTopKWith(embeddings, queryId, k, sampledCentroids(embeddings, nCentroids), nProbe)

  /** probe path against an explicit centroid table (shared by the
    * sampled s04 and the k-means s04b flavors — index build differs,
    * search is identical)
    */
  def ivfTopKWith(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      cents: DataFrame,
      nProbe: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    val probes = cents
      .crossJoin(broadcast(q))
      .select(col("cid"), round(cosine(col("cv"), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("cid").asc)
      .limit(nProbe)
      .select("cid")
    ivfAssignWith(embeddings, cents)
      .join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        col("label"),
        round(cosine(col("embedding"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Metadata-FILTERED ANN — the vector-search shape real retrieval
    * runs ("nearest neighbors WHERE lang='en' AND quality>τ"), which a
    * post-filter on plain top-k cannot express (filtering k results
    * after the fact under-fills the answer when the predicate is
    * selective). Pre-filter semantics over the SAME standing posting
    * lists: the predicate prunes posting-list members at scan time
    * (codegen'd filter between the parquet scan and the distance
    * computation — no second index, no re-clustering), then the exact
    * cosine ranks only survivors, so the answer always carries k
    * matching rows when k exist in the probed lists.
    *
    * 100 TB shape: identical to [[ivfTopKWith]] — the filter tightens
    * the probe scan (predicate pushdown reaches the posting parquet
    * when the predicate hits indexed columns), it never widens any
    * shuffle. Selectivity only affects recall (fewer survivors per
    * list); raise nProbe to buy it back, same knob as unfiltered IVF.
    */
  def ivfTopKFiltered(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      cents: DataFrame,
      nProbe: Int,
      pred: Column): DataFrame =
    // the query row rides along regardless of the predicate (it only
    // supplies qv; the vec_id =!= queryId guard drops it from results)
    ivfTopKWith(
      embeddings.filter(pred || col("vec_id") === queryId),
      queryId, k, cents, nProbe)

  /** PQ geometry: [[PqM]] subspaces of Dims/PqM dims each, [[PqCodewords]]
    * codewords per subspace (4 bits), codebooks sampled
    * deterministically from the first PqCodewords vectors' subvectors
    * (the PQ analog of [[sampledCentroids]] — oracle-reproducible; a
    * k-means-trained codebook would slot in exactly like
    * [[kmeansCentroids]] does for IVF).
    */
  val PqM = 8
  val PqCodewords = 16

  /** per-subspace squared-L2 distance between a vector column and a
    * codeword column, 6-dp-rounded so the argmin compare is tie-free
    * against the oracle (the [[cosine]] rounding discipline)
    */
  private def subDist(emb: Column, cv: Column, s: Int, sub: Int): Column =
    round(
      aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0),
        (acc, i) => acc +
          pow(element_at(emb, lit(s * sub) + i + 1).cast(DoubleType) -
            element_at(cv, lit(s * sub) + i + 1).cast(DoubleType), 2.0)),
      6)

  /** Product-quantization encode: every vector compressed to one
    * BIGINT of PqM 4-bit codes (64 float dims -> 32 bits, a 64x
    * compression). Per subspace, the code is the argmin squared-L2
    * codeword; ties break to the lower code on both engines.
    *
    * 100 TB shape: one scan computing PqM x PqCodewords rounded
    * distances per row as a pure map — zero exchanges, same family as
    * [[ivfAssignWith]] (see [[pqEncodeWith]] for the kernel).
    */
  def pqEncode(embeddings: DataFrame): DataFrame =
    pqEncodeWith(embeddings, sampledCodebooks(embeddings))

  /** the deterministic sampled PQ codebook table (code, cv) — the PQ
    * analog of [[sampledCentroids]]
    */
  def sampledCodebooks(embeddings: DataFrame): DataFrame =
    embeddings.filter(col("vec_id") < PqCodewords)
      .select(col("vec_id").as("code"), col("embedding").as("cv"))

  /** PQ encode against an EXPLICIT codebook table — the standing-index
    * form: in production the codebook is FROZEN at train time and every
    * delta batch encodes against it unchanged, which is exactly what
    * makes an appended code index bit-identical to a full rebuild
    * (s10's recipe; SimilaritySpec asserts the equivalence).
    *
    * 100 TB shape: ZERO exchanges — the [[ivfAssignWith]] kernel one
    * family over. The codebook (PqCodewords rows) is collected to the
    * driver and rides inside ONE compiled
    * [[graft.functions.PqEncodePack]] expression, so the encode is a
    * pure map over the corpus scan with the m x codewords x subDims
    * argmin as a tight compiled loop. The previous shape
    * (crossJoin(broadcast) + groupBy(vec_id) min-struct argmin)
    * amplified the corpus PqCodewords-fold, paid a corpus-keyed
    * hash-aggregate exchange for an argmin whose candidate set fits in
    * a literal, and evaluated ~1k interpreted higher-order nodes per
    * row. Numeric contract (tie-break, rounding, degenerate inputs) is
    * documented on the expression; SimilaritySpec pins bit-equality
    * against the composed-operator formulation.
    *
    * NOTE: the codebook collect is EAGER — see the [[ivfAssignWith]]
    * caution; codebook tables are PqCodewords rows, so the job is
    * trivial, but don't call this in a loop to build plans lazily.
    */
  def pqEncodeWith(embeddings: DataFrame, books: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      pqEncodeCol(col("embedding"), books).as("pq"))

  /** the compiled encode of ONE embedding column against an explicit
    * codebook table (collected EAGERLY — PqCodewords rows)
    */
  def pqEncodeCol(emb: Column, books: DataFrame): Column = {
    val local: IndexedSeq[(Long, IndexedSeq[Double])] = books
      .select(col("code").cast(LongType), col("cv").cast(ArrayType(DoubleType)))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq.sortBy(_._1)
    require(local.nonEmpty, "pqEncodeWith: empty codebook table")
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.PqEncodePack(
      Bridge.expression(emb), local.map(_._1), local.map(_._2), PqM))
  }

  /** level-1 PQ assignment that KEEPS the residuals: per subspace the
    * argmin struct carries (rounded dist, code, residual subvector),
    * so one broadcast cross-join + one per-vector aggregate yields the
    * code, the quantization error, and the exact input of the second
    * quantization level. Residual subtraction is exact (float inputs
    * widen to double losslessly); the dist is 6-dp-rounded per the
    * family's tie-free argmin discipline.
    */
  private def level1Residuals(embeddings: DataFrame, books: DataFrame): DataFrame = {
    val sub = Dims / PqM
    def resExpr(s: Int): Column = expr(
      s"transform(sequence(0, ${sub - 1}), i -> " +
        s"cast(element_at(embedding, ${s * sub} + i + 1) as double) - " +
        s"cast(element_at(cv, ${s * sub} + i + 1) as double))")
    val aggs = (0 until PqM).map(s =>
      min(struct(
        subDist(col("embedding"), col("cv"), s, sub).as("d"),
        col("code").as("code"),
        resExpr(s).as("r"))).as(s"b$s"))
    embeddings
      .crossJoin(broadcast(books))
      .groupBy("vec_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(
        (col("vec_id") +:
          (0 until PqM).map(s => col(s"b$s.code") * lit(1L << (4 * s)))
            .reduce(_ + _).as("pq") +:
          (0 until PqM).map(s => col(s"b$s.d").cast(DecimalType(18, 6)))
            .reduce(_ + _).as("err1") +:
          (0 until PqM).map(s => col(s"b$s.r").as(s"r$s"))): _*)
  }

  /** Residual (two-level) product quantization — the RQ rung of the
    * ladder (Chen et al., "Approximate Nearest Neighbor Search by
    * Residual Vector Quantization", 2010; the refinement stage of
    * IVFADC+R in Jégou et al.): level 1 encodes against the frozen PQ
    * codebooks, level 2 encodes the level-1 RESIDUAL against residual
    * codebooks, doubling the bits (64) and shrinking reconstruction
    * error — err2 <= err1 holds wherever a residual codeword beats
    * the zero estimate, and the two errors are emitted so the
    * improvement is measurable, not asserted.
    *
    * Codebook discipline: level-2 codewords are the level-1 residuals
    * of vectors [PqCodewords, 2*PqCodewords) — the sampled-quantizer
    * recipe one level down, oracle-reproducible like
    * [[sampledCodebooks]]; trained codebooks would slot in unchanged.
    *
    * 100 TB shape: both codebooks (16 rows each) ride inside ONE
    * compiled expression — a single corpus scan, zero exchanges, same
    * family as [[pqEncodeWith]] (see [[residualPqEncodeWith]]).
    */
  def residualPqEncode(embeddings: DataFrame): DataFrame = {
    val books1 = sampledCodebooks(embeddings)
    residualPqEncodeWith(embeddings, books1, residualCodebooksWide(embeddings, books1))
  }

  /** the level-2 codebooks in WIDE form (code2, w0..w7) — the shape
    * the encode aggregates against, and the relation a standing index
    * freezes to parquet (s27)
    */
  def residualCodebooksWide(embeddings: DataFrame, books1: DataFrame): DataFrame =
    level1Residuals(
      embeddings.filter(
        col("vec_id") >= PqCodewords && col("vec_id") < 2 * PqCodewords),
      books1)
      .select(
        ((col("vec_id") - PqCodewords).as("code2") +:
          (0 until PqM).map(s => col(s"r$s").as(s"w$s"))): _*)

  /** residual-PQ encode against EXPLICIT frozen codebooks — the
    * standing-index form (the [[pqEncodeWith]] rule one level down):
    * both assignments are per-row against frozen broadcast tables, so
    * an appended delta batch is bit-identical to a full rebuild
    */
  def residualPqEncodeWith(
      embeddings: DataFrame, books1: DataFrame, books2: DataFrame): DataFrame = {
    // 100 TB shape: ZERO exchanges — both codebooks ride inside ONE
    // compiled PqResidualPack expression (the pqEncodeWith kernel two
    // levels deep), so the whole two-level encode is a pure map over
    // the corpus scan. The previous shape paid two
    // crossJoin(broadcast) amplifications + two corpus-keyed
    // hash-aggregate exchanges. Numeric contract documented on the
    // expression; SimilaritySpec pins bit-equality vs the composed
    // formulation.
    val local1: IndexedSeq[(Long, IndexedSeq[Double])] = books1
      .select(col("code").cast(LongType), col("cv").cast(ArrayType(DoubleType)))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq.sortBy(_._1)
    require(local1.nonEmpty, "residualPqEncodeWith: empty level-1 codebook")
    // wide (code2, w0..w7) -> (code2, full-dim concatenation): the
    // kernel indexes level-2 codewords with the same base + j offsets
    // as level 1
    val local2: IndexedSeq[(Long, IndexedSeq[Double])] = books2
      .select(col("code2").cast(LongType),
        concat((0 until PqM).map(s => col(s"w$s")): _*).as("w"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toIndexedSeq.sortBy(_._1)
    require(local2.nonEmpty, "residualPqEncodeWith: empty level-2 codebook")
    import org.apache.spark.sql.graftbridge.Bridge
    val enc = Bridge.column(graft.functions.PqResidualPack(
      Bridge.expression(col("embedding")),
      local1.map(_._1), local1.map(_._2),
      local2.map(_._1), local2.map(_._2), PqM))
    embeddings
      .select(col("vec_id"), enc.as("rq"))
      .select(col("vec_id"), col("rq.pq").as("pq"), col("rq.pq2").as("pq2"),
        col("rq.err1").as("err1"), col("rq.err2").as("err2"))
  }

  /** WIDE codebooks -> ROW form (code2, s, rv[8]), the shape the
    * refinement ADC table builds from
    */
  private def booksWideToRows(books2: DataFrame): DataFrame =
    books2.select(col("code2"),
      posexplode(array((0 until PqM).map(s => col(s"w$s")): _*))
        .as(Seq("s", "rv")))

  /** RQ-refined search — the "+R" of IVFADC+R (Jégou et al.): rank by
    * level-1 ADC, take a WIDE shortlist, REFINE those candidates with
    * the level-2 residual ADC partials (score = q·cw1 + q·cw2, still
    * float-free over the corpus), cut to a NARROW shortlist, and only
    * then pay exact cosines. The refinement buys narrow-shortlist
    * recall without touching float vectors: both ADC tables are
    * broadcast-sized lookups, the level-2 pass prices on `wide` rows,
    * and the decimal-sum discipline keeps every shortlist boundary
    * tie-free against the oracle.
    */
  def rqRefineTopK(
      embeddings: DataFrame, queryId: Long, k: Int,
      wide: Int, narrow: Int): DataFrame = {
    val books1 = sampledCodebooks(embeddings)
    val books2 = residualCodebooksWide(embeddings, books1)
    rqRefineTopKWith(embeddings,
      residualPqEncodeWith(embeddings, books1, books2).select("vec_id", "pq", "pq2"),
      books1, books2, queryId, k, wide, narrow)
  }

  /** the [[rqRefineTopK]] search against EXPLICIT code/codebook
    * relations — the standing-index form (s27): `codes` is the frozen
    * (vec_id, pq, pq2) table read back from parquet, `books1`/`books2`
    * the frozen codebooks; the search never re-encodes and never
    * touches float vectors until the exact re-rank of the narrow cut.
    */
  def rqRefineTopKWith(
      embeddings: DataFrame, codes: DataFrame,
      books1: DataFrame, books2: DataFrame,
      queryId: Long, k: Int, wide: Int, narrow: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    val rq = codes.filter(col("vec_id") =!= queryId)
    val codes1 = rq.select(col("vec_id"),
      posexplode(expr(s"transform(sequence(0, ${PqM - 1}), s -> (pq >> (s * 4)) & 15)"))
        .as(Seq("s", "code")))
    val wideSet = codes1
      .join(broadcast(adcTable(books1, q)), Seq("s", "code"))
      .groupBy("vec_id").agg(sum(col("p")).as("score1"))
      .orderBy(col("score1").desc, col("vec_id").asc)
      .limit(wide)
    val sub = Dims / PqM
    val adc2 = booksWideToRows(books2)
      .crossJoin(broadcast(q))
      .select(col("code2"), col("s"),
        round(expr(s"aggregate(sequence(0, ${sub - 1}), cast(0.0 as double), " +
          s"(acc, i) -> acc + element_at(rv, i + 1) * " +
          s"cast(element_at(qv, s * $sub + i + 1) as double))"), 6)
          .cast(DecimalType(18, 6)).as("p2"))
    val codes2 = rq.select(col("vec_id"),
      posexplode(expr(s"transform(sequence(0, ${PqM - 1}), s -> (pq2 >> (s * 4)) & 15)"))
        .as(Seq("s", "code2")))
      .join(broadcast(wideSet.select("vec_id")), Seq("vec_id"), "leftsemi")
    val narrowSet = codes2.join(broadcast(adc2), Seq("s", "code2"))
      .groupBy("vec_id").agg(sum(col("p2")).as("score2"))
      .join(broadcast(wideSet), Seq("vec_id"))
      .select(col("vec_id"), (col("score1") + col("score2")).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(narrow)
    exactRerank(embeddings, queryId, k, narrowSet.select("vec_id"))
  }

  /** PQ-ADC approximate top-k with exact re-rank (the IVF-PQ search
    * recipe at billion scale, asymmetric distance computation of
    * Jégou et al., PAMI 2011): the query is NOT quantized — a
    * (subspace, code) -> partial-dot lookup table is built against the
    * raw query (PqM x PqCodewords rows, broadcast), every vector's
    * approximate score is the sum of its codes' partials, and only the
    * `shortlist` best approximate scores pay an exact cosine.
    *
    * Parity discipline: partials are 6-dp-rounded then summed as
    * DECIMAL(18,6) — decimal addition is associative, so the shortlist
    * boundary is identical on both engines regardless of aggregation
    * order (the Tables.dsum rule applied to ADC).
    */
  def pqTopK(embeddings: DataFrame, queryId: Long, k: Int, shortlist: Int): DataFrame = {
    val short = pqApproxScores(embeddings, queryId)
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(shortlist)
    exactRerank(embeddings, queryId, k, short.select("vec_id"))
  }

  /** IVF-PQ top-k — the billion-scale ANN workhorse assembled from its
    * two verified halves: the IVF coarse stage restricts the search to
    * the `nProbe` posting lists nearest the query (scanned fraction ≈
    * nProbe/nCentroids, as in [[ivfTopKWith]]), and WITHIN those lists
    * vectors are ranked by PQ-ADC codes (32 bits each, never the float
    * vectors) before the exact re-rank of the shortlist. At 100 TB the
    * float vectors are touched exactly twice per query: once at index
    * build, once for the `shortlist` finalists.
    */
  def ivfPqTopK(
      embeddings: DataFrame,
      queryId: Long,
      k: Int,
      nCentroids: Int,
      nProbe: Int,
      shortlist: Int): DataFrame = {
    val cents = sampledCentroids(embeddings, nCentroids)
    val q = embeddings.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    val probes = cents
      .crossJoin(broadcast(q))
      .select(col("cid"), round(cosine(col("cv"), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("cid").asc)
      .limit(nProbe)
      .select("cid")
    val members = ivfAssignWith(embeddings, cents)
      .join(broadcast(probes), "cid")
      .select("vec_id")
    val short = pqApproxScores(embeddings, queryId)
      .join(members, Seq("vec_id"), "leftsemi")
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(shortlist)
    exactRerank(embeddings, queryId, k, short.select("vec_id"))
  }

  /** decimal-exact ADC score per non-query vector: the (subspace, code)
    * -> partial-dot broadcast lookup joined against each vector's
    * unpacked codes (see [[pqTopK]]'s parity discipline)
    */
  private def pqApproxScores(embeddings: DataFrame, queryId: Long): DataFrame =
    pqScoresWithCodes(
      pqEncode(embeddings).filter(col("vec_id") =!= queryId),
      sampledCodebooks(embeddings),
      embeddings.filter(col("vec_id") === queryId).select(col("embedding").as("qv")))

  /** the ADC lookup table (code, s, partial) against a one-row query
    * frame `q(qv)` — PqM rows per codeword, broadcast-sized
    */
  private def adcTable(books: DataFrame, q: DataFrame): DataFrame = {
    val sub = Dims / PqM
    val partials = (0 until PqM).map(s =>
      round(
        aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0),
          (acc, i) => acc +
            element_at(col("cv"), lit(s * sub) + i + 1).cast(DoubleType) *
              element_at(col("qv"), lit(s * sub) + i + 1).cast(DoubleType)),
        6).cast(DecimalType(18, 6)))
    books.crossJoin(broadcast(q))
      .select(col("code"), posexplode(array(partials: _*)).as(Seq("s", "p")))
  }

  /** ADC scoring over a STANDING code table (vec_id, pq) — the search
    * half that never touches float vectors. The PqM x PqCodewords
    * decimal partials collapse into ONE lookup array (slot =
    * s * PqCodewords + code) broadcast as a single row, and each code
    * row scores itself with an in-row fold over its 8 packed codes —
    * decimal-exact like the previous explode + join + re-group shape
    * (exact addition, order-free), but the corpus-sized code scan is
    * never amplified PqM-fold and never shuffled for the sum.
    */
  def pqScoresWithCodes(codes: DataFrame, books: DataFrame, q: DataFrame): DataFrame = {
    val adcArr = adcTable(books, q)
      .groupBy()
      .agg(map_from_entries(collect_list(struct(
        (col("s") * PqCodewords + col("code")).cast(IntegerType).as("slot"),
        col("p")))).as("m"))
      // dense layout with zero-fill — see pqScoresWithCodesBatched
      .select(transform(
        sequence(lit(0), lit(PqM * PqCodewords - 1)),
        i => coalesce(try_element_at(col("m"), i),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 6)))).as("adc"))
    codes.crossJoin(broadcast(adcArr))
      .withColumn("score", expr(
        s"aggregate(sequence(0, ${PqM - 1}), cast(0 as decimal(18,6)), " +
          s"(acc, s) -> cast(acc + element_at(adc, s * $PqCodewords + " +
          "int((pq >> (s * 4)) & 15) + 1) as decimal(18,6)))"))
      .select("vec_id", "score")
  }

  /** batched ADC lookup table (query_id, s, code, p) against a query
    * FRAME `queries(query_id, qv)` — |queries| x PqCodewords x PqM
    * rows, still broadcast-sized for the micro-batch-scale query sets
    * a serving path answers at once (a 1k-query batch is 1k x 16 x 8
    * = 128k tiny rows)
    */
  private def adcTableBatched(books: DataFrame, queries: DataFrame): DataFrame = {
    val sub = Dims / PqM
    val partials = (0 until PqM).map(s =>
      round(
        aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0),
          (acc, i) => acc +
            element_at(col("cv"), lit(s * sub) + i + 1).cast(DoubleType) *
              element_at(col("qv"), lit(s * sub) + i + 1).cast(DoubleType)),
        6).cast(DecimalType(18, 6)))
    books.crossJoin(broadcast(queries))
      .select(col("query_id"), col("code"), posexplode(array(partials: _*)).as(Seq("s", "p")))
  }

  /** batched ADC scoring: `members(query_id, vec_id, pq)` — each
    * query's pruned posting-list members — scored IN-ROW against a
    * per-query ADC lookup ARRAY (slot = s * PqCodewords + code, PqM x
    * PqCodewords decimal partials per query, broadcast). Same
    * decimal-exact values as the previous explode + (query_id, s,
    * code) join + re-group shape (decimal addition is exact, so
    * summation order cannot move a score), but the member relation is
    * never amplified PqM-fold and never re-shuffled for the sum: one
    * broadcast hash join on query_id, then a map-side fold over the 8
    * packed codes. This is the serving hot loop —
    * [[graft.streaming.ServeGate]] pays it per micro-batch.
    */
  def pqScoresWithCodesBatched(
      members: DataFrame, books: DataFrame, queries: DataFrame): DataFrame = {
    val adcArr = adcTableBatched(books, queries)
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(
        (col("s") * PqCodewords + col("code")).cast(IntegerType).as("slot"),
        col("p")))).as("m"))
      // DENSE PqM x PqCodewords layout: a small corpus trains fewer
      // codewords, and a compacted (sorted) array would misindex the
      // s * PqCodewords + code arithmetic — absent slots zero-fill
      // (they are never looked up: codes only reference trained words)
      .select(col("query_id"), transform(
        sequence(lit(0), lit(PqM * PqCodewords - 1)),
        i => coalesce(try_element_at(col("m"), i),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 6)))).as("adc"))
    members.join(broadcast(adcArr), "query_id")
      .withColumn("score", expr(
        s"aggregate(sequence(0, ${PqM - 1}), cast(0 as decimal(18,6)), " +
          s"(acc, s) -> cast(acc + element_at(adc, s * $PqCodewords + " +
          "int((pq >> (s * 4)) & 15) + 1) as decimal(18,6)))"))
      .select("query_id", "vec_id", "score")
  }

  /** batched IVF-PQ SERVING step against a standing index: answer a
    * whole query frame `queries(query_id, qv)` in one plan — the shape
    * a streaming retrieval endpoint runs per micro-batch
    * ([[graft.streaming.ServeGate]]). Per query: rank the frozen
    * centroids (queries broadcast into the 16-row cents table), keep
    * nProbe lists, ADC-score ONLY those lists' 32-bit codes, top-k by
    * decimal score. Pure index scan — no float corpus I/O; the only
    * corpus-wide relation is the posting-list join, shuffled by cid
    * once regardless of |queries|. Scores stay ADC-approximate by
    * design (the serving budget); an exact re-rank over the returned
    * ids is the caller's optional second stage, exactly as x08
    * composes it.
    *
    * `excludeSelf` implements the corpus-vector-AS-query convention
    * (drop the index row whose vec_id equals the query_id — s10's
    * shape, where answering "my own nearest neighbours" with myself
    * is vacuous). It defaults OFF because a SERVING feed's query_id
    * is the caller's namespace, not the corpus's: a feed id that
    * happens to collide with a corpus vec_id must not silently drop
    * that corpus vector from one caller's answers
    * ([[graft.streaming.ServeGate]] serves with the default).
    */
  def ivfPqServeBatch(
      queries: DataFrame,
      index: DataFrame,
      cents: DataFrame,
      books: DataFrame,
      k: Int,
      nProbe: Int,
      excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cid").asc)
    val probes = cents.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cid"),
        round(cosine(col("cv"), col("qv")), 6).as("sim"))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= nProbe)
      .select("query_id", "cid")
    val joined = index.join(broadcast(probes), "cid")
    val members =
      (if (excludeSelf) joined.filter(col("vec_id") =!= col("query_id")) else joined)
        .select("query_id", "vec_id", "pq")
    val wr = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id").asc)
    pqScoresWithCodesBatched(members, books, queries)
      .withColumn("rank", row_number().over(wr).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        col("score").cast(DoubleType).as("score"), col("rank"))
  }

  /** Batched IVFADC+R serving — [[ivfPqServeBatch]] with the s26/s27
    * residual refinement inserted between the level-1 ADC and the
    * final cut (Jégou et al.'s "+R" in its streaming-serving shape):
    * probe nProbe posting lists per query, rank the members by
    * level-1 ADC, keep a per-query WIDE shortlist (a partial
    * WindowGroupLimit keeps the exchange wide-bounded), refine ONLY
    * those rows with the level-2 residual partials (score = q·cw1 +
    * q·cw2 — still no float vectors anywhere), and cut to k. Both ADC
    * tables ship as dense per-query decimal arrays scored by in-row
    * folds (the [[pqScoresWithCodesBatched]] recipe), so the member
    * relation is never amplified and the only exchanges are the
    * cid posting join and the two per-query top-k windows.
    */
  def ivfPqRefineServeBatch(
      queries: DataFrame,
      index: DataFrame,
      cents: DataFrame,
      books1: DataFrame,
      books2: DataFrame,
      k: Int,
      nProbe: Int,
      wide: Int,
      excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cid").asc)
    val probes = cents.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cid"),
        round(cosine(col("cv"), col("qv")), 6).as("sim"))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= nProbe)
      .select("query_id", "cid")
    val joined = index.join(broadcast(probes), "cid")
    val members =
      (if (excludeSelf) joined.filter(col("vec_id") =!= col("query_id")) else joined)
        .select("query_id", "vec_id", "pq", "pq2")
    val w1 = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id").asc)
    val wideSet =
      pqScoresWithCodesBatched(members.select("query_id", "vec_id", "pq"), books1, queries)
        .withColumn("wr", row_number().over(w1))
        .filter(col("wr") <= wide)
        .select(col("query_id"), col("vec_id"), col("score").as("score1"))
    // level-2 per-query dense lookup array (slot = s * PqCodewords +
    // code2, zero-filled — the pqScoresWithCodesBatched layout on the
    // residual codebooks)
    val sub = Dims / PqM
    val adc2 = booksWideToRows(books2)
      .crossJoin(broadcast(queries))
      .select(col("query_id"),
        (col("s") * PqCodewords + col("code2")).cast(IntegerType).as("slot"),
        round(expr(s"aggregate(sequence(0, ${sub - 1}), cast(0.0 as double), " +
          s"(acc, i) -> acc + element_at(rv, i + 1) * " +
          s"cast(element_at(qv, s * $sub + i + 1) as double))"), 6)
          .cast(DecimalType(18, 6)).as("p"))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(col("slot"), col("p")))).as("m"))
      .select(col("query_id"), transform(
        sequence(lit(0), lit(PqM * PqCodewords - 1)),
        i => coalesce(try_element_at(col("m"), i),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 6)))).as("adc2"))
    val wr = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id").asc)
    members.select("query_id", "vec_id", "pq2")
      .join(broadcast(wideSet), Seq("query_id", "vec_id"))
      .join(broadcast(adc2), "query_id")
      .withColumn("score2", expr(
        s"aggregate(sequence(0, ${PqM - 1}), cast(0 as decimal(18,6)), " +
          s"(acc, s) -> cast(acc + element_at(adc2, s * $PqCodewords + " +
          "int((pq2 >> (s * 4)) & 15) + 1) as decimal(18,6)))"))
      .withColumn("score", col("score1") + col("score2"))
      .withColumn("rank", row_number().over(wr).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        col("score").cast(DoubleType).as("score"), col("rank"))
  }

  /** One batch of standing IVF-PQ+RQ index rows (vec_id, cid, pq, pq2)
    * against a FROZEN quantizer and both codebook levels — the
    * [[ivfPqIndexRows]] rule on the residual family; per-row against
    * frozen tables, so append ≡ rebuild bit-for-bit.
    */
  def ivfRqIndexRows(
      batch: DataFrame, cents: DataFrame,
      books1: DataFrame, books2: DataFrame): DataFrame =
    ivfAssignWith(batch, cents)
      .select("vec_id", "cid")
      .join(residualPqEncodeWith(batch, books1, books2)
        .select("vec_id", "pq", "pq2"), "vec_id")

  /** One batch of standing IVF-PQ index rows (vec_id, cid, pq) against
    * a FROZEN quantizer (cents) + codebook (books) — base build and
    * delta append are the same call over different batches, and because
    * both assignments are per-row against frozen tables, append ≡ full
    * rebuild bit-for-bit (SimilaritySpec asserts it). The vec_id join
    * of the two per-row assignments is key-partitioned — no corpus^2
    * term anywhere.
    */
  def ivfPqIndexRows(batch: DataFrame, cents: DataFrame, books: DataFrame): DataFrame =
    ivfAssignWith(batch, cents)
      .select("vec_id", "cid")
      .join(pqEncodeWith(batch, books), "vec_id")

  /** IVF-PQ search against a STANDING (vec_id, cid, pq) index — the
    * operator a 100 TB deployment actually runs per query (s10):
    * probe the nProbe nearest centroids, ADC-score ONLY those posting
    * lists' 32-bit codes (the index scan prunes to nProbe/nCentroids
    * of the corpus and reads no float vectors), exact-cosine re-rank
    * the shortlist. Unlike [[ivfPqTopK]], nothing is re-encoded: the
    * float corpus is touched only for the query row and the shortlist.
    */
  def ivfPqTopKStanding(
      embeddings: DataFrame,
      index: DataFrame,
      cents: DataFrame,
      books: DataFrame,
      queryId: Long,
      k: Int,
      nProbe: Int,
      shortlist: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    val probes = cents
      .crossJoin(broadcast(q))
      .select(col("cid"), round(cosine(col("cv"), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("cid").asc)
      .limit(nProbe)
      .select("cid")
    val members = index
      .join(broadcast(probes), "cid")
      .filter(col("vec_id") =!= queryId)
      .select("vec_id", "pq")
    val short = pqScoresWithCodes(members, books, q)
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(shortlist)
    exactRerank(embeddings, queryId, k, short.select("vec_id"))
  }

  /** exact-cosine re-rank of a shortlist id frame (broadcast-sized) */
  private def exactRerank(
      embeddings: DataFrame, queryId: Long, k: Int, ids: DataFrame): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    embeddings.join(broadcast(ids), "vec_id")
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        col("label"),
        round(cosine(col("embedding"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}
