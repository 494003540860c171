package graft.streaming

import graft.llm.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming RETRIEVAL SERVING gate: the query-side twin of the ingest
  * gates. Every other streaming surface moves the CORPUS (ingest,
  * dedup, contamination, sampling); this one moves the QUERIES — a
  * continuous feed of embedding queries answered against the FROZEN
  * standing IVF-PQ index (s10's cents/books/rows layout), the
  * operational shape of a RAG or dedup-lookup endpoint fed from a
  * queue:
  *
  *   freeze:  embeddings -> cents (16 rows) + books (PQ codebook)
  *                       -> rows (vec_id, cid, pq) posting lists
  *   batch:   queries -> per-query centroid ranking (queries broadcast
  *            into the 16-row cents table), keep nProbe lists
  *         -> posting-list join (the ONE corpus-wide relation,
  *            shuffled by cid once regardless of |queries|)
  *         -> batched ADC scoring (decimal-exact, float-free)
  *         -> per-query top-k to batch-scoped result generations
  *
  * 100 TB notes: the search plan reads no float vectors — the index
  * rows carry 32-bit PQ codes, so a query batch scans
  * nProbe/nCentroids of a code-width index, never the raster corpus;
  * queries, probes, and the per-batch ADC table are all broadcast-
  * sized, and [[step]] SPLITS an oversized query drop into
  * sub-batches so that assumption is enforced, not assumed (one huge
  * dropped file degrades to several broadcast-sized plans instead of
  * blowing the driver's broadcast limit). Results are ADC-approximate
  * by design (the serving budget); exact re-rank over the returned
  * ids is the caller's second stage, as x08/x09 compose it.
  *
  * INDEX RELEASES ARE ATOMIC UNDER LIVE SERVING. The index root holds
  * versioned GENERATIONS (`gen-<seq>-<token>/{cents,books,rows}`),
  * each published by [[FoldCommit]]'s stage → marker → ONE-rename
  * protocol, so a release is all-or-nothing: a rebuild that crashes at
  * any point (between relation writes, before the marker, before the
  * rename) leaves the previous generation serving, and the next
  * [[buildIndex]] heals the residue forward or back. Every serving
  * batch resolves [[currentDir]] ONCE and reads all three relations
  * from that one generation — a flip between micro-batches switches
  * releases cleanly; a flip DURING a batch is invisible because the
  * displaced generation's files survive the grace window (the
  * publisher retires everything OLDER than the previous current, so
  * steady state is two generations on disk). The frozen-index
  * contract matches production: embedding releases are operator
  * events ([[buildIndex]] again), never stream state, which is what
  * keeps the gate stateless — replay a micro-batch and the same
  * generation lands byte-identical (the batch-scoped overwrite recipe
  * every gate shares).
  *
  * ServeGateSpec asserts: streamed answers == the batch
  * [[Similarity.ivfPqServeBatch]] over the same query set, restart
  * from the checkpoint re-emits nothing, late query files are served
  * incrementally, writes refuse while a maintenance lease is held,
  * a mid-stream rebuild serves every batch entirely from one release,
  * and a rebuild crashed at each injection point leaves the old
  * release serving unchanged.
  */
object ServeGate {

  /** schema of the query feed (parquet drop): a query id + the
    * embedding to answer, same element type as the corpus. Query ids
    * are the CALLER's namespace — they are never compared against
    * corpus vec_ids (see [[Similarity.ivfPqServeBatch]]'s
    * `excludeSelf`, off here: a feed id that happens to collide with
    * a corpus id must not silently drop that corpus vector).
    */
  val querySchema: StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("qv", ArrayType(FloatType), nullable = false)))

  private val GenPrefix = "gen-"

  /** TEST-ONLY crash injection for the relation writes INSIDE a
    * release's staging phase (the inter-write points FoldCommit's own
    * failpoints can't see). Never set outside specs.
    */
  @volatile private[graft] var failpoint: String = null
  private def trip(p: String): Unit =
    if (failpoint == p)
      throw new IllegalStateException(s"injected crash at $p")

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** published generation names under the index root, ascending (the
    * zero-padded sequence number makes lexicographic == temporal)
    */
  private def publishedGens(
      fs: org.apache.hadoop.fs.FileSystem, root: Path): Seq[String] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(GenPrefix))
      .map(_.getPath.getName).sorted

  /** Resolve the CURRENT index release — the newest published
    * generation. Pure listing, no healing: readers never repair the
    * root (a racing reader heal could roll back a build mid-stage);
    * a crashed release stays invisible until the next [[buildIndex]]
    * finishes it, and the previous release keeps serving meanwhile.
    */
  def currentDir(spark: SparkSession, indexDir: String): String = {
    val (fs, root) = fsOf(spark, indexDir)
    val gens = publishedGens(fs, root)
    require(gens.nonEmpty,
      s"no published index generation under $indexDir — run buildIndex first")
    new Path(root, gens.last).toString
  }

  /** Freeze a serving index RELEASE from an embeddings frame — s10's
    * layout (cents/books/rows) built through the same public
    * primitives, staged as one generation and made visible by ONE
    * rename ([[FoldCommit.publish]]), so a live serving stream never
    * observes a mix of releases or a half-written one. Rebuild = call
    * again (a release, not stream state); generations older than the
    * PREVIOUS current are retired with the publish (keep-two grace
    * window for a batch that resolved just before the flip).
    */
  def buildIndex(spark: SparkSession, embeddings: DataFrame, indexDir: String): Unit =
    publishRelease(spark, indexDir)(stageDense(spark, embeddings, _))

  /** the release-publication protocol shared by every release writer
    * (dense build, hybrid build, forget fold): heal, next sequence
    * number, stage via `stage`, one-rename publish retiring everything
    * older than the displaced current
    */
  private def publishRelease(spark: SparkSession, indexDir: String)(
      stage: String => Unit): Unit = {
    val (fs, root) = fsOf(spark, indexDir)
    fs.mkdirs(root)
    // finish any crashed release FIRST (publish would heal anyway, but
    // the sequence number and retire list must see the healed state or
    // a rolled-forward release could be assigned a duplicate sequence)
    FoldCommit.heal(fs, root)
    val pub = publishedGens(fs, root)
    val seq = pub.lastOption
      .map(_.stripPrefix(GenPrefix).takeWhile(_.isDigit).toLong + 1)
      .getOrElse(1L)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val name = f"$GenPrefix$seq%09d-$token"
    // retire everything older than the generation being displaced —
    // after this publish the root holds (previous, new)
    val retires = if (pub.isEmpty) Nil else pub.dropRight(1)
    FoldCommit.publish(fs, root, name, retires)(stage)
  }

  /** stage the dense family (cents/books/books2/rows) into a release */
  private def stageDense(
      spark: SparkSession, embeddings: DataFrame, staging: String): Unit = {
    Similarity.sampledCentroids(embeddings, 16)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/cents")
    trip("cents")
    Similarity.sampledCodebooks(embeddings)
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/books")
    trip("books")
    // level-2 residual codebooks ride in every release (s27's
    // layout) so a deployment can flip refinement on per-step
    // without an index rebuild
    Similarity.residualCodebooksWide(
        embeddings, spark.read.parquet(s"$staging/books"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/books2")
    trip("books2")
    // the rows assignment reads the JUST-WRITTEN quantizer back so
    // the release is internally consistent even if the sampling
    // primitives were re-evaluated differently
    Similarity.ivfRqIndexRows(
        embeddings,
        spark.read.parquet(s"$staging/cents"),
        spark.read.parquet(s"$staging/books"),
        spark.read.parquet(s"$staging/books2"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/rows")
    trip("rows")
    // the quantizer's TRAINING-SAMPLE ids, recorded in the release so
    // a later [[forgetRelease]] can detect when a forgotten vector's
    // VALUES are embedded in cents/books/books2 (cents and books draw
    // vec_id < PqCodewords, books2's donors [PqCodewords,
    // 2*PqCodewords)) — without this a forget of a sample vector would
    // be a silent right-to-be-forgotten leak: the row disappears but
    // its coordinates keep serving as a codeword
    embeddings
      .filter(col("vec_id") < 2L * Similarity.PqCodewords)
      .select("vec_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/sample")
  }

  /** Freeze a HYBRID serving release: the dense family PLUS the exact
    * re-rank vectors (`embs`) and the s13-layout BM25 family
    * (`bm25/{postings,df,dl,stats}`) over `docs` — ALL relations in
    * ONE generation made visible by ONE rename, so the dense and
    * lexical halves of a hybrid answer can never come from different
    * releases. `docs` is the lexical corpus `(doc_id, text)`; doc_id
    * shares vec_id's namespace (the d10 convention), and only docs
    * whose vectors are in `embeddings` participate (a lexical-only doc
    * could be retrieved but not MMR-diversified).
    */
  def buildHybridIndex(
      spark: SparkSession, embeddings: DataFrame, docs: DataFrame,
      indexDir: String): Unit =
    publishRelease(spark, indexDir) { staging =>
      stageDense(spark, embeddings, staging)
      embeddings.select(col("vec_id"), col("embedding"))
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/embs")
      trip("embs")
      val corpus = docs
        .join(broadcast(embeddings.select(col("vec_id"))),
          col("doc_id") === col("vec_id"), "left_semi")
      // the compiled in-row TermCounts fold (the s13Tf kernel) — the
      // postings relation is a pure map over the corpus, zero exchanges
      val tf = corpus
        .select(col("doc_id"),
          explode(graft.functions.ColumnFns.term_counts(split(col("text"), " "))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
        .persist()
      try {
        tf.write.mode(SaveMode.Overwrite).parquet(s"$staging/bm25/postings")
        tf.groupBy("term").agg(count(lit(1)).as("df"))
          .write.mode(SaveMode.Overwrite).parquet(s"$staging/bm25/df")
        val dlB = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        dlB.write.mode(SaveMode.Overwrite).parquet(s"$staging/bm25/dl")
        dlB.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
          .write.mode(SaveMode.Overwrite).parquet(s"$staging/bm25/stats")
      } finally tf.unpersist(): Unit
      trip("bm25")
    }

  /** RIGHT-TO-BE-FORGOTTEN fold on the serving releases — the one
    * standing-index family that previously had to wait for the next
    * full [[buildIndex]]: filter the predicate's ids out of every
    * row-shaped relation of the CURRENT release and publish the result
    * as a NEW generation under the same atomic release protocol.
    * BM25's derived relations (df, stats) are RECOMPUTED from the
    * filtered postings/dl, never merged — the s13FoldForgets rule.
    * A crash at any point leaves the previous release serving; re-run
    * to complete (the filter is idempotent).
    *
    * QUANTIZER-SAMPLE rule: the quantizer relations
    * (cents/books/books2) copy unchanged ONLY when no forgotten id is
    * in the quantizer's training sample (the release's `sample`
    * relation, recorded at build time). A sample vector's COORDINATES
    * are embedded in the codebooks, so filtering its row alone would
    * be a silent retention leak. When the predicate hits the sample:
    * a hybrid release (which carries the exact vectors in `embs`)
    * stages a full dense RETRAIN from the remaining vectors — the
    * published generation then equals a rebuild-without EXACTLY, by
    * the same staged/atomic protocol; a dense-only release has no
    * vectors to retrain from, so the fold REFUSES with a
    * retrain-required error and the current release keeps serving.
    * ServeGateSpec pins all three cases (out-of-sample fold,
    * in-sample retrain == rebuild-without, dense-only refusal).
    *
    * `gone(idCol)` receives `vec_id` for the dense relations and
    * `doc_id` for the lexical ones — one namespace (d10), two column
    * names.
    */
  def forgetRelease(
      spark: SparkSession, indexDir: String,
      gone: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val (fs, _) = fsOf(spark, indexDir)
    publishRelease(spark, indexDir) { staging =>
      // resolve the fold's SOURCE generation only after publishRelease
      // has healed: a crashed-but-committed prior release that heal
      // rolls forward must be what the fold filters, or the fold would
      // publish a filtered copy of the stale previous release ON TOP
      // of the healed one — silently reverting the serving corpus to
      // its pre-rebuild content
      val cur = currentDir(spark, indexDir)
      def has(rel: String): Boolean = fs.exists(new Path(cur, rel))
      // quantizer-sample membership (bounded: the sample is at most
      // 2*PqCodewords ids). Releases from before the sample relation
      // existed fall back to the sampled-quantizer convention: the
      // training ids are exactly the indexed ids below 2*PqCodewords.
      val sample =
        if (has("sample")) spark.read.parquet(s"$cur/sample")
        else spark.read.parquet(s"$cur/rows")
          .filter(col("vec_id") < 2L * Similarity.PqCodewords)
          .select("vec_id")
      val inSample = sample.filter(gone(col("vec_id"))).count()
      if (inSample == 0) {
        for (rel <- Seq("cents", "books", "books2") ++
            (if (has("sample")) Seq("sample") else Nil))
          spark.read.parquet(s"$cur/$rel")
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/$rel")
        trip("cents")
        spark.read.parquet(s"$cur/rows").filter(!gone(col("vec_id")))
          .write.mode(SaveMode.Overwrite).parquet(s"$staging/rows")
        trip("rows")
      } else if (has("embs")) {
        // staged retrain: re-derive the whole dense family from the
        // remaining exact vectors — identical inputs to a
        // rebuild-without, so the published release IS one. (The null
        // label only satisfies ivfAssignWith's pass-through projection;
        // no staged relation keeps it.)
        stageDense(spark,
          spark.read.parquet(s"$cur/embs").filter(!gone(col("vec_id")))
            .withColumn("label",
              lit(null).cast(org.apache.spark.sql.types.StringType)),
          staging)
      } else {
        throw new IllegalStateException(
          s"forgetRelease: $inSample forgotten id(s) are in the quantizer " +
            "training sample of a dense-only release — their coordinates are " +
            "embedded in cents/books/books2 and there are no exact vectors to " +
            "retrain from. Rebuild the release from the filtered corpus " +
            "(buildIndex) instead; the current release keeps serving meanwhile.")
      }
      if (has("embs")) {
        spark.read.parquet(s"$cur/embs").filter(!gone(col("vec_id")))
          .write.mode(SaveMode.Overwrite).parquet(s"$staging/embs")
        trip("embs")
      }
      if (has("bm25")) {
        val postings = spark.read.parquet(s"$cur/bm25/postings")
          .filter(!gone(col("doc_id"))).persist()
        try {
          postings.write.mode(SaveMode.Overwrite).parquet(s"$staging/bm25/postings")
          postings.groupBy("term").agg(count(lit(1)).as("df"))
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/bm25/df")
          val dlF = spark.read.parquet(s"$cur/bm25/dl").filter(!gone(col("doc_id")))
          dlF.write.mode(SaveMode.Overwrite).parquet(s"$staging/bm25/dl")
          dlF.agg(count(lit(1)).as("n"),
              coalesce(sum(col("dl")), lit(0L)).as("s"))
            .write.mode(SaveMode.Overwrite).parquet(s"$staging/bm25/stats")
        } finally postings.unpersist(): Unit
        trip("bm25")
      }
    }
  }

  /** The serving releases as a [[Takedown]] surface, so ONE ledger
    * token folds the gate indexes AND the serving corpus — without
    * this, a real takedown had to remember to call [[forgetRelease]]
    * separately, and a crash between the gate folds and the serving
    * fold left the takedown half-applied with no record. The fold is
    * idempotent and crash-atomic, so the ledger's re-drives are
    * harmless; an id set that hits the quantizer training sample
    * follows [[forgetRelease]]'s retrain-or-refuse rule (a refusal
    * aborts the resume with the token OPEN and the serving surface
    * unmarked — honest, never silently closed). TakedownSpec pins the
    * crash-between-surfaces saga.
    */
  def takedownSurface(indexDir: String, name: String = "serve"): Takedown.Surface =
    Takedown.Surface(name, (s, ids) =>
      forgetRelease(s, indexDir, id => id.isInCollection(ids)))

  /** One serving step: answer `batchQueries` against the CURRENT index
    * release (resolved once — all three relations come from the same
    * generation), land per-query top-k under a batch-scoped generation.
    * Refuses under a maintenance lease — the quiesce contract every
    * gate's sink honors. A drop larger than `maxQueriesPerPart` is
    * served as deterministic hash-split sub-batches so the per-plan
    * ADC table stays broadcast-sized.
    *
    * Replay semantics: a replayed micro-batch overwrites its own
    * generation (never duplicates). If NO release flipped in between,
    * the rewrite is byte-identical; if one did, the replay RE-SERVES
    * the batch from the current release — the honest semantics for a
    * serving surface, where an answer reflects the index at serve
    * time, never a pinned historical index. Each result generation
    * carries a `_served_gen` sidecar (underscore-prefixed, invisible
    * to readers) naming the release that answered it, so provenance
    * is auditable either way.
    */
  def step(
      spark: SparkSession,
      batchQueries: DataFrame,
      batchTag: String,
      indexDir: String,
      resultsDir: String,
      k: Int = 10,
      nProbe: Int = 4,
      maxQueriesPerPart: Int = 4096,
      refineWide: Int = 0): Unit = {
    LakeCompact.assertNoLease(spark, resultsDir)
    val gen = currentDir(spark, indexDir)
    val rows = spark.read.parquet(s"$gen/rows")
    val cents = spark.read.parquet(s"$gen/cents")
    val books = spark.read.parquet(s"$gen/books")
    // cache the (broadcast-sized) query batch: the size probe below and
    // every serve plan read it — without the cache each is a fresh
    // source scan
    val q = batchQueries.select(col("query_id"), col("qv")).cache()
    try {
      def serveTo(queries: DataFrame, genDir: String): Unit = {
        // refineWide > 0 switches the dense plan to IVFADC+R: the
        // level-1 shortlist of that width re-scored with the release's
        // residual codebooks before the final cut (x10's dense arm at
        // serve time; same release, no rebuild)
        (if (refineWide > 0)
           Similarity.ivfPqRefineServeBatch(queries, rows, cents, books,
             spark.read.parquet(s"$gen/books2"), k, nProbe, refineWide)
         else Similarity.ivfPqServeBatch(queries, rows, cents, books, k, nProbe))
          .write.mode(SaveMode.Overwrite).parquet(genDir)
        val (fs, _) = fsOf(spark, genDir)
        val out = fs.create(new Path(genDir, "_served_gen"), true)
        try out.write((new Path(gen).getName + "\n").getBytes("UTF-8"))
        finally out.close()
      }
      val parts = math.max(1L,
        (q.count() + maxQueriesPerPart - 1) / maxQueriesPerPart).toInt
      if (parts == 1) serveTo(q, s"$resultsDir/batch=$batchTag")
      else
        // hash split (not row_number) so a replayed micro-batch lands the
        // SAME rows in the SAME sub-generation regardless of scan order
        for (i <- 0 until parts)
          serveTo(q.filter(pmod(xxhash64(col("query_id")), lit(parts)) === i),
            s"$resultsDir/batch=$batchTag-p$i")
    } finally q.unpersist(): Unit
  }

  /** Streaming entry point: parquet query drop in, per-query top-k
    * result generations out, checkpointed resume.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      indexDir: String,
      resultsDir: String,
      checkpointDir: String,
      k: Int = 10,
      nProbe: Int = 4,
      availableNow: Boolean = true,
      refineWide: Int = 0): StreamingQuery = {
    val raw = spark.readStream
      .schema(querySchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(srcDir)
    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(spark, batch, s"$token-$batchId", indexDir, resultsDir, k, nProbe,
          refineWide = refineWide)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  /** schema of the HYBRID query feed: id + the dense embedding + the
    * raw query text (the step derives the top-4 terms exactly as the
    * x08/x09/x10 batch queries do)
    */
  val hybridQuerySchema: StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("qv", ArrayType(FloatType), nullable = false),
    StructField("qtext", StringType, nullable = false)))

  /** One HYBRID serving step: answer `(query_id, qv, qtext)` queries
    * with the full x10 composition — RQ-refined dense arm + BM25
    * lexical arm + RRF fusion + MMR diversification
    * ([[graft.llm.HybridServe.hybridServeBatch]]) — against the
    * CURRENT hybrid release (all relations resolved from ONE
    * generation, so the two arms can never answer from different
    * releases). Same batch-scoped replay/idempotence, lease-refusal,
    * sub-batch splitting and `_served_gen` provenance as [[step]].
    * `excludeSelf` is the s10 corpus-vector-as-query convention
    * (default OFF — the serving-feed namespace rule, see [[step]]).
    */
  def stepHybrid(
      spark: SparkSession,
      batchQueries: DataFrame,
      batchTag: String,
      indexDir: String,
      resultsDir: String,
      k: Int = 10,
      nProbe: Int = 4,
      wide: Int = 50,
      narrow: Int = 20,
      maxQueriesPerPart: Int = 4096,
      excludeSelf: Boolean = false): Unit = {
    LakeCompact.assertNoLease(spark, resultsDir)
    val gen = currentDir(spark, indexDir)
    val rows = spark.read.parquet(s"$gen/rows")
    val cents = spark.read.parquet(s"$gen/cents")
    val books = spark.read.parquet(s"$gen/books")
    val books2 = spark.read.parquet(s"$gen/books2")
    val embs = spark.read.parquet(s"$gen/embs")
    val postings = spark.read.parquet(s"$gen/bm25/postings")
    val dfp = spark.read.parquet(s"$gen/bm25/df")
    val dl = spark.read.parquet(s"$gen/bm25/dl")
    val stats = spark.read.parquet(s"$gen/bm25/stats")
    val q = batchQueries.select(col("query_id"), col("qv"), col("qtext")).cache()
    try {
      def serveTo(queries: DataFrame, genDir: String): Unit = {
        graft.llm.HybridServe.hybridServeBatch(queries, rows, cents, books,
            books2, embs, postings, dfp, dl, stats, k, nProbe, wide, narrow,
            excludeSelf)
          .write.mode(SaveMode.Overwrite).parquet(genDir)
        val (fs, _) = fsOf(spark, genDir)
        val out = fs.create(new Path(genDir, "_served_gen"), true)
        try out.write((new Path(gen).getName + "\n").getBytes("UTF-8"))
        finally out.close()
      }
      val parts = math.max(1L,
        (q.count() + maxQueriesPerPart - 1) / maxQueriesPerPart).toInt
      if (parts == 1) serveTo(q, s"$resultsDir/batch=$batchTag")
      else
        for (i <- 0 until parts)
          serveTo(q.filter(pmod(xxhash64(col("query_id")), lit(parts)) === i),
            s"$resultsDir/batch=$batchTag-p$i")
    } finally q.unpersist(): Unit
  }

  /** Streaming HYBRID entry point: parquet `(query_id, qv, qtext)`
    * drop in, per-query fused+diversified top-k generations out.
    */
  def startHybrid(
      spark: SparkSession,
      srcDir: String,
      indexDir: String,
      resultsDir: String,
      checkpointDir: String,
      k: Int = 10,
      nProbe: Int = 4,
      wide: Int = 50,
      narrow: Int = 20,
      availableNow: Boolean = true,
      excludeSelf: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .schema(hybridQuerySchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(srcDir)
    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        stepHybrid(spark, batch, s"$token-$batchId", indexDir, resultsDir,
          k, nProbe, wide, narrow, excludeSelf = excludeSelf)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  /** Result-root maintenance window (the index is frozen — rebuilds
    * are [[buildIndex]] calls, not folds).
    */
  def compact(spark: SparkSession, resultsDir: String): Unit =
    LakeCompact.withLeases(spark, Seq(resultsDir)) {
      LakeCompact.foldGenerations(spark, resultsDir, assumeLeased = true)
    }
}
