package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards for the 100 TB design rules: these
  * assert the properties `.explain` audits rely on, so a refactor that
  * silently degrades a plan (cartesian, lost broadcast) fails CI, not
  * the cluster.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    Catalog.byName(name).run(spark, sf).queryExecution.executedPlan.toString

  test("no catalog query plans a cartesian product") {
    val offenders = Catalog.all.flatMap { q =>
      val plan =
        try q.run(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("designed broadcasts are planned as broadcasts") {
    // c01: the small test-split side must broadcast (never shuffle the
    // train side by shingle)
    assert(planOf("c01_contamination").contains("BroadcastHashJoin"))
    // t05: the vocabulary-sized df table must broadcast
    assert(planOf("t05_tfidf_terms").contains("BroadcastHashJoin"))
    // q05: dimension tables broadcast into the fact scan
    assert(planOf("q05_regional_revenue").contains("BroadcastHashJoin"))
  }

  test("dedup pipelines never shuffle the corpus by raw text") {
    // the only text-keyed exchange allowed is d01's exact-dedup groupBy;
    // LSH-family exchanges must be hash/long-keyed (h64, doc_id, band)
    for (name <- Seq("d03_minhash_lsh", "d05_ngram_jaccard", "d11_incremental_neardup")) {
      val plan = planOf(name)
      assert(!plan.contains("hashpartitioning(shingle"),
        s"$name shuffles on the shingle string")
      assert(!plan.contains("hashpartitioning(text"),
        s"$name shuffles on raw text")
    }
  }

  test("IVF flavors broadcast their small sides, never shuffle the corpus to them") {
    // query vectors / posting-list probes join the corpus as broadcasts
    // (the centroid ASSIGNMENT itself no longer joins at all — next test)
    for (name <- Seq("s04_ivf_topk", "s04b_ivf_kmeans_topk",
        "d14_semdedup", "x05_cluster_mix", "s09_ivfpq_topk", "s11_filtered_topk")) {
      val plan = planOf(name)
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
        s"$name does not broadcast its centroids")
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }

  test("IVF assignment is a pure map over the corpus scan: zero exchanges, no window, no join") {
    // the most-reused ANN kernel (feeds s04/s04b/s06/s17/s20, d14, x05
    // and every x09/SemanticGate-adjacent index build): the centroid
    // argmax is a fold over a driver-collected array literal, so the
    // whole assignment must plan as scan -> project. The previous
    // crossJoin + row_number shape relied on an OPTIONAL partial
    // WindowGroupLimit to keep the exchange corpus-sized — this pins
    // the unconditional no-exchange shape instead (r14 verdict item).
    val plan = llm.Similarity.ivfAssign(Tables.embeddings(spark, sf), 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"IVF assignment shuffles:\n$plan")
    assert(!plan.contains("Window"), s"IVF assignment plans a window:\n$plan")
    assert(!plan.contains("Join"), s"IVF assignment plans a join:\n$plan")
  }

  test("PQ searchers broadcast the ADC array and shortlist, never the corpus") {
    // the ADC partials collapse to ONE broadcast array row and the
    // shortlist is `shortlist` ids — both must reach the corpus-sized
    // sides as broadcasts (BNLJ for the single-row array, BHJ for the
    // keyed joins); an exchange of the codes frame toward either would
    // shuffle the corpus to a 128-slot table. The in-row fold means no
    // plan may amplify the code scan PqM-fold through a Generate.
    for (name <- Seq("s08_pq_topk", "s09_ivfpq_topk", "s10_ivfpq_standing")) {
      val plan = planOf(name)
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
        s"$name does not broadcast the ADC array")
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }

  test("s10 searches a standing parquet code index, not a re-encoded corpus") {
    val plan = planOf("s10_ivfpq_standing")
    // the ADC-scoring stage must scan the persisted (vec_id, cid, pq)
    // index parquet...
    assert(plan.contains("graft_idx"), "standing index parquet not scanned")
    // ...and the float corpus appears only for the query row, the probe
    // table, the codebook, and the re-rank — strictly fewer embedding
    // scans than s09's self-contained in-query rebuild
    def embScans(p: String) = "embeddings".r.findAllMatchIn(p).length
    assert(embScans(plan) < embScans(planOf("s09_ivfpq_topk")),
      "standing search re-scans the float corpus as much as the rebuild path")
  }

  test("d15 probes a standing parquet lexical index") {
    // the search stage must scan the persisted shingle/band parquet,
    // not re-shingle the corpus (the delta side is the only text touch)
    val plan = planOf("d15_standing_neardup")
    assert(plan.contains("graft_idx"), "standing shingle/band parquet not scanned")
  }

  test("BM25 searchers broadcast df/dl and s13 probes the standing index") {
    // the posting join's small sides (query terms, vocabulary-sized df,
    // per-doc dl) must broadcast — an exchange of the postings toward
    // any of them would shuffle the corpus to a vocabulary-sized table
    for (name <- Seq("s12_bm25_topk", "s13_bm25_standing", "s14_hybrid_rrf")) {
      val plan = planOf(name)
      assert(plan.contains("BroadcastHashJoin"), s"$name does not broadcast df/dl")
      assert(plan.contains("WindowGroupLimit"), s"$name lost the partial top-k")
    }
    // the standing search must scan the persisted postings parquet
    assert(planOf("s13_bm25_standing").contains("graft_idx"),
      "s13 does not scan the standing postings index")
  }

  test("c03's test-shingle set broadcasts into the train-side left join") {
    val plan = planOf("c03_contamination_ratio")
    assert(plan.contains("BroadcastHashJoin"), "c03 shuffles the train side to the test set")
  }

  test("q53's merge apply is one key-partitioned full-outer join") {
    val plan = planOf("q53_merge_upsert")
    assert(plan.contains("FullOuter"), "q53 lost its full-outer merge join")
    // exactly one join in the apply: snapshot x collapsed delta
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length == 1,
      s"q53 plans more than the single merge join:\n$plan")
  }

  test("c02's bloom prefilter is a codegen expression, not a ScalaUDF") {
    // the probe runs on every train-side shingle — the hottest row path
    // of the operator. A ScalaUDF there breaks whole-stage codegen for
    // the entire scan+filter stage; Spark's native BloomFilterMightContain
    // (what the runtime-filter rewrite itself injects) keeps it fused.
    val plan = planOf("c02_contamination_bloom")
    assert(!plan.contains("ScalaUDF"), "c02 plans a ScalaUDF on the probe path")
    assert(plan.contains("might_contain"), "c02 lost its bloom prefilter")
  }

  test("per-row scan-shaped operators plan zero exchanges") {
    // the per-row text/embedding/media family must stay map-only: any
    // Exchange here means a refactor introduced a shuffle into an
    // operator whose 100 TB contract is "runs at scan speed"
    for (name <- Seq(
        "t01_lang_id", "t02_quality_score", "t03_token_count", "t04_fingerprint",
        "t08_normalize_unicode", "t09_pii_redact", "t10_gopher_rules",
        "e01_quantize_int8", "d04_simhash", "p01_split_assign", "m01_multimodal_meta",
        "m06_wav_decode", "m07_ppm_decode", "m08_png_decode", "m09_jpeg_decode",
        "m10_gif_frames", "m11_ulaw_decode", "m02_media_features", "m04_media_resize",
        "e03_binary_quantize", "p12_context_windows")) {
      val plan = planOf(name)
      assert(!plan.contains("Exchange"), s"$name plans a shuffle:\n$plan")
    }
  }

  test("m12's keeper election is a spillable window, never an in-memory group buffer") {
    // duplicate-heavy corpora are media dedup's NORMAL case (one viral
    // image × 10^8 copies = one content group): a
    // groupByKey.flatMapGroups `it.toSeq` holds the whole group on one
    // task's heap, while WindowExec buffers it in a spillable row
    // array. Assert the de-materialized shape — and that the single
    // content-key exchange is still the plan's only shuffle.
    val plan = planOf("m12_media_content_dedup")
    assert(!plan.contains("FlatMapGroups") && !plan.contains("AppendColumns"),
      s"m12 re-grew an object group buffer:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"),
      s"m12 aggregates through an object heap buffer:\n$plan")
    assert(plan.contains("Window"), s"m12 lost its window election:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"m12 should shuffle exactly once (the content key):\n$plan")
  }

  test("s27 searches the standing RQ code parquet, not a re-encoded corpus") {
    val plan = planOf("s27_rq_standing")
    assert(plan.contains("graft_idx"), "standing RQ index parquet not scanned")
    // the standing search must touch the float corpus strictly less
    // than s26's self-contained encode-and-search
    def embScans(p: String) = "embeddings".r.findAllMatchIn(p).length
    assert(embScans(plan) < embScans(planOf("s26_rq_refine")),
      "standing RQ search re-scans the float corpus as much as the rebuild path")
  }

  test("m14 rides m13's kernel: no sample shuffle, window election") {
    val plan = planOf("m14_audio_fingerprint")
    assert(plan.contains("Window"), s"m14 lost its window election:\n$plan")
    assert(!plan.contains("hashpartitioning(bytes") &&
      !plan.contains("hashpartitioning(samples"),
      s"m14 shuffles decoded audio:\n$plan")
  }

  test("m13's rasters never shuffle and the election rides the m12 window") {
    // the perceptual-hash graph prices in distinct-hash space: the only
    // corpus-sized exchanges may carry (id, token, long) signature rows
    // keyed on phash/cluster — a plan that shuffles the decoded blobs
    // or keys an exchange on the binary column has lost the design
    val plan = planOf("m13_phash_neardup")
    assert(plan.contains("Window"), s"m13 lost its window election:\n$plan")
    assert(!plan.contains("hashpartitioning(bytes") &&
      !plan.contains("hashpartitioning(rgb"),
      s"m13 shuffles raster bytes:\n$plan")
    assert(!plan.contains("FlatMapGroups") && !plan.contains("AppendColumns#"),
      s"m13 re-grew an object group buffer:\n$plan")
  }

  test("e04's two-level encode is a pure map: zero exchanges, zero joins") {
    // both codebooks (16 rows each) ride INSIDE the compiled
    // pq_residual_encode expression, so the whole two-level encode is
    // one projection over the corpus scan — the corpus must never
    // shuffle toward a codebook, and no join may reappear (the old
    // crossJoin(broadcast) + groupBy shape paid two corpus-keyed
    // hash-aggregate exchanges)
    val plan = planOf("e04_residual_pq")
    assert(plan.contains("pq_residual_encode"),
      s"e04 lost the compiled kernel:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"e04 re-grew a shuffle or join:\n$plan")
  }

  test("batch MMR runs in group tasks: no driver-computed relation re-enters the plan") {
    // s25/x08 (and x09/x10 through the same kernel) previously
    // collected the pairwise sims + relevance to the driver and
    // re-joined the greedy's picks as a LocalTableScan. The shared
    // HybridServe.mmrPicks kernel keeps the whole selection lazy
    // inside a per-query group task — the plan must show the group
    // stage and contain NO local relation (a LocalTableScan here
    // means a .collect() ran at plan-construction time)
    for (q <- Seq("s25_mmr_rerank", "x08_retrieval_serving")) {
      val plan = planOf(q)
      assert(plan.contains("MapGroups"),
        s"$q lost the group-task MMR stage:\n$plan")
      assert(!plan.contains("LocalTableScan"),
        s"$q re-grew a driver-computed local relation:\n$plan")
    }
  }

  test("e02's PQ encode is a pure map: zero exchanges, zero joins") {
    val plan = planOf("e02_pq_encode")
    assert(plan.contains("pq_encode"),
      s"e02 lost the compiled kernel:\n$plan")
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"e02 re-grew a shuffle or join:\n$plan")
  }

  test("t13's classifier inference is map-only: zero exchanges over the scan") {
    // the filtering pass that runs over EVERY crawled document must not
    // shuffle: a plan that grew an Exchange here would re-partition
    // 100 TB to compute a per-row scalar. The hash->weight->fold lives
    // in a projection directly over the batched parquet scan; the
    // aggregate() lambda itself is interpreted (higher-order functions
    // don't codegen) but the scan and final projection keep their
    // whole-stage spans (the *(n) markers).
    val plan = planOf("t13_classifier_score")
    assert(!plan.contains("Exchange"), s"t13 grew a shuffle:\n$plan")
    assert(plan.contains("*("), s"t13 lost its codegen spans entirely:\n$plan")
    assert(plan.contains("FileScan parquet") && plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"t13 should scan only (doc_id, text):\n$plan")
  }

  test("t12 broadcasts the vocab-sized context totals but shuffle-joins the bigram relation") {
    // the unigram left-context table is vocab-sized => broadcast; the
    // bigram-count relation grows with vocab² => must NOT be forced
    // into a broadcast (at real vocabularies it would OOM the driver;
    // the optimizer may still pick one at toy scale, so assert only
    // the broadcast that is REQUIRED, plus no cartesian)
    val plan = planOf("t12_bigram_surprisal")
    assert(plan.contains("BroadcastHashJoin"), s"t12 lost the context-total broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("s25's shortlist stages stay broadcast-shaped with a single-reduce pool") {
    // candidate generation is s01's pool: a TakeOrdered single reduce,
    // never a global sort; the pairwise stage runs over two ≤20-row
    // sides so any join there must be broadcast, not a shuffle
    val plan = planOf("s25_mmr_rerank")
    assert(plan.contains("TakeOrderedAndProject"), s"s25 pool is not single-reduce:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("x09 serves off BOTH standing indexes — nothing corpus-sized built in-query") {
    // the lexical arm must scan the persisted BM25 partials and the
    // dense arm the persisted IVF-PQ code index; the small relations
    // (query terms, df, dl, probes, ADC) broadcast, never the corpus
    val plan = planOf("x09_serving_standing")
    assert(plan.contains("x09_serving/bm25"), "x09 lost the standing BM25 scan")
    assert(plan.contains("x09_serving/ivf"), "x09 lost the standing IVF-PQ scan")
    assert(plan.contains("BroadcastHashJoin"), "x09's small relations must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("x10 serves off the standing RQ + BM25 indexes — nothing corpus-sized built in-query") {
    // x09's composition with the refined dense arm: the level-1/level-2
    // ADC passes must scan the persisted (vec_id, pq, pq2) code parquet
    // and frozen codebooks, the lexical arm the persisted BM25 partials
    val plan = planOf("x10_serving_rq")
    assert(plan.contains("x10_serving/bm25"), "x10 lost the standing BM25 scan")
    assert(plan.contains("x10_serving/rq"), "x10 lost the standing RQ code scan")
    assert(plan.contains("BroadcastHashJoin"), "x10's small relations must broadcast")
    assert(!plan.contains("CartesianProduct"))
    // the float corpus is touched only for the query row and the
    // narrow-shortlist re-rank, never re-encoded in-query
    assert(!plan.toLowerCase.contains("posexplode(transform(sequence(0, 7), s"),
      "x10 re-encodes embeddings in-query instead of reading the code parquet")
  }

  test("refined serving scans the standing release and broadcasts every query-sized side") {
    // the IVFADC+R serving kernel (ServeGate refineWide > 0): the only
    // corpus-sized relation is the (vec_id, cid, pq, pq2) code parquet
    // of the CURRENT release; probes, the wide shortlist, and both
    // dense ADC arrays must reach it as broadcasts — an exchange of
    // the member relation toward any of them would shuffle the corpus
    // to a query-batch-sized table
    val tmp = java.nio.file.Files.createTempDirectory("graft_plan_refine").toString
    val emb = Tables.embeddings(spark, sf)
    graft.streaming.ServeGate.buildIndex(spark, emb, tmp)
    val gen = graft.streaming.ServeGate.currentDir(spark, tmp)
    val queries = emb.limit(3)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("qv"))
    val plan = llm.Similarity.ivfPqRefineServeBatch(
      queries,
      spark.read.parquet(s"$gen/rows"),
      spark.read.parquet(s"$gen/cents"),
      spark.read.parquet(s"$gen/books"),
      spark.read.parquet(s"$gen/books2"),
      10, 4, 40).queryExecution.executedPlan.toString
    assert(plan.contains("gen-"), "refined serving does not scan the standing release")
    assert(plan.contains("BroadcastHashJoin"),
      "refined serving lost its broadcast joins toward the code scan")
    assert(!plan.contains("CartesianProduct"), "refined serving plans a cartesian")
  }

  test("hybrid serving scans one release; every corpus-sized relation is probed via broadcast") {
    // the batched x10 composition (ServeGate.stepHybrid's kernel): the
    // corpus-sized relations are the (cid, pq, pq2) code parquet, the
    // embs float relation and the bm25 postings — each may be SCANNED,
    // but every join toward them must arrive as a broadcast of a
    // bounded side (queries, probes, ADC arrays, the narrow set, the
    // fused pool); floats are touched only by the narrow re-rank and
    // the ≤ 20-member MMR pool
    val tmp = java.nio.file.Files.createTempDirectory("graft_plan_hybrid").toString
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    graft.streaming.ServeGate.buildHybridIndex(spark, emb, docs, tmp)
    val gen = graft.streaming.ServeGate.currentDir(spark, tmp)
    val queries = emb.join(docs,
        org.apache.spark.sql.functions.col("vec_id") ===
          org.apache.spark.sql.functions.col("doc_id"))
      .limit(3)
      .selectExpr("vec_id AS query_id", "embedding AS qv", "text AS qtext")
    val plan0 = llm.HybridServe.hybridServeBatch(
      queries,
      spark.read.parquet(s"$gen/rows"),
      spark.read.parquet(s"$gen/cents"),
      spark.read.parquet(s"$gen/books"),
      spark.read.parquet(s"$gen/books2"),
      spark.read.parquet(s"$gen/embs"),
      spark.read.parquet(s"$gen/bm25/postings"),
      spark.read.parquet(s"$gen/bm25/df"),
      spark.read.parquet(s"$gen/bm25/dl"),
      spark.read.parquet(s"$gen/bm25/stats")).queryExecution
    val plan = plan0.executedPlan.toString
    // executedPlan.toString truncates scan locations (and AQE hides the
    // scan nodes from collect) — the formatted explain prints each
    // scan's full Location
    val scanned = plan0.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(scanned.contains("gen-"), "hybrid serving does not scan the standing release")
    for (rel <- Seq("embs", "bm25/postings", "rows"))
      assert(scanned.contains(rel), s"hybrid serving lost the standing $rel scan:\n$scanned")
    assert(plan.contains("BroadcastHashJoin"),
      "hybrid serving lost its broadcast joins toward the corpus scans")
    assert(!plan.contains("CartesianProduct"), "hybrid serving plans a cartesian")
  }

  test("salted aggregation plans two phases: salt-keyed then key-only exchange") {
    val plan = planOf("q50_salted_agg")
    // phase 1 shuffles on (key, salt) — the hot key spread over buckets;
    // phase 2 shuffles the bucket partials on the key alone
    assert(plan.contains("__salt"), "salt column missing from the plan")
    val exchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.exists(e => e.contains("l_returnflag") && e.contains("__salt")),
      s"no salt-keyed exchange in: $exchanges")
    assert(exchanges.exists(e => e.contains("l_returnflag") && !e.contains("__salt")),
      s"no key-only merge exchange in: $exchanges")
  }

  test("mergeable-sketch entries keep sketch aggregation object-hash-shaped") {
    // q47/q48: DataSketches states aggregate through ObjectHashAggregate
    // (partial per partition, merge after one exchange) — a fallback to
    // SortAggregate would mean per-group sorting of sketch states
    for (name <- Seq("q47_approx_top_k", "q48_theta_distinct")) {
      val plan = planOf(name)
      assert(plan.contains("ObjectHashAggregate"), s"$name lost object-hash aggregation")
      assert(!plan.contains("SortAggregate"), s"$name fell back to SortAggregate")
    }
  }

  test("variant shreds parse each payload once, never per access") {
    // b10/q46: the JSON text must enter the binary VARIANT encoding in
    // ONE projection, with every per-variant field a variant_get over
    // that column. If a refactor lets CollapseProject (or inlining)
    // duplicate the parse per extraction, the scan re-parses text 4x —
    // the exact per-access cost VARIANT exists to remove.
    for (name <- Seq("b10_action_variant_shred", "q46_variant")) {
      val plan = planOf(name)
      // the parse appears as static_invoke(VariantExpressionEvalUtils.parseJson(...))
      val parses = "parseJson|parse_json".r.findAllIn(plan).length
      assert(parses == 1, s"$name should parse once, found $parses parses:\n$plan")
      assert(plan.contains("variant_get"), s"$name lost its typed variant_get extraction")
    }
  }

  test("grouped top-k plans a PARTIAL WindowGroupLimit before the exchange") {
    // q08 (rank<=k per brand): Spark 4 plans partial+final
    // WindowGroupLimitExec, so the shuffle carries at most k rows per
    // group per map partition instead of the whole fact table. A
    // refactor that breaks the rank-filter pattern (e.g. computing rank
    // in one select and filtering in a later, non-adjacent one) silently
    // loses this — the 100x-scale difference between "shuffle k*groups
    // rows" and "shuffle everything, sort, then filter".
    val plan = planOf("q08_brand_topk")
    val firstLimit = plan.indexOf("WindowGroupLimit")
    assert(firstLimit >= 0, "no WindowGroupLimit planned for q08")
    assert(plan.indexOf("WindowGroupLimit", firstLimit + 1) > 0,
      "expected both partial and final WindowGroupLimit")
  }

  test("pool-then-refine retrieval plans a single-reduce TakeOrdered, never a global sort") {
    // s15/s16/s18/p11: the corpus-wide stage must be TakeOrderedAndProject
    // (per-partition top-N + one reduce); a Sort + Limit pair instead
    // would globally sort the corpus to take 10-100 rows. The global
    // Window these entries carry runs AFTER the pool/shortlist bound,
    // over <= 100 rows — a plan where Sort feeds the full corpus into
    // Window is the regression this guards against.
    for (name <- Seq("s15_diverse_topk", "s16_matryoshka_topk",
        "s18_hamming_topk", "p11_weighted_sample")) {
      val plan = planOf(name)
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name lost its single-reduce top-N:\n$plan")
    }
  }

  test("v07's vocabulary joins the token stream as a broadcast, never a shuffle join") {
    // the type-count aggregate legitimately shuffles once on term to
    // BUILD the vocab; the coverage JOIN of the corpus token stream
    // against that vocab must be a broadcast, not a second term-keyed
    // sort-merge of the full stream
    val plan = planOf("v07_vocab_coverage")
    assert(plan.contains("BroadcastHashJoin"), "vocab must broadcast into the token scan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "the coverage join must not shuffle the corpus token stream")
  }

  test("s19's corpus-wide hamming pass scans the standing code index, floats only at re-rank") {
    val plan = planOf("s19_hamming_standing")
    assert(plan.contains("s19_bincodes"), "first pass must scan the persisted code parquet")
    // exactly two embeddings-table scans: the query-vector lookup and
    // the 50-row re-rank join — a third would mean the corpus-wide
    // pass re-derived codes from the floats
    val embScans = "Scan parquet[^\\n]*embeddings".r.findAllIn(plan).length
    assert(embScans <= 2, s"expected <= 2 embeddings scans, found $embScans:\n$plan")
  }
}
