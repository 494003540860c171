package graft

import graft.llm.{Dedup, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the LLM-pipeline operators (exact-value
  * parity vs DuckDB is tools/check.py's job).
  */
class LlmSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val embs = Tables.embeddings(spark, sf)

  test("md5_prefix64 equals the conv(substr(md5)) formulation it replaces") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples = Seq("", "a", "hello world", "ünïcødé ☃", "x" * 1000) ++
      (0 until 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val rows = samples.toDF("s").select(
      graft.functions.ColumnFns.md5_prefix64(col("s")).as("native"),
      expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").as("sqlform"),
      expr("md5_prefix64(s)").as("registered")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == r.getLong(2))
    }
  }

  test("nfc_normalize composes combining sequences, is idempotent, identity on ASCII") {
    import spark.implicits._
    val composed = "café" // U+00E9
    val decomposed = "café" // e + U+0301
    val rows = Seq(decomposed, composed, "plain ascii", "", "ÅB̈") // Å B̈
      .toDF("s")
      .select(
        col("s"),
        graft.functions.ColumnFns.nfc_normalize(col("s")).as("n1"),
        graft.functions.ColumnFns.nfc_normalize(
          graft.functions.ColumnFns.nfc_normalize(col("s"))).as("n2"),
        length(col("s")).as("len_raw"),
        length(graft.functions.ColumnFns.nfc_normalize(col("s"))).as("len_nfc"))
      .collect()
    assert(rows(0).getString(1) == composed && rows(0).getInt(3) == 5 && rows(0).getInt(4) == 4)
    assert(rows(1).getString(1) == composed) // already-composed input unchanged
    assert(rows(2).getString(1) == "plain ascii")
    assert(rows(3).getString(1) == "")
    assert(rows(4).getString(1) == "ÅB̈" && rows(4).getInt(4) == 3)
    rows.foreach(r => assert(r.getString(1) == r.getString(2), s"not idempotent: ${r.getString(0)}"))
  }

  test("graft expressions reject wrong-typed input at analysis time, not runtime") {
    // ExpectsInputTypes: a mistyped call through the SQL-registered name
    // must fail with a clean DATATYPE_MISMATCH during analysis instead of
    // a ClassCastException inside eval/codegen
    import spark.implicits._
    val df = Seq(1).toDF("i")
    // (zorder2 is ImplicitCastInputTypes, so a string arg is coerced
    // like any numeric builtin's — an ARRAY arg has no coercion path
    // and must still fail analysis)
    for (bad <- Seq("nfc_normalize(i)", "simhash48(i)", "md5_prefix64(i)",
        "zorder2(array(i), cast(i as bigint))")) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(expr(bad)).collect()
      }
      assert(ex.getMessage.toLowerCase.contains("mismatch"), s"$bad: ${ex.getMessage}")
    }
  }

  test("pii redaction scrubs emails, IPs and phones; counts match; clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      "mail me at jo.doe+spam@sub.example.org thanks",
      "server 192.168.001.1 then call 555-867-5309",
      "nothing sensitive here 12.5 percent, v1.2.3.4.5 is a version",
      "a@b.co and 1.2.3.4 and 800 555 1234").toDF("text")
      .select(
        graft.llm.TextAnalysis.piiRedact(col("text")).as("red"),
        regexp_count(col("text"), lit(graft.llm.TextAnalysis.EmailRe)).as("ne"),
        regexp_count(col("text"), lit(graft.llm.TextAnalysis.Ipv4Re)).as("ni"),
        regexp_count(col("text"), lit(graft.llm.TextAnalysis.PhoneRe)).as("np"))
      .collect()
    assert(rows(0).getString(0) == "mail me at <EMAIL> thanks" && rows(0).getInt(1) == 1)
    assert(rows(1).getString(0) == "server <IP> then call <PHONE>")
    assert(rows(1).getInt(2) == 1 && rows(1).getInt(3) == 1)
    // 1.2.3.4.5: the first 4 octets match the unanchored IPv4 shape —
    // redaction is recall-biased by design; the decimal 12.5 survives
    assert(rows(2).getString(0).contains("12.5 percent"))
    assert(rows(3).getString(0) == "<EMAIL> and <IP> and <PHONE>")
  }

  test("minhash-LSH finds the planted near-duplicates and nothing below threshold") {
    val pairs = Catalog.byName("d03_minhash_lsh").run(spark, sf).collect()
    assert(pairs.nonEmpty, "generator plants jaccard≈1.0 pairs; LSH must surface them")
    assert(pairs.forall(_.getAs[Double]("jac") >= 0.8))
  }

  test("LSH candidates are a superset of exact high-jaccard pairs") {
    // recall check: every exact pair >= 0.8 from the inverted index must
    // also be caught by banding (r=2,k=8 => ~1.0 prob at jac 0.8)
    val exact = Catalog.byName("d05_ngram_jaccard").run(spark, sf)
      .filter(col("jac") >= 0.8).select("d1", "d2")
    val lsh = Catalog.byName("d03_minhash_lsh").run(spark, sf).select("d1", "d2")
    assert(exact.except(lsh).count() == 0)
  }

  test("d05 amplified banding recall >= 0.9 vs brute-force jaccard >= 0.5") {
    // pins the K2 docstring's recall claim: the r=2 amplified banding
    // trades <= 10% recall at the 0.5 boundary for collision-bounded
    // candidates. Ground truth = full inverted-index self-join (all
    // pairs sharing any capped shingle can reach jac >= 0.5; feasible
    // at this sf, exactly what banding exists to avoid at scale).
    val sh = Dedup.shingleIndex(Dedup.shingles(docs), graft.llm.LlmQueries.MaxDf)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("d1"), col("h64"))
      .join(sh.select(col("doc_id").as("d2"), col("h64")), "h64")
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    val exact = inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .filter(round(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 4) >= 0.5)
      .select("d1", "d2")
    val nExact = exact.count()
    assert(nExact > 0, "planted near-dups must produce jac >= 0.5 ground-truth pairs")
    val missed = exact.except(
      Catalog.byName("d05_ngram_jaccard").run(spark, sf).select("d1", "d2")).count()
    assert(missed.toDouble / nExact <= 0.1,
      s"amplified banding missed $missed of $nExact ground-truth pairs")
  }

  test("adaptiveBandBits: floor of 4 covers every graded SF; integer boundaries exact") {
    import graft.llm.Similarity.adaptiveBandBits
    // graded corpora (50 / 500 / 2000 vecs) must all land on the
    // historical 16-plane/4-bit banding — outputs unchanged there
    assert(Seq(50L, 500L, 2000L, 2048L).forall(adaptiveBandBits(_) == 4))
    // boundary exactness is why the formula is integer bit-length, not
    // float ceil(log2): 2048 -> 4 and 2049 -> 5 on BOTH engines
    assert(adaptiveBandBits(2049) == 5)
    assert(adaptiveBandBits(4096) == 5)
    assert(adaptiveBandBits(20000) == 8)
    assert(adaptiveBandBits(1L << 30) == 23)
  }

  test("native simhash48 equals the HOF formulation row-for-row") {
    import spark.implicits._
    val edge = Seq(
      (9000L, ""), (9001L, " "), (9002L, "one"), (9003L, "a  b"),
      (9004L, "trailing space "), (9005L, ("w " * 200).trim))
      .toDF("doc_id", "text")
    val sample = docs.select("doc_id", "text").limit(100).union(edge)
    val mismatches = sample.select(
      Dedup.simhash().as("native"), Dedup.simhashHof().as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("simhash: near-dup pairs have small hamming distance") {
    val sim = Catalog.byName("d04_simhash").run(spark, sf)
    val pairs = Catalog.byName("d03_minhash_lsh").run(spark, sf)
    val withSig = pairs
      .join(sim.withColumnRenamed("doc_id", "d1").withColumnRenamed("simhash", "h1"), "d1")
      .join(sim.withColumnRenamed("doc_id", "d2").withColumnRenamed("simhash", "h2"), "d2")
      .withColumn("ham", expr("bit_count(h1 ^ h2)"))
    val maxHamDup = withSig.agg(max("ham")).collect()(0).getInt(0)
    assert(maxHamDup <= 12, s"near-dups should be hamming-close, got $maxHamDup")
  }

  test("d12: banded hamming pairs equal the brute-force all-pairs recount") {
    val sigs = Catalog.byName("d04_simhash").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 3
    } yield (d1, d2, h.toLong)).toSet
    val got = Catalog.byName("d12_simhash_neardup").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected) // pigeonhole banding is lossless at <= 3 flips
    assert(expected.nonEmpty) // planted near-dups make this non-vacuous
  }

  test("x03: suite slices equal the standalone d03/d05 outputs") {
    val suite = Catalog.byName("x03_dedup_suite").run(spark, sf).collect()
      .groupBy(_.getAs[String]("family"))
      .map { case (f, rs) =>
        f -> rs.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Double]("jac"))).toSet
      }
    def pairsOf(name: String) = Catalog.byName(name).run(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Double]("jac"))).toSet
    assert(suite("minhash08") == pairsOf("d03_minhash_lsh"))
    assert(suite("jaccard05") == pairsOf("d05_ngram_jaccard"))
    // exact slice: one pair row per duplicated fingerprint pair
    val nDupPairs = Catalog.byName("d02_dedup_fingerprint").run(spark, sf).collect()
      .map(_.getAs[Long]("n_copies")).map(n => n * (n - 1) / 2).sum
    assert(suite.getOrElse("exact", Set.empty).size == nDupPairs)
  }

  test("d10: semantic pairs are cos-verified; lexical near-dups among them carry high jaccard") {
    val sem = Catalog.byName("d10_semantic_dedup").run(spark, sf).cache()
    assert(sem.count() > 0)
    assert(sem.filter(col("cos") < 0.4).count() == 0)
    // every lexical near-dup pair (d03) that band-collides semantically
    // must show its jaccard here, not 0
    val lex = Catalog.byName("d03_minhash_lsh").run(spark, sf).select("d1", "d2")
    val overlap = sem.join(lex, Seq("d1", "d2"))
    assert(overlap.filter(col("jac") < 0.8).count() == 0,
      "a d03-verified pair annotated by d10 must carry its true jaccard")
    sem.unpersist()
  }

  test("d11: incremental pairs are exactly d03's pairs that straddle the corpus/delta split") {
    val inc = Catalog.byName("d11_incremental_neardup").run(spark, sf)
    val all = Catalog.byName("d03_minhash_lsh").run(spark, sf)
    val u = graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast(org.apache.spark.sql.types.StringType)) /
      lit(1152921504606846976.0)
    val split = docs.select(col("doc_id"), (u < 0.8).as("in_corpus"))
    // d03 pairs with exactly one side in the corpus, normalized to (corpus, delta)
    val crossing = all
      .join(split.select(col("doc_id").as("d1"), col("in_corpus").as("c1")), "d1")
      .join(split.select(col("doc_id").as("d2"), col("in_corpus").as("c2")), "d2")
      .filter(col("c1") =!= col("c2"))
      .select(
        when(col("c1"), col("d1")).otherwise(col("d2")).as("corpus_doc"),
        when(col("c1"), col("d2")).otherwise(col("d1")).as("delta_doc"),
        col("jac"))
    assert(inc.except(crossing).count() == 0 && crossing.except(inc).count() == 0)
  }

  test("s05: quantized-first top-k recalls most of the exact top-10") {
    val exact = Catalog.byName("s01_cosine_topk").run(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Catalog.byName("s05_quantized_topk").run(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(quant).size.toDouble / exact.size
    assert(recall >= 0.7, s"int8 first-pass recall $recall too low — " +
      "30 candidates for top-10 should survive quantization noise")
  }

  test("cosine top-k is the true argmax set (vs full scan)") {
    val top = Catalog.byName("s01_cosine_topk").run(spark, sf).collect()
    assert(top.length == 10)
    val scores = top.map(_.getAs[Double]("cos"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "sorted desc")
    assert(scores.forall(s => s >= -1.0000001 && s <= 1.0000001))
    // the k-th score must dominate every non-returned vector's score
    val q = embs.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val allScores = embs.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(round(graft.llm.Similarity.cosine(col("embedding"), col("qv")), 6).as("cos"))
      .collect().map(_.getDouble(0)).sorted(Ordering[Double].reverse)
    assert(scores.last >= allScores(10) - 1e-9)
  }

  test("ann join reports one banded-candidate argmax per vector") {
    val ann = Catalog.byName("s03_ann_join").run(spark, sf)
    // exactly one row (the top-1) per vec_id
    assert(ann.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
    // every reported pair must be a banded-LSH candidate (collide in >= 1 band)
    val cand = graft.llm.Similarity.bandedCandidates(embs, planes = 16, bandBits = 4)
    val directed = cand.select(col("v1").as("vec_id"), col("v2").as("neighbor_id"))
      .unionAll(cand.select(col("v2").as("vec_id"), col("v1").as("neighbor_id")))
    assert(ann.select("vec_id", "neighbor_id").except(directed).count() == 0)
  }

  test("s06: delta-only IVF append equals a full index rebuild") {
    import org.apache.spark.sql.functions.{col, expr}
    val emb = Tables.embeddings(spark, sf)
    val indexed = emb.filter(expr("vec_id % 10 != 7"))
    val delta = emb.filter(expr("vec_id % 10 = 7"))
    val cents = indexed.orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // per-row assignment => appending only the delta to the standing
    // index is bit-identical to rebuilding from scratch
    val appended = llm.Similarity.ivfAssignWith(indexed, cents)
      .union(llm.Similarity.ivfAssignWith(delta, cents))
      .select("vec_id", "cid")
    val rebuilt = llm.Similarity.ivfAssignWith(emb, cents)
      .select("vec_id", "cid")
    assert(appended.except(rebuilt).isEmpty && rebuilt.except(appended).isEmpty)
  }

  test("ivfAssignWith: degenerate (null/empty) embeddings assign the LOWEST cid, never -1") {
    // the fold's init cid is -1; a null cosine must not let a vector
    // silently keep it — cid=-1 is a posting list no probe path ever
    // visits, so the vector would become unreachable. The pre-fold
    // window shape assigned the lowest cid on degenerate inputs (nulls
    // last under sim DESC, row_number by cid ASC) and the fold must
    // reproduce that.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("label", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(1L, 0, Seq(1.0f, 0.0f)),
      Row(2L, 0, null),            // null embedding
      Row(3L, 0, Seq.empty[Float]) // empty embedding (zero norm => null cosine)
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val cents = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(5L, Seq(1.0f, 0.0f)), Row(9L, Seq(0.0f, 1.0f)))),
      StructType(Seq(StructField("cid", LongType),
        StructField("cv", ArrayType(FloatType)))))
    val got = llm.Similarity.ivfAssignWith(df, cents)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 5L, "a real vector still argmaxes")
    assert(got(2L) == 5L, "null embedding -> lowest cid, not -1")
    assert(got(3L) == 5L, "empty embedding -> lowest cid, not -1")
  }

  test("s10: appended standing IVF-PQ index equals a full rebuild, search equals s09") {
    import org.apache.spark.sql.functions.{col, expr}
    val emb = Tables.embeddings(spark, sf)
    val cents = llm.Similarity.sampledCentroids(emb, 16)
    val books = llm.Similarity.sampledCodebooks(emb)
    // frozen quantizer+codebook => per-row assignment => base+delta
    // append is bit-identical to encoding the whole corpus at once
    val appended = llm.Similarity
      .ivfPqIndexRows(emb.filter(expr("vec_id % 10 != 7")), cents, books)
      .union(llm.Similarity.ivfPqIndexRows(emb.filter(expr("vec_id % 10 = 7")), cents, books))
    val rebuilt = llm.Similarity.ivfPqIndexRows(emb, cents, books)
    assert(appended.except(rebuilt).isEmpty && rebuilt.except(appended).isEmpty)
    // and the standing-index search answers exactly like s09's
    // self-contained rebuild at the same (16, 4, 50, 10) parameters
    val standing = Catalog.byName("s10_ivfpq_standing").run(spark, sf).collect()
    val inline = Catalog.byName("s09_ivfpq_topk").run(spark, sf).collect()
    assert(standing.map(_.toString).toSeq == inline.map(_.toString).toSeq)
  }

  test("s04b: k-means quantizer recalls at least as well as the sampled one") {
    val brute = Catalog.byName("s01_cosine_topk").run(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Int = {
      val rows = df.collect()
      assert(rows.length == 10, s"search returned ${rows.length} rows")
      (brute & rows.map(_.getAs[Long]("vec_id")).toSet).size
    }
    val sampled = recall(Catalog.byName("s04_ivf_topk").run(spark, sf))
    val kmeans = recall(
      llm.Similarity.ivfTopKWith(embs, 0L, 10, llm.Similarity.kmeansCentroids(embs, 16, 2), 4))
    assert(kmeans >= sampled,
      s"Lloyd refinement lost recall: kmeans=$kmeans/10 sampled=$sampled/10")
    // and the catalog entry's absolute recall floor (>= 8/10) holds
    val entry = Catalog.byName("s04b_ivf_kmeans_topk").run(spark, sf).collect()
    assert(entry.length == 1 && entry(0).getAs[Long]("kmeans_recall_ok") == 1L)
    // and the refined centroids actually moved off the seed vectors
    val seed = graft.llm.Similarity.sampledCentroids(embs, 16)
      .selectExpr("cid", "transform(cv, x -> cast(x as double)) as cv").collect()
      .map(r => r.getAs[Long]("cid") -> r.getSeq[Double](1)).toMap
    val trained = graft.llm.Similarity.kmeansCentroids(embs, 16, 2).collect()
      .map(r => r.getAs[Long]("cid") -> r.getSeq[Double](1)).toMap
    assert(trained.keySet == seed.keySet)
    assert(trained.exists { case (cid, cv) => cv != seed(cid) }, "centroids never moved")
  }

  test("IVF top-k probes posting lists and recalls most of the brute-force top-10") {
    val brute = Catalog.byName("s01_cosine_topk").run(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = Catalog.byName("s04_ivf_topk").run(spark, sf).collect()
    assert(ivf.length == 10)
    val ivfIds = ivf.map(_.getAs[Long]("vec_id")).toSet
    // 4 of 16 probes scan ~1/4 of the corpus; measured recall@10 is 0.9
    // at sf0.001 — assert a conservative floor
    assert((brute & ivfIds).size >= 5, s"recall too low: ${(brute & ivfIds).size}/10")
    // every result must come from a probed posting list
    val assign = graft.llm.Similarity.ivfAssign(embs, 16)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = assign.filterKeys(ivfIds.contains).values.toSet
    assert(probed.size <= 4, s"results span ${probed.size} centroids, nProbe=4")
  }

  test("d15: standing lexical index equals a full rebuild; search answers match d11 exactly") {
    // running the entry builds the base+append parquet index eagerly
    val standingAns = Catalog.byName("d15_standing_neardup").run(spark, sf)
    val inlineAns = Catalog.byName("d11_incremental_neardup").run(spark, sf)
    assert(standingAns.except(inlineAns).isEmpty && inlineAns.except(standingAns).isEmpty,
      "standing-index search diverged from the in-query rebuild")
    // base + appended batches against the frozen stop set must equal a
    // single-shot encode of the whole corpus (the s06/s10 equivalence
    // claim, lexical edition)
    val docsAll = Tables.documents(spark, sf)
    val u = graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast("string")) /
      lit(1152921504606846976.0)
    val rebuilt = Dedup
      .bandTable(Dedup.minhashSigs(Dedup.shingleIndex(Dedup.shingles(docsAll), 1000), 8), 8, 2)
      .join(docsAll.filter(u < 0.8).select("doc_id"), "doc_id")
      .select("doc_id", "band", "bv")
    val standing = spark.read.parquet("target/graft_idx/d15_neardup/bands")
      .select("doc_id", "band", "bv")
    assert(standing.except(rebuilt).isEmpty && rebuilt.except(standing).isEmpty,
      "append ≠ rebuild for the standing band table")
  }

  test("s11: filtered top-k returns only predicate rows, from probed lists, with fair recall") {
    val rows = Catalog.byName("s11_filtered_topk").run(spark, sf).collect()
    assert(rows.length == 10, s"filtered search returned ${rows.length} rows")
    assert(rows.forall(_.getAs[Int]("label") % 2 == 1), "a non-matching row leaked through")
    // descending cosine, vec_id tiebreak
    val cs = rows.map(r => (-r.getAs[Double]("cos"), r.getAs[Long]("vec_id")))
    assert(cs.sameElements(cs.sorted), "results not ranked by cosine desc")
    // pre-filter semantics: recall vs the FILTERED brute force (a
    // post-filter on s04's unfiltered answer could keep as few as
    // k/2 matches; pre-filter must find most of the true filtered top-10)
    val brute = llm.Similarity
      .topK(embs.filter(col("label") % 2 === 1 || col("vec_id") === 0L), 0L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val got = rows.map(_.getAs[Long]("vec_id")).toSet
    assert((brute & got).size >= 5, s"filtered recall too low: ${(brute & got).size}/10")
    // every result still comes from one of the <= 4 probed posting lists
    val assign = graft.llm.Similarity.ivfAssign(embs, 16)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.map(assign).size <= 4, "results span more lists than nProbe")
  }

  test("t10: gopher rule flags agree with independently recomputed statistics") {
    val flags = Catalog.byName("t10_gopher_rules").run(spark, sf).collect()
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(flags.length == texts.size)
    val markers = graft.llm.TextAnalysis.markers("en").toSet
    for (r <- flags) {
      val text = texts(r.getAs[Long]("doc_id"))
      val words = text.split(" ", -1)
      assert(r.getAs[Long]("n_words") == words.length)
      val mwl = BigDecimal(text.replace(" ", "").length.toDouble / words.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("mean_word_len") - mwl) < 1e-9)
      val hits = words.distinct.count(markers.contains)
      assert(r.getAs[Long]("stop_hits") == hits)
      val expect = Seq(
        r.getAs[Long]("r_len") == (if (words.length >= 50 && words.length <= 100000) 1L else 0L),
        r.getAs[Long]("r_word_len") == (if (mwl >= 3.0 && mwl <= 10.0) 1L else 0L),
        r.getAs[Long]("r_stopwords") == (if (hits >= 2) 1L else 0L))
      assert(expect.forall(identity), s"doc ${r.getAs[Long]("doc_id")} rule flags diverged")
      val prod = r.getAs[Long]("r_len") * r.getAs[Long]("r_word_len") *
        r.getAs[Long]("r_symbols") * r.getAs[Long]("r_stopwords")
      assert(r.getAs[Long]("gopher_pass") == prod)
    }
    // the rule set must actually discriminate on this corpus (a filter
    // that passes or fails everything tests nothing)
    val passes = flags.count(_.getAs[Long]("gopher_pass") == 1L)
    assert(passes > 0 && passes < flags.length, s"degenerate rule set: $passes/${flags.length}")
  }

  test("e02: PQ codes pack 8 4-bit subspace codes into 32 bits, total over the corpus") {
    val codes = Catalog.byName("e02_pq_encode").run(spark, sf).cache()
    assert(codes.count() == embs.count())
    // every code fits the 8 x 4-bit layout
    assert(codes.filter(col("pq") < 0L || col("pq") >= (1L << 32)).count() == 0)
    // codebook vectors must encode to themselves in every subspace
    // (distance 0 to their own codeword): vec i < 16 -> all nibbles = i
    val self = codes.filter(col("vec_id") < graft.llm.Similarity.PqCodewords)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    for ((id, pq) <- self; s <- 0 until graft.llm.Similarity.PqM)
      assert(((pq >> (4 * s)) & 15L) == id,
        s"codebook vector $id not self-coded in subspace $s (pq=$pq)")
    codes.unpersist()
  }

  test("e04: residual PQ agrees with e02 at level 1 and never worsens the error") {
    val rq = Catalog.byName("e04_residual_pq").run(spark, sf).cache()
    val n = embs.count()
    assert(rq.count() == n)
    // level-1 codes are EXACTLY e02's codes (same codebooks, same argmin)
    val e02codes = Catalog.byName("e02_pq_encode").run(spark, sf)
    assert(rq.select("vec_id", "pq").exceptAll(e02codes).count() == 0)
    // both code words fit the 8 x 4-bit layout
    assert(rq.filter(col("pq2") < 0L || col("pq2") >= (1L << 32)).count() == 0)
    // level-1 codebook vectors encode to themselves: err1 = 0
    assert(rq.filter(col("vec_id") < graft.llm.Similarity.PqCodewords)
      .filter(col("err1") =!= 0.0).count() == 0)
    // level-2 codebook donors (vectors 16..31): their residual IS a
    // level-2 codeword, so the refinement must zero them out
    assert(rq.filter(col("vec_id") >= graft.llm.Similarity.PqCodewords &&
        col("vec_id") < 2 * graft.llm.Similarity.PqCodewords)
      .filter(col("err2") =!= 0.0).count() == 0)
    // refinement: err2 strictly improves on average (the point of RQ)
    val Array(m1, m2) = rq.agg(avg("err1"), avg("err2")).collect()(0)
      .toSeq.map(_.asInstanceOf[Double]).toArray
    assert(m2 < m1, s"mean err2 $m2 not below mean err1 $m1")
    rq.unpersist()
  }

  test("s26: the residual refinement never hurts narrow-cut recall and the answer is exact-ranked") {
    val out = Catalog.byName("s26_rq_refine").run(spark, sf).collect()
    assert(out.length == 10)
    // the k results are exact cosines in strictly resolved order
    val cosines = out.map(_.getAs[Double]("cos")).toSeq
    assert(cosines == cosines.sorted.reverse)
    // recall of the exact top-10 through the refined narrow-20 cut
    // vs the UNREFINED (level-1 ADC only) narrow-20 cut: refinement
    // exists to not lose finalists between wide and narrow
    val exact = Catalog.byName("s01_cosine_topk").run(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val refined = out.map(_.getLong(0)).count(exact)
    val unrefined = Catalog.byName("s08_pq_topk").run(spark, sf)
      .collect().map(_.getLong(0)).count(exact)
    assert(refined >= 5, s"refined recall $refined/10 too low")
    info(s"refined recall $refined/10 vs s08 (50-deep unrefined) $unrefined/10")
  }

  test("s27: appended standing RQ index equals a full rebuild, search equals s26") {
    import graft.llm.Similarity
    // build the catalog entry's index (base %10!=7 overwritten, delta
    // %10==7 appended against the same frozen books)
    val standing = Catalog.byName("s27_rq_standing").run(spark, sf).collect()
    val idxDir = new java.io.File("target/graft_idx/s27_rq").getAbsolutePath
    val rows = spark.read.parquet(s"$idxDir/rows")
    // append ≡ rebuild: one-shot encode of the whole corpus against
    // the same frozen books is bit-identical to the two-batch index
    val books = spark.read.parquet(s"$idxDir/books")
    val books2 = spark.read.parquet(s"$idxDir/books2")
    val rebuilt = Similarity.residualPqEncodeWith(embs, books, books2)
      .select("vec_id", "pq", "pq2")
    assert(rows.exceptAll(rebuilt).count() == 0 && rebuilt.exceptAll(rows).count() == 0)
    // the standing search answers exactly like the in-query s26
    val inQuery = Catalog.byName("s26_rq_refine").run(spark, sf).collect()
    assert(standing.map(_.toString).toSeq == inQuery.map(_.toString).toSeq)
  }

  test("s08: PQ-ADC shortlist re-rank recalls most of the brute-force top-10") {
    val brute = Catalog.byName("s01_cosine_topk").run(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val pq = Catalog.byName("s08_pq_topk").run(spark, sf).collect()
    assert(pq.length == 10)
    val pqIds = pq.map(_.getAs[Long]("vec_id")).toSet
    // 32-bit codes + 50-deep shortlist: assert a conservative floor
    // (the re-rank is exact, so misses can only come from ADC ranking
    // a true top-10 vector below the shortlist cut)
    assert((brute & pqIds).size >= 5, s"recall too low: ${(brute & pqIds).size}/10")
  }

  test("s09: IVF-PQ results come only from probed posting lists and recall reasonably") {
    val brute = Catalog.byName("s01_cosine_topk").run(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val out = Catalog.byName("s09_ivfpq_topk").run(spark, sf).collect()
    assert(out.length == 10)
    val ids = out.map(_.getAs[Long]("vec_id")).toSet
    // double approximation (coarse probe AND code ranking): conservative floor
    assert((brute & ids).size >= 4, s"recall too low: ${(brute & ids).size}/10")
    // every result must come from one of the 4 probed posting lists —
    // s09 can never return more centroids than it probes
    val assign = graft.llm.Similarity.ivfAssign(embs, 16)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = assign.filterKeys(ids.contains).values.toSet
    assert(probed.size <= 4, s"results span ${probed.size} centroids, nProbe=4")
  }

  test("m02 router decodes real containers for every kind, deterministically") {
    val f1 = Multimodal.decodeRouted(spark, Multimodal.realMediaTable(spark, docs)).collect()
    val f2 = Multimodal.decodeRouted(spark, Multimodal.realMediaTable(spark, docs)).collect()
    assert(f1.sortBy(_.media_id).toSeq == f2.sortBy(_.media_id).toSeq,
      "two decode passes over freshly-encoded containers must agree")
    // kinds route per the doc_id % 3 rule, and per-kind decode invariants hold
    for (f <- f1) {
      val expected = (f.media_id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      assert(f.kind == expected, s"$f routed down the wrong arm")
      f.kind match {
        case "image" =>
          assert(f.n_frames == 1 && f.n_units >= 16 * 12 && f.peak <= 255)
        case "audio" =>
          assert(f.n_frames == 1 && f.n_units >= 400 && f.peak <= 32124) // μ-law full-scale
        case _ =>
          assert(f.n_frames >= 2 && f.n_units == f.n_frames * (8 + f.media_id % 8) * (6 + f.media_id % 6))
          assert(f.peak <= 255 && f.peak % 51 == 0) // web-safe palette levels
      }
      assert(f.sum_vals > 0)
    }
  }

  test("rolling fingerprint is order-sensitive, content fingerprint is whitespace-insensitive") {
    import spark.implicits._
    val two = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha  beta   gamma"))
      .toDF("doc_id", "text")
    val fp = two.select(
      col("doc_id"),
      graft.llm.TextAnalysis.rollingFingerprint.as("r"),
      graft.llm.TextAnalysis.contentFingerprint.as("c")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(fp(1L)._1 != fp(2L)._1, "permutation must change the rolling fp")
    assert(fp(1L)._2 == fp(3L)._2, "whitespace must not change the content fp")
  }

  test("MLlib MinHashLSH path finds the same near-dup pairs as the md5 pipeline") {
    val ml = graft.llm.MlDedup.nearDupPairs(Tables.documents(spark, sf), maxDistance = 0.2)
      .select("d1", "d2")
    val md5Pairs = Catalog.byName("d03_minhash_lsh").run(spark, sf)
      .filter(col("jac") >= 0.9).select("d1", "d2")
    // the exact high-jaccard pairs must all be recalled by the MLlib path
    assert(md5Pairs.except(ml).count() == 0,
      "MLlib LSH missed pairs the exact pipeline found at jaccard >= 0.9")
  }

  test("d06 finds every high-cosine pair its buckets can see, none below threshold") {
    val pairs = Catalog.byName("d06_embedding_neardup").run(spark, sf).collect()
    assert(pairs.forall(_.getAs[Double]("cos") >= 0.4))
    // symmetric sanity: v1 < v2 always
    assert(pairs.forall(r => r.getAs[Long]("v1") < r.getAs[Long]("v2")))
  }

  test("d14: drops are witnessed and cluster minima always survive") {
    val out = Catalog.byName("d14_semdedup").run(spark, sf).cache()
    // total function over the corpus: every vector exactly once
    assert(out.count() == embs.count())
    assert(out.filter(!col("keep").isin(0L, 1L)).count() == 0)
    // the min vec_id of each cluster has no lower-id mate — always kept
    val minPerCluster = out.groupBy("cid").agg(min("vec_id").as("vec_id"))
    val minDropped = minPerCluster
      .join(out.filter(col("keep") === 0L), Seq("cid", "vec_id")).count()
    assert(minDropped == 0, "a cluster's minimum vec_id can never be dropped")
    // every drop has a witness: a lower-id same-cluster vector within
    // the similarity radius (recomputed independently from embeddings)
    val e1 = embs.select(col("vec_id").as("w_id"), col("embedding").as("w_emb"))
    val dropped = out.filter(col("keep") === 0L)
      .join(embs.select(col("vec_id"), col("embedding")), "vec_id")
    val clusterMates = out.select(col("vec_id").as("w_id"), col("cid"))
    val witnessed = dropped
      .join(clusterMates, "cid")
      .filter(col("w_id") < col("vec_id"))
      .join(e1, "w_id")
      .filter(round(llm.Similarity.cosine(col("embedding"), col("w_emb")), 6) >= 0.4)
      .select("vec_id").distinct()
    val unwitnessed = dropped.select("vec_id")
      .join(witnessed, Seq("vec_id"), "left_anti").count()
    assert(unwitnessed == 0, "every dropped vector needs an in-radius lower-id witness")
    out.unpersist()
  }

  test("m12: decoded-content dedup groups cross-container AND cross-id duplicates") {
    val out = Catalog.byName("m12_media_content_dedup").run(spark, sf).cache()
    // every content group elects exactly one keeper, and it is a PNG
    val groups = out.groupBy("keeper_id")
      .agg(sum("is_keeper").as("k"), count(lit(1)).as("n"), max("group_size").as("gs"))
    assert(groups.filter(col("k") =!= 1).count() == 0, "each group needs exactly one keeper")
    assert(groups.filter(col("n") =!= col("gs")).count() == 0, "group_size must equal membership")
    assert(out.filter(col("is_keeper") === 1 && col("container") =!= "png").count() == 0)
    // cross-id duplicates exist (ids 256 apart decode identically), so
    // groups exceed the trivial png+ppm pair
    assert(out.filter(col("group_size") >= 4).count() > 0, "no cross-id duplicate found")
    // byte-level dedup would find NONE of this: containers differ
    assert(out.select("media_id").distinct().count() * 2 == out.count())
    out.unpersist()
  }

  test("m12: the opt-in salted election equals the window election bit-for-bit") {
    // the salted two-stage count/min (for single-content-dominated
    // corpora, where the window serializes the hot group on one task)
    // must be a pure plan swap: same rows, same keepers, same sizes —
    // including on a duplicate-heavy input where the two shapes
    // actually diverge in execution
    val heavy = {
      import spark.implicits._
      (0 until 400).map(i =>
        if (i % 10 != 0) 256L * i // 90%: one giant content group
        else 256L * i + 1 + (i % 255)).toDF("doc_id")
    }
    val window = Multimodal.contentDedup(spark, heavy).toDF()
    val salted = Multimodal.contentDedupSalted(spark, heavy, salts = 7).toDF()
    assert(salted.exceptAll(window).count() == 0 &&
      window.exceptAll(salted).count() == 0,
      "salted and window elections must produce identical output")
    spark.catalog.clearCache() // contentDedupSalted persists its signatures
  }

  test("m04 router downsamples each kind along its natural axis, never upsampling") {
    val rs = Multimodal
      .resizeRouted(spark, Multimodal.realMediaTable(spark, docs)).collect()
    assert(rs.nonEmpty && rs.exists(_.kind == "image")
      && rs.exists(_.kind == "audio") && rs.exists(_.kind == "video"))
    for (r <- rs) {
      assert(r.dst_extent >= 1 && r.dst_extent <= r.src_extent, s"$r upsampled")
      r.kind match {
        case "image" => // NN resize into the 8-px box
          assert(r.dst_extent <= 64 && r.peak_out <= 255)
        case "audio" => // stride-3 decimation keeps ceil(n/3) samples
          assert(r.dst_extent == (r.src_extent + 2) / 3 && r.peak_out <= 32124)
        case _ => // stride-2 frame keep
          assert(r.dst_extent == (r.src_extent + 1) / 2 && r.peak_out <= 255)
      }
      assert(r.sum_out > 0)
    }
  }

  test("shingle index respects the stop-shingle cap") {
    val sh = Dedup.shingles(docs)
    val capped = Dedup.shingleIndex(sh, 2)
    val maxDf = capped.groupBy("h64").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxDf <= 2)
  }

  test("s15: at most 2 results per label, and they are the true top-10 of the capped pool") {
    val rows = Catalog.byName("s15_diverse_topk").run(spark, sf).collect()
    assert(rows.length == 10)
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    assert(byLabel.values.forall(_.length <= 2), "diversity cap violated")
    // independent recompute: full brute ranking in-JVM, apply the same
    // cap-2-per-label scan over the global order, take 10
    val all = llm.Similarity.topK(embs, 0L, Int.MaxValue - 1).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"), r.getAs[Double]("cos")))
    val seen = scala.collection.mutable.Map[Int, Int]()
    val expect = all.sortBy { case (id, _, c) => (-c, id) }.take(100).filter { case (_, l, _) =>
      val n = seen.getOrElse(l, 0); seen(l) = n + 1; n < 2
    }.take(10).map(_._1)
    assert(rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id")).sameElements(expect))
  }

  test("s16: truncated ranking is by 16-dim cosine and the agreement flag matches the full top-10") {
    val rows = Catalog.byName("s16_matryoshka_topk").run(spark, sf).collect()
    assert(rows.length == 10)
    // ranks follow cos16 descending with vec_id tiebreak
    val sorted = rows.sortBy(_.getAs[Long]("rank"))
    val resorted = rows.sortBy(r => (-r.getAs[Double]("cos16"), r.getAs[Long]("vec_id")))
    assert(sorted.map(_.getAs[Long]("vec_id")).sameElements(resorted.map(_.getAs[Long]("vec_id"))))
    // the flag is exactly membership in the full-dimension top-10
    val full = llm.Similarity.topK(embs, 0L, 10).collect().map(_.getAs[Long]("vec_id")).toSet
    for (r <- rows)
      assert((r.getAs[Long]("in_full_topk") == 1L) == full.contains(r.getAs[Long]("vec_id")))
    // truncation loses SOME fidelity but not all: overlap in (0, 10]
    assert(rows.count(_.getAs[Long]("in_full_topk") == 1L) > 0, "no overlap at all is a bug")
  }

  test("d17: containment dominates jaccard and the relation verdict matches its thresholds") {
    val rows = Catalog.byName("d17_containment").run(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val jac = r.getAs[Double]("jac")
      val con = r.getAs[Double]("containment")
      // i/min(n1,n2) >= i/(n1+n2-i) always
      assert(con >= jac - 1e-9, s"containment $con < jac $jac")
      val expect =
        if (jac >= 0.8) "near_exact"
        else if (jac >= 0.5) "near_dup"
        else if (con >= 0.8) "contained"
        else "weak"
      assert(r.getAs[String]("relation") == expect)
    }
  }

  test("s17: recall is monotone in nProbe and exactly 1.0 when every list is probed") {
    val rows = Catalog.byName("s17_nprobe_recall").run(spark, sf).collect()
      .sortBy(_.getAs[Long]("n_probe"))
    assert(rows.map(_.getAs[Long]("n_probe")).sameElements(Array(1L, 2L, 4L, 8L, 16L)))
    // probing all 16 lists IS brute force — recall must be exactly 1.0
    assert(rows.last.getAs[Long]("hits") == 10L)
    assert(rows.last.getAs[Double]("recall_at_10") == 1.0)
    // widening the probe can only add candidates: recall is monotone
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall not monotone: ${recalls.toList}")
    assert(rows.forall(r => r.getAs[Long]("hits") >= 0L && r.getAs[Long]("hits") <= 10L))
  }

  test("e03/s18: binary codes match a JVM sign-pack and hamming search re-ranks correctly") {
    // recompute every code from the raw floats
    val raw = embs.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      var lo = 0L; var hi = 0L
      for (d <- 0 until 64) if (v(d).toDouble > 0) {
        if (d < 32) lo |= 1L << d else hi |= 1L << (d - 32)
      }
      r.getAs[Long]("vec_id") -> (lo, hi)
    }.toMap
    val codes = Catalog.byName("e03_binary_quantize").run(spark, sf).collect()
    assert(codes.length == raw.size)
    for (r <- codes) {
      val (lo, hi) = raw(r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("code_lo") == lo && r.getAs[Long]("code_hi") == hi)
      assert(r.getAs[Long]("n_pos") ==
        (java.lang.Long.bitCount(lo) + java.lang.Long.bitCount(hi)).toLong)
    }
    // s18: every hit's hamming matches the recompute, and the hit set
    // is drawn from the 50 hamming-nearest candidates
    val (qlo, qhi) = raw(0L)
    def ham(id: Long): Long = {
      val (lo, hi) = raw(id)
      (java.lang.Long.bitCount(lo ^ qlo) + java.lang.Long.bitCount(hi ^ qhi)).toLong
    }
    val hits = Catalog.byName("s18_hamming_topk").run(spark, sf).collect()
    assert(hits.length == 10)
    for (r <- hits) assert(r.getAs[Long]("hamming") == ham(r.getAs[Long]("vec_id")))
    val short50 = raw.keys.filter(_ != 0L).toSeq.sortBy(id => (ham(id), id)).take(50).toSet
    assert(hits.forall(r => short50.contains(r.getAs[Long]("vec_id"))))
    // ranks follow the exact re-rank cosine, descending
    val sorted = hits.sortBy(_.getAs[Long]("rank"))
    val coss = sorted.map(_.getAs[Double]("cos"))
    assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
  }

  test("s19: standing-index hamming search returns exactly s18's answer and scans only codes") {
    val standing = Catalog.byName("s19_hamming_standing").run(spark, sf)
    val inQuery = Catalog.byName("s18_hamming_topk").run(spark, sf)
    assert(standing.exceptAll(inQuery).count() == 0 &&
      inQuery.exceptAll(standing).count() == 0,
      "standing-index search must be result-identical to the in-query build")
    // the corpus-wide first pass reads the code parquet, not the
    // embedding floats: the only embeddings scans are the query-vector
    // lookup and the 50-row re-rank join
    val plan = standing.queryExecution.executedPlan.toString
    assert(plan.contains("s19_bincodes"), "search plan must scan the standing index")
  }

  test("s20: every batched-IVF hit comes from one of its query's 4 probed posting lists") {
    val rows = Catalog.byName("s20_batched_ivf").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val assign = llm.Similarity.ivfAssign(embs, 16).select("vec_id", "cid").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    val cents = llm.Similarity.sampledCentroids(embs, 16)
    // recompute each query's probe set independently
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    for ((qid, hits) <- byQuery) {
      val probed = llm.Similarity
        .ivfTopKWith(embs, qid, Int.MaxValue - 1, cents, 4)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (h <- hits) {
        val v = h.getAs[Long]("vec_id")
        assert(v != qid, "a query must not retrieve itself")
        assert(probed.contains(v), s"query $qid hit $v outside its probed lists")
      }
      // per-query ranks are dense 1..k
      val ranks = hits.map(_.getAs[Long]("rank")).sorted
      assert(ranks.sameElements(1L to hits.length.toLong))
      assert(hits.length <= 5)
    }
    assert(assign.nonEmpty) // corpus assignment exists (sanity)
  }

  test("m08: PNG blobs are real PNG wire format and the codec round-trips rasters exactly") {
    // wire format: every blob must start with the 8-byte PNG signature —
    // a stub that stored the raster verbatim (or PPM bytes) fails here
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    import spark.implicits._
    val blobs = llm.Multimodal.pngTable(spark, docs.limit(8)).collect()
    for (b <- blobs)
      assert(b.bytes.take(8).sameElements(sig), s"media ${b.media_id} is not PNG wire format")
    // lossless round-trip on an adversarial raster (all byte values,
    // including the 0x89/0xff corners)
    val w = 32; val h = 24
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 131 + 7) % 256).toByte)
    val back = graft.functions.MediaCodecs.pngParse(
      graft.functions.MediaCodecs.pngWrite(w, h, rgb))
    assert(back.w == w && back.h == h)
    assert(back.rgb.sameElements(rgb), "PNG round-trip must be byte-exact")
  }

  test("m09: JPEG blobs are real JPEG wire format and the decode is genuinely lossy") {
    import spark.implicits._
    val blobs = llm.Multimodal.jpegTable(spark, docs.limit(8)).collect()
    for (b <- blobs) {
      // JPEG SOI marker (FF D8), not PNG magic and not a raw raster
      assert((b.bytes(0) & 0xff) == 0xff && (b.bytes(1) & 0xff) == 0xd8,
        s"media ${b.media_id} is not JPEG wire format")
    }
    // lossy: at least one blob's decode differs from its source raster
    // (a stub that smuggled PNG/raw bytes through would round-trip
    // exactly and fail this)
    val anyLossy = blobs.exists { b =>
      val img = graft.functions.MediaCodecs.pngParse(b.bytes)
      val w = img.w; val h = img.h
      val k = (b.media_id % 32).toInt
      (0 until h).exists(y => (0 until w).exists { x =>
        val i = (y * w + x) * 3
        (img.rgb(i) & 0xff) != 2 * x + 3 * y + k ||
          (img.rgb(i + 1) & 0xff) != 3 * x + 2 * y + k ||
          (img.rgb(i + 2) & 0xff) != x + 4 * y + k
      })
    }
    assert(anyLossy, "every decode was byte-exact -- this is not a lossy codec path")
  }

  test("s21: the quantization report covers all three rungs with consistent recall arithmetic") {
    val rows = Catalog.byName("s21_quantization_recall").run(spark, sf).collect()
    assert(rows.map(_.getAs[String]("method")).toSet == Set("int8", "pq_adc", "binary"))
    for (r <- rows) {
      val h = r.getAs[Long]("hits")
      assert(h >= 0L && h <= 10L)
      assert(math.abs(r.getAs[Double]("recall_at_10") - h / 10.0) < 1e-9)
    }
    // the report must not be degenerate: at least one rung recalls
    // something (all-zero would mean the anchors/join keys broke)
    assert(rows.map(_.getAs[Long]("hits")).sum > 0)
  }

  test("c04: every fuzzy-contamination pair crosses the split boundary at jac >= 0.5") {
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) / math.pow(2, 60)
    }
    val rows = Catalog.byName("c04_fuzzy_contamination").run(spark, sf).collect()
    for (r <- rows) {
      assert(u(r.getAs[Long]("train_doc")) < 0.9, "train side must be in the train split")
      assert(u(r.getAs[Long]("test_doc")) >= 0.95, "test side must be in the held-out split")
      assert(r.getAs[Double]("jac") >= 0.5)
    }
    // fuzzy must be a superset of exact contamination restricted to the
    // same candidate recall: every c01 pair with enough overlap to imply
    // jac >= 0.5 that the bands surfaced is present. Weak-form check:
    // any c01 pair sharing most of a doc's shingles should reappear.
    val exact = Catalog.byName("c01_contamination").run(spark, sf).collect()
    assert(rows.nonEmpty || exact.isEmpty, "exact contamination exists but fuzzy found nothing")
  }

  test("s10: row-filter forget on the IVF-PQ index ≡ rebuild without the vectors") {
    import graft.llm.{LlmQueries, Similarity}
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.sampledCentroids(emb, 16)
    val books = Similarity.sampledCodebooks(emb)
    val idx = s"${java.nio.file.Files.createTempDirectory("graft_s10_forget")}/idx"
    Similarity.ivfPqIndexRows(emb, cents, books)
      .write.mode("overwrite").parquet(s"$idx/rows")
    def search(rows: org.apache.spark.sql.DataFrame) =
      Similarity.ivfPqTopKStanding(emb, rows, cents, books, 0L, 10, 4, 50)
        .collect().map(_.toString).toSeq
    val before = search(spark.read.parquet(s"$idx/rows"))

    val gone = col("vec_id") % 5 === 1
    LlmQueries.forgetRows(spark, idx, Seq("rows"), gone)
    val after = search(spark.read.parquet(s"$idx/rows"))
    assert(after != before, "forget changed nothing — vacuous fixture")
    // ground truth: the index rows rebuilt over the surviving vectors
    // against the SAME frozen quantizer tables (per-row assignment =>
    // filter ≡ rebuild)
    val rebuilt = search(Similarity.ivfPqIndexRows(emb.filter(!gone), cents, books))
    assert(after == rebuilt, "row-filter forget must equal a rebuild without the vectors")
    // and no forgotten vector survives in the answer
    assert(spark.read.parquet(s"$idx/rows").filter(gone).count() == 0)
  }

  test("s22: BM25 forget — tombstone reads ≡ compaction ≡ rebuild without the docs; double-forget is a no-op") {
    import graft.llm.LlmQueries
    val base = java.nio.file.Files.createTempDirectory("graft_s13_forget").toString
    val idx = s"$base/idx"
    val gone = col("doc_id") % 7 === 2
    def results(d: String) =
      LlmQueries.s13ProbeAt(spark, sf, d).collect().map(_.toString).sorted.toSeq

    LlmQueries.s13BuildAt(spark, sf, idx)
    val before = results(idx)
    LlmQueries.s13Forget(spark, idx, gone)
    val tombstoned = results(idx)
    assert(tombstoned != before, "forget changed nothing — vacuous fixture")
    assert(!spark.read.parquet(s"$idx/forgets/*/deletes").isEmpty)

    // idempotence: forgetting the same slice again retracts nothing twice
    LlmQueries.s13Forget(spark, idx, gone)
    assert(results(idx) == tombstoned, "double-forget changed the scores")

    // ground truth: an index REBUILT over the corpus without those docs
    // (the forgotten docs never contribute to df/dl/stats). The spec
    // pre-filters the corpus the same way the oracle does.
    val rebuilt = s"$base/rebuilt"
    val docs = Tables.documents(spark, sf).filter(!gone)
    val tmpCorpus = s"$base/corpus"
    docs.write.mode("overwrite").parquet(s"$tmpCorpus/documents.parquet")
    // carry the sibling tables the loader expects? s13 only reads
    // documents, so the single table suffices.
    LlmQueries.s13BuildAt(spark, tmpCorpus, rebuilt)
    assert(results(rebuilt) == tombstoned,
      "tombstone+retraction reads must equal a rebuild without the docs")

    // physical compaction folds the tombstones away without changing a score
    LlmQueries.s13FoldForgets(spark, idx)
    assert(!new java.io.File(s"$idx/forgets").exists(), "forgets dir must be gone")
    assert(results(idx) == tombstoned, "compaction changed the scores")

    // and the folded index accepts a SECOND forget round
    LlmQueries.s13Forget(spark, idx, col("doc_id") % 7 === 3)
    assert(results(idx) != tombstoned)
  }

  test("s25: MMR leads with the relevance argmax, trades relevance for diversity, never increases self-similarity") {
    val top10 = Catalog.byName("s01_cosine_topk").run(spark, sf)
      .collect().map(_.getAs[Long]("vec_id"))
    val picks = Catalog.byName("s25_mmr_rerank").run(spark, sf)
      .orderBy("rank").collect().map(_.getAs[Long]("vec_id"))
    assert(picks.length == 10)
    assert(picks.head == top10.head, "rank 1 must be the relevance argmax")
    assert(picks.toSet != top10.toSet,
      "MMR never traded relevance for diversity — vacuous fixture")
    // the selection's mean pairwise cosine must not exceed the plain
    // top-10's (the whole point of the diversity penalty)
    val emb = Tables.embeddings(spark, sf)
    def meanPairSim(ids: Seq[Long]): Double = {
      val e = emb.filter(col("vec_id").isin(ids: _*))
      val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
      val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"))
      a.join(broadcast(b), col("v1") < col("v2"))
        .select(graft.llm.Similarity.cosine(col("e1"), col("e2")).as("c"))
        .agg(avg("c")).head().getDouble(0)
    }
    assert(meanPairSim(picks.toSeq) <= meanPairSim(top10.toSeq) + 1e-9,
      "MMR selection is MORE self-similar than the plain top-10")
  }
}
