package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the training-data curation operators
  * (exact-value parity vs DuckDB is tools/check.py's job).
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)

  test("p01: split assignment is deterministic, total, and ~90/5/5") {
    val a = Catalog.byName("p01_split_assign").run(spark, sf)
    val b = Catalog.byName("p01_split_assign").run(spark, sf)
    assert(a.except(b).count() == 0, "rerun must not flip any assignment")
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") / n > 0.8, s"train share ${counts("train") / n}")
    assert(counts("val") / n < 0.15 && counts("test") / n < 0.15)
    assert(n.toLong == docs.count(), "every doc gets exactly one split")
  }

  test("p02: sample rate per stratum is honored within tolerance") {
    val sampled = Catalog.byName("p02_stratified_sample").run(spark, sf)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / base("en")
    assert(math.abs(enRate - 0.5) < 0.15, s"en sampled at $enRate, want ~0.5")
    // sampling is a strict filter: no invented rows
    assert(sampled.count() <= docs.count())
  }

  test("p03: bins are contiguous per lang and respect the running budget") {
    val packed = Catalog.byName("p03_pack_sequences").run(spark, sf)
    // bin ids per lang form a dense 0..max range (no gaps: a bin is only
    // opened once the running count crosses a budget boundary)
    val perLang = packed.groupBy("lang")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("nbins"))
      .collect()
    perLang.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("nbins") == r.getAs[Long]("hi") + 1,
        s"gap in bins for ${r.getAs[String]("lang")}")
    }
    // bins are monotone in doc_id order within a lang (the packing order)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val nonMonotone = packed
      .withColumn("prev_bin", lag("bin", 1).over(w))
      .filter(col("prev_bin").isNotNull && col("bin") < col("prev_bin"))
      .count()
    assert(nonMonotone == 0, "bin ids must be non-decreasing in packing order")
  }

  test("p05: buckets are equal-population (±1) and length-ordered") {
    val b = Catalog.byName("p05_length_buckets").run(spark, sf)
      .collect().sortBy(_.getAs[Long]("bucket"))
    assert(b.map(_.getAs[Long]("bucket")).toSeq == (1L to 8L))
    val sizes = b.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, s"uneven buckets: ${sizes.mkString(",")}")
    // ntile order: bucket k's max length never exceeds bucket k+1's min
    b.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("max_tokens") <= hi.getAs[Long]("min_tokens"))
    }
    b.foreach { r =>
      val pf = r.getAs[Double]("padding_frac")
      assert(pf >= 0.0 && pf < 1.0)
    }
  }

  test("t05: exactly top-3 terms per doc, ranked by tf-idf desc") {
    val t = Catalog.byName("t05_tfidf_terms").run(spark, sf)
    val perDoc = t.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("rank").as("maxr")).collect()
    perDoc.foreach { r =>
      assert(r.getAs[Long]("n") <= 3 && r.getAs[Long]("maxr") <= 3)
    }
    // scores are non-increasing in rank within a doc
    val viol = t.as("a").join(t.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.rank") < col("b.rank") &&
          col("a.score") < col("b.score"))
      .count()
    assert(viol == 0, "higher rank must not have lower score")
  }

  test("t06: ratios are in [0,1] and a repeated-text doc scores higher") {
    import spark.implicits._
    val t = Catalog.byName("t06_repetition_score").run(spark, sf)
    val bounds = t.agg(
      min("dup_ratio"), max("dup_ratio"), min("top_share"), max("top_share"))
      .collect()(0)
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
    assert(bounds.getDouble(2) > 0.0 && bounds.getDouble(3) <= 1.0)
    // a doc that is one bigram repeated must land at dup_ratio ~ 1
    val loop = Seq(("synthetic", ("spam ham " * 50).trim, "en"))
      .toDF("doc_id", "text", "lang")
    val scored = llm.Curation.repetitionScore(loop)
    val r = scored.collect()(0)
    assert(r.getAs[Double]("dup_ratio") > 0.9)
    assert(r.getAs[Double]("top_share") > 0.4)
  }

  test("c01: contaminated pairs really share a 5-gram across the split boundary") {
    val c = Catalog.byName("c01_contamination").run(spark, sf).collect()
    // the generator plants near-dups; some straddle the 90/5/5 split
    c.foreach { r =>
      val tr = r.getAs[Long]("train_doc"); val te = r.getAs[Long]("test_doc")
      assert(tr != te)
      assert(r.getAs[Long]("n_shared") > 0)
    }
    // spot-verify one pair by brute force
    if (c.nonEmpty) {
      val r = c.head
      val texts = docs.filter(col("doc_id").isin(r.getAs[Long]("train_doc"), r.getAs[Long]("test_doc")))
        .collect().map(_.getAs[String]("text").split(" ").sliding(5).map(_.mkString(" ")).toSet)
      assert(texts(0).intersect(texts(1)).nonEmpty)
    }
  }

  test("c02: bloom-prefiltered contamination is bit-identical to the exact c01") {
    val exact = Catalog.byName("c01_contamination").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val bloom = Catalog.byName("c02_contamination_bloom").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(exact.nonEmpty) // the generator plants cross-split near-dups
    assert(bloom.sameElements(exact))
  }

  test("v01: vocabulary ranks are dense, counts non-increasing") {
    val v = Catalog.byName("v01_vocab_topk").run(spark, sf)
      .orderBy("rank").collect()
    assert(v.nonEmpty && v.head.getAs[Long]("rank") == 1L)
    v.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("rank") == a.getAs[Long]("rank") + 1)
        assert(b.getAs[Long]("cnt") <= a.getAs[Long]("cnt"))
      case _ =>
    }
  }

  test("e01: quantized range fits int8 and scale is the max-normalizer") {
    val e = Catalog.byName("e01_quantize_int8").run(spark, sf)
    val bad = e.filter(col("qmin") < -128 || col("qmax") > 127).count()
    assert(bad == 0, "floor(x * 127/max|x|) must stay within int8")
    // at least one coordinate touches the positive or negative edge
    val edge = e.filter(col("qmax") === 127 || col("qmin") === -128).count()
    assert(edge > 0)
  }

  test("x01: every doc gets one disposition; rules agree with their source operators") {
    val x = Catalog.byName("x01_curation_pipeline").run(spark, sf).cache()
    assert(x.count() == docs.count())
    // contaminated dispositions are exactly c01's train docs that
    // survived the earlier gates
    val contamTrain = Catalog.byName("c01_contamination").run(spark, sf)
      .select(col("train_doc").as("doc_id")).distinct()
    val markedContam = x.filter(col("disposition") === "contaminated").select("doc_id")
    assert(markedContam.except(contamTrain).count() == 0)
    // a disposition of 'dup' implies another doc with the same fingerprint kept
    val dups = x.filter(col("disposition") === "dup").count()
    val fpGroups = docs.groupBy(llm.TextAnalysis.contentFingerprint)
      .count().filter(col("count") > 1)
      .agg(sum(col("count") - 1)).collect()(0)
    val expectedDups = if (fpGroups.isNullAt(0)) 0L else fpGroups.getLong(0)
    assert(dups == expectedDups)
    x.unpersist()
  }

  test("p04: token shares sum to 1 and weights rebalance to uniform") {
    val m = Catalog.byName("p04_source_mix").run(spark, sf).collect()
    val shareSum = m.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3, s"shares sum to $shareSum")
    // weight * share == uniform target share for every stratum
    val k = m.length.toDouble
    m.foreach { r =>
      val rebalanced = r.getAs[Double]("weight") * r.getAs[Double]("token_share")
      assert(math.abs(rebalanced - 1.0 / k) < 1e-3)
    }
  }

  test("v02: pair counts match a brute-force recount on a sample word") {
    val pairs = Catalog.byName("v02_bpe_top_pairs").run(spark, sf).collect()
    assert(pairs.length == 20)
    val top = pairs.minBy(_.getAs[Long]("rank"))
    // brute-force: recount the top pair across the corpus vocabulary
    val pair = top.getAs[String]("pair")
    val expected = docs.collect().iterator
      .flatMap(_.getAs[String]("text").split(" "))
      .toSeq.groupBy(identity).map { case (w, ws) =>
        ws.size.toLong * w.sliding(2).count(_ == pair)
      }.sum
    assert(top.getAs[Long]("cnt") == expected)
  }

  test("t07: surprisal is monotone in rarity and exactly floor(log2(total//cnt))") {
    val t = Catalog.byName("t07_surprisal_score").run(spark, sf)
    assert(t.count() == docs.count())
    val bounds = t.agg(min("mean_surprisal"), max("mean_surprisal")).collect()(0)
    assert(bounds.getDouble(0) >= 0.0)
    // exact-parity kernel: length(bin(n)) - 1 == floor(log2(n)) for longs
    import spark.implicits._
    val ns = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, (1L << 40) - 1, 1L << 40).toDF("n")
    val bad = ns.filter(
      expr("length(bin(n)) - 1") =!=
        expr("cast(floor(log2(cast(n as double))) as int)")).count()
    assert(bad == 0)
  }

  test("d08: kept+shared accounting is consistent and dedup is lossless on uniques") {
    val d = Catalog.byName("d08_passage_dedup").run(spark, sf)
    // every doc appears; kept <= passages; ratios consistent
    assert(d.count() == docs.count())
    val bad = d.filter(col("n_kept") > col("n_passages")).count()
    assert(bad == 0)
    // globally: number of kept passages == number of distinct fingerprints
    val kept = d.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctFps = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / ${llm.Curation.PassageWords}.0) as int) - 1), " +
          s"i -> concat_ws(' ', slice(toks, i * ${llm.Curation.PassageWords} + 1, ${llm.Curation.PassageWords})))"))
        .as(Seq("idx", "passage")))
      .select(md5(col("passage"))).distinct().count()
    assert(kept == distinctFps, "one keeper per distinct passage fingerprint")
  }

  test("v03: tolerates single-token and empty documents under ANSI mode") {
    // regression: size(toks)=1 made sequence(0, -1) yield [0, -1] and
    // toks[i+1] trap with INVALID_ARRAY_INDEX before the len>=2 guard
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_v03_edge").toString
    Seq(
      (1L, "one", "en", "web", 3L),
      (2L, "", "en", "web", 0L),
      (3L, "two words here", "en", "web", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // nothing reaches the pc >= 25 floor — empty result, but no crash
    assert(Catalog.byName("v03_collocations").run(spark, dir).count() == 0)
  }

  test("v03: reported collocations beat chance and meet the count floor") {
    val rows = Catalog.byName("v03_collocations").run(spark, sf).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      // lift > 1 means the pair co-occurs more than independent words
      // would by chance — the definition of a collocation
      assert(r.getAs[Double]("lift") > 1.0, s"chance-level pair reported: $r")
      assert(r.getAs[Long]("pc") >= 25, s"below the count floor: $r")
    }
    // ranks are 1..20 in lift order
    val lifts = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("v04: BPE merge round is greedy left-to-right on planted fixtures") {
    import spark.implicits._
    // top pair is (x, x): "x x x x" must merge twice (positions 0-1 and
    // 2-3), never the overlapping 1-2; "x x x" merges once leaving a
    // bare x whose adjacency with the merged token survives
    val docs = Seq(
      (0L, "x x x x"),
      (1L, "x x x a"),
      (2L, "a x x b")).toDF("doc_id", "text")
    val out = llm.Curation.bpeMergeRound(docs).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r.getAs[Long]("pc")).toMap
    // doc0 -> [x_x, x_x]; doc1 -> [x_x, x, a]; doc2 -> [a, x_x, b]
    assert(out(("x_x", "x_x")) == 1L)
    assert(out(("x_x", "x")) == 1L)
    assert(out(("x", "a")) == 1L)
    assert(out(("a", "x_x")) == 1L)
    assert(out(("x_x", "b")) == 1L)
    assert(!out.contains(("x", "x")), "overlapping merge leaked a raw (x, x) pair")
    // non-self-adjacent top pair: every occurrence merges
    val docs2 = Seq((0L, "a b c a b"), (1L, "a b")).toDF("doc_id", "text")
    val out2 = llm.Curation.bpeMergeRound(docs2).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r.getAs[Long]("pc")).toMap
    assert(out2(("a_b", "c")) == 1L && out2(("c", "a_b")) == 1L)
    assert(!out2.contains(("a", "b")))
  }

  test("v04: SQL merge matches a brute-force greedy merge on random corpora (property)") {
    import spark.implicits._
    // reference implementation: the obvious sequential greedy scan
    def bruteMerge(toks: Array[String], p1: String, p2: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == p1 && toks(i + 1) == p2) {
          out += s"${p1}_$p2"; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toArray
    }
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      // tiny vocab -> dense repeats, self-adjacent runs, long islands
      val vocab = Array("a", "b", "c")
      val docs = (0 until 12).map { id =>
        (id.toLong, Array.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(3))).mkString(" "))
      }
      val out = llm.Curation.bpeMergeRound(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r.getAs[Long]("pc")).toMap
      // recompute expectation with the brute scan: top pair by the same
      // counting rule, then pair counts over the merged streams
      val split = docs.map { case (_, t) => t.split(" ") }
      val pairCounts = split.flatMap(ts => ts.zip(ts.tail))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val (bp1, bp2) = pairCounts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
      val merged = split.map(ts => bruteMerge(ts, bp1, bp2))
      val expect = merged.flatMap(ts => ts.zip(ts.tail))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val expectTop = expect.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(20).toMap
      assert(out == expectTop, s"seed $seed: $out vs $expectTop")
    }
  }

  test("p11: A-ES sample is the exact top-100 by u^(1/w) key and is length-biased") {
    val rows = Catalog.byName("p11_weighted_sample").run(spark, sf).collect()
    assert(rows.length == 100)
    assert(rows.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 100L))
    // independent JVM recompute of the exponential keys
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) / math.pow(2, 60)
    }
    val all = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
    val keyed = all.map { case (id, w) =>
      (id, BigDecimal(math.pow(u(id), 1.0 / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expect = keyed.sortBy { case (id, k) => (-k, id) }.take(100).map(_._1)
    assert(rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).sameElements(expect))
    // the length weight must bias the sample: sampled docs are longer on average
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    val corpusMean = all.map(_._2).sum.toDouble / all.length
    assert(sampleMean > corpusMean, s"sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("v06: applying the v05-learned merges brute-force reproduces every per-doc count") {
    // sequential greedy reference scan, one learned merge at a time, in
    // the order v05 emits them — exactly what a tokenizer runtime does
    def applyMerge(toks: Array[String], p1: String, p2: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == p1 && toks(i + 1) == p2) {
          out += s"${p1}_$p2"; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toArray
    }
    val merges = Catalog.byName("v05_bpe_train").run(spark, sf).collect()
      .sortBy(_.getAs[Long]("round"))
      .map(r => (r.getAs[String]("p1"), r.getAs[String]("p2")))
    assert(merges.length == llm.Curation.BpeRounds)
    val expect = docs.select("doc_id", "text").collect().map { r =>
      var toks = r.getAs[String]("text").split(" ")
      for ((p1, p2) <- merges) toks = applyMerge(toks, p1, p2)
      r.getAs[Long]("doc_id") -> (r.getAs[String]("text").split(" ").length.toLong, toks.length.toLong)
    }.toMap
    val got = Catalog.byName("v06_bpe_apply").run(spark, sf).collect()
    assert(got.length == expect.size, "one row per doc")
    for (r <- got) {
      val id = r.getAs[Long]("doc_id")
      val (nRaw, nBpe) = expect(id)
      assert(r.getAs[Long]("n_raw") == nRaw, s"doc $id n_raw")
      assert(r.getAs[Long]("n_bpe") == nBpe, s"doc $id n_bpe")
      assert(r.getAs[Long]("n_saved") == nRaw - nBpe, s"doc $id n_saved")
    }
  }

  test("v07: per-source OOV accounting matches a direct recount against the top-16 vocab") {
    val rows = Catalog.byName("v07_vocab_coverage").run(spark, sf).collect()
    // recompute vocab + per-source counts directly from the raw docs
    val raw = docs.select("source", "text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text").split(" ")))
    val freq = raw.flatMap(_._2).groupBy(identity).map { case (t, v) => t -> v.length }
    val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }.take(16).map(_._1).toSet
    val bySource = raw.groupBy(_._1)
    assert(rows.length == bySource.size, "one row per source")
    for (r <- rows) {
      val toks = bySource(r.getAs[String]("source")).flatMap(_._2)
      val inV = toks.count(vocab.contains)
      assert(r.getAs[Long]("n_tokens") == toks.length.toLong)
      assert(r.getAs[Long]("n_in_vocab") == inV.toLong)
      assert(r.getAs[Long]("oov_types") == toks.filterNot(vocab.contains).distinct.length.toLong)
      val expectRate = BigDecimal((toks.length - inV).toDouble / toks.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("oov_rate") - expectRate) < 1e-9)
    }
    // the 16-type vocab must leave real OOV mass on this 31-type corpus
    assert(rows.forall(_.getAs[Double]("oov_rate") > 0.0))
  }

  test("x07: packing bins run on the real BPE counts and are contiguous per source") {
    val rows = Catalog.byName("x07_tokenizer_pipeline").run(spark, sf).collect()
    // n_bpe must be v06's counts exactly (same persisted merge chain)
    val v06 = Catalog.byName("v06_bpe_apply").run(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe")).toMap
    assert(rows.length == v06.size)
    for (r <- rows) assert(r.getAs[Long]("n_bpe") == v06(r.getAs[Long]("doc_id")))
    // bins within a source are contiguous starting at 0 and follow the
    // running cumulative budget
    for ((_, members) <- rows.groupBy(_.getAs[String]("source"))) {
      val ordered = members.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      for (m <- ordered) {
        assert(m.getAs[Long]("bin") == cum / llm.Curation.PackBudget,
          s"bin mismatch at doc ${m.get(0)}")
        cum += m.getAs[Long]("n_bpe")
      }
    }
  }

  test("v05/v06: multi-round training + apply match a brute-force loop on random corpora (property)") {
    import spark.implicits._
    // reference implementation: sequential greedy scan per round
    def applyMerge(toks: Array[String], p1: String, p2: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == p1 && toks(i + 1) == p2) {
          out += s"${p1}_$p2"; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toArray
    }
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array("a", "b", "c") // dense repeats force self-adjacency
      val corpus = (0 until 10).map { id =>
        (id.toLong, Array.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(3))).mkString(" "))
      }
      // brute: iterate BpeRounds greedy rounds over the whole corpus
      var streams = corpus.map { case (id, t) => id -> t.split(" ") }.toMap
      val expectMerges = (1 to llm.Curation.BpeRounds).map { r =>
        val counts = streams.values.toSeq.flatMap(ts => ts.zip(ts.tail))
          .groupBy(identity).map { case (k, v) => k -> v.size }
        val ((p1, p2), tc) = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
        streams = streams.map { case (id, ts) => id -> applyMerge(ts, p1, p2) }
        (r.toLong, p1, p2, tc.toLong)
      }
      // engine: run the catalog entries against a temp parquet corpus
      val dir = java.nio.file.Files.createTempDirectory(s"bpe_prop_$seed").toString
      corpus.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.parquet(s"$dir/documents.parquet")
      val merges = Catalog.byName("v05_bpe_train").run(spark, dir).collect()
        .map(r => (r.getAs[Long]("round"), r.getAs[String]("p1"),
          r.getAs[String]("p2"), r.getAs[Long]("tc"))).sortBy(_._1)
      assert(merges.sameElements(expectMerges), s"seed $seed: $merges vs $expectMerges")
      val applied = Catalog.byName("v06_bpe_apply").run(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe")).toMap
      for ((id, ts) <- streams)
        assert(applied(id) == ts.length.toLong, s"seed $seed doc $id")
    }
  }

  test("v05/v06: a corpus with no mergeable pair is a no-op round, never an erased stream") {
    import spark.implicits._
    // single-token docs: round 1's winning-pair relation is EMPTY; the
    // merge must keep every doc's stream intact (a cross join against
    // the empty top erased the corpus before the left-join fix)
    val dir = java.nio.file.Files.createTempDirectory("bpe_edge").toString
    (0L until 5L).map(i => (i, s"tok$i"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    assert(Catalog.byName("v05_bpe_train").run(spark, dir).count() == 0,
      "no pairs -> no merges learned")
    val applied = Catalog.byName("v06_bpe_apply").run(spark, dir).collect()
    assert(applied.length == 5, "every doc must survive the no-op rounds")
    for (r <- applied) {
      assert(r.getAs[Long]("n_raw") == 1L && r.getAs[Long]("n_bpe") == 1L)
      assert(r.getAs[Long]("n_saved") == 0L)
    }
  }

  test("p06: temperature mixing flattens shares; keep rates are valid subsample probabilities") {
    val rows = Catalog.byName("p06_temperature_mix").run(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      val p = r.getAs[Double]("keep_rate")
      assert(p > 0.0 && p <= 1.0)
    }
    // the most-upweighted source is kept whole
    assert(rows.map(_.getAs[Double]("keep_rate")).max == 1.0)
    // tau = 0.5 flattens: over-represented sources move DOWN toward
    // uniform, under-represented move UP (strictly, for non-uniform)
    for (r <- rows) {
      val share = r.getAs[Double]("token_share")
      val target = r.getAs[Double]("target_share")
      val uniform = 1.0 / rows.length
      if (share > uniform + 1e-6) assert(target < share)
      if (share < uniform - 1e-6) assert(target > share)
    }
  }

  test("p08: shard shuffle is a deterministic balanced permutation with a total read order") {
    val a = Catalog.byName("p08_shard_shuffle").run(spark, sf)
    val b = Catalog.byName("p08_shard_shuffle").run(spark, sf)
    assert(a.except(b).count() == 0, "rerun must not move any row")
    val rows = a.collect()
    assert(rows.length == docs.count(), "every doc lands in exactly one shard slot")
    // shards are 0..7 and balanced within binomial slack (2x of fair share)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    val fair = rows.length / 8.0
    for ((s, members) <- byShard)
      assert(members.length < 2 * fair && members.length > fair / 2,
        s"shard $s holds ${members.length} of ${rows.length}")
    // intra-shard positions are contiguous 1..n_s (an epoch reader can
    // seek by position without gaps)
    for ((s, members) <- byShard) {
      val pos = members.map(_.getAs[Long]("pos")).sorted
      assert(pos.sameElements(1L to members.length.toLong), s"shard $s positions not dense")
    }
    // the round-robin interleave is injective => a well-defined total order
    val gp = rows.map(_.getAs[Long]("global_pos"))
    assert(gp.distinct.length == gp.length, "global_pos collision")
    // and shard order must not simply follow doc_id order (it's a
    // shuffle): some adjacent global positions come from far-apart ids
    val byGp = rows.sortBy(_.getAs[Long]("global_pos")).map(_.getAs[Long]("doc_id"))
    val monotone = byGp.zip(byGp.tail).count { case (x, y) => y == x + 1 }
    assert(monotone < rows.length / 10, "read order degenerated to ingestion order")
  }

  test("p08: shard is the documented pure doc_id hash (append-stable by construction)") {
    // independent JVM-side recompute of floor(md5prefix60(doc_id)/2^60 * 8):
    // purity of the assignment is what makes corpus appends unable to
    // reshuffle existing rows — pin the exact function, not just determinism
    val got = Catalog.byName("p08_shard_shuffle").run(spark, sf)
      .select("doc_id", "shard").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, shard) <- got) {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val expect = math.floor(java.lang.Long.parseLong(hex, 16) / math.pow(2, 60) * 8).toLong
      assert(shard == expect, s"doc $id: shard $shard != $expect")
    }
  }
}
