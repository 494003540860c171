package graft

import java.nio.file.Files

import graft.streaming.ContamGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming contamination gate: the union of a run's decision
  * generations must equal the oracle-checked batch c03 output over the
  * same documents; clean docs pass to the lake, contaminated docs
  * don't; replayed batches re-land identical partitions.
  */
class ContamGateSpec extends AnyFunSuite {
  import TestSpark._

  private def dirs() = {
    val b = Files.createTempDirectory("graft_contam").toString
    (s"$b/src", s"$b/lake", s"$b/idx", s"$b/dec", s"$b/ckpt")
  }

  test("streamed decisions equal batch c03 exactly; clean docs land, contaminated don't") {
    val (src, lake, idx, dec, ckpt) = dirs()
    val docs = Tables.documents(spark, sf)
    ContamGate.buildIndex(spark, docs, idx)
    // stream exactly c03's population: the u < 0.9 train split, split
    // over two drops so the run spans multiple micro-batches
    val u = graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast("string")) /
      lit(1152921504606846976.0)
    val train = docs.filter(u < 0.9).select("doc_id", "text", "lang", "source").cache()
    train.filter(col("doc_id") % 2 === 0).write.mode("append").json(src)
    train.filter(col("doc_id") % 2 =!= 0).write.mode("append").json(src)
    ContamGate.start(spark, src, lake, idx, dec, ckpt).awaitTermination()

    val streamed = spark.read.parquet(dec)
      .select("train_doc", "n_shingles", "n_hit", "hit_ratio", "contaminated")
    val batch = Catalog.byName("c03_contamination_ratio").run(spark, sf)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "gate decisions must equal the oracle-checked batch c03 output")

    // lake = exactly the clean docs, decision log covers every doc once
    val lakeIds = spark.read.parquet(lake).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val rows = streamed.collect()
    assert(rows.map(_.getAs[Long]("train_doc")).distinct.length == train.count())
    for (r <- rows)
      assert(lakeIds.contains(r.getAs[Long]("train_doc")) == !r.getAs[Boolean]("contaminated"))
    // at least one doc on each side, or the fixture proves nothing
    assert(rows.exists(_.getAs[Boolean]("contaminated")) &&
      rows.exists(!_.getAs[Boolean]("contaminated")))
  }

  test("replayed batches re-land identical partitions (idempotent overwrite)") {
    import spark.implicits._
    val (_, lake, idx, dec, _) = dirs()
    ContamGate.buildIndex(spark, Tables.documents(spark, sf), idx)
    val batch = Seq(
      (1000001L, "alpha beta gamma delta epsilon zeta eta theta", "en", "t"),
      (1000002L, "one two three four five six seven eight nine", "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
    ContamGate.step(spark, batch, "rep-0", lake, idx, dec)
    val first = spark.read.parquet(dec).collect().sortBy(_.getAs[Long]("train_doc"))
    ContamGate.step(spark, batch, "rep-0", lake, idx, dec) // replay
    val second = spark.read.parquet(dec).collect().sortBy(_.getAs[Long]("train_doc"))
    assert(first.length == second.length &&
      first.zip(second).forall { case (a, b) => a == b },
      "replaying a batch tag must not change or duplicate decisions")
  }

  test("an empty micro-batch is a no-op that still lands its (empty) generation") {
    import spark.implicits._
    val (_, lake, idx, dec, _) = dirs()
    ContamGate.buildIndex(spark, Tables.documents(spark, sf), idx)
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    ContamGate.step(spark, empty, "empty-0", lake, idx, dec)
    assert(spark.read.parquet(dec).count() == 0)
    assert(spark.read.parquet(lake).count() == 0)
  }

  test("docs shorter than the shingle width still get a decision row and reach the lake") {
    // a doc with < ContamN tokens produces NO shingles — it cannot
    // contain a test n-gram, so it is trivially clean, and the audit
    // contract ("every doc to the decision log") must still hold
    import spark.implicits._
    val (_, lake, idx, dec, _) = dirs()
    ContamGate.buildIndex(spark, Tables.documents(spark, sf), idx)
    val batch = Seq(
      (3000001L, "tiny", "en", "t"),                       // 1 token, 0 shingles
      (3000002L, "just four small words", "en", "t"),      // 4 tokens, 0 shingles
      (3000003L, "alpha beta gamma delta epsilon zeta", "en", "t")) // shingled
      .toDF("doc_id", "text", "lang", "source")
    ContamGate.step(spark, batch, "short-0", lake, idx, dec)
    val decisions = spark.read.parquet(dec).collect()
      .map(r => r.getAs[Long]("train_doc") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Boolean]("contaminated"))).toMap
    assert(decisions.keySet == Set(3000001L, 3000002L, 3000003L),
      "every arriving doc must get a decision row")
    assert(decisions(3000001L) == (0L, false) && decisions(3000002L) == (0L, false))
    val lakeIds = spark.read.parquet(lake).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(lakeIds.contains(3000001L) && lakeIds.contains(3000002L),
      "trivially-clean short docs must reach the clean lake")
  }

  test("excise mode: streamed span excision equals batch c05 exactly; every doc lands cleaned") {
    val (src, lake, idx, dec, ckpt) = dirs()
    val docs = Tables.documents(spark, sf)
    ContamGate.buildIndex(spark, docs, idx)
    // stream exactly c05's population (the u < 0.9 train split), two
    // drops so the run spans multiple micro-batches
    val u = graft.functions.ColumnFns.md5_prefix64(col("doc_id").cast("string")) /
      lit(1152921504606846976.0)
    val train = docs.filter(u < 0.9).select("doc_id", "text", "lang", "source").cache()
    train.filter(col("doc_id") % 2 === 0).write.mode("append").json(src)
    train.filter(col("doc_id") % 2 =!= 0).write.mode("append").json(src)
    ContamGate.start(spark, src, lake, idx, dec, ckpt,
      cfg = ContamGate.Config(excise = true)).awaitTermination()

    // gate output reassembled into c05's image: span accounting from
    // the decision log, clean_text from the lake
    val streamed = spark.read.parquet(dec)
      .select(col("train_doc").as("doc_id"), col("n_toks"), col("n_removed"))
      .join(spark.read.parquet(lake).select(col("doc_id"), col("text").as("clean_text")),
        "doc_id")
    val batch = Catalog.byName("c05_contamination_excise").run(spark, sf)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "gate excision must equal the oracle-checked batch c05 output")

    // every arriving doc lands in the lake (excision KEEPS documents)
    assert(spark.read.parquet(lake).count() == train.count())
    // non-vacuity: something was excised, and most docs were untouched
    val removed = spark.read.parquet(dec)
      .filter(col("n_removed") > 0).count()
    assert(removed > 0, "the fixture must contain contaminated spans")
    assert(removed < train.count(), "excision must not touch clean docs")
    // the decision log's span count is consistent with the token delta
    val bad = spark.read.parquet(dec)
      .filter(col("n_spans") === 0 && col("n_removed") > 0).count()
    assert(bad == 0, "tokens can only be removed where spans hit")
  }

  test("excise mode: replayed batches re-land identical partitions") {
    import spark.implicits._
    val (_, lake, idx, dec, _) = dirs()
    ContamGate.buildIndex(spark, Tables.documents(spark, sf), idx)
    val batch = Seq(
      (4000001L, "alpha beta gamma delta epsilon zeta eta theta", "en", "t"),
      (4000002L, "one two three four five six seven eight nine", "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
    val cfg = ContamGate.Config(excise = true)
    ContamGate.step(spark, batch, "rep-0", lake, idx, dec, cfg)
    val first = spark.read.parquet(dec).collect().sortBy(_.getAs[Long]("train_doc"))
    val firstLake = spark.read.parquet(lake).collect().sortBy(_.getAs[Long]("doc_id"))
    ContamGate.step(spark, batch, "rep-0", lake, idx, dec, cfg) // replay
    val second = spark.read.parquet(dec).collect().sortBy(_.getAs[Long]("train_doc"))
    val secondLake = spark.read.parquet(lake).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(first.length == second.length &&
      first.zip(second).forall { case (a, b) => a == b },
      "replaying an excise batch tag must not change or duplicate decisions")
    assert(firstLake.length == secondLake.length &&
      firstLake.zip(secondLake).forall { case (a, b) => a == b },
      "replaying an excise batch tag must not change or duplicate lake rows")
  }

  test("bloom prefilter never changes the verdict (exact-verify tail kills false positives)") {
    // a doc sharing NO shingles with the test split must report n_hit 0
    // even though the bloom can fire spuriously
    import spark.implicits._
    val (_, lake, idx, dec, _) = dirs()
    ContamGate.buildIndex(spark, Tables.documents(spark, sf), idx)
    val clean = Seq((2000001L,
      "qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss", "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
    ContamGate.step(spark, clean, "fp-0", lake, idx, dec)
    val r = spark.read.parquet(dec).collect().head
    assert(r.getAs[Long]("n_hit") == 0L && !r.getAs[Boolean]("contaminated"))
  }
}
