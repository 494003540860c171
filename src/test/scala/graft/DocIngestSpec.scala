package graft

import java.nio.file.{Files, Paths}

import graft.streaming.DocIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming curation gate: file-drop docs -> quality gates ->
  * fingerprint dedup within watermark -> lang-partitioned lake, with
  * checkpointed restart (no loss, no dup).
  */
class DocIngestSpec extends AnyFunSuite {
  import TestSpark._

  private def doc(id: Long, text: String, lang: String = "en"): String =
    s"""{"doc_id":$id,"text":"$text","lang":"$lang","source":"crawl"}"""

  private val longText = (1 to 50).map(i => s"word$i").mkString(" ")

  test("quality gates + fingerprint dedup + restart resume") {
    val base = Files.createTempDirectory("graft_docs").toString
    val src = s"$base/src"; val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))

    // batch 1: two keepers (one de), one short doc, one exact dup of id 1
    Files.write(Paths.get(s"$src/a.jsonl"), Seq(
      doc(1, longText),
      doc(2, longText.replace("word1", "wort1"), "de"),
      doc(3, "too short"),
      doc(4, longText) // same fp as 1 -> deduped within watermark
    ).mkString("\n").getBytes("UTF-8"))
    DocIngest.start(spark, src, lake, ckpt).awaitTermination()

    // restart: a replayed dup (same file content re-dropped) + a new doc
    Files.write(Paths.get(s"$src/b.jsonl"), Seq(
      doc(5, longText + " extra"),
      doc(6, "tiny")
    ).mkString("\n").getBytes("UTF-8"))
    DocIngest.start(spark, src, lake, ckpt).awaitTermination()

    val lakeDf = spark.read.parquet(lake)
    val ids = lakeDf.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 3 and 6 fail the length gate; exactly one of {1,4} survives dedup; 2 and 5 kept
    assert(!ids.contains(3L) && !ids.contains(6L))
    assert(ids.count(id => id == 1L || id == 4L) == 1)
    assert(ids.contains(2L) && ids.contains(5L))
    // fingerprints unique in the curated lake
    assert(lakeDf.select("fp").distinct().count() == lakeDf.count())
    // lang partitioning materialized on disk inside each batch-scoped
    // generation (batch=N/lang=X — the idempotent-replay layout)
    import scala.jdk.CollectionConverters._
    def langDirs() = Files.walk(Paths.get(lake)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("lang=")).toList
    assert(langDirs().exists(_.getFileName.toString == "lang=de"))
    // gate columns (+ the batch generation partition col) present for
    // downstream curation readers
    assert(lakeDf.columns.toSet == Set("doc_id", "text", "source", "n_tokens", "fp", "lang", "batch"))

    // third generation, then compaction: same rows (modulo the folded
    // batch column), fold + protected newest tail, one file per lang
    // partition inside the fold
    Files.write(Paths.get(s"$src/c.jsonl"),
      doc(8, longText + " third batch doc").getBytes("UTF-8"))
    DocIngest.start(spark, src, lake, ckpt).awaitTermination()
    val before = spark.read.parquet(lake).drop("batch").collect().toSet
    DocIngest.compact(spark, lake)
    assert(spark.read.parquet(lake).drop("batch").collect().toSet == before)
    val gens = Files.list(Paths.get(lake)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("batch=")).toList
    val fold = gens.filter(_.getFileName.toString.startsWith("batch=compact-"))
    assert(gens.size == 2 && fold.size == 1, s"got ${gens.map(_.getFileName)}")
    val enFiles = Files.list(fold.head.resolve("lang=en")).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(enFiles == 1, s"expected 1 compacted file, got $enFiles")
  }

  test("keeper-gated ingest elects the best-quality dup across a restart") {
    val base = Files.createTempDirectory("graft_docs_keeper").toString
    val src = s"$base/src"; val out = s"$base/decisions"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))

    // two docs, same fingerprint-relevant content? No — keeper keys on
    // fp, so use EXACT dup texts (same fp) with different doc_ids; and
    // one distinct doc. Quality is identical for identical text, so the
    // tie breaks toward the first-processed (lowest doc_id) incumbent.
    Files.write(Paths.get(s"$src/a.jsonl"), Seq(
      doc(1, longText),
      doc(4, longText), // same fp as 1 -> tie -> incumbent (1) keeps
      doc(2, longText + " unique tail here")
    ).mkString("\n").getBytes("UTF-8"))
    DocIngest.startKeeper(spark, src, out, ckpt).awaitTermination()

    // restart with state recovered from the RocksDB checkpoint: another
    // copy of fp(longText) must DROP (state remembers keeper 1)
    Files.write(Paths.get(s"$src/b.jsonl"), Seq(
      doc(7, longText)
    ).mkString("\n").getBytes("UTF-8"))
    DocIngest.startKeeper(spark, src, out, ckpt).awaitTermination()

    val log = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("decision"))).toMap
    assert(log.size == 4)
    assert(log(1L) == "admit" && log(4L) == "drop" && log(2L) == "admit")
    assert(log(7L) == "drop", "restart lost keeper state")
  }

  test("keeperCompact folds the decision log into the current keeper set") {
    val base = Files.createTempDirectory("graft_docs_compact").toString
    val src = s"$base/src"; val out = s"$base/decisions"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))

    // contentFingerprint lowercases, qualityScore does not (stopword
    // match is exact): "The ..." and "the ..." share a fingerprint with
    // different quality — so a later lowercase copy genuinely SUPERSEDES
    // through the real ingest path, not a hand-fed decision log.
    val tail = (1 to 40).map(i => s"word$i").mkString(" ")
    Files.write(Paths.get(s"$src/a.jsonl"), Seq(
      doc(1, s"The and of $tail"),      // admit (capital The: lower quality)
      doc(2, tail + " standalone doc")  // admit (its own fp)
    ).mkString("\n").getBytes("UTF-8"))
    DocIngest.startKeeper(spark, src, out, ckpt).awaitTermination()
    Files.write(Paths.get(s"$src/b.jsonl"), Seq(
      doc(3, s"the and of $tail"),      // same fp as 1, better quality -> supersede
      doc(4, s"The and of $tail")       // worse again -> drop
    ).mkString("\n").getBytes("UTF-8"))
    DocIngest.startKeeper(spark, src, out, ckpt).awaitTermination()

    val keepers = DocIngest.keeperCompact(spark, out).collect()
      .map(r => r.getAs[String]("fp") -> (r.getAs[Long]("doc_id"), r.getAs[Double]("quality")))
      .toMap

    // batch recount over the same decision log: max-quality doc per fp
    val expected = spark.read.parquet(out)
      .collect()
      .map(r => (r.getAs[String]("fp"), r.getAs[Long]("doc_id"), r.getAs[Double]("quality")))
      .groupBy(_._1)
      .map { case (fp, rows) => fp -> rows.maxBy(r => (r._3, -r._2)) }
    assert(keepers.keySet == expected.keySet)
    assert(keepers.size == 2)
    expected.foreach { case (fp, (_, id, q)) =>
      assert(keepers(fp) == ((id, q)), s"fp=$fp")
    }
    // and the supersede actually happened: doc 3 owns doc 1's fingerprint
    assert(keepers.values.map(_._1).toSet == Set(3L, 2L))
  }

  test("lake schema evolution: readers merge old files with a widened schema") {
    // the lake outlives any one writer version: files written before a
    // column existed must stay readable next to files written after.
    // Parquet + mergeSchema gives additive evolution for free — this
    // pins the behavior (old rows null-fill, no reader config beyond
    // the flag, pruning still works on the shared columns).
    val lake = Files.createTempDirectory("graft_lake_evo").toString
    import spark.implicits._
    Seq((1L, "alpha", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(lake)
    Seq((2L, "beta", "en", 0.9)).toDF("doc_id", "text", "lang", "quality")
      .write.mode("append").parquet(lake)

    val merged = spark.read.option("mergeSchema", "true").parquet(lake)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "quality"))
    val byId = merged.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("quality"))) // old file null-fills
    assert(byId(2L).getAs[Double]("quality") == 0.9)
    // filters on pre-evolution columns still push down across versions
    assert(merged.filter(col("doc_id") === 2L).count() == 1)
  }

  test("the bench keeper probe elects under duplicate pressure and reports a positive rate") {
    // the probe's own require() enforces a non-empty decision log
    val rate = graft.Bench.keeperRun(spark, "/root/testdata/sf0.001")
    assert(rate > 0, s"keeper probe rate $rate")
  }
}
