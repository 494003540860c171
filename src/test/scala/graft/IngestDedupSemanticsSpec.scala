package graft

import java.nio.file.{Files, Paths}

import graft.blocks.{Fixtures, Flatten}
import graft.streaming.BlockIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ingest pre-dedup key probe's keep/drop set to
  * [[Flatten.parse]]'s (r16 ADVICE): a line whose raw `$.block.header
  * .height` path CASTS to a Long but fails the typed `from_json` parse
  * must never occupy a `dropDuplicatesWithinWatermark` state slot — it
  * would shadow a subsequent valid line at the same height inside the
  * watermark, and that height would never land in the lake. The probe
  * ([[BlockIngest.headerProbeSchema]]) shares the full parse's parser
  * and leaf types, so keep/drop coincide BY CONSTRUCTION; this spec is
  * the drift alarm if either side's semantics move.
  */
class IngestDedupSemanticsSpec extends AnyFunSuite {
  import TestSpark._

  private val h = 424242L
  private val good = Fixtures.blockJson(h)
  require(good.contains(s""""height":$h"""), "fixture shape changed")

  /** label -> wire line; every way a height-bearing line can deviate
    * from the declared schema, plus controls that must stay kept
    */
  private val corpus: Seq[(String, String)] = Seq(
    "valid" -> good,
    // the ADVICE scenario: raw path casts to Long, typed parse nulls it
    "height quoted as string" ->
      good.replace(s""""height":$h""", s""""height":"$h""""),
    "height float literal" ->
      good.replace(s""""height":$h""", s""""height":$h.5"""),
    "height overflows i64" ->
      good.replace(s""""height":$h""", """"height":18446744073709551616"""),
    "height non-numeric" ->
      good.replace(s""""height":$h""", """"height":"tall""""),
    "height null literal" ->
      good.replace(s""""height":$h""", """"height":null"""),
    "height key absent" ->
      good.replace(s""""height":$h,""", ""),
    "header is a scalar" -> {
      val from = good.indexOf(""""header":{"""); val start = from + 9
      // replace the balanced {...} after "header": with a scalar
      var depth = 0; var end = start
      while ({ val c = good.charAt(end)
        if (c == '{') depth += 1 else if (c == '}') depth -= 1; depth != 0 }) end += 1
      good.substring(0, start) + "7" + good.substring(end + 1)
    },
    "block is a scalar" ->
      good.replaceFirst("""\{"block":\{""", """{"block":9,"dead":{"""),
    "malformed json" -> good.dropRight(30),
    "doc is json null" -> "null",
    "doc is a bare array" -> s"[$h]",
    // controls: damage OUTSIDE the dedup key — both sides must KEEP
    // (partial-result parsing nulls only the failing leaf)
    "timestamp quoted as string" -> {
      val m = """"timestamp":(\d+)""".r
      m.replaceAllIn(good, mm => s""""timestamp":"${mm.group(1)}"""")
    },
    "unrelated leaf type error (nonce quoted)" -> {
      val m = """"nonce":(\d+)""".r
      m.replaceAllIn(good, mm => s""""nonce":"${mm.group(1)}"""")
    }
  )

  /** the probe's keep decision, exactly as startFrom computes it */
  private def probeKeeps(line: String): Boolean = {
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(line)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    df.withColumn("hdr", from_json(col("value"), BlockIngest.headerProbeSchema))
      .filter(col("hdr.block.header.height").isNotNull)
      .count() == 1
  }

  private def parseKeeps(line: String): Boolean = {
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(line)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    Flatten.parse(spark, df).count() == 1
  }

  test("probe keep/drop set coincides with Flatten.parse's on every corpus line") {
    for ((label, line) <- corpus) {
      val p = probeKeeps(line); val f = parseKeeps(line)
      assert(p == f, s"$label: probe=${if (p) "keep" else "drop"} " +
        s"but full parse=${if (f) "keep" else "drop"} — dedup state can " +
        (if (p) "be poisoned by a line the parse rejects"
         else "reject a line the parse accepts"))
    }
    // the corpus must actually exercise both outcomes
    val kept = corpus.count { case (_, l) => parseKeeps(l) }
    assert(kept >= 2 && kept < corpus.size, s"degenerate corpus: $kept kept")
  }

  test("a schema-invalid line cannot shadow a later valid line at the same height") {
    // cross-batch so arrival order into the dedup state store is
    // deterministic: batch 1 delivers ONLY the poisoned line, batch 2
    // the valid one at the same height within the watermark
    val base = Files.createTempDirectory("graft_shadow").toString
    val src = s"$base/src"; val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))
    val poisoned = good.replace(s""""height":$h""", s""""height":"$h"""")
    Files.write(Paths.get(s"$src/a.jsonl"), poisoned.getBytes("UTF-8")): Unit
    BlockIngest.start(spark, src, lake, ckpt).awaitTermination()
    Files.write(Paths.get(s"$src/b.jsonl"), good.getBytes("UTF-8")): Unit
    BlockIngest.start(spark, src, lake, ckpt).awaitTermination()

    val landed = spark.read.parquet(s"$lake/blocks")
      .filter(col("block_height") === h).count()
    assert(landed == 1L, s"valid line at height $h was shadowed (landed=$landed)")

    // and the poisoned line is dead-lettered, not silently dropped
    val rej = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(poisoned)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    assert(Flatten.rejects(spark, rej).count() == 1L)
  }
}
