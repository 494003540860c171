package graft

import java.nio.file.{Files, Paths}

import graft.streaming.SemanticGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantic gate: planted embedding near-dups across two
  * micro-batches must drop against the growing admitted vector index;
  * the admitted set must be pairwise below the radius; bucket pruning
  * must be lossless.
  */
class SemanticGateSpec extends AnyFunSuite {
  import TestSpark._

  /** deterministic unit-ish gaussian vector */
  private def vec(seed: Int): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val v = Array.fill(llm.Similarity.Dims)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  /** near-dup: tiny perturbation, cosine ~0.999, same sign pattern */
  private def perturb(v: Array[Double], seed: Int): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    v.map(x => x + rnd.nextGaussian() * 0.01)
  }
  private def row(id: Long, v: Array[Double]): String =
    s"""{"vec_id":$id,"embedding":[${v.map(x => f"$x%.6f").mkString(",")}],"label":0}"""

  test("cross-batch + intra-batch semantic near-dups drop; admitted set is radius-clean") {
    val base = Files.createTempDirectory("graft_semgate").toString
    val src = s"$base/src"; val lake = s"$base/lake"; val idx = s"$base/idx"
    val dec = s"$base/dec"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))

    val v1 = vec(1); val v2 = vec(2); val v3 = vec(3); val v4 = vec(4)
    // batch 1: two distinct vectors + an intra-batch near-dup pair (10~11)
    Files.write(Paths.get(s"$src/a.jsonl"), Seq(
      row(10, v1), row(11, perturb(v1, 101)), row(12, v2)
    ).mkString("\n").getBytes("UTF-8"))
    SemanticGate.start(spark, src, lake, idx, dec, ckpt).awaitTermination()

    // batch 2: near-dup of an admitted batch-1 vector (20~12), a
    // near-dup of the DROPPED 11's keeper (21~10), and two fresh
    Files.write(Paths.get(s"$src/b.jsonl"), Seq(
      row(20, perturb(v2, 102)), row(21, perturb(v1, 103)), row(22, v3), row(23, v4)
    ).mkString("\n").getBytes("UTF-8"))
    SemanticGate.start(spark, src, lake, idx, dec, ckpt).awaitTermination()

    val lakeDf = spark.read.parquet(lake).cache()
    val decisions = spark.read.parquet(dec).cache()
    val admitted = lakeDf.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(10L, 12L, 22L, 23L), s"admitted = $admitted")

    assert(decisions.count() == 7 && decisions.select("vec_id").distinct().count() == 7)
    val byId = decisions.collect().map(r =>
      r.getAs[Long]("vec_id") ->
        (r.getAs[String]("decision"), Option(r.getAs[java.lang.Long]("partner")))).toMap
    assert(byId(11L)._1 == "drop_batch" && byId(11L)._2.contains(10L))
    assert(byId(20L)._1 == "drop_corpus" && byId(20L)._2.contains(12L))
    assert(byId(21L)._1 == "drop_corpus" && byId(21L)._2.contains(10L))
    for (id <- Seq(10L, 12L, 22L, 23L)) assert(byId(id)._1 == "admit")

    // drop_corpus audit rows carry a verified cosine >= tau
    val cosines = decisions.filter(col("decision") === "drop_corpus")
      .select("cos").collect().map(_.getDouble(0))
    assert(cosines.nonEmpty && cosines.forall(_ >= 0.4), cosines.mkString(","))

    // the admitted set is pairwise below the radius (the gate's whole
    // contract), verified brute-force over the lake
    val e1 = lakeDf.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val e2 = lakeDf.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val hot = e1.crossJoin(e2).filter(col("a") < col("b"))
      .filter(round(llm.Similarity.cosine(col("ea"), col("eb")), 6) >= 0.4)
      .count()
    assert(hot == 0, "admitted vectors within the dedup radius")
    lakeDf.unpersist(); decisions.unpersist()
  }

  test("bucket pruning is lossless: 64-bucket and 1-bucket semantic gates decide identically") {
    import spark.implicits._
    def dirs() = {
      val b = Files.createTempDirectory("graft_semgate_prune").toString
      (s"$b/lake", s"$b/idx", s"$b/dec")
    }
    def batch(b: Int) = {
      val fresh = (0 until 2).map(i => (b * 10L + i, vec(500 + b * 2 + i).map(_.toFloat).toSeq))
      val dup = if (b > 0) Seq((b * 10L + 9, perturb(vec(500), 600 + b).map(_.toFloat).toSeq)) else Nil
      (fresh ++ dup).toDF("vec_id", "embedding")
        .withColumn("label", lit(0))
    }
    val (lakeA, idxA, decA) = dirs()
    val (lakeB, idxB, decB) = dirs()
    for (b <- 0 until 4) {
      SemanticGate.step(spark, batch(b), f"p-$b%03d", lakeA, idxA, decA,
        SemanticGate.Config(indexBuckets = 64))
      SemanticGate.step(spark, batch(b), f"p-$b%03d", lakeB, idxB, decB,
        SemanticGate.Config(indexBuckets = 1))
    }
    def verdicts(dec: String) = spark.read.parquet(dec)
      .select("vec_id", "decision").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(verdicts(decA) == verdicts(decB), "bucket pruning changed a decision")
    // and the planted cross-batch dups all dropped
    val drops = verdicts(decA).filter(_._2 == "drop_corpus").map(_._1)
    assert((1 until 4).forall(b => drops.contains(b * 10L + 9)), s"missed drops: $drops")
  }

  test("band-width rebuild in the lease window never changes a past decision and keeps catching dups") {
    import spark.implicits._
    val b = Files.createTempDirectory("graft_semgate_rebuild").toString
    val (lake, idx, dec) = (s"$b/lake", s"$b/idx", s"$b/dec")
    val narrow = SemanticGate.Config(planes = 8, bandBits = 2)
    val wide = SemanticGate.Config(planes = 16, bandBits = 4)
    def batchDf(rows: Seq[(Long, Array[Double])]) =
      rows.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("vec_id", "embedding").withColumn("label", lit(0))

    // build at the NARROW creation-time width: two batches so the index
    // carries real probe history (11 drops vs 10 in-batch, 19 vs 10
    // cross-batch)
    val v1 = vec(800); val v2 = vec(801); val v3 = vec(802)
    SemanticGate.step(spark, batchDf(Seq(
      10L -> v1, 11L -> perturb(v1, 810), 12L -> v2)), "w-0", lake, idx, dec, narrow)
    SemanticGate.step(spark, batchDf(Seq(
      19L -> perturb(v1, 811), 13L -> v3)), "w-1", lake, idx, dec, narrow)
    val lakeBefore = spark.read.parquet(lake).collect().map(_.toString).sorted.toSeq
    val decBefore = spark.read.parquet(dec).collect().map(_.toString).sorted.toSeq
    assert(decBefore.size == 5)

    // the corpus outgrew width 8x2: REBUILD the band table at 16x4
    SemanticGate.rebuildBands(spark, idx, wide)

    // past decisions and the admitted lake are byte-identical
    assert(spark.read.parquet(lake).collect().map(_.toString).sorted.toSeq == lakeBefore)
    assert(spark.read.parquet(dec).collect().map(_.toString).sorted.toSeq == decBefore)
    // exactly one band generation remains, and it is the wide-width
    // signature of exactly the admitted vectors (rebuild ≡ recompute)
    // the rebuild published as a fresh base tier and retired every
    // band delta generation in one atomic swap
    val bandDirs = new java.io.File(s"$idx/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(bandDirs.count(_.startsWith("batch=")) == 0 && bandDirs.contains("_base"),
      s"band dirs = $bandDirs")
    def bandSet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "band", "bv").collect()
        .map(r => (r.get(0).toString, r.get(1).toString, r.get(2).toString)).toSet
    val rebuilt = bandSet(SemanticGate.readBands(spark, idx))
    val expected = bandSet(llm.Similarity.hyperplaneBands(
      SemanticGate.readVectors(spark, idx).select("vec_id", "embedding"),
      wide.planes, wide.bandBits))
    assert(rebuilt == expected, "rebuilt bands must equal a fresh wide-width recompute")

    // the gate continues at the WIDE width: a dup of an admitted vector
    // still drops against it, a fresh vector still admits
    SemanticGate.step(spark, batchDf(Seq(
      20L -> perturb(v2, 812), 21L -> vec(803))), "w-2", lake, idx, dec, wide)
    val byId = spark.read.parquet(dec).collect().map(r =>
      r.getAs[Long]("vec_id") ->
        (r.getAs[String]("decision"), Option(r.getAs[java.lang.Long]("partner")))).toMap
    assert(byId(20L) == (("drop_corpus", Some(12L))), s"20 -> ${byId(20L)}")
    assert(byId(21L)._1 == "admit")
    // admitted vectors stayed admitted across the width change
    val admitted = spark.read.parquet(lake).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(admitted == Set(10L, 12L, 13L, 21L), s"admitted = $admitted")
  }

  test("forget evicts a vector from lake + index: a copy re-admits, other dups still drop") {
    import spark.implicits._
    val b = Files.createTempDirectory("graft_semgate_forget").toString
    val (lake, idx, dec) = (s"$b/lake", s"$b/idx", s"$b/dec")
    def batchDf(rows: Seq[(Long, Array[Double])]) =
      rows.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
        .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val v1 = vec(900); val v2 = vec(901)
    SemanticGate.step(spark, batchDf(Seq(1L -> v1, 2L -> v2)), "g1", lake, idx, dec)
    SemanticGate.forget(spark, lake, idx, col("vec_id") === 1L)
    assert(spark.read.parquet(lake).select("vec_id").collect().map(_.getLong(0)).toSet == Set(2L))
    assert(SemanticGate.readVectors(spark, idx).filter(col("vec_id") === 1L).count() == 0)
    assert(SemanticGate.readBands(spark, idx).filter(col("vec_id") === 1L).count() == 0)
    SemanticGate.step(spark,
      batchDf(Seq(10L -> v1, 11L -> perturb(v2, 902))), "g2", lake, idx, dec)
    val byId = spark.read.parquet(dec).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("decision")).toMap
    assert(byId(10L) == "admit", s"copy of forgotten vector must re-admit, got ${byId(10L)}")
    assert(byId(11L) == "drop_corpus", s"dup of surviving vector must still drop, got ${byId(11L)}")
  }

  test("a mismatched indexBuckets config is refused, not silently mis-probed") {
    import spark.implicits._
    val b = Files.createTempDirectory("graft_semgate_layout").toString
    val batch = Seq((1L, vec(700).map(_.toFloat).toSeq)).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    SemanticGate.step(spark, batch, "l-0", s"$b/lake", s"$b/idx", s"$b/dec",
      SemanticGate.Config(indexBuckets = 64))
    intercept[IllegalArgumentException] {
      SemanticGate.step(spark, batch, "l-1", s"$b/lake", s"$b/idx", s"$b/dec",
        SemanticGate.Config(indexBuckets = 8))
    }
  }
}
