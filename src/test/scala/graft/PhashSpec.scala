package graft

import graft.functions.MediaCodecs
import graft.llm.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Invariants behind m13's residue-arithmetic oracle. The catalog
  * entry's DuckDB oracle derives groups purely from id % 240; that is
  * only sound if (a) the three perceptual variants of every residue
  * hash IDENTICALLY through the real write -> sniff -> decode -> pool
  * -> DCT path, and (b) no two DISTINCT residues land within the
  * banding join's hamming threshold. Only 240 distinct rasters exist,
  * so both properties are enumerable — this spec enumerates them,
  * which makes the floating-point margins (brightness shift moves AC
  * coefficients by ~1e-13 while median gaps are O(1)) a checked fact
  * rather than an analysis.
  */
class PhashSpec extends AnyFunSuite {
  import TestSpark._

  private val MaxHamming = 7

  private def decode(bytes: Array[Byte]): MediaCodecs.Ppm =
    MediaCodecs.sniff(bytes) match {
      case Some("png") => MediaCodecs.pngParse(bytes)
      case Some("ppm") => MediaCodecs.ppmParse(bytes)
      case other => fail(s"unexpected container $other")
    }

  private lazy val residueHashes: Map[Long, Long] =
    (0L until 240L).map { rid =>
      val hs = Multimodal.phashVariants(rid).map { case (_, bytes) =>
        Multimodal.perceptualHash(decode(bytes))
      }
      assert(hs.distinct.size == 1,
        s"residue $rid: variants hash apart (${hs.mkString(", ")})")
      rid -> hs.head
    }.toMap

  test("all three variants of every residue hash identically (240/240)") {
    assert(residueHashes.size == 240)
  }

  test("brightness shift changes the decoded bytes, not the hash") {
    // the +8 PPM really is a different decoded raster (else m13 would
    // be m12 in disguise) — decode both and compare
    val vs = Multimodal.phashVariants(7L).toMap
    val base = decode(vs("base"))
    val bright = decode(vs("bright"))
    assert(!java.util.Arrays.equals(base.rgb, bright.rgb))
    assert((bright.rgb(0) & 0xff) == (base.rgb(0) & 0xff) + 8)
  }

  test("the 2x upscale changes the dimensions, not the hash") {
    val vs = Multimodal.phashVariants(7L).toMap
    val scaled = decode(vs("scaled"))
    assert(scaled.w == 64 && scaled.h == 64)
  }

  test("distinct residues stay beyond the hamming threshold (all pairs)") {
    val hs = residueHashes.toSeq.sortBy(_._1)
    var minD = 64
    for (i <- hs.indices; j <- (i + 1) until hs.size) {
      val d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if (d < minD) minD = d
      assert(d > MaxHamming,
        s"residues ${hs(i)._1} and ${hs(j)._1} collide at hamming $d")
    }
    // the fixtures are deterministic, so the observed floor is a
    // constant of the set — pin it (ARCHITECTURE quotes 14; asserting
    // only > MaxHamming would let the headroom erode silently)
    assert(minD >= 14, s"m13 cross-residue hamming floor eroded to $minD")
    info(s"minimum cross-residue hamming distance: $minD")
  }

  test("hashes are median-balanced: 31 bits set, DC bit clear") {
    residueHashes.values.foreach { h =>
      assert(java.lang.Long.bitCount(h) == 31)
      assert((h & (1L << 63)) == 0L)
    }
  }

  // ------------------------- m14: the acoustic fingerprint's turn

  private lazy val afpHashes: Map[Long, Long] =
    (0L until 240L).map { rid =>
      val hs = Multimodal.afpVariants(rid).map { case (_, bytes) =>
        assert(MediaCodecs.sniff(bytes).contains("wav-pcm"))
        Multimodal.audioFingerprint(MediaCodecs.wavParse(bytes).samples)
      }
      assert(hs.distinct.size == 1,
        s"residue $rid: audio variants fingerprint apart")
      rid -> hs.head
    }.toMap

  test("m14: all three audio variants of every residue fingerprint identically (240/240)") {
    assert(afpHashes.size == 240)
  }

  test("m14: gain doubles every decoded sample, the LIST chunk changes every byte — not the fingerprint") {
    val vs = Multimodal.afpVariants(5L).toMap
    val pcm = MediaCodecs.wavParse(vs("pcm")).samples
    val loud = MediaCodecs.wavParse(vs("loud")).samples
    val pad = MediaCodecs.wavParse(vs("pad")).samples
    assert(loud.toSeq != pcm.toSeq && loud(7) == (pcm(7) * 2).toShort)
    assert(pad.toSeq == pcm.toSeq && !java.util.Arrays.equals(vs("pad"), vs("pcm")))
  }

  test("m14: distinct residues stay beyond the hamming threshold (all pairs)") {
    val hs = afpHashes.toSeq.sortBy(_._1)
    var minD = 64
    for (i <- hs.indices; j <- (i + 1) until hs.size) {
      val d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if (d < minD) minD = d
      assert(d > MaxHamming,
        s"residues ${hs(i)._1} and ${hs(j)._1} collide at hamming $d")
    }
    // deterministic fixtures: pin the observed acoustic floor too
    assert(minD >= 13, s"m14 cross-residue hamming floor eroded to $minD")
    info(s"minimum cross-residue hamming distance: $minD")
    afpHashes.values.foreach(h => assert((h & (1L << 63)) == 0L))
  }

  test("afpNearDup groups the variant corpus by residue with loud keepers") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 240L)
    val out = Multimodal.afpNearDup(spark, ids.toDF("doc_id"), MaxHamming)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 9)
    for (id <- ids; v <- Seq("pcm", "loud", "pad")) {
      val (size, keeper, isKeeper) = out((id, v))
      assert(size == (if (id % 240 == 0) 6L else 3L))
      assert(keeper == id % 240)
      assert(isKeeper == (if (id == id % 240 && v == "loud") 1L else 0L))
    }
  }

  test("phashNearDup groups the variant corpus by residue with base keepers") {
    import spark.implicits._
    // two full residue collisions (0/240, 1/241) + two singleton ids
    val ids = Seq(0L, 1L, 2L, 3L, 240L, 241L)
    val docs = ids.toDF("doc_id")
    val out = Multimodal.phashNearDup(spark, docs, MaxHamming)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == ids.size * 3)
    for (id <- ids; v <- Seq("base", "bright", "scaled")) {
      val (size, keeper, isKeeper) = out((id, v))
      val expectSize = if (id % 240 <= 1) 6L else 3L
      assert(size == expectSize, s"($id,$v) group_size $size != $expectSize")
      assert(keeper == id % 240, s"($id,$v) keeper $keeper")
      val expectKeeper = if (id == id % 240 && v == "base") 1L else 0L
      assert(isKeeper == expectKeeper, s"($id,$v) is_keeper")
    }
  }
}
