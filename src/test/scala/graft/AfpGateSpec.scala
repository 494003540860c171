package graft

import graft.llm.Multimodal
import graft.streaming.AfpGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming acoustic media dedup: the m14 fingerprint run
  * continuously. Fixtures are m14's own variant blobs (pure functions
  * of id % 240), so expected groupings are residue arithmetic — a
  * 2x-gain re-master or a re-containered copy must drop against its
  * admitted original across batches and restarts, the gate's keepers
  * must agree with batch m14's election, and a forget must re-open
  * the door for exactly the forgotten content.
  */
class AfpGateSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_afp_gate").toString

  private def drop(dir: String, name: String, bytes: Array[Byte]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
  }

  // variant blobs by (residue, variant): pcm | loud (2x gain) | pad
  // (extra LIST chunk — byte-different container, same samples)
  private def blob(rid: Long, variant: String): Array[Byte] =
    Multimodal.afpVariants(rid).toMap.apply(variant)

  test("acoustic dups drop at the door across gain/container/batches/restarts; forget re-opens") {
    val base = tmp()
    val dropDir = s"$base/drop"; val lake = s"$base/lake"
    val index = s"$base/index"; val dec = s"$base/decisions"
    val ckpt = s"$base/ckpt"

    // batch 1: residue 0 three ways (pcm / 2x-gain / LIST-padded —
    // every decoded byte path differs, the fingerprint does not) plus
    // base-of-240 (the SAME signal), residue 2 once, and hostile
    // bytes: junk, a torn wav, an unsupported png, a dust clip
    drop(dropDir, "m1.wav", blob(0, "pcm"))
    drop(dropDir, "m2.wav", blob(0, "loud"))
    drop(dropDir, "m3.wav", blob(0, "pad"))
    drop(dropDir, "m5.wav", blob(240, "pcm"))
    drop(dropDir, "m4.wav", blob(2, "pcm"))
    drop(dropDir, "m8.bin", "JUNKJUNKJUNKJUNK".getBytes)
    // 50 bytes keeps the fmt chunk intact (sniffs wav-pcm) but tears
    // the data chunk mid-header — the parse, not the sniff, must fail
    drop(dropDir, "m9.wav", blob(0, "pcm").take(50))
    drop(dropDir, "m10.png", graft.functions.MediaCodecs.pngWrite(16, 16,
      Array.fill[Byte](16 * 16 * 3)(7)))
    drop(dropDir, "m11.wav", graft.functions.MediaCodecs.wavWrite(
      Array.tabulate[Short](30)(i => (i * 100).toShort), 8000)) // 30 < MinSamples

    AfpGate.start(spark, dropDir, lake, index, dec, ckpt).awaitTermination()

    val d1 = spark.read.parquet(dec)
      .select("media_id", "decision", "partner", "hamming").collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(d1.size == 9)
    // the residue-0 clique elects min media_id; all variants
    // fingerprint IDENTICALLY (PhashSpec m14), so drops record hamming 0
    assert(d1(1L) == (("admit", -1L, -1L)))
    assert(d1(2L) == (("drop_batch", 1L, 0L)))
    assert(d1(3L) == (("drop_batch", 1L, 0L)))
    assert(d1(5L) == (("drop_batch", 1L, 0L)))
    assert(d1(4L) == (("admit", -1L, -1L)))
    assert(d1(8L)._1 == "rejected:unrecognized")
    assert(d1(9L)._1 == "rejected:corrupt")
    assert(d1(10L)._1 == "rejected:unsupported")
    assert(d1(11L)._1 == "rejected:dust")
    assert(spark.read.parquet(lake).select("media_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    // the lake carries the decode's real metadata
    val m1 = spark.read.parquet(lake).filter(col("media_id") === 1L).head()
    assert(m1.getAs[String]("fmt") == "wav-pcm" &&
      m1.getAs[Long]("n_samples") == 2048L && m1.getAs[Long]("sample_rate") == 8000L)

    // batch 2 (same checkpoint — only new files process): a 2x-gain
    // re-master of admitted residue 2 must drop vs the CORPUS with its
    // partner named; a fresh residue admits
    drop(dropDir, "m6.wav", blob(2, "loud"))
    drop(dropDir, "m7.wav", blob(3, "pcm"))
    AfpGate.start(spark, dropDir, lake, index, dec, ckpt).awaitTermination()
    val d2 = spark.read.parquet(dec)
      .select("media_id", "decision", "partner").collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(d2.size == 11)
    assert(d2(6L) == (("drop_corpus", 4L)))
    assert(d2(7L) == (("admit", -1L)))
    assert(spark.read.parquet(lake).count() == 3)

    // restart with nothing new: re-ingests nothing, duplicates nothing
    AfpGate.start(spark, dropDir, lake, index, dec, ckpt).awaitTermination()
    assert(spark.read.parquet(dec).count() == 11)
    assert(spark.read.parquet(lake).count() == 3)
    val bandsPerAdmit = AfpGate.readBands(spark, index)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bandsPerAdmit == Map(1L -> 8L, 4L -> 8L, 7L -> 8L))

    // forget residue 2's keeper: its re-upload admits afresh, while a
    // dup of the SURVIVING residue 0 keeps dropping
    AfpGate.forget(spark, lake, index, col("media_id") === 4L)
    assert(spark.read.parquet(lake).count() == 2)
    drop(dropDir, "m12.wav", blob(2, "loud"))
    drop(dropDir, "m13.wav", blob(240, "pad"))
    AfpGate.start(spark, dropDir, lake, index, dec, ckpt).awaitTermination()
    val d3 = spark.read.parquet(dec)
      .select("media_id", "decision", "partner").collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(d3(12L) == (("admit", -1L)))
    assert(d3(13L) == (("drop_corpus", 1L)))
    assert(spark.read.parquet(lake).select("media_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 7L, 12L))
  }

  test("AIFF/AU re-containers of admitted WAV audio drop as acoustic dups") {
    import graft.functions.MediaCodecs
    val base = tmp()
    val dropDir = s"$base/drop"; val lake = s"$base/lake"
    val index = s"$base/index"; val dec = s"$base/decisions"
    val ckpt = s"$base/ckpt"
    // batch 1 admits the WAV original
    drop(dropDir, "m1.wav", blob(0, "pcm"))
    AfpGate.start(spark, dropDir, lake, index, dec, ckpt).awaitTermination()
    // batch 2: the SAME samples re-containered as AIFF and AU (every
    // byte of the container differs; the decoded fingerprint does not)
    // plus a genuinely different signal as AIFF
    drop(dropDir, "m2.aif", MediaCodecs.aiffWrite(Multimodal.afpSamples(0), 8000))
    drop(dropDir, "m3.au", MediaCodecs.auWrite(Multimodal.afpSamples(0), 8000))
    drop(dropDir, "m4.aif", MediaCodecs.aiffWrite(Multimodal.afpSamples(3), 8000))
    AfpGate.start(spark, dropDir, lake, index, dec, ckpt).awaitTermination()
    val d = spark.read.parquet(dec)
      .select("media_id", "fmt", "decision", "partner").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(d(2L) == (("aiff", "drop_corpus", 1L)))
    assert(d(3L) == (("au", "drop_corpus", 1L)))
    assert(d(4L) == (("aiff", "admit", -1L)))
    assert(spark.read.parquet(lake).select("media_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
  }

  test("the gate's admitted set equals batch m14's keeper election over the same corpus") {
    import spark.implicits._
    val base = tmp()
    val (lake, index, dec) = (s"$base/lake", s"$base/index", s"$base/dec")
    // file id r*10+v encodes (residue r, variant v) so the gate's
    // min-media_id election maps exactly onto m14's lexicographic
    // (media_id, variant) keeper: within residue r the min file id is
    // r*10 + 0 <=> m14's keeper (r, "loud") — the alphabetical min
    // variant — carries the same residue
    val variants = Seq("pcm", "loud", "pad")
    val files = (0L until 8L).flatMap { r =>
      variants.zipWithIndex.map { case (v, i) =>
        (s"f/m${r * 10 + i}.wav", blob(r, v))
      }
    }.toDF("path", "content")
    AfpGate.step(spark, files, "eq-1", lake, index, dec)

    // the gate admits exactly one blob per residue (min file id)
    val admitted = spark.read.parquet(lake).select("media_id").collect()
      .map(_.getLong(0)).toSet
    assert(admitted == (0L until 8L).map(_ * 10).toSet, s"admitted = $admitted")

    // batch m14 over the same 8 residues: same component structure —
    // every residue one group of 3, keeper unique per residue
    val m14 = Multimodal.afpNearDup(spark, (0L until 8L).toDF("doc_id"))
    val groups = m14.select("media_id", "group_size", "is_keeper").collect()
    assert(groups.forall(_.getLong(1) == 3L), "m14 group sizes diverged")
    val m14Keepers = m14.filter(col("is_keeper") === 1L)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(m14Keepers == (0L until 8L).toSet,
      s"m14 keepers = $m14Keepers — one per residue expected")
  }

  test("step replay with the same tag rewrites its generation byte-stably") {
    val base = tmp()
    val lake = s"$base/lake"; val index = s"$base/index"; val dec = s"$base/dec"
    import spark.implicits._
    def files = Seq(
      ("f/m21.wav", blob(7, "pcm")),
      ("f/m22.wav", blob(7, "loud")),
      ("f/m23.wav", blob(9, "pcm"))).toDF("path", "content")
    AfpGate.step(spark, files, "t-1", lake, index, dec)
    val lake1 = spark.read.parquet(lake).collect().map(_.toString).sorted.toSeq
    val dec1 = spark.read.parquet(dec).collect().map(_.toString).sorted.toSeq
    AfpGate.step(spark, files, "t-1", lake, index, dec)
    assert(spark.read.parquet(lake).collect().map(_.toString).sorted.toSeq == lake1)
    assert(spark.read.parquet(dec).collect().map(_.toString).sorted.toSeq == dec1)
    assert(AfpGate.readBands(spark, index).count() == 16) // 2 admits x 8 bands
  }

  test("the gate refuses a mismatched bucket layout and a leased root") {
    val base = tmp()
    val lake = s"$base/lake"; val index = s"$base/index"; val dec = s"$base/dec"
    import spark.implicits._
    val files = Seq(("f/m31.wav", blob(5, "pcm"))).toDF("path", "content")
    AfpGate.step(spark, files, "l-0", lake, index, dec,
      AfpGate.Config(indexBuckets = 64))
    intercept[IllegalArgumentException] {
      AfpGate.step(spark, files, "l-1", lake, index, dec,
        AfpGate.Config(indexBuckets = 8))
    }
    graft.streaming.LakeCompact.withLeases(spark, Seq(lake)) {
      intercept[IllegalStateException] {
        AfpGate.step(spark, files, "l-2", lake, index, dec)
      }
    }
  }

  test("an external audio decoder rides sniff -> guard -> gate acceptance, untouched gate code") {
    // the PhashGateSpec external-raster arm's acoustic twin: a toy
    // pure-JVM audio container ("xsnd": magic, u32 header-declared
    // sample claim, s16be payload at 8 kHz) registers through the
    // MediaDecoder SPI and the fingerprint gate admits/drops it with
    // untouched gate code
    import graft.streaming.MediaIngest
    def xsnd(samples: Array[Short], claim: Long = -1L): Array[Byte] = {
      val c = if (claim >= 0) claim else samples.length.toLong
      val out = java.nio.ByteBuffer.allocate(8 + samples.length * 2)
      out.put("XSND".getBytes("US-ASCII")).putInt(c.toInt)
      samples.foreach(out.putShort)
      out.array()
    }
    val toy = new Multimodal.MediaDecoder {
      val fmt = "xsnd"
      def sniff(bytes: Array[Byte]) =
        bytes.length >= 8 && new String(bytes.take(4), "US-ASCII") == "XSND"
      def declaredUnits(bytes: Array[Byte]) =
        if (bytes.length < 8) -1L
        else java.nio.ByteBuffer.wrap(bytes, 4, 4).getInt.toLong
      private def samples(bytes: Array[Byte]) = {
        val buf = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
        Array.fill((bytes.length - 8) / 2)(buf.getShort)
      }
      def decode(bytes: Array[Byte]) = {
        val s = samples(bytes)
        Multimodal.DecodedStats("audio", 1L, s.length.toLong,
          s.map(_.toLong.abs).sum, s.map(_.toLong.abs).max)
      }
      override def decodeSamples(bytes: Array[Byte]) = Some((8000, samples(bytes)))
    }
    def tone(seed: Int): Array[Short] =
      Array.tabulate[Short](128)(i => ((i * 7 + seed * 131) % 1024 - 512).toShort)

    val base = tmp()
    val dropDir = s"$base/drop"; val lake = s"$base/lake"
    val index = s"$base/index"; val dec = s"$base/decisions"
    drop(dropDir, "a1.xsnd", xsnd(tone(1)))
    drop(dropDir, "a2.xsnd", xsnd(tone(1)))                 // same signal -> dup
    drop(dropDir, "a3.xsnd", xsnd(tone(2)))                 // distinct -> admits
    drop(dropDir, "a4.xsnd", xsnd(tone(3), claim = 1L << 30)) // hostile claim
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(dropDir)
      .select(col("path"), col("content"))

    Multimodal.registerDecoder(toy)
    try {
      AfpGate.step(spark, files, "t-1", lake, index, dec)
      val d = spark.read.parquet(dec)
        .select("media_id", "decision").as[(Long, String)].collect().toMap
      def idOf(n: String) = MediaIngest.mediaIdOf(s"$dropDir/$n")
      assert(d(idOf("a1.xsnd")) == "admit")
      assert(d(idOf("a2.xsnd")) == "drop_batch")
      assert(d(idOf("a3.xsnd")) == "admit")
      assert(d(idOf("a4.xsnd")) == "rejected:oversize")
    } finally Multimodal.unregisterDecoder("xsnd")

    val after = AfpGate.fingerprintBatch(spark, files,
      graft.functions.MediaCodecs.MaxDeclaredUnits)
      .collect().map(h => h.verdict).toSet
    assert(after == Set("rejected:unrecognized"),
      "unregistering must leave the format unrecognized again")
  }
}
