package graft

import graft.functions.MediaCodecs._
import graft.llm.Multimodal
import graft.streaming.MediaIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming multimodal ingest: files in, sniffed + really-decoded +
  * verdicted out — kept content in a kind-partitioned lake, every
  * reject in the decision log with a reason, replays idempotent.
  */
class MediaIngestSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_media_ingest").toString

  private def drop(dir: String, name: String, bytes: Array[Byte]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
  }

  test("media id derives from trailing basename digits, else a stable hash") {
    assert(MediaIngest.mediaIdOf("/drop/m104.gif") == 104L)
    assert(MediaIngest.mediaIdOf("/a/b/000017.png") == 17L)
    val h = MediaIngest.mediaIdOf("/drop/noid.png")
    assert(h > 0 && h == MediaIngest.mediaIdOf("/elsewhere/noid.png"))
  }

  test("drop dir ingests through sniff + real decode: kept lake, reasons for the rest") {
    val base = tmp()
    val dropDir = s"$base/drop"; val lake = s"$base/lake"
    val dec = s"$base/decisions"; val ckpt = s"$base/ckpt"

    val rgb = Array.tabulate(10 * 8 * 3)(i => (i % 251).toByte)
    drop(dropDir, "m101.png", pngWrite(10, 8, rgb))
    drop(dropDir, "m102.wav", wavWrite(Array.tabulate[Short](60)(i => (i * 7 - 200).toShort), 8000))
    drop(dropDir, "m103.wav", ulawWavWrite(Array.tabulate(50)(i => ulawEncode((i * 31).toShort)), 8000))
    drop(dropDir, "m104.gif", gifWrite(5, 4, Seq.tabulate(3)(f => Array.tabulate(20)(i => ((i + f) % 216).toByte))))
    drop(dropDir, "m105.ppm", ppmWrite(6, 5, Array.tabulate(6 * 5 * 3)(i => (i % 97).toByte)))
    drop(dropDir, "m106.jpg", jpegWrite(16, 12, Array.tabulate(16 * 12 * 3)(i => (i % 120).toByte)))
    drop(dropDir, "m107.png", pngWrite(10, 8, rgb).take(20)) // magic ok, body torn
    drop(dropDir, "m108.bin", "JUNKJUNKJUNKJUNKJUNK".getBytes)
    drop(dropDir, "m109.png", pngWrite(2, 2, Array.tabulate(12)(_.toByte))) // 4 px: dust

    MediaIngest.start(spark, dropDir, lake, dec, ckpt).awaitTermination()

    val verdicts = spark.read.parquet(dec)
      .select("media_id", "fmt", "verdict").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(verdicts.size == 9)
    assert(verdicts(101L) == ("png", "kept") && verdicts(105L) == ("ppm", "kept"))
    assert(verdicts(102L) == ("wav-pcm", "kept") && verdicts(103L) == ("wav-ulaw", "kept"))
    assert(verdicts(104L) == ("gif", "kept") && verdicts(106L) == ("jpeg", "kept"))
    assert(verdicts(107L) == ("png", "rejected:corrupt"))
    assert(verdicts(108L) == ("unknown", "rejected:unrecognized"))
    assert(verdicts(109L) == ("png", "rejected:dust"))

    // the kept lake: only decodable non-dust rows, kind-partitioned,
    // stats equal to a direct run of the shared decode kernel
    val kept = spark.read.parquet(lake)
    assert(kept.select("media_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(101L, 102L, 103L, 104L, 105L, 106L))
    assert(kept.filter(col("kind") === "video").count() == 1)
    assert(kept.filter(col("kind") === "audio").count() == 2)
    val gifRow = kept.filter(col("media_id") === 104L).collect()(0)
    val direct = Multimodal.decodeStats("gif",
      gifWrite(5, 4, Seq.tabulate(3)(f => Array.tabulate(20)(i => ((i + f) % 216).toByte))))
    assert(gifRow.getAs[Long]("n_frames") == direct.n_frames &&
      gifRow.getAs[Long]("n_units") == direct.n_units &&
      gifRow.getAs[Long]("sum_vals") == direct.sum_vals &&
      gifRow.getAs[Long]("peak") == direct.peak)

    // replay idempotence: a restart over the same checkpoint re-ingests
    // nothing and duplicates nothing
    MediaIngest.start(spark, dropDir, lake, dec, ckpt).awaitTermination()
    assert(spark.read.parquet(lake).count() == 6)
    assert(spark.read.parquet(dec).count() == 9)

    // late arrivals flow through the SAME checkpoint lineage as a new
    // batch-scoped generation
    drop(dropDir, "m110.ppm", ppmWrite(4, 5, Array.tabulate(4 * 5 * 3)(i => (i % 89).toByte)))
    MediaIngest.start(spark, dropDir, lake, dec, ckpt).awaitTermination()
    assert(spark.read.parquet(lake).count() == 7)
    assert(spark.read.parquet(dec)
      .filter(col("media_id") === 110L && col("verdict") === "kept").count() == 1)
  }

  test("BMP/TIFF/AIFF/AU route through the ingest: kept with real stats, truncations rejected") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rgb = Array.tabulate(10 * 8 * 3)(i => (i % 233).toByte)
    val ss = Array.tabulate[Short](400)(i => ((i * 37) % 9000 - 4500).toShort)
    val blobs = Seq(
      "/drop/m401.bmp" -> bmpWrite(10, 8, rgb),
      "/drop/m402.tif" -> tiffWrite(10, 8, rgb),
      "/drop/m403.aif" -> aiffWrite(ss, 16000),
      "/drop/m404.au" -> auWrite(ss, 16000),
      // truncated-header arms: the router must reject, never throw
      "/drop/m405.bmp" -> bmpWrite(10, 8, rgb).take(20), // below the DIB field
      "/drop/m406.tif" -> tiffWrite(10, 8, rgb).take(6), // IFD offset torn
      "/drop/m407.aif" -> aiffWrite(ss, 16000).take(12), // no COMM chunk
      "/drop/m408.au" -> auWrite(ss, 16000).take(12))    // header cut mid-field
    val files = spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map { case (p, b) => Row(p, b) }),
      StructType(Seq(StructField("path", StringType), StructField("content", BinaryType))))
    val out = MediaIngest.decide(spark, files).collect()
      .map(d => d.media_id -> d).toMap
    assert(out(401L).fmt == "bmp" && out(401L).verdict == "kept" &&
      out(401L).kind == "image" && out(401L).n_units == 80L)
    assert(out(402L).fmt == "tiff" && out(402L).verdict == "kept" &&
      out(402L).n_units == 80L)
    // lossless containers decode to the SAME raster => identical stats
    assert(out(401L).sum_vals == out(402L).sum_vals &&
      out(401L).peak == out(402L).peak)
    assert(out(403L).fmt == "aiff" && out(403L).verdict == "kept" &&
      out(403L).kind == "audio" && out(403L).n_units == 400L)
    assert(out(404L).fmt == "au" && out(404L).verdict == "kept" &&
      out(404L).n_units == 400L)
    assert(out(403L).sum_vals == out(404L).sum_vals)
    // truncations: below-sniff tears are unrecognized; sniffed-but-
    // declaring-nothing headers are corrupt (the guard refused them)
    assert(out(405L).verdict == "rejected:unrecognized")
    assert(out(406L).fmt == "tiff" && out(406L).verdict == "rejected:corrupt")
    assert(out(407L).fmt == "aiff" && out(407L).verdict == "rejected:corrupt")
    assert(out(408L).fmt == "au" && out(408L).verdict == "rejected:corrupt")
  }

  test("hostile feed armor: oversize header claims are quarantined, the stream survives") {
    import CraftedMedia.{craftedGif, craftedPng}
    val base = tmp()
    val dropDir = s"$base/drop"; val lake = s"$base/lake"
    val dec = s"$base/decisions"; val ckpt = s"$base/ckpt"
    // 64 real bytes declaring 1.6e9 pixels; ~14 KB declaring 4e9 units —
    // either would be a multi-GB allocation (executor OOM + poison-pill
    // task retry) if the codec were entered
    drop(dropDir, "m201.png", craftedPng(40000L, 40000L))
    drop(dropDir, "m202.gif", craftedGif(2000, 2000, 1000))
    drop(dropDir, "m203.png", pngWrite(6, 5, Array.tabulate(90)(i => (i % 97).toByte)))

    MediaIngest.start(spark, dropDir, lake, dec, ckpt).awaitTermination()

    val verdicts = spark.read.parquet(dec)
      .select("media_id", "fmt", "verdict").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // oversize ≠ corrupt: the corrupt verdict is what the real codec
    // produces on a garbage body, so "oversize" itself proves the
    // decode was never attempted
    assert(verdicts(201L) == ("png", "rejected:oversize"))
    assert(verdicts(202L) == ("gif", "rejected:oversize"))
    assert(verdicts(203L) == ("png", "kept"))
    assert(spark.read.parquet(lake).count() == 1)
  }

  test("an external SPI decoder routes through the ingest verdict path") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val toy = new Multimodal.MediaDecoder {
      val fmt = "mp3"
      def sniff(bytes: Array[Byte]): Boolean =
        bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'
      def declaredUnits(bytes: Array[Byte]): Long =
        if (bytes.length < 4) -1L else (bytes(3) & 0xff).toLong * 1000L
      def decode(bytes: Array[Byte]): Multimodal.DecodedStats = {
        val body = bytes.drop(4)
        Multimodal.DecodedStats("audio", 1L, body.length.toLong,
          body.map(b => math.abs(b.toLong)).sum, body.map(b => math.abs(b.toLong)).max)
      }
    }
    Multimodal.registerDecoder(toy)
    try {
      val blob = "ID3".getBytes ++ Array[Byte](1) ++
        Array.tabulate[Byte](40)(i => (i - 10).toByte)
      val files = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row("/drop/m301.mp3", blob))),
        StructType(Seq(StructField("path", StringType), StructField("content", BinaryType))))
      val out = MediaIngest.decide(spark, files).collect()
      assert(out.length == 1)
      val d = out.head
      assert(d.media_id == 301L && d.fmt == "mp3" && d.kind == "audio" &&
        d.verdict == "kept" && d.n_units == 40L)
    } finally Multimodal.unregisterDecoder("mp3")
  }

  test("the ingest plan captures the decoder registry — tasks never read the global") {
    // on a real cluster the executor JVMs re-initialize the registry
    // singleton EMPTY, so any task-side global lookup silently
    // quarantines external formats; prove the plan works off a
    // snapshot captured at construction by CLEARING the global between
    // building the plan and running it — the local[*] equivalent of an
    // executor that never saw registerDecoder
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val toy = new Multimodal.MediaDecoder {
      val fmt = "mp3"
      def sniff(bytes: Array[Byte]): Boolean =
        bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'
      def declaredUnits(bytes: Array[Byte]): Long =
        if (bytes.length < 4) -1L else (bytes(3) & 0xff).toLong * 1000L
      def decode(bytes: Array[Byte]): Multimodal.DecodedStats = {
        val body = bytes.drop(4)
        Multimodal.DecodedStats("audio", 1L, body.length.toLong,
          body.map(b => math.abs(b.toLong)).sum, body.map(b => math.abs(b.toLong)).max)
      }
    }
    val blob = "ID3".getBytes ++ Array[Byte](1) ++
      Array.tabulate[Byte](40)(i => (i - 10).toByte)
    val files = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("/drop/m302.mp3", blob))),
      StructType(Seq(StructField("path", StringType), StructField("content", BinaryType))))

    Multimodal.registerDecoder(toy)
    val planned =
      try MediaIngest.decide(spark, files) // snapshot taken here
      finally Multimodal.unregisterDecoder("mp3") // global now empty
    assert(Multimodal.decoderSnapshot.isEmpty,
      "precondition: the registry must be empty when the tasks run")
    val d = planned.collect().head
    assert(d.fmt == "mp3" && d.verdict == "kept" && d.n_units == 40L,
      "a cleared global must not affect a plan that captured the snapshot")

    // and the inverse: a plan built with an EMPTY registry quarantines
    // the blob even though the snapshot-less global lookup would have
    // been too late to matter anyway — snapshot semantics, both ways
    val emptyPlanned = MediaIngest.decide(spark, files)
    Multimodal.registerDecoder(toy)
    try {
      val e = emptyPlanned.collect().head
      assert(e.verdict == "rejected:unrecognized",
        "a plan constructed before registration must not see the decoder")
    } finally Multimodal.unregisterDecoder("mp3")
  }
}
