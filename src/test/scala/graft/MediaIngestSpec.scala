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
}
