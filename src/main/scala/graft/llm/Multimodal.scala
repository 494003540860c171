package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * container ships no image/audio codecs); everything around it — the
  * schema, the typed Dataset boundary, the per-partition batch shape,
  * the feature-vector contract — is the real pipeline a decoder drops
  * into. `mapPartitions` is the Scala analog of arrow-batched pandas
  * UDFs: the decode amortizes per-partition setup (codec init, model
  * load) across the rows of each batch.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      checksum: String,
      n_frames: Long,
      features: Array[Float])

  /** synthesize a binary media column from the documents table (the
    * fixture corpus has no real media; text bytes stand in for the blob)
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** STUB decoder: a real implementation calls an image/audio codec
    * here (per-partition init, batched decode). This stand-in derives
    * deterministic pseudo-features from the bytes so the pipeline is
    * testable end-to-end.
    */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(r.bytes)
    val checksum = digest.map("%02x".format(_)).mkString
    val nFrames = r.kind match {
      case "image" => 1L
      case "audio" => (r.bytes.length / 64 + 1).toLong
      case _ => (r.bytes.length / 32 + 1).toLong
    }
    val features = digest.take(8).map(b => (b & 0xff).toFloat / 255.0f)
    MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, checksum, nFrames, features)
  }

  /** batched feature extraction: one decoder instance per partition,
    * streamed over the rows (never materializes a partition in memory)
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup happens here (codec/model init in a real impl)
      rows.map(decodeStub)
    }
  }

  case class ResizedMedia(
      media_id: Long,
      kind: String,
      src_w: Int,
      src_h: Int,
      dst_w: Int,
      dst_h: Int,
      est_bytes: Long)

  /** STUB resize: a real implementation decodes, scales, and re-encodes
    * per partition; this stand-in derives deterministic source
    * dimensions from the bytes and computes the aspect-preserving
    * target box — the exact plumbing (typed rows, batched partitions,
    * size accounting) a real scaler drops into.
    */
  def resize(spark: SparkSession, media: DataFrame, maxDim: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        // fake source dims from content bytes (stable per blob)
        val w = 64 + (r.bytes.length % 1024)
        val h = 64 + (math.abs(r.bytes.headOption.getOrElse(0: Byte).toInt) * 7 % 1024)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val dw = math.max(1, (w * scale).toInt)
        val dh = math.max(1, (h * scale).toInt)
        ResizedMedia(r.media_id, r.kind, w, h, dw, dh, dw.toLong * dh * 3)
      }
    }
  }

  /** scalar metadata view of the media table — oracle-checkable
    * (byte length, md5, kind routing) without the stubbed decode
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).cast(LongType).as("byte_len"),
      md5(col("bytes")).as("checksum"))
}
