package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Every decode in this file is REAL: the kind-routed batch decoder
  * ([[decodeRouted]]) and downsampler ([[resizeRouted]]) dispatch each
  * row to the JDK's own codecs — PNG (javax.imageio inflate+defilter)
  * for images, G.711 μ-law (javax.sound) for audio, multi-frame GIF
  * (javax.imageio LZW) for video — over real containers written by
  * real encoders. `mapPartitions` is the Scala analog of
  * arrow-batched pandas UDFs: the decode amortizes per-partition
  * setup (codec/reader init) across the rows of each batch, and a
  * perceptual codec this container doesn't ship (MP3, H.264) would
  * drop into the matching arm of the router without touching the
  * schema, the batching, or the downstream algebra.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** synthesize a binary media column from the documents table (the
    * fixture corpus has no real media; text bytes stand in for the blob)
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** metadata-driven frame/sample accounting over the opaque blobs —
    * pure column algebra (no typed boundary, no decode: the whole
    * point of the m03/m05 sampling entries is that a 100 TB pipeline
    * picks offsets WITHOUT touching bytes it will drop, so this stays
    * inside whole-stage codegen). The per-kind frame rule is the
    * documented metadata contract: images are single-frame; audio and
    * video frame counts derive from the blob length at the container's
    * nominal frame stride (64 / 32 bytes).
    */
  def mediaFrameMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).cast(LongType).as("byte_len"),
      when(col("kind") === "image", lit(1L))
        .when(col("kind") === "audio", (length(col("bytes")) / 64 + 1).cast(LongType))
        .otherwise((length(col("bytes")) / 32 + 1).cast(LongType)).as("n_frames"))

  /** scalar metadata view of the media table — byte length, md5, kind
    * routing straight off the blob column, no decode
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).cast(LongType).as("byte_len"),
      md5(col("bytes")).as("checksum"))

  // ------------------------------------------------- REAL decode path
  // The uncompressed containers (RIFF/PCM WAV, PPM P6) need no codec
  // library, so for them the decode is REAL — actual bytes written by a
  // real writer, re-read by a real chunk-walking parser — and only the
  // compressed codecs stay behind the stub above. The fixtures are
  // integer-deterministic functions of media_id, so the DuckDB oracle
  // re-derives every decoded statistic from the same formulas WITHOUT
  // parsing binaries: any header-offset, endianness, or raster-order
  // bug in writer OR parser diverges the numbers and fails the hash
  // gate.

  import graft.functions.MediaCodecs

  /** sawtooth PCM parameters per media id — integer-only so the oracle
    * reproduces samples exactly: sr=8000 Hz, n = 400 + id%200 samples,
    * period f = 100 + id%400, s(i) = ((i·f) mod sr)·24000/sr − 12000
    */
  private def wavSamples(id: Long): Array[Short] = {
    val sr = 8000
    val n = (400 + id % 200).toInt
    val f = (100 + id % 400).toInt
    Array.tabulate(n)(i => (((i * f) % sr) * 24000 / sr - 12000).toShort)
  }

  /** real WAV blobs: one RIFF/PCM16 file per document id */
  def wavTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map(id =>
      MediaRow(id, "audio", MediaCodecs.wavWrite(wavSamples(id), 8000))))
  }

  case class WavFeatures(
      media_id: Long, sample_rate: Long, n_samples: Long,
      peak: Long, sum_abs: Long, crossings: Long)

  /** REAL audio decode: parse the RIFF container (chunk walk, fmt
    * contract, LE PCM16) and compute integer signal statistics —
    * amplitude peak, total absolute amplitude, zero crossings
    */
  def wavFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[WavFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val wav = MediaCodecs.wavParse(r.bytes)
      var peak = 0L; var sumAbs = 0L; var crossings = 0L
      var i = 0
      while (i < wav.samples.length) {
        val v = wav.samples(i).toLong
        val a = math.abs(v)
        if (a > peak) peak = a
        sumAbs += a
        if (i > 0 && ((wav.samples(i - 1) >= 0) != (v >= 0))) crossings += 1
        i += 1
      }
      WavFeatures(r.media_id, wav.sampleRate.toLong, wav.samples.length.toLong,
        peak, sumAbs, crossings)
    })
  }

  case class ContainerImage(
      media_id: Long, container: String, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** m15 kernel: the SAME raster through every JDK-native LOSSLESS
    * image container — PNG (deflate), BMP (raw 24-bit), TIFF — each
    * blob re-SNIFFED from its magic bytes and decoded by the routed
    * codec. Identical channel sums across containers is what
    * "lossless" MEANS, and the sniff itself is under oracle test: a
    * BMP mis-sniffed would route to the wrong parser and fail its
    * decode or its sums. Per-row mapPartitions; rasters never leave
    * their partition.
    */
  def imageContainerFeatures(
      spark: SparkSession, docs: DataFrame): Dataset[ContainerImage] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.flatMap { id =>
      val (w, h, rgb) = ppmPixels(id)
      Seq(
        "png" -> MediaCodecs.pngWrite(w, h, rgb),
        "bmp" -> MediaCodecs.bmpWrite(w, h, rgb),
        "tiff" -> MediaCodecs.tiffWrite(w, h, rgb)).map { case (expect, bytes) =>
        val fmt = MediaCodecs.sniff(bytes)
        require(fmt.contains(expect), s"container $expect sniffed as $fmt")
        val img = MediaCodecs.pngParse(bytes) // ImageIO routes all three
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.rgb.length) {
          sr += img.rgb(i) & 0xff; sg += img.rgb(i + 1) & 0xff
          sb += img.rgb(i + 2) & 0xff
          i += 3
        }
        ContainerImage(id, expect, img.w.toLong, img.h.toLong, sr, sg, sb)
      }
    })
  }

  case class ContainerAudio(
      media_id: Long, container: String, sample_rate: Long,
      n_samples: Long, peak: Long, sum_abs: Long)

  /** m16 kernel: the SAME PCM16 signal through every JDK-native
    * audio container — RIFF/WAV, AIFF (big-endian IFF), Sun AU — each
    * blob re-sniffed and decoded by the sniff-ROUTED parser (the RIFF
    * chunk walk for wav-pcm, javax.sound for aiff/au). PCM16 is
    * stored exactly by all three, so peak/sum statistics must be
    * container-invariant.
    */
  def audioContainerFeatures(
      spark: SparkSession, docs: DataFrame): Dataset[ContainerAudio] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.flatMap { id =>
      val samples = wavSamples(id)
      Seq(
        "wav-pcm" -> MediaCodecs.wavWrite(samples, 8000),
        "aiff" -> MediaCodecs.aiffWrite(samples, 8000),
        "au" -> MediaCodecs.auWrite(samples, 8000)).map { case (expect, bytes) =>
        val fmt = MediaCodecs.sniff(bytes)
        require(fmt.contains(expect), s"container $expect sniffed as $fmt")
        val wav =
          if (expect == "wav-pcm") MediaCodecs.wavParse(bytes)
          else MediaCodecs.javaSoundParse(bytes)
        var peak = 0L; var sumAbs = 0L
        var i = 0
        while (i < wav.samples.length) {
          val a = math.abs(wav.samples(i).toLong)
          if (a > peak) peak = a
          sumAbs += a
          i += 1
        }
        ContainerAudio(id, expect, wav.sampleRate.toLong,
          wav.samples.length.toLong, peak, sumAbs)
      }
    })
  }

  /** real μ-law blobs: the SAME sawtooth as m06, compressed through
    * the hand-written G.711 companding encoder into a format-tag-7
    * RIFF container — the compressed-audio sibling of the PCM fixture
    */
  def ulawTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val codes = wavSamples(id).map(MediaCodecs.ulawEncode)
      MediaRow(id, "audio", MediaCodecs.ulawWavWrite(codes, 8000))
    })
  }

  case class UlawFeatures(
      media_id: Long, sample_rate: Long, n_samples: Long,
      peak: Long, sum_abs: Long, crossings: Long,
      sum_err: Long, max_err: Long)

  /** REAL compressed-audio decode: the JDK's javax.sound μ-law codec
    * expands the companded container back to PCM16; signal statistics
    * over the DECODED samples plus the companding-error image vs the
    * original sawtooth (re-derived from media_id) — a LOSSY codec
    * whose loss is still byte-exactly oracle-checkable, because the
    * G.711 expansion is deterministic integer math. Audio's analogue
    * of what PNG (m08) is for compressed images.
    */
  def ulawFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[UlawFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (sr, dec) = MediaCodecs.ulawWavDecode(r.bytes)
      val orig = wavSamples(r.media_id)
      require(dec.length == orig.length,
        s"decoded ${dec.length} samples, fixture has ${orig.length}")
      var peak = 0L; var sumAbs = 0L; var crossings = 0L
      var sumErr = 0L; var maxErr = 0L
      var i = 0
      while (i < dec.length) {
        val v = dec(i).toLong
        val a = math.abs(v)
        if (a > peak) peak = a
        sumAbs += a
        if (i > 0 && ((dec(i - 1) >= 0) != (v >= 0))) crossings += 1
        val err = math.abs(v - orig(i).toLong)
        sumErr += err
        if (err > maxErr) maxErr = err
        i += 1
      }
      UlawFeatures(r.media_id, sr.toLong, dec.length.toLong,
        peak, sumAbs, crossings, sumErr, maxErr)
    })
  }

  /** deterministic raster parameters per media id: w = 16 + id%16,
    * h = 12 + id%8, channel values linear-modular in (x, y, id)
    */
  private def ppmPixels(id: Long): (Int, Int, Array[Byte]) = {
    val w = (16 + id % 16).toInt
    val h = (12 + id % 8).toInt
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        rgb(i) = ((x * 3 + y * 5 + id) % 256).toByte
        rgb(i + 1) = ((x * 7 + y + 2 * id) % 256).toByte
        rgb(i + 2) = ((x + y * 11 + 3 * id) % 256).toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** real PPM blobs: one P6 file per document id */
  def ppmTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val (w, h, rgb) = ppmPixels(id)
      MediaRow(id, "image", MediaCodecs.ppmWrite(w, h, rgb))
    })
  }

  case class PpmFeatures(
      media_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long,
      dst_w: Long, dst_h: Long, rsum_r: Long, rsum_g: Long, rsum_b: Long)

  /** REAL image decode + resize: parse the P6 header/raster, sum the
    * channels, then nearest-neighbor-resize into an aspect-preserving
    * `maxDim` box (integer source mapping) and sum the resized raster —
    * every output byte-exactly reproducible from the fixture formulas
    */
  def ppmFeatures(
      spark: SparkSession, media: Dataset[MediaRow], maxDim: Int): Dataset[PpmFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val img = MediaCodecs.ppmParse(r.bytes)
      def channelSums(p: MediaCodecs.Ppm): (Long, Long, Long) = {
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < p.rgb.length) {
          sr += p.rgb(i) & 0xff; sg += p.rgb(i + 1) & 0xff; sb += p.rgb(i + 2) & 0xff
          i += 3
        }
        (sr, sg, sb)
      }
      val (sr, sg, sb) = channelSums(img)
      val m = math.max(img.w, img.h)
      val (dw, dh) =
        if (m <= maxDim) (img.w, img.h)
        else (math.max(1, img.w * maxDim / m), math.max(1, img.h * maxDim / m))
      val resized = MediaCodecs.ppmResize(img, dw, dh)
      val (rr, rg, rb) = channelSums(resized)
      PpmFeatures(r.media_id, img.w.toLong, img.h.toLong, sr, sg, sb,
        dw.toLong, dh.toLong, rr, rg, rb)
    })
  }

  /** real COMPRESSED image blobs: one 8-bit RGB PNG per document id,
    * same raster formulas as the PPM table — the point of sharing the
    * generator is that the decode oracle is the same arithmetic, so
    * the deflate+filter round-trip is what the hash gate actually
    * exercises
    */
  def pngTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val (w, h, rgb) = ppmPixels(id)
      MediaRow(id, "image", MediaCodecs.pngWrite(w, h, rgb))
    })
  }

  case class PngFeatures(
      media_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL compressed-image decode: the JDK PNG codec inflates and
    * defilters back to the raster; channel sums must equal the
    * generator formulas exactly (PNG is lossless — which is exactly
    * what makes a COMPRESSED codec oracle-checkable). The blob size is
    * deliberately NOT an output: encoder byte counts are codec-version
    * trivia the oracle cannot derive; MultimodalSpec pins the wire
    * format (PNG magic, not a raster dump) instead.
    */
  def pngFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[PngFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val img = MediaCodecs.pngParse(r.bytes)
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < img.rgb.length) {
        sr += img.rgb(i) & 0xff; sg += img.rgb(i + 1) & 0xff; sb += img.rgb(i + 2) & 0xff
        i += 3
      }
      PngFeatures(r.media_id, img.w.toLong, img.h.toLong, sr, sg, sb)
    })
  }

  /** palette-indexed frame rasters for the animated-GIF fixtures: each
    * pixel's web-safe level triple is an integer formula of (x, y,
    * media_id, frame) — 6 levels per channel, value = level*51, so the
    * GIF's 8-bit palette holds every color exactly and the LZW
    * round-trip is lossless (the oracle recomputes the sums from the
    * same formulas)
    */
  private def gifFrameIndices(id: Long): (Int, Int, Seq[Array[Byte]]) = {
    val w = (8 + id % 8).toInt
    val h = (6 + id % 6).toInt
    val nf = (2 + id % 4).toInt
    val frames = (0 until nf).map { f =>
      val idx = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((x * 3 + y * 5 + id + 7L * f) % 6).toInt
          val g = ((x * 7 + y + 2 * id + 3L * f) % 6).toInt
          val b = ((x + y * 11 + 3 * id + 5L * f) % 6).toInt
          idx(y * w + x) = (r * 36 + g * 6 + b).toByte
          x += 1
        }
        y += 1
      }
      idx
    }
    (w, h, frames)
  }

  /** real multi-frame animated GIF blobs (JDK encoder) */
  def gifTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val (w, h, frames) = gifFrameIndices(id)
      MediaRow(id, "video", MediaCodecs.gifWrite(w, h, frames))
    })
  }

  case class GifFrameFeatures(
      media_id: Long, n_frames: Long, frame_idx: Long,
      width: Long, height: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL frame sampling over REAL decoded frames — m03's stride
    * applied to frames the JDK GIF reader actually LZW-decodes, with
    * per-frame channel stats the oracle recomputes exactly (the
    * palette-lossless argument). The frame COUNT is read from the
    * container, not derived from byte math; a decoder that miscounts
    * frames, composites disposal wrong, or swaps a channel fails the
    * hash gate.
    */
  def gifFrameSample(
      spark: SparkSession, media: Dataset[MediaRow], stride: Int = 2): Dataset[GifFrameFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val anim = MediaCodecs.gifParse(r.bytes)
      val nf = anim.frames.length
      (0 until nf by stride).map { fi =>
        val rgb = anim.frames(fi)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < rgb.length) {
          sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
          i += 3
        }
        GifFrameFeatures(r.media_id, nf.toLong, fi.toLong,
          anim.w.toLong, anim.h.toLong, sr, sg, sb)
      }
    })
  }

  // ------------------------------------------- kind-routed REAL decode

  /** one REAL container per document, routed by kind exactly like the
    * m01 metadata rule (doc_id%3: 0 image, 1 audio, 2 video) — a PNG
    * of the m07/m08 raster, a G.711 μ-law WAV of the m06/m11
    * sawtooth, an animated GIF of the m10 palette frames. The
    * fixtures reuse the per-format generators verbatim, so every
    * statistic the router decodes is the same integer formula the
    * per-format oracles already replay.
    */
  def realMediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      (id % 3) match {
        case 0 =>
          val (w, h, rgb) = ppmPixels(id)
          MediaRow(id, "image", MediaCodecs.pngWrite(w, h, rgb))
        case 1 =>
          val codes = wavSamples(id).map(MediaCodecs.ulawEncode)
          MediaRow(id, "audio", MediaCodecs.ulawWavWrite(codes, 8000))
        case _ =>
          val (w, h, frames) = gifFrameIndices(id)
          MediaRow(id, "video", MediaCodecs.gifWrite(w, h, frames))
      }
    })
  }

  case class RoutedFeatures(
      media_id: Long, kind: String, n_frames: Long, n_units: Long,
      sum_vals: Long, peak: Long)

  /** decoded stats for one blob: kind, frames, units (pixels·frames /
    * samples), value sum (channel bytes / abs samples), peak
    */
  case class DecodedStats(
      kind: String, n_frames: Long, n_units: Long, sum_vals: Long, peak: Long)

  /** the pluggable DECODER SPI shared by the m02 batch router and the
    * streaming [[graft.streaming.MediaIngest]] gate: one instance per
    * container format, carrying the format's magic-byte test, its
    * header-only size declaration (the decode-bomb guard input) and
    * the real decode. The five JDK codec families register through
    * this seam at object init; a perceptual codec this container lacks
    * (MP3/H.264) drops in via [[registerDecoder]] with ZERO changes to
    * the router, the ingest gate, or the guard — CodecSpec proves the
    * route end-to-end with a toy external decoder.
    *
    * The registry lives on the DRIVER only. Decoders are Serializable,
    * and every distributed plan captures [[decoderSnapshot]] into its
    * task closure at PLAN-CONSTRUCTION time ([[graft.streaming
    * .MediaIngest.decide]]) — tasks never consult this JVM-global,
    * because executor JVMs re-initialize the singleton with an empty
    * vector and a run-time lookup would silently sniff every
    * external-format blob as unrecognized on a real cluster
    * (MediaIngestSpec proves the capture by clearing the registry
    * between plan construction and execution).
    */
  trait MediaDecoder extends Serializable {
    /** routing token, e.g. "png" — unique across the registry */
    def fmt: String
    /** magic-byte test: does this blob look like my container? */
    def sniff(bytes: Array[Byte]): Boolean
    /** decoded size in units declared by the HEADER ALONE (no decode,
      * no proportional allocation); -1 when the header is too torn to
      * declare — see [[MediaCodecs.declaredUnits]] for the contract
      */
    def declaredUnits(bytes: Array[Byte]): Long
    /** the real decode; free to throw on structural corruption */
    def decode(bytes: Array[Byte]): DecodedStats
    /** the decoded RASTER, for perceptual-hash surfaces
      * ([[graft.streaming.PhashGate]] routes external rasters through
      * this after its own declaredUnits guard): None means "not a
      * raster format" and the gate verdicts `rejected:unsupported` —
      * the default, so stats-only decoders need not know rasters
      * exist. Free to throw on structural corruption (quarantined).
      */
    def decodeRaster(bytes: Array[Byte]): Option[MediaCodecs.Ppm] = None
    /** (sampleRate, samples), for acoustic surfaces
      * ([[graft.streaming.AfpGate]]) — same contract as
      * [[decodeRaster]], for audio
      */
    def decodeSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] = None
  }

  /** built-in decoder for one of [[MediaCodecs.sniff]]'s tokens: sniff
    * and header bounds delegate to the shared header parsers, decode
    * to the JDK codec arm for the token
    */
  private def jdkDecoder(token: String): MediaDecoder = new MediaDecoder {
    val fmt: String = token
    def sniff(bytes: Array[Byte]): Boolean = MediaCodecs.sniff(bytes).contains(token)
    def declaredUnits(bytes: Array[Byte]): Long = MediaCodecs.declaredUnits(token, bytes)
    def decode(bytes: Array[Byte]): DecodedStats = jdkDecode(token, bytes)
  }

  private val BuiltinFmts: Seq[String] =
    Seq("png", "jpeg", "gif", "ppm", "bmp", "tiff", "wav-pcm", "wav-ulaw",
      "aiff", "au")

  /** registration-ordered externals; tiny and read-mostly, so a
    * volatile immutable vector + synchronized writers is the whole
    * concurrency story
    */
  @volatile private var externalDecoders: Vector[MediaDecoder] =
    Vector.empty

  def registerDecoder(d: MediaDecoder): Unit = synchronized {
    require(!BuiltinFmts.contains(d.fmt) && externalDecoders.forall(_.fmt != d.fmt),
      s"decoder token '${d.fmt}' already registered")
    externalDecoders = externalDecoders :+ d
  }

  def unregisterDecoder(fmt: String): Unit = synchronized {
    externalDecoders = externalDecoders.filterNot(_.fmt == fmt)
  }

  /** the current external-decoder list, to be captured into a task
    * closure at plan-construction time (the decoders are
    * Serializable); the ONLY way distributed code may see the registry
    */
  def decoderSnapshot: Seq[MediaDecoder] = externalDecoders

  /** registry-wide sniff: the built-in magic-byte ladder first (one
    * fused pass), then `externals` in registration order; an external
    * sniff that throws is treated as "not mine" (sniffing never
    * throws — the ingest contract)
    */
  def sniffMedia(bytes: Array[Byte], externals: Seq[MediaDecoder]): Option[String] =
    MediaCodecs.sniff(bytes).orElse(
      externals.find(d =>
        try d.sniff(bytes)
        catch { case scala.util.control.NonFatal(_) => false }).map(_.fmt))

  /** driver-side convenience over the live registry — do NOT call from
    * inside a task lambda (capture [[decoderSnapshot]] instead)
    */
  def sniffMedia(bytes: Array[Byte]): Option[String] =
    sniffMedia(bytes, externalDecoders)

  private def decoderFor(fmt: String, externals: Seq[MediaDecoder]): Option[MediaDecoder] =
    (if (BuiltinFmts.contains(fmt)) Some(jdkDecoder(fmt)) else None)
      .orElse(externals.find(_.fmt == fmt))

  /** the per-blob decode KERNEL: a sniffed format token in
    * ([[sniffMedia]]'s vocabulary), decoded stats out, routed through
    * the [[MediaDecoder]] registry. Throws on a structurally corrupt
    * container — the ingest gate catches and quarantines; unknown
    * tokens are a caller bug, not data, so they also throw.
    *
    * GUARDED: the decoder's header-declared size is checked against
    * `maxUnits` BEFORE its codec runs — a crafted header declaring a
    * multi-GB raster raises [[MediaCodecs.OversizeMediaException]]
    * instead of letting the codec attempt the allocation
    * (`OutOfMemoryError` would kill the executor and poison-pill
    * Spark's task retry), and an undeclarable header is refused as
    * corrupt rather than trusted.
    */
  private[graft] def decodeStats(
      fmt: String, bytes: Array[Byte],
      maxUnits: Long = MediaCodecs.MaxDeclaredUnits): DecodedStats =
    decodeStats(fmt, bytes, maxUnits, externalDecoders)

  /** closure-capture form: `externals` is the caller's snapshot of the
    * registry (see [[decoderSnapshot]]) — the variant task lambdas use
    */
  private[graft] def decodeStats(
      fmt: String, bytes: Array[Byte], maxUnits: Long,
      externals: Seq[MediaDecoder]): DecodedStats = {
    val dec = decoderFor(fmt, externals).getOrElse(
      throw new IllegalArgumentException(s"no decoder arm for '$fmt'"))
    val declared = dec.declaredUnits(bytes)
    if (declared < 0)
      throw new IllegalArgumentException(s"$fmt header declares no decodable size")
    if (declared > maxUnits)
      throw new MediaCodecs.OversizeMediaException(
        s"$fmt header declares $declared units > budget $maxUnits — decode refused")
    dec.decode(bytes)
  }

  /** the JDK codec arms behind the built-in [[MediaDecoder]]s */
  private def jdkDecode(fmt: String, bytes: Array[Byte]): DecodedStats = {
    def imageStats(img: MediaCodecs.Ppm): DecodedStats = {
      var s = 0L; var p = 0L; var i = 0
      while (i < img.rgb.length) {
        val v = (img.rgb(i) & 0xff).toLong; s += v; if (v > p) p = v; i += 1
      }
      DecodedStats("image", 1L, (img.w * img.h).toLong, s, p)
    }
    def audioStats(samples: Array[Short]): DecodedStats = {
      var s = 0L; var p = 0L; var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toLong); s += a; if (a > p) p = a; i += 1
      }
      DecodedStats("audio", 1L, samples.length.toLong, s, p)
    }
    fmt match {
      // ImageIO sniffs the container for all four of its formats
      case "png" | "jpeg" | "bmp" | "tiff" => imageStats(MediaCodecs.pngParse(bytes))
      case "ppm" => imageStats(MediaCodecs.ppmParse(bytes))
      case "wav-pcm" => audioStats(MediaCodecs.wavParse(bytes).samples)
      case "wav-ulaw" => audioStats(MediaCodecs.ulawWavDecode(bytes)._2)
      case "aiff" | "au" => audioStats(MediaCodecs.javaSoundParse(bytes).samples)
      case "gif" =>
        val anim = MediaCodecs.gifParse(bytes)
        var s = 0L; var p = 0L
        anim.frames.foreach { rgb =>
          var i = 0
          while (i < rgb.length) {
            val v = (rgb(i) & 0xff).toLong; s += v; if (v > p) p = v; i += 1
          }
        }
        DecodedStats("video", anim.frames.length.toLong,
          anim.frames.length.toLong * anim.w * anim.h, s, p)
      case other => throw new IllegalArgumentException(s"no decoder arm for '$other'")
    }
  }

  /** the REAL batched multi-kind decoder: one mapPartitions pass whose
    * per-row dispatch hands each blob to the JDK codec for its kind —
    * PNG inflate+defilter, μ-law expansion, GIF LZW multi-frame — and
    * emits a unified integer feature row (frames, decoded units,
    * value sum, peak) the oracle re-derives per kind from the fixture
    * formulas. This is the production shape of "decode the corpus":
    * per-partition codec reuse, one scan, no shuffle; an MP3 or H.264
    * decoder (absent from this container) would drop into the audio /
    * video arm without touching the schema or the plan.
    */
  def decodeRouted(spark: SparkSession, media: Dataset[MediaRow]): Dataset[RoutedFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val fmt = r.kind match {
        case "image" => "png"
        case "audio" => "wav-ulaw"
        case _ => "gif"
      }
      val st = decodeStats(fmt, r.bytes)
      RoutedFeatures(r.media_id, st.kind, st.n_frames, st.n_units, st.sum_vals, st.peak)
    })
  }

  case class RoutedResize(
      media_id: Long, kind: String, src_extent: Long, dst_extent: Long,
      sum_out: Long, peak_out: Long)

  /** the REAL kind-routed downsampler — each modality reduced along
    * its natural axis, with the reduced content re-measured from the
    * actually-decoded bytes: images NN-resize into an
    * aspect-preserving `maxDim` box (the m07 kernel on the decoded
    * PNG raster), audio decimates by `audioStride` over the expanded
    * μ-law samples, video keeps every `frameStride`-th decoded GIF
    * frame. src/dst extents use each kind's unit (pixels / samples /
    * frames), so the row doubles as the size-accounting record a
    * 100 TB re-encode job plans from.
    */
  def resizeRouted(
      spark: SparkSession, media: Dataset[MediaRow],
      maxDim: Int = 8, audioStride: Int = 3, frameStride: Int = 2): Dataset[RoutedResize] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      r.kind match {
        case "image" =>
          val img = MediaCodecs.pngParse(r.bytes)
          val m = math.max(img.w, img.h)
          val (dw, dh) =
            if (m <= maxDim) (img.w, img.h)
            else (math.max(1, img.w * maxDim / m), math.max(1, img.h * maxDim / m))
          val rz = MediaCodecs.ppmResize(img, dw, dh)
          var s = 0L; var p = 0L; var i = 0
          while (i < rz.rgb.length) {
            val v = (rz.rgb(i) & 0xff).toLong; s += v; if (v > p) p = v; i += 1
          }
          RoutedResize(r.media_id, r.kind, (img.w * img.h).toLong, (dw * dh).toLong, s, p)
        case "audio" =>
          val (_, dec) = MediaCodecs.ulawWavDecode(r.bytes)
          var s = 0L; var p = 0L; var i = 0; var kept = 0L
          while (i < dec.length) {
            val a = math.abs(dec(i).toLong); s += a; if (a > p) p = a
            kept += 1; i += audioStride
          }
          RoutedResize(r.media_id, r.kind, dec.length.toLong, kept, s, p)
        case _ =>
          val anim = MediaCodecs.gifParse(r.bytes)
          var s = 0L; var p = 0L; var kept = 0L; var fi = 0
          while (fi < anim.frames.length) {
            val rgb = anim.frames(fi)
            var i = 0
            while (i < rgb.length) {
              val v = (rgb(i) & 0xff).toLong; s += v; if (v > p) p = v; i += 1
            }
            kept += 1; fi += frameStride
          }
          RoutedResize(r.media_id, r.kind, anim.frames.length.toLong, kept, s, p)
      }
    })
  }

  // --------------------------------------- decoded-content dedup (m12)

  /** one decoded-content signature per (id, container): the SAME
    * raster written as PNG and as PPM — byte-DIFFERENT blobs (deflate
    * stream vs raw P6) that decode identically, which is exactly why
    * media dedup must hash decoded content, never container bytes.
    * `digest` is a 64-bit FNV-1a over (w, h, raster) — engine-internal
    * exact-verify state, never an output column (the m09 recipe:
    * the oracle pins what the digest must PROVE, not its value).
    */
  case class MediaSig(
      media_id: Long, container: String, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, digest: Long)

  def contentSignatures(spark: SparkSession, docs: DataFrame): Dataset[MediaSig] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.flatMap { id =>
      val (w, h, rgb) = ppmPixels(id)
      def sig(container: String, img: MediaCodecs.Ppm): MediaSig = {
        var sr = 0L; var sg = 0L; var sb = 0L; var i = 0
        var d = 0xcbf29ce484222325L // FNV-1a offset basis
        def mix(b: Int): Unit = { d ^= (b & 0xff); d *= 0x100000001b3L }
        mix(img.w); mix(img.w >> 8); mix(img.h)
        while (i < img.rgb.length) {
          sr += img.rgb(i) & 0xff; sg += img.rgb(i + 1) & 0xff; sb += img.rgb(i + 2) & 0xff
          mix(img.rgb(i)); mix(img.rgb(i + 1)); mix(img.rgb(i + 2))
          i += 3
        }
        MediaSig(id, container, img.w.toLong, img.h.toLong, sr, sg, sb, d)
      }
      Iterator(
        sig("png", MediaCodecs.pngParse(MediaCodecs.pngWrite(w, h, rgb))),
        sig("ppm", MediaCodecs.ppmParse(MediaCodecs.ppmWrite(w, h, rgb))))
    })
  }

  /** one media row with its decoded-content group resolved */
  case class MediaDup(
      media_id: Long, container: String, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long,
      group_size: Long, keeper_id: Long, is_keeper: Long)

  /** decoded-content dedup: candidate groups by the integer signature
    * (w, h, channel sums — the only shuffle, and it carries 6 longs
    * per blob, never rasters), EXACT-verified by grouping on the FNV
    * digest too (signature collisions across residues split on it),
    * keeper = lowest id's PNG. The fixture algebra makes ground truth
    * derivable: every raster is a pure function of id mod 256 (w/h
    * divide 256's residue classes and every channel formula is
    * (…+k·id) % 256), so ids 256 apart are true duplicates across
    * BOTH containers — the oracle replays group sizes and keepers
    * from residue arithmetic while the engine must EARN them through
    * decode + signature + digest verification.
    *
    * The keeper election is a WINDOW over the content key, not a
    * `groupByKey.flatMapGroups` buffer: duplicate-heavy corpora are
    * the NORMAL case for media dedup at crawl scale (one viral image
    * × 10^8 copies lands in one group), and an object-hash-aggregate
    * `it.toSeq` would hold that whole group on one task's heap.
    * `WindowExec` buffers the group in a SPILLABLE row array (disk
    * after a threshold, never OOM), computes min/count once per
    * group, and — unlike an agg-plus-self-join shape — runs the
    * decode lineage exactly ONCE, which dominates cost when the
    * upstream is a real codec pass. Skewed groups ride the same
    * spill path; rows carry 8 longs + a token, never rasters.
    */
  def contentDedup(spark: SparkSession, docs: DataFrame): Dataset[MediaDup] = {
    import spark.implicits._
    val byContent = org.apache.spark.sql.expressions.Window
      .partitionBy("width", "height", "sum_r", "sum_g", "sum_b", "digest")
    contentSignatures(spark, docs)
      .withColumn("group_size", count(lit(1)).over(byContent))
      .withColumn("keeper_id", min(col("media_id")).over(byContent))
      .select(
        col("media_id"), col("container"), col("width"), col("height"),
        col("sum_r"), col("sum_g"), col("sum_b"),
        col("group_size"), col("keeper_id"),
        when(col("media_id") === col("keeper_id") && col("container") === "png", 1L)
          .otherwise(0L).as("is_keeper"))
      .as[MediaDup]
  }

  /** OPT-IN salted election for single-content-dominated corpora —
    * the documented alternative to [[contentDedup]]'s window when one
    * viral content group dominates the corpus outright: the window
    * spills rather than OOMs, but it still serializes the hot group's
    * min/count on ONE task (the measured 30x skew floor in the scale
    * table). Here the election is a two-stage count/min: a partial
    * aggregate per (content key, salt) — map-side combined, so the
    * shuffle carries at most `salts` rows per group — then a bounded
    * merge of those partials, then a join back to the signature rows
    * for the per-row columns. The join keys on the content key, so
    * the hot group is one skewed probe-side partition — exactly what
    * AQE's skew-join split re-parallelizes (the build side is one row
    * per group). Costs: one extra shuffle of the 9-small-column
    * signature rows, and the signature lineage evaluates twice (agg +
    * join sides) — so the signatures are persisted (memory-and-disk;
    * this is the relation a crawl-scale run checkpoints anyway) and
    * the caller may unpersist via the returned dataset's lineage.
    * Same output as [[contentDedup]] bit-for-bit (CodecSpec pins it).
    */
  def contentDedupSalted(
      spark: SparkSession, docs: DataFrame, salts: Int = 32): Dataset[MediaDup] = {
    import spark.implicits._
    val key = Seq("width", "height", "sum_r", "sum_g", "sum_b", "digest")
    val sigs = contentSignatures(spark, docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partials = sigs
      .withColumn("salt", pmod(xxhash64(col("media_id")), lit(salts)))
      .groupBy((key.map(col) :+ col("salt")): _*)
      .agg(count(lit(1)).as("pc"), min(col("media_id")).as("pm"))
    val groups = partials
      .groupBy(key.map(col): _*)
      .agg(sum(col("pc")).as("group_size"), min(col("pm")).as("keeper_id"))
    sigs.join(groups, key)
      .select(
        col("media_id"), col("container"), col("width"), col("height"),
        col("sum_r"), col("sum_g"), col("sum_b"),
        col("group_size"), col("keeper_id"),
        when(col("media_id") === col("keeper_id") && col("container") === "png", 1L)
          .otherwise(0L).as("is_keeper"))
      .as[MediaDup]
  }

  /** SMOOTH raster for the lossy-codec fixtures: linear channel planes
    * with no mod-256 wrap (max value 157 at the corner), because JPEG
    * error concentrates at high-frequency edges — a gradient keeps the
    * decode within a tight, assertable band of the exact means.
    */
  private def smoothPixels(id: Long): (Int, Int, Array[Byte]) = {
    val w = (16 + id % 16).toInt
    val h = (12 + id % 8).toInt
    val k = (id % 32).toInt
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        rgb(i) = (2 * x + 3 * y + k).toByte
        rgb(i + 1) = (3 * x + 2 * y + k).toByte
        rgb(i + 2) = (x + 4 * y + k).toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** real JPEG blobs (JDK codec, default quality) over the smooth
    * fixtures
    */
  def jpegTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val (w, h, rgb) = smoothPixels(id)
      MediaRow(id, "image", MediaCodecs.jpegWrite(w, h, rgb))
    })
  }

  case class JpegFeatures(
      media_id: Long, width: Long, height: Long,
      r_ok: Long, g_ok: Long, b_ok: Long)

  /** REAL lossy decode with BOUNDED-ERROR invariants (the q24b/s04b
    * recipe for operators whose exact output is engine-internal by
    * nature): JPEG decode cannot be hash-compared pixelwise, but the
    * decoded channel MEANS of a smooth gradient must land within
    * `tol` of the exact formula means — the oracle recomputes the
    * exact side and pins the ok-booleans at 1, so the engine has to
    * EARN them through a real inflate/IDCT round-trip (a stub
    * returning zeros, or a decoder off by a channel swap, fails the
    * hash gate).
    */
  def jpegFeatures(
      spark: SparkSession, media: Dataset[MediaRow], tol: Double = 4.0): Dataset[JpegFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val img = MediaCodecs.pngParse(r.bytes) // ImageIO sniffs the container
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < img.rgb.length) {
        sr += img.rgb(i) & 0xff; sg += img.rgb(i + 1) & 0xff; sb += img.rgb(i + 2) & 0xff
        i += 3
      }
      val n = (img.w * img.h).toDouble
      // exact means from the generator formulas (sum of a linear plane)
      val k = (r.media_id % 32).toDouble
      val exR = (img.w - 1) + 1.5 * (img.h - 1) + k
      val exG = 1.5 * (img.w - 1) + (img.h - 1) + k
      val exB = 0.5 * (img.w - 1) + 2.0 * (img.h - 1) + k
      def ok(sum: Long, ex: Double) = if (math.abs(sum / n - ex) <= tol) 1L else 0L
      JpegFeatures(r.media_id, img.w.toLong, img.h.toLong,
        ok(sr, exR), ok(sg, exG), ok(sb, exB))
    })
  }

  // ----------------------------------- perceptual near-dup (m13)

  /** 32x32 RGB raster for the perceptual-hash fixtures. Channel
    * values are NONLINEAR integer formulas of (x, y, id % 240) under
    * mod 240: the quadratic/product terms make the mod wraps put real
    * high-frequency texture in every image (a linear plane would DCT
    * to an id-independent AC spectrum and every hash would collapse),
    * and the 240 ceiling leaves exact headroom for the +8 brightness
    * variant (max 239 + 8 = 247 — no clamp, no wrap). Only 240
    * distinct rasters exist: ids 240 apart are TRUE perceptual
    * duplicates — the m12 residue-arithmetic oracle recipe moved to
    * the perceptual axis.
    */
  private[graft] def phashPixels(id: Long): Array[Byte] = {
    val rid = (id % 240).toInt
    val rgb = new Array[Byte](32 * 32 * 3)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val i = (y * 32 + x) * 3
        rgb(i) = (((x + 31 * y + 17 * rid) * (x * y + rid + 1)) % 240).toByte
        rgb(i + 1) = (((y + 29 * x + 13 * rid) * (x + y * y + 2 * rid + 1)) % 240).toByte
        rgb(i + 2) = (((x * x + y + 7 * rid) * (y * x + 3 * rid + 2)) % 240).toByte
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** three perceptually-equivalent variants per id, all of which m12's
    * exact decoded-content dedup keeps APART (different rasters or
    * dimensions after decode) and a perceptual hash must bring
    * TOGETHER: the base PNG; a +8-brightness PPM (every decoded byte
    * differs — but pHash drops the DC coefficient, so a uniform
    * brightness shift is invisible); and a 2x nearest-neighbor
    * upscale re-encoded as PNG (different dimensions — but each 8x8
    * pooling block of the 64x64 image averages exactly the pixels of
    * the base's 4x4 block, so the pooled plane is bit-identical).
    */
  /** Per-JVM memo of the 240 distinct variant sets: the fixtures are
    * pure functions of id % 240, but the PNG deflate encode per call
    * dominated fixture BUILD time when a corpus-sized caller derives
    * them per doc (m13 re-encoded the same 240 rasters thousands of
    * times per bench rep). ~10 KB x 240 resident; entries are treated
    * as immutable by every caller (file write / decode only). The
    * MEASURED kernels are untouched — they still sniff and decode
    * every blob from bytes.
    */
  private val phashVariantCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Seq[(String, Array[Byte])]]()

  private[graft] def phashVariants(id: Long): Seq[(String, Array[Byte])] =
    phashVariantCache.computeIfAbsent((id % 240).toInt, rid => {
      val base = phashPixels(rid.toLong)
      val bright = base.map(b => ((b & 0xff) + 8).toByte)
      val scaled = MediaCodecs.ppmResize(MediaCodecs.Ppm(32, 32, base), 64, 64)
      Seq(
        ("base", MediaCodecs.pngWrite(32, 32, base)),
        ("bright", MediaCodecs.ppmWrite(32, 32, bright)),
        ("scaled", MediaCodecs.pngWrite(64, 64, scaled.rgb)))
    })

  /** cos((2n+1) k pi / 16) DCT-II basis, StrictMath so the table is
    * bit-identical on every JVM the executors run
    */
  private val PhashCos: Array[Double] = {
    val t = new Array[Double](64)
    var k = 0
    while (k < 8) {
      var n = 0
      while (n < 8) {
        t(k * 8 + n) = StrictMath.cos((2 * n + 1) * k * math.Pi / 16.0)
        n += 1
      }
      k += 1
    }
    t
  }

  /** 63-bit DCT perceptual hash of a decoded raster — the classic
    * pHash shape made exactness-friendly:
    *
    *  1. integer luma (77 r + 151 g + 28 b) >> 8 — the weights sum to
    *     256, so a uniform +c brightness shift moves every luma value
    *     by EXACTLY +c (8 * 256 >> 8 = 8, no rounding residue);
    *  2. average-pool into an 8x8 grid on floor(i*dim/8) boundaries —
    *     a 2x nearest-neighbor upscale quadruples both each block's
    *     sum and its count, and IEEE division of 4a/4b rounds to the
    *     same double as a/b, so the pooled plane survives the resize
    *     bit-for-bit;
    *  3. 2D DCT-II of the pooled grid;
    *  4. threshold the 63 AC coefficients against their median (DC is
    *     DROPPED — that is what buys brightness invariance: a uniform
    *     shift lands only in DC, the AC spectrum moves by ~1e-13 of a
    *     coefficient while median gaps are O(1)).
    *
    * Bits pack into the low 63 bits of a Long (hash is never an
    * output column — the m12 digest recipe: the oracle pins what the
    * hash must PROVE, not its value).
    */
  private[graft] def perceptualHash(img: MediaCodecs.Ppm): Long = {
    val pooled = new Array[Double](64)
    var by = 0
    while (by < 8) {
      // sub-8px rasters make floor boundaries collapse (y1 == y0) and
      // the pool divisor zero — clamp every block to at least one
      // pixel (a nearest-neighbor upsample of the tiny raster) so the
      // hash is deterministic, never 0/0 = NaN. Gates additionally
      // refuse sub-8x8 images as rejected:dust (PhashGate.hashBatch);
      // the clamp is the defense-in-depth for any other caller.
      val y0 = by * img.h / 8; val y1 = math.max((by + 1) * img.h / 8, y0 + 1)
      var bx = 0
      while (bx < 8) {
        val x0 = bx * img.w / 8; val x1 = math.max((bx + 1) * img.w / 8, x0 + 1)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * img.w + x) * 3
            s += (77 * (img.rgb(i) & 0xff) + 151 * (img.rgb(i + 1) & 0xff) +
              28 * (img.rgb(i + 2) & 0xff)) >> 8
            x += 1
          }
          y += 1
        }
        pooled(by * 8 + bx) = s.toDouble / ((y1 - y0).toLong * (x1 - x0))
        bx += 1
      }
      by += 1
    }
    val f = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            acc += pooled(y * 8 + x) * PhashCos(u * 8 + x) * PhashCos(v * 8 + y)
            x += 1
          }
          y += 1
        }
        f(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val sorted = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(sorted)
    val med = sorted(31) // 63 ACs -> the 32nd order statistic
    var hash = 0L
    var i = 1
    while (i < 64) {
      if (f(i) > med) hash |= 1L << (i - 1)
      i += 1
    }
    hash
  }

  case class PhashRow(media_id: Long, variant: String, phash: Long)

  /** one perceptual hash per (id, variant) blob: write the three real
    * containers, SNIFF each one back (magic bytes, not the variant
    * tag), decode through the real codec, hash the decoded raster —
    * per-row mapPartitions, rasters never leave their partition, the
    * shuffle downstream carries (id, token, long) only
    */
  def phashSignatures(spark: SparkSession, docs: DataFrame): Dataset[PhashRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.flatMap { id =>
      phashVariants(id).map { case (variant, bytes) =>
        val img = MediaCodecs.sniff(bytes) match {
          case Some("png") => MediaCodecs.pngParse(bytes)
          case Some("ppm") => MediaCodecs.ppmParse(bytes)
          case other => throw new IllegalStateException(
            s"phash fixture sniffed as $other — fixtures write png/ppm only")
        }
        PhashRow(id, variant, perceptualHash(img))
      }
    })
  }

  case class PhashDup(
      media_id: Long, variant: String,
      group_size: Long, keeper_id: Long, is_keeper: Long)

  /** perceptual near-dup over the variant corpus: the LSH-banded
    * hamming join runs in DISTINCT-HASH space, never row space — a
    * dup-heavy crawl collapses to few distinct perceptual hashes, so
    * the quadratic band-bucket self-join prices on the collapsed set
    * while the row-space work stays aggregation-shaped (one distinct,
    * one join-back, one spillable window election, the m12 recipe).
    *
    * 8 bands of 8 bits over the 63-bit hash: pigeonhole guarantees
    * every pair within hamming <= 7 collides on at least one exact
    * band, so `maxHamming` = 7 keeps the banding RECALL-EXACT (no
    * probabilistic miss — unlike minhash banding, which trades recall
    * for candidate count); band collisions beyond 7 are dropped by
    * the exact bit_count verify. Components via the shared bounded
    * union-find (distributed star-contraction fallback above the edge
    * bound), keeper = lexicographic min (media_id, variant).
    */
  def phashNearDup(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 7): DataFrame =
    hashNearDupGroups(spark,
      phashSignatures(spark, docs).toDF().withColumnRenamed("phash", "sig"),
      maxHamming)

  /** banded hamming near-dup GROUPING over any 63-bit signature frame
    * (media_id, variant, sig) — the kernel m13 (DCT perceptual hash)
    * and m14 (acoustic fingerprint) share: distinct-signature
    * collapse, 8x8-bit bands (recall-exact for hamming <= 7 by
    * pigeonhole), exact bit_count verify, bounded union-find
    * components, spillable window election with the lexicographic
    * (media_id, variant) keeper.
    */
  private[graft] def hashNearDupGroups(
      spark: SparkSession, sigs0: DataFrame, maxHamming: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE pass of the decode-heavy signature computation, shared by the
    // node set and the final join. localCheckpoint instead of persist:
    // a persist here leaked one cached relation per m13/m14 run for the
    // session lifetime (nothing could own the unpersist), while
    // checkpoint blocks are reclaimed by the ContextCleaner as soon as
    // the result is dropped — and the grouped plan below stays fully
    // visible to the plan audits (raster-free shuffle, window election).
    val sigs = sigs0.localCheckpoint()
    val nodes = sigs.select(col("sig").as("doc_id")).distinct()
    val bands = nodes.select(col("doc_id").as("h"))
      .select(col("h"), posexplode(expr(
        "transform(sequence(0, 7), b -> shiftright(h, b * 8) & 255)"))
        .as(Seq("band", "key")))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.h") < col("b.h"))
      .select(col("a.h").as("d1"), col("b.h").as("d2")).distinct()
      .filter(expr(s"bit_count(d1 ^ d2) <= $maxHamming"))
    val cc = Clusters.connectedComponents(nodes, pairs)
      .withColumnRenamed("doc_id", "sig")
    val byCluster = Window.partitionBy("cluster")
    sigs.join(cc, Seq("sig"))
      .withColumn("group_size", count(lit(1)).over(byCluster))
      .withColumn("k", min(struct(col("media_id"), col("variant"))).over(byCluster))
      .select(
        col("media_id"), col("variant"), col("group_size"),
        col("k.media_id").as("keeper_id"),
        when(col("media_id") === col("k.media_id") &&
          col("variant") === col("k.variant"), 1L).otherwise(0L).as("is_keeper"))
  }

  // ----------------------------------- acoustic fingerprint (m14)

  /** 2048 PCM16 samples for the acoustic-fingerprint fixtures —
    * nonlinear in (t, id % 240) with amplitude bounded to ±8000, so
    * the 2x-gain variant (±16000) never clips and its energies are
    * EXACTLY 4x the base's (integer squares). Only 240 distinct
    * signals exist: the m12/m13 residue-oracle recipe on audio.
    */
  private[graft] def afpSamples(id: Long): Array[Short] = {
    val rid = (id % 240).toInt
    Array.tabulate(2048) { t =>
      ((((t + 13 * rid) * (t % 29 + rid % 31 + 2) + rid * rid * t) % 16001) - 8000).toShort
    }
  }

  /** 63-bit ACOUSTIC fingerprint of decoded PCM (the
    * chromaprint-family delta-sign recipe made exact): 32
    * floor-boundary windows; bits 0..31 compare each window's
    * second-half energy to its first half, bits 32..62 the sign of
    * consecutive window-energy deltas. Energies are exact Long sums
    * of squares, so a uniform GAIN multiplies every energy by the
    * same square and flips NOTHING — volume is invisible by
    * arithmetic, not approximation (strict >, ties to 0, preserved
    * exactly under scaling).
    */
  private[graft] def audioFingerprint(samples: Array[Short]): Long = {
    val nw = 32
    val n = samples.length
    val ea = new Array[Long](nw); val eb = new Array[Long](nw)
    var w = 0
    while (w < nw) {
      val w0 = w * n / nw; val w1 = (w + 1) * n / nw; val m = (w0 + w1) / 2
      var i = w0
      while (i < m) { val x = samples(i).toLong; ea(w) += x * x; i += 1 }
      while (i < w1) { val x = samples(i).toLong; eb(w) += x * x; i += 1 }
      w += 1
    }
    var hash = 0L
    w = 0
    while (w < nw) {
      if (eb(w) > ea(w)) hash |= 1L << w
      w += 1
    }
    w = 0
    while (w < nw - 1) {
      if (ea(w + 1) + eb(w + 1) > ea(w) + eb(w)) hash |= 1L << (32 + w)
      w += 1
    }
    hash
  }

  /** splice an ignorable LIST/INFO chunk between fmt and data: a
    * byte-DIFFERENT container that decodes to the SAME samples (RIFF
    * readers must skip unknown chunks — wavParse does)
    */
  private def wavWithListChunk(samples: Array[Short]): Array[Byte] = {
    val plain = MediaCodecs.wavWrite(samples, 8000)
    val info = "INFOICMT\u0008\u0000\u0000\u0000fixture\u0000".getBytes("ISO-8859-1")
    val out = java.nio.ByteBuffer
      .allocate(plain.length + 8 + info.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(plain, 0, 36) // RIFF header + fmt chunk
    out.put("LIST".getBytes("US-ASCII"))
    out.putInt(info.length)
    out.put(info)
    out.put(plain, 36, plain.length - 36) // data chunk onward
    val bytes = out.array()
    // patch the RIFF size for the inserted chunk
    val riffLen = (plain.length - 8) + 8 + info.length
    bytes(4) = (riffLen & 0xff).toByte
    bytes(5) = ((riffLen >> 8) & 0xff).toByte
    bytes(6) = ((riffLen >> 16) & 0xff).toByte
    bytes(7) = ((riffLen >> 24) & 0xff).toByte
    bytes
  }

  /** three acoustically-equivalent variants per id that decoded-PCM
    * equality would NOT all group: the base WAV; a 2x-GAIN copy
    * (every decoded sample differs — the fingerprint's delta signs
    * don't); and a container with an extra LIST chunk (byte-different
    * file, identical samples — RIFF chunk walking, not byte hashing,
    * is what recovers it)
    */
  /** the [[phashVariants]] memo on the acoustic axis (~13 KB x 240) */
  private val afpVariantCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Seq[(String, Array[Byte])]]()

  private[graft] def afpVariants(id: Long): Seq[(String, Array[Byte])] =
    afpVariantCache.computeIfAbsent((id % 240).toInt, rid => {
      val base = afpSamples(rid.toLong)
      val loud = base.map(s => (s * 2).toShort)
      Seq(
        ("pcm", MediaCodecs.wavWrite(base, 8000)),
        ("loud", MediaCodecs.wavWrite(loud, 8000)),
        ("pad", wavWithListChunk(base)))
    })

  case class AfpRow(media_id: Long, variant: String, sig: Long)

  /** one acoustic fingerprint per (id, variant) blob: write the real
    * containers, sniff each back (magic bytes), decode through the
    * real RIFF/PCM parser, fingerprint the decoded samples
    */
  def afpSignatures(spark: SparkSession, docs: DataFrame): Dataset[AfpRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions(_.flatMap { id =>
      afpVariants(id).map { case (variant, bytes) =>
        require(MediaCodecs.sniff(bytes).contains("wav-pcm"),
          s"afp fixture did not sniff as wav-pcm")
        AfpRow(id, variant, audioFingerprint(MediaCodecs.wavParse(bytes).samples))
      }
    })
  }

  /** acoustic near-dup over the variant corpus — [[hashNearDupGroups]]
    * on the audio fingerprint (m14): same distinct-signature banding,
    * same election, different modality
    */
  def afpNearDup(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 7): DataFrame =
    hashNearDupGroups(spark, afpSignatures(spark, docs).toDF(), maxHamming)
}
