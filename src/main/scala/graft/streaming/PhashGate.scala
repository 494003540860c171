package graft.streaming

import graft.functions.MediaCodecs
import graft.llm.Multimodal
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming PERCEPTUAL media dedup — m13 run continuously at ingest,
  * the media sibling of [[NearDupGate]]: each micro-batch of image
  * blobs is sniffed, decode-guarded, decoded for real, perceptually
  * hashed (the m13 DCT hash), and gated against everything admitted so
  * far. A brightness-shifted or rescaled re-upload of an admitted
  * image drops at the door with its partner named, instead of reaching
  * the lake for a batch dedup to find later.
  *
  *   batch -> sniff/guard/decode/phash        (per row, stateless)
  *         -> collapse to DISTINCT hashes     (dup pressure dies here)
  *         -> band-probe the admitted index   (corpus perceptual dups)
  *         -> band self-join within the batch (intra-batch dups)
  *         -> exact hamming verify <= maxHamming, components, keeper
  *         -> admit keepers; append their band rows to the index
  *
  * The hash-space discipline is m13's: 8 bands of 8 bits over the
  * 63-bit hash make banding recall EXACT for hamming <= 7 (pigeonhole
  * — not a probabilistic LSH trade), and every quadratic step runs
  * over DISTINCT hashes, so a viral re-upload storm (10^6 copies of
  * one image in a batch) collapses to ONE node before any join; rows
  * rejoin by hash at the end for per-row verdicts, so the row-space
  * work is one join against distinct-hash-sized labels.
  *
  * State is one two-tier [[GateIndex]] relation, `indexDir/bands`
  * (band, key, phash, media_id of the admitted keeper): micro-batch
  * deltas land as the batch's own few files, compaction folds them
  * into the `_base/bucket=*` tier, and the per-batch probe dir-prunes
  * the base to the buckets the batch's bands touch — probe cost
  * follows the delta, not the corpus ([[NearDupGate]]'s layout,
  * enforced by the same [[GateLayout]] marker). All outputs
  * land as batch-scoped `batch=<tag>` overwrite generations (replay
  * rewrites, never duplicates), the probe excludes the batch's own
  * tag (a crash-replay must not match its own half-written
  * signatures), and compaction/forget ride [[LakeCompact]] /
  * [[GateForget]] under the shared lease contract.
  *
  * Untrusted-feed armor (the [[MediaIngest]] rules): the sniff runs
  * inside the quarantine try, the decode is header-guarded
  * ([[MediaCodecs.declaredUnits]] BEFORE any codec — a crafted header
  * is `rejected:oversize`, never an executor OOM), and any codec
  * failure verdicts `rejected:corrupt` instead of killing the batch.
  */
object PhashGate {

  final case class Config(
      maxHamming: Int = 7,
      indexBuckets: Int = 64,
      maxUnits: Long = MediaCodecs.MaxDeclaredUnits,
      // fold all three roots past this many index generations (see
      // NearDupGate.Config — same unattended-stream reasoning)
      autoFoldGenerations: Int = 64)

  /** one hashed blob: `ok` rows carry a real decode; rejected rows
    * carry the reason in `verdict` and zeroed stats
    */
  case class MediaHash(
      media_id: Long, fmt: String, width: Long, height: Long,
      phash: Long, ok: Boolean, verdict: String)

  /** sniff -> header guard -> real decode -> m13 perceptual hash, per
    * partition; every hostile-bytes failure mode is a verdict
    */
  def hashBatch(spark: SparkSession, files: DataFrame, maxUnits: Long): Dataset[MediaHash] = {
    import spark.implicits._
    // registry snapshot at PLAN-CONSTRUCTION time — the MediaIngest
    // capture rule: tasks never consult the driver-global registry
    val externals = Multimodal.decoderSnapshot
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) =>
        val id = MediaIngest.mediaIdOf(path)
        def rejected(fmt: String, why: String) =
          MediaHash(id, fmt, 0L, 0L, 0L, ok = false, why)
        def hashed(fmt: String, img: MediaCodecs.Ppm): MediaHash =
          // dust floor (MediaIngest.MinUnits's perceptual twin):
          // below the 8x8 pooling grid the DCT spectrum carries
          // almost no signal, so distinct tiny images would
          // collide on near-degenerate hashes and silently drop
          // each other as perceptual dups — refuse them instead
          if (img.w < 8 || img.h < 8) rejected(fmt, "rejected:dust")
          else MediaHash(id, fmt, img.w.toLong, img.h.toLong,
            Multimodal.perceptualHash(img), ok = true, "kept")
        try {
          Multimodal.sniffMedia(bytes, externals) match {
            case Some(fmt @ ("png" | "ppm" | "jpeg" | "bmp" | "tiff")) =>
              if (MediaCodecs.declaredUnits(fmt, bytes) > maxUnits)
                rejected(fmt, "rejected:oversize")
              else
                // ImageIO sniffs the container for png/jpeg/bmp/tiff;
                // ppm is ours
                hashed(fmt,
                  if (fmt == "ppm") MediaCodecs.ppmParse(bytes)
                  else MediaCodecs.pngParse(bytes))
            case Some(fmt) =>
              // an EXTERNAL raster decoder (the MediaDecoder SPI)
              // rides the identical guard -> decode -> dust -> hash
              // ladder; externals without a raster (audio/stats-only)
              // stay unsupported here — AfpGate owns the audio arm
              externals.find(_.fmt == fmt) match {
                case Some(d) =>
                  val declared = d.declaredUnits(bytes)
                  if (declared < 0) rejected(fmt, "rejected:corrupt")
                  else if (declared > maxUnits) rejected(fmt, "rejected:oversize")
                  else d.decodeRaster(bytes) match {
                    case Some(img) => hashed(fmt, img)
                    case None => rejected(fmt, "rejected:unsupported")
                  }
                case None => rejected(fmt, "rejected:unsupported")
              }
            case None => rejected("unknown", "rejected:unrecognized")
          }
        } catch {
          case scala.util.control.NonFatal(_) => rejected("unknown", "rejected:corrupt")
        }
      })
  }

  /** One incremental step: gate `files` (binaryFile-shaped: path,
    * content) against the index at `indexDir`, land admitted rows /
    * band signatures / per-row decisions under `batch=batchTag`.
    * Everything past the decode is [[HashGateCore]] — the pipeline
    * m13 and m14 share in signature space.
    */
  def step(
      spark: SparkSession,
      files: DataFrame,
      batchTag: String,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      cfg: Config = Config()): Unit = {
    Seq(lakeDir, s"$indexDir/bands", decisionsDir)
      .foreach(LakeCompact.assertNoLease(spark, _))
    GateLayout.assertBuckets(spark, indexDir, cfg.indexBuckets)
    HashGateCore.step(spark,
      hashBatch(spark, files, cfg.maxUnits).toDF(),
      sig = "phash",
      lakeCols = Seq("media_id", "fmt", "width", "height", "phash"),
      batchTag, lakeDir, indexDir, decisionsDir,
      cfg.maxHamming, cfg.indexBuckets, cfg.autoFoldGenerations,
      // the auto-fold knows its own live tag, so exclusion is by name
      () => compact(spark, lakeDir, indexDir, decisionsDir, Some(batchTag)))
  }

  /** the admitted band index, both [[GateIndex]] tiers as one relation */
  def readBands(spark: SparkSession, indexDir: String): DataFrame =
    GateIndex.read(spark, s"$indexDir/bands")

  /** fold the gate's three batch-scoped roots under ONE lease window
    * (see [[NearDupGate.compact]] — same gap-free reasoning); the index
    * fold moves deltas into the dir-pruned `_base/bucket=*` tier
    */
  def compact(
      spark: SparkSession,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      liveTag: Option[String] = None): Unit =
    HashGateCore.compact(spark, lakeDir, indexDir, decisionsDir, liveTag)

  /** right-to-be-forgotten on the gate's admitted state: remove the
    * predicate's media_ids from the lake and the band index (decision
    * log untouched — the audit rule, see [[NearDupGate.forget]]). After
    * a forget, a perceptually-identical future arrival finds no
    * colliding signature and admits afresh.
    *
    * CRASH-RE-RUN CONTRACT ([[GateForget]]): each root rewrites
    * crash-atomically, but a death between roots leaves a half-done
    * forget with no on-disk record — re-run the same forget until it
    * returns; ledger-driven takedowns ([[Takedown]]) re-drive this
    * automatically.
    */
  def forget(
      spark: SparkSession,
      lakeDir: String,
      indexDir: String,
      pred: Column): Unit =
    GateForget.fold(spark, pred, Seq(
      (lakeDir, None),
      (s"$indexDir/bands", Some("bucket"))))

  /** Streaming entry point: binary drop dir in, perceptually-deduped
    * media lake out, checkpointed resume. Same source contract as
    * [[MediaIngest.start]].
    */
  def start(
      spark: SparkSession,
      dropDir: String,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      checkpointDir: String,
      cfg: Config = Config(),
      availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .format("binaryFile")
      .schema(MediaIngest.binSchema)
      .option("maxFilesPerTrigger", 256)
      .load(dropDir)
    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(spark, batch, s"$token-$batchId", lakeDir, indexDir, decisionsDir, cfg)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }
}
