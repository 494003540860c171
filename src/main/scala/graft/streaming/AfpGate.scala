package graft.streaming

import graft.functions.MediaCodecs
import graft.llm.Multimodal
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ACOUSTIC media dedup — m14 run continuously at ingest,
  * [[PhashGate]]'s audio sibling: each micro-batch of audio blobs is
  * sniffed, decode-guarded, decoded through the real RIFF/PCM and
  * G.711 μ-law codecs, fingerprinted with the m14 delta-sign recipe
  * (exact integer energies — a uniform gain flips nothing), and gated
  * against everything admitted so far. A re-mastered (2x-gain) or
  * re-containered (extra LIST chunk) upload of an admitted track
  * drops at the door with its partner named.
  *
  * Everything past the decode is [[HashGateCore]] — the identical
  * signature-space pipeline m13 runs on image hashes: distinct-
  * fingerprint collapse, 8x8-bit banding (recall-exact for hamming
  * <= 7 by pigeonhole), bucket-pruned [[GateIndex]] probe of the
  * admitted index, exact `bit_count` verify, bounded components,
  * lexicographic keeper election, per-row verdicts, batch-scoped
  * idempotent writes, lease-fenced compaction, and the forget /
  * takedown fold ([[forget]] registers on the same audit contract as
  * every gate — AfpGateSpec and TakedownSpec assert both).
  *
  * Untrusted-feed armor (the [[MediaIngest]] rules): the sniff runs
  * inside the quarantine try, the decode is header-guarded
  * ([[MediaCodecs.declaredUnits]] BEFORE any codec — a crafted RIFF
  * size is `rejected:oversize`, never an executor OOM), any codec
  * failure verdicts `rejected:corrupt`, and sub-[[MinSamples]] clips
  * are `rejected:dust` (below two samples per fingerprint window the
  * energy spectrum is near-degenerate — the same reasoning as the
  * perceptual gate's 8x8 floor).
  */
object AfpGate {

  final case class Config(
      maxHamming: Int = 7,
      indexBuckets: Int = 64,
      maxUnits: Long = MediaCodecs.MaxDeclaredUnits,
      autoFoldGenerations: Int = 64)

  /** the m14 fingerprint folds 32 windows of 2 half-energies; below
    * one sample per half the windows go empty and distinct clips
    * collide on near-zero fingerprints — refuse them as dust
    */
  val MinSamples = 64

  /** one fingerprinted blob: `ok` rows carry a real decode; rejected
    * rows carry the reason in `verdict` and zeroed stats
    */
  case class AudioHash(
      media_id: Long, fmt: String, sample_rate: Long, n_samples: Long,
      afp: Long, ok: Boolean, verdict: String)

  /** sniff -> header guard -> real PCM/μ-law decode -> m14 delta-sign
    * fingerprint, per partition; every hostile-bytes failure mode is a
    * verdict
    */
  def fingerprintBatch(
      spark: SparkSession, files: DataFrame, maxUnits: Long): Dataset[AudioHash] = {
    import spark.implicits._
    // registry snapshot at PLAN-CONSTRUCTION time — the MediaIngest
    // capture rule: tasks never consult the driver-global registry
    val externals = Multimodal.decoderSnapshot
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) =>
        val id = MediaIngest.mediaIdOf(path)
        def rejected(fmt: String, why: String) =
          AudioHash(id, fmt, 0L, 0L, 0L, ok = false, why)
        def printed(fmt: String, rate: Int, samples: Array[Short]): AudioHash =
          if (samples.length < MinSamples) rejected(fmt, "rejected:dust")
          else AudioHash(id, fmt, rate.toLong, samples.length.toLong,
            Multimodal.audioFingerprint(samples), ok = true, "kept")
        try {
          Multimodal.sniffMedia(bytes, externals) match {
            case Some(fmt @ ("wav-pcm" | "wav-ulaw" | "aiff" | "au")) =>
              if (MediaCodecs.declaredUnits(fmt, bytes) > maxUnits)
                rejected(fmt, "rejected:oversize")
              else {
                val (rate, samples) = fmt match {
                  case "wav-pcm" =>
                    val w = MediaCodecs.wavParse(bytes)
                    (w.sampleRate, w.samples)
                  case "wav-ulaw" => MediaCodecs.ulawWavDecode(bytes)
                  case _ => // aiff / au through the JDK javax.sound reader
                    val w = MediaCodecs.javaSoundParse(bytes)
                    (w.sampleRate, w.samples)
                }
                printed(fmt, rate, samples)
              }
            case Some(fmt) =>
              // an EXTERNAL audio decoder (the MediaDecoder SPI) rides
              // the identical guard -> decode -> dust -> fingerprint
              // ladder; externals without samples (raster/stats-only)
              // stay unsupported here — PhashGate owns the raster arm
              externals.find(_.fmt == fmt) match {
                case Some(d) =>
                  val declared = d.declaredUnits(bytes)
                  if (declared < 0) rejected(fmt, "rejected:corrupt")
                  else if (declared > maxUnits) rejected(fmt, "rejected:oversize")
                  else d.decodeSamples(bytes) match {
                    case Some((rate, samples)) => printed(fmt, rate, samples)
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
      fingerprintBatch(spark, files, cfg.maxUnits).toDF(),
      sig = "afp",
      lakeCols = Seq("media_id", "fmt", "sample_rate", "n_samples", "afp"),
      batchTag, lakeDir, indexDir, decisionsDir,
      cfg.maxHamming, cfg.indexBuckets, cfg.autoFoldGenerations,
      // the auto-fold knows its own live tag, so exclusion is by name
      () => compact(spark, lakeDir, indexDir, decisionsDir, Some(batchTag)))
  }

  /** the admitted band index, both [[GateIndex]] tiers as one relation */
  def readBands(spark: SparkSession, indexDir: String): DataFrame =
    GateIndex.read(spark, s"$indexDir/bands")

  /** three-root maintenance window — [[HashGateCore.compact]] */
  def compact(
      spark: SparkSession,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      liveTag: Option[String] = None): Unit =
    HashGateCore.compact(spark, lakeDir, indexDir, decisionsDir, liveTag)

  /** right-to-be-forgotten on the gate's admitted state: remove the
    * predicate's media_ids from the lake and the band index (decision
    * log untouched — the audit rule, see [[NearDupGate.forget]]).
    * After a forget, an acoustically-identical future arrival finds no
    * colliding fingerprint and admits afresh.
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

  /** Streaming entry point: binary drop dir in, acoustically-deduped
    * audio lake out, checkpointed resume. Same source contract as
    * [[MediaIngest.start]] / [[PhashGate.start]].
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
        step(spark, batch.select("path", "content"),
          s"$token-$batchId", lakeDir, indexDir, decisionsDir, cfg)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }
}
