package graft.streaming

import graft.functions.MediaCodecs
import graft.llm.Multimodal
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming MULTIMODAL ingest — the binary sibling of [[DocIngest]]:
  * media files arrive in a drop directory (≡ a crawl/upload feed),
  * each blob is format-SNIFFED from its magic bytes (arriving data
  * carries no trustworthy kind column), decoded for real by the JDK
  * codec for its format (the m02 router's kernel, shared code), and
  * verdicted — decodable content lands in a kind-partitioned parquet
  * lake, everything else lands in a decision log with a reason
  * (`rejected:unrecognized | rejected:corrupt | rejected:dust`), so
  * "dropped" is always distinguishable from "never arrived".
  *
  * What is and isn't streamable, by design:
  *  - sniff + decode + verdict: per-row, stateless, wire speed — the
  *    same `mapPartitions` batch shape as m02, so a perceptual codec
  *    this container lacks (MP3/H.264) would drop into the kernel
  *    without touching the stream.
  *  - cross-media analysis (near-dup of decoded content, embedding
  *    gates): corpus-wide by nature — batch jobs over the lake this
  *    stream feeds, exactly like DocIngest's split.
  *
  * At scale the lake layout is the point: partitioned by kind so
  * modality-specific readers (image featurizers, audio windowers)
  * prune at the directory level, with the decoded integer stats
  * already materialized for gate predicates. Writes are batch-scoped
  * overwrites keyed by the checkpoint-lineage token (BlockIngest's S9
  * recipe): a replayed micro-batch rewrites its own generation, never
  * duplicates.
  */
object MediaIngest {

  /** one verdicted blob: decoded stats for kept rows, zeroed stats +
    * a reason for rejected ones (the audit row a takedown or a
    * re-crawl debugging session reads)
    */
  case class MediaDecision(
      media_id: Long, path: String, fmt: String, kind: String,
      verdict: String, n_frames: Long, n_units: Long,
      sum_vals: Long, peak: Long)

  /** reject decodes below this many units (pixels / samples) — dust
    * that would only pollute downstream featurizers
    */
  val MinUnits = 16L

  /** the binaryFile source's fixed schema (streaming sources require
    * it spelled out; batch infers it)
    */
  val binSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** media id from the file name: trailing digits of the basename
    * (the `m<id>.<ext>` drop convention), else a stable positive
    * 63-bit hash of the name — deterministic across replays either way
    */
  private[graft] def mediaIdOf(path: String): Long = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val stem = name.takeWhile(_ != '.')
    val digits = stem.reverse.takeWhile(_.isDigit).reverse
    if (digits.nonEmpty && digits.length <= 18) digits.toLong
    else name.foldLeft(1125899906842597L)((h, c) => 31 * h + c) & Long.MaxValue
  }

  /** the sniff → decode → verdict pass, per partition (codec reuse),
    * usable on a static binaryFile frame or a micro-batch.
    *
    * ARMORED for untrusted bytes — this is the one surface fed a raw
    * crawl/upload feed, so every failure mode lands as a verdict, never
    * as a task failure:
    *  - the sniff itself runs inside the quarantine try (a torn header
    *    that trips a parser edge is `rejected:corrupt`, not a dead
    *    micro-batch);
    *  - the decode is budget-GUARDED: a crafted header declaring a
    *    multi-GB raster is `rejected:oversize` with the codec never
    *    entered ([[Multimodal.decodeStats]]'s header-only cap) — the
    *    alternative is an executor `OutOfMemoryError` that Spark's task
    *    retry replays as a poison pill.
    */
  def decide(
      spark: SparkSession, files: DataFrame,
      maxUnits: Long = MediaCodecs.MaxDeclaredUnits): Dataset[MediaDecision] = {
    import spark.implicits._
    // snapshot the external-decoder registry HERE, on the driver, at
    // plan-construction time: the lambda below runs on executor JVMs
    // whose copy of the registry singleton is EMPTY, so a run-time
    // global lookup would silently quarantine every external-format
    // blob on a real cluster (the decoders are Serializable — the
    // snapshot rides the task closure)
    val externals = Multimodal.decoderSnapshot
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) =>
        val id = mediaIdOf(path)
        try {
          Multimodal.sniffMedia(bytes, externals) match {
            case None =>
              MediaDecision(id, path, "unknown", "unknown", "rejected:unrecognized", 0L, 0L, 0L, 0L)
            case Some(fmt) =>
              try {
                val st = Multimodal.decodeStats(fmt, bytes, maxUnits, externals)
                val verdict = if (st.n_units < MinUnits) "rejected:dust" else "kept"
                MediaDecision(id, path, fmt, st.kind, verdict,
                  st.n_frames, st.n_units, st.sum_vals, st.peak)
              } catch {
                case _: MediaCodecs.OversizeMediaException =>
                  // the header's CLAIM is over budget; nothing was decoded
                  MediaDecision(id, path, fmt, "unknown", "rejected:oversize", 0L, 0L, 0L, 0L)
                case scala.util.control.NonFatal(_) =>
                  // magic bytes promised a format the body doesn't deliver
                  MediaDecision(id, path, fmt, "unknown", "rejected:corrupt", 0L, 0L, 0L, 0L)
              }
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            // a sniff-layer edge on hostile bytes: quarantine, don't die
            MediaDecision(id, path, "unknown", "unknown", "rejected:corrupt", 0L, 0L, 0L, 0L)
        }
      })
  }

  /** streaming ingest with checkpointed resume: drop dir of media
    * files in, kind-partitioned lake of kept decodes + full decision
    * log out, both as replay-idempotent batch-scoped generations
    */
  def start(
      spark: SparkSession,
      dropDir: String,
      lakeDir: String,
      decisionsDir: String,
      checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .format("binaryFile")
      .schema(binSchema)
      .option("maxFilesPerTrigger", 256)
      .load(dropDir)
    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    val writer = decide(spark, raw).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[MediaDecision], batchId: Long) =>
        LakeCompact.assertNoLease(spark, lakeDir) // quiesce contract
        LakeCompact.assertNoLease(spark, decisionsDir)
        val b = batch.cache()
        try {
          b.toDF().write.mode("overwrite")
            .parquet(s"$decisionsDir/batch=$token-$batchId")
          b.filter(col("verdict") === "kept").toDF()
            .write.mode("overwrite").partitionBy("kind")
            .parquet(s"$lakeDir/batch=$token-$batchId")
        } finally b.unpersist(): Unit
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }
}
