package graft.streaming

import graft.llm.Similarity
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming RETRIEVAL SERVING gate: the query-side twin of the ingest
  * gates. Every other streaming surface moves the CORPUS (ingest,
  * dedup, contamination, sampling); this one moves the QUERIES — a
  * continuous feed of embedding queries answered against the FROZEN
  * standing IVF-PQ index (s10's cents/books/rows layout), the
  * operational shape of a RAG or dedup-lookup endpoint fed from a
  * queue:
  *
  *   freeze:  embeddings -> cents (16 rows) + books (PQ codebook)
  *                       -> rows (vec_id, cid, pq) posting lists
  *   batch:   queries -> per-query centroid ranking (queries broadcast
  *            into the 16-row cents table), keep nProbe lists
  *         -> posting-list join (the ONE corpus-wide relation,
  *            shuffled by cid once regardless of |queries|)
  *         -> batched ADC scoring (decimal-exact, float-free)
  *         -> per-query top-k to batch-scoped result generations
  *
  * 100 TB notes: the search plan reads no float vectors — the index
  * rows carry 32-bit PQ codes, so a query batch scans
  * nProbe/nCentroids of a code-width index, never the raster corpus;
  * queries, probes, and the per-batch ADC table are all broadcast-
  * sized (a 1k-query batch's ADC table is 128k tiny rows). The
  * frozen-index contract matches production: embedding releases are
  * operator events ([[buildIndex]] again), never stream state, which
  * is exactly what keeps the gate stateless — replay a micro-batch
  * and the same generation lands byte-identical (the batch-scoped
  * overwrite recipe every gate shares). Results are ADC-approximate
  * by design (the serving budget); exact re-rank over the returned
  * ids is the caller's second stage, as x08 composes it.
  *
  * ServeGateSpec asserts: streamed answers == the batch
  * [[Similarity.ivfPqServeBatch]] over the same query set, restart
  * from the checkpoint re-emits nothing, late query files are served
  * incrementally, and writes refuse while a maintenance lease is held.
  */
object ServeGate {

  /** schema of the query feed (parquet drop): a query id + the
    * embedding to answer, same element type as the corpus
    */
  val querySchema: StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("qv", ArrayType(FloatType), nullable = false)))

  /** Freeze the serving index from an embeddings frame — s10's layout
    * (cents/books/rows) built through the same public primitives, so
    * an index built by the batch entries serves unchanged. Rebuild =
    * call again (a release, not stream state).
    */
  def buildIndex(spark: SparkSession, embeddings: DataFrame, indexDir: String): Unit = {
    Similarity.sampledCentroids(embeddings, 16)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/cents")
    Similarity.sampledCodebooks(embeddings)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/books")
    Similarity.ivfPqIndexRows(
        embeddings,
        spark.read.parquet(s"$indexDir/cents"),
        spark.read.parquet(s"$indexDir/books"))
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/rows")
  }

  /** One serving step: answer `batchQueries` against the frozen index,
    * land per-query top-k under a batch-scoped generation (idempotent
    * on replay). Refuses under a maintenance lease — the quiesce
    * contract every gate's sink honors.
    */
  def step(
      spark: SparkSession,
      batchQueries: DataFrame,
      batchTag: String,
      indexDir: String,
      resultsDir: String,
      k: Int = 10,
      nProbe: Int = 4): Unit = {
    LakeCompact.assertNoLease(spark, resultsDir)
    Similarity.ivfPqServeBatch(
        batchQueries.select(col("query_id"), col("qv")),
        spark.read.parquet(s"$indexDir/rows"),
        spark.read.parquet(s"$indexDir/cents"),
        spark.read.parquet(s"$indexDir/books"),
        k, nProbe)
      .write.mode(SaveMode.Overwrite).parquet(s"$resultsDir/batch=$batchTag")
  }

  /** Streaming entry point: parquet query drop in, per-query top-k
    * result generations out, checkpointed resume.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      indexDir: String,
      resultsDir: String,
      checkpointDir: String,
      k: Int = 10,
      nProbe: Int = 4,
      availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(querySchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(srcDir)
    val token = BlockIngest.runToken(s"ckpt:$checkpointDir")
    val writer = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        step(spark, batch, s"$token-$batchId", indexDir, resultsDir, k, nProbe)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  /** Result-root maintenance window (the index is frozen — rebuilds
    * are [[buildIndex]] calls, not folds).
    */
  def compact(spark: SparkSession, resultsDir: String): Unit =
    LakeCompact.withLeases(spark, Seq(resultsDir)) {
      LakeCompact.foldGenerations(spark, resultsDir, assumeLeased = true)
    }
}
