package graft.streaming

import graft.blocks.{Flatten, StreamerSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming image of the reference's ingest pipeline
  * (SURVEY §2 S1/S3/S4/S9/S13/S19, §3.1-3.3):
  *
  *  - file-drop source of JSON-lines block documents ≡ the NATS subject
  *    (one blob per block, borealis-indexer/src/main.rs:362-379); any
  *    Kafka-style source slots in by swapping `readStream.format`.
  *  - `checkpointLocation` ≡ JetStream durable consumer + explicit ack
  *    (consumer main.rs:640-669): offsets commit per micro-batch, restart
  *    resumes from interruption (SyncMode::FromInterruption,
  *    configs.rs:138-146).
  *  - `Trigger.AvailableNow` ≡ AwaitSynced::WaitForFullSync backfill,
  *    then a continuous trigger tails the stream
  *    (AwaitSynced::StreamWhileSyncing, configs.rs:161-168).
  *  - `dropDuplicatesWithinWatermark` on height ≡ the 24 h JetStream
  *    duplicate_window (consumer main.rs:578).
  *  - `foreachBatch` + append Parquet ≡ the at-least-once publish with
  *    retry (main.rs:388-401); checkpoint + task retry makes it
  *    effectively-once without the reference's hand-rolled reconnect
  *    actor (S10/S20 — non-goals per SURVEY).
  *
  * At 100 TB the lake layout is what matters: every entity table is
  * written partitioned so height-range and date predicates prune files.
  */
object BlockIngest {

  /** batch backfill: read an existing drop of JSON-lines block files
    * into the lake (S4 WaitForFullSync)
    */
  def backfill(spark: SparkSession, srcDir: String, lakeDir: String): Unit = {
    val docs = Flatten.parse(spark, spark.read.text(srcDir))
    writeEntities(docs, lakeDir, batchId = -1L)
  }

  /** streaming tail with checkpointed resume + height dedup */
  def start(
      spark: SparkSession,
      srcDir: String,
      lakeDir: String,
      checkpointDir: String,
      availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 64) // backpressure ≡ the bounded mpsc(1000)
      .text(srcDir)
    val docs = Flatten
      .parse(spark, raw)
      .withColumn("height", col("block.header.height"))
      .withColumn("event_time", timestamp_micros((col("block.header.timestamp") / 1000L)
        .cast(org.apache.spark.sql.types.LongType)))
      .withWatermark("event_time", "24 hours")
      .dropDuplicatesWithinWatermark("height")

    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeEntities(batch.drop("event_time", "height"), lakeDir, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("10 seconds"))).start()
  }

  /** Flatten + write each entity table; blocks partitioned by date for
    * pruning. The 8 writes are independent jobs over the same cached
    * batch — submitted concurrently so the scheduler overlaps them
    * (Spark jobs from separate threads share the executor pool).
    *
    * Idempotence (the effectively-once half of S9): every write lands in
    * a batch-scoped partition directory (`batch=<id>`) with OVERWRITE
    * semantics, so a micro-batch that is replayed after a partial
    * failure — some entities committed, checkpoint not — simply
    * rewrites the same directories instead of appending duplicates.
    * `batch` surfaces as an ordinary partition column on read.
    */
  private def writeEntities(docs: DataFrame, lakeDir: String, batchId: Long): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val cached = docs.cache()
    cached.count(): Unit // materialize once before the parallel writers
    val entities = Flatten.all(cached)
    try {
      val jobs = entities.toSeq.map { case (name, df) =>
        Future {
          val w = df.write.mode("overwrite")
          (if (name == "blocks") w.partitionBy("block_date") else w)
            .parquet(s"$lakeDir/$name/batch=$batchId")
        }
      }
      jobs.foreach(Await.result(_, Duration.Inf))
    } finally { cached.unpersist(): Unit }
  }
}
