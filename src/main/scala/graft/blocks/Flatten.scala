package graft.blocks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical projection / flatten — "the query" the reference runs on
  * every block (jq spec at borealis-indexer/src/main.rs:454, full
  * traversal at main.rs:486-569 / borealis-consumer/src/main.rs:318-412):
  * the nested block document becomes six relational entity tables.
  *
  * This is the bronze->silver job. Design points for 100 TB:
  *  - everything is `select`/`explode_outer` — no UDFs, fully
  *    codegen'd, no shuffle at all (flattening is per-document; Spark
  *    keeps it in the scan stage).
  *  - u128 strings cast to Decimal(38,0) with the raw string kept when
  *    the cast overflows (guard policy per SURVEY §1.3: `try_cast
  *    semantics — null decimal + preserved *_raw column`).
  *  - nanosecond longs stay canonical; micros TimestampType derived for
  *    time ops; `block_date` column for lake partitioning
  *    (`partitionBy(block_date)` keeps pruning effective at any scale).
  */
object Flatten {

  private val dec38 = DecimalType(38, 0)

  /** u128-string -> Decimal(38,0), null if it would overflow (u128 max
    * 3.4e38 > 1e38-1)
    */
  private def u128(c: org.apache.spark.sql.Column) =
    when(length(c) <= 38, c.cast(dec38)).otherwise(lit(null).cast(dec38))

  private def tsCols(nanos: org.apache.spark.sql.Column) = Seq(
    nanos.as("timestamp_ns"),
    timestamp_micros((nanos / 1000L).cast(LongType)).as("block_time"),
    to_date(timestamp_micros((nanos / 1000L).cast(LongType))).as("block_date"))

  /** raw (wire) documents -> one row per block */
  def blocks(docs: DataFrame): DataFrame =
    docs.select(
      Seq(
        col("block.header.height").as("block_height"),
        col("block.header.hash").as("block_hash"),
        col("block.header.prev_hash").as("prev_hash"),
        col("block.author").as("author"),
        col("block.header.epoch_id").as("epoch_id"),
        u128(col("block.header.gas_price")).as("gas_price"),
        u128(col("block.header.total_supply")).as("total_supply"),
        col("block.header.total_supply").as("total_supply_raw"),
        col("block.header.chunks_included").as("chunks_included"),
        col("block.header.latest_protocol_version").as("protocol_version"),
        size(col("block.chunks")).cast(LongType).as("n_chunks"),
        size(col("shards")).cast(LongType).as("n_shards"),
        col("block.header.chunk_mask").as("chunk_mask"),
        col("block.header.signature").as("signature")) ++
        tsCols(col("block.header.timestamp")): _*)

  /** block.chunks[] -> one row per chunk header */
  def chunkHeaders(docs: DataFrame): DataFrame =
    docs
      .select(
        col("block.header.height").as("block_height"),
        col("block.header.timestamp").as("ts_ns"),
        explode(col("block.chunks")).as("c"))
      .select(
        col("block_height"),
        col("c.chunk_hash").as("chunk_hash"),
        col("c.shard_id").as("shard_id"),
        col("c.height_created").as("height_created"),
        col("c.height_included").as("height_included"),
        col("c.encoded_length").as("encoded_length"),
        col("c.gas_used").as("gas_used"),
        col("c.gas_limit").as("gas_limit"),
        u128(col("c.balance_burnt")).as("balance_burnt"),
        col("c.prev_block_hash").as("prev_block_hash"),
        col("c.tx_root").as("tx_root"))

  /** shards[].chunk.transactions[] -> one row per transaction, outcome
    * inlined (null-chunk shards contribute nothing — explode_outer keeps
    * the block visible in [[shards]] instead)
    */
  def transactions(docs: DataFrame): DataFrame =
    docs
      .select(
        col("block.header.height").as("block_height"),
        col("block.header.timestamp").as("nanos"),
        explode(col("shards")).as("shard"))
      .filter(col("shard.chunk").isNotNull)
      .select(
        col("block_height"),
        col("nanos"),
        col("shard.shard_id").as("shard_id"),
        explode(col("shard.chunk.transactions")).as("t"))
      .select(
        Seq(
          col("block_height"),
          col("shard_id"),
          col("t.transaction.hash").as("tx_hash"),
          col("t.transaction.signer_id").as("signer_id"),
          col("t.transaction.receiver_id").as("receiver_id"),
          col("t.transaction.nonce").as("nonce"),
          col("t.transaction.public_key").as("public_key"),
          size(col("t.transaction.actions")).cast(LongType).as("n_actions"),
          col("t.outcome.execution_outcome.outcome.gas_burnt").as("gas_burnt"),
          u128(col("t.outcome.execution_outcome.outcome.tokens_burnt")).as("tokens_burnt"),
          col("t.outcome.execution_outcome.outcome.executor_id").as("executor_id"),
          col("t.outcome.execution_outcome.outcome.status.status_type").as("status_type"),
          col("t.outcome.execution_outcome.outcome.status.value").as("status_value"),
          col("t.outcome.execution_outcome.outcome.receipt_ids").as("receipt_ids")) ++
          tsCols(col("nanos")): _*)

  /** one row per (transaction, action) with the action ordinal —
    * the polymorphic variant list made relational. `action_json` keeps
    * the payload as JSON TEXT alongside the typed columns (null struct
    * fields dropped, so each variant carries exactly its own fields):
    * the open-set escape hatch for action variants the tagged struct
    * doesn't type — b10 VARIANT-shreds it, and new variants flow
    * through it un-dropped until the schema catches up.
    */
  def txActions(docs: DataFrame): DataFrame =
    docs
      .select(col("block.header.height").as("block_height"), explode(col("shards")).as("shard"))
      .filter(col("shard.chunk").isNotNull)
      .select(col("block_height"), explode(col("shard.chunk.transactions")).as("t"))
      .select(
        col("block_height"),
        col("t.transaction.hash").as("tx_hash"),
        posexplode(col("t.transaction.actions")).as(Seq("action_index", "a")))
      .select(
        col("block_height"),
        col("tx_hash"),
        col("action_index"),
        col("a.action_type").as("action_type"),
        u128(col("a.deposit")).as("deposit"),
        col("a.public_key").as("public_key"),
        col("a.access_key.permission").as("access_key_permission"),
        to_json(col("a")).as("action_json"))

  /** shards[].chunk.receipts[] -> one row per receipt */
  def receipts(docs: DataFrame): DataFrame =
    docs
      .select(col("block.header.height").as("block_height"), explode(col("shards")).as("shard"))
      .filter(col("shard.chunk").isNotNull)
      .select(
        col("block_height"),
        col("shard.shard_id").as("shard_id"),
        explode(col("shard.chunk.receipts")).as("r"))
      .select(
        col("block_height"),
        col("shard_id"),
        col("r.receipt_id").as("receipt_id"),
        col("r.predecessor_id").as("predecessor_id"),
        col("r.receiver_id").as("receiver_id"),
        col("r.receipt.signer_id").as("signer_id"),
        u128(col("r.receipt.gas_price")).as("gas_price"),
        size(col("r.receipt.actions")).cast(LongType).as("n_actions"))

  /** shards[].receipt_execution_outcomes[] -> one row per outcome.
    * Outcomes land in LATER blocks than their transaction
    * (main.rs:121-124) — joining back to [[transactions]] is the as-of /
    * cross-block op ([[graft.ops.AsOfJoin]]).
    */
  def executionOutcomes(docs: DataFrame): DataFrame =
    docs
      .select(
        col("block.header.height").as("block_height"),
        col("block.header.timestamp").as("nanos"),
        explode(col("shards")).as("shard"))
      .select(
        col("block_height"),
        col("nanos"),
        col("shard.shard_id").as("shard_id"),
        explode(col("shard.receipt_execution_outcomes")).as("o"))
      .select(
        Seq(
          col("block_height"),
          col("shard_id"),
          col("o.execution_outcome.id").as("outcome_id"),
          col("o.execution_outcome.outcome.gas_burnt").as("gas_burnt"),
          u128(col("o.execution_outcome.outcome.tokens_burnt")).as("tokens_burnt"),
          col("o.execution_outcome.outcome.executor_id").as("executor_id"),
          col("o.execution_outcome.outcome.status.status_type").as("status_type"),
          col("o.execution_outcome.outcome.receipt_ids").as("receipt_ids"),
          col("o.receipt.receipt_id").as("receipt_id"),
          col("o.receipt.predecessor_id").as("predecessor_id"),
          col("o.receipt.receiver_id").as("receiver_id")) ++
          tsCols(col("nanos")): _*)

  /** shards[].state_changes[] -> one row per state change */
  def stateChanges(docs: DataFrame): DataFrame =
    docs
      .select(col("block.header.height").as("block_height"), explode(col("shards")).as("shard"))
      .select(
        col("block_height"),
        col("shard.shard_id").as("shard_id"),
        explode(col("shard.state_changes")).as("sc"))
      .select(
        col("block_height"),
        col("shard_id"),
        col("sc.cause.cause_type").as("cause_type"),
        col("sc.value.value_type").as("value_type"),
        col("sc.value.account_id").as("account_id"),
        u128(col("sc.value.account.amount")).as("amount"),
        u128(col("sc.value.account.locked")).as("locked"),
        col("sc.value.account.storage_usage").as("storage_usage"))

  /** per-shard row keeping the None-chunk branch visible (S18,
    * main.rs:509-546): explode_outer + null-gated counts
    */
  def shards(docs: DataFrame): DataFrame =
    docs
      .select(col("block.header.height").as("block_height"), explode_outer(col("shards")).as("shard"))
      .select(
        col("block_height"),
        col("shard.shard_id").as("shard_id"),
        col("shard.chunk").isNotNull.as("has_chunk"),
        when(col("shard.chunk").isNotNull, size(col("shard.chunk.transactions")).cast(LongType))
          .as("n_transactions"),
        when(col("shard.chunk").isNotNull, size(col("shard.chunk.receipts")).cast(LongType))
          .as("n_receipts"),
        size(col("shard.receipt_execution_outcomes")).cast(LongType).as("n_outcomes"),
        size(col("shard.state_changes")).cast(LongType).as("n_state_changes"))

  val entityNames: Seq[String] = Seq(
    "blocks", "chunk_headers", "transactions", "tx_actions", "receipts",
    "execution_outcomes", "state_changes", "shards")

  def all(docs: DataFrame): Map[String, DataFrame] = Map(
    "blocks" -> blocks(docs),
    "chunk_headers" -> chunkHeaders(docs),
    "transactions" -> transactions(docs),
    "tx_actions" -> txActions(docs),
    "receipts" -> receipts(docs),
    "execution_outcomes" -> executionOutcomes(docs),
    "state_changes" -> stateChanges(docs),
    "shards" -> shards(docs))

  /** parse raw JSON-lines block documents with the versioned schema
    * (never inferSchema — SURVEY §1.4). Lines that don't parse to a
    * block document (malformed JSON, wrong shape) are DROPPED here —
    * `from_json` yields a null struct for them, and a null doc row must
    * never reach the entity tables. Capture them via [[rejects]] into a
    * dead-letter location instead of losing them silently.
    */
  def parse(spark: SparkSession, jsonl: DataFrame): DataFrame = {
    jsonl
      .select(from_json(col("value"), StreamerSchema.streamerMessage).as("doc"))
      .filter(col("doc").isNotNull && col("doc.block.header.height").isNotNull)
      .select("doc.*")
  }

  /** the complement of [[parse]]: raw lines that failed schema parse
    * (the dead-letter stream a 100 TB ingest writes aside and alerts
    * on, rather than poisoning the lake or crashing the job)
    */
  def rejects(spark: SparkSession, jsonl: DataFrame): DataFrame = {
    jsonl
      .withColumn("doc", from_json(col("value"), StreamerSchema.streamerMessage))
      .filter(col("doc").isNull || col("doc.block.header.height").isNull)
      .select(col("value").as("raw"))
  }

  /** in-memory fixture documents (golden example re-keyed per height) */
  def fixtureDocs(spark: SparkSession, from: Long, n: Int): DataFrame = {
    import spark.implicits._
    parse(spark, Fixtures.blocksJson(from, n).toDF("value"))
  }
}
