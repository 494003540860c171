package graft.blocks

import org.apache.spark.sql.types._

/** Versioned, hand-written wire schema for the block-document stream —
  * the Spark image of the reference's `StreamerMessage` (worked example
  * at borealis-indexer/src/main.rs:118-349; same shape at
  * borealis-consumer/src/main.rs:22-253). No schema inference, ever:
  * the reference's schema is static Rust structs, ours is this object.
  *
  * Wire-type decisions (SURVEY.md §1.3):
  *  - u64 heights/nonces/gas  -> LongType (no unsigned in Spark; heights
  *    < 2^63 in practice).
  *  - u128 balances (gas_price, total_supply, deposit, tokens_burnt,
  *    amount/locked) -> StringType ON THE WIRE (NEAR RPC serializes
  *    u128 as JSON strings), cast to DecimalType(38,0) in the flatten
  *    with a null-on-overflow guard (u128 max 3.4e38 exceeds
  *    Decimal(38)'s 1e38-1).
  *  - u64 nanosecond timestamps -> LongType nanos as source of truth;
  *    micros TimestampType derived in the flatten.
  *  - base58 hashes, ed25519 keys/sigs, account ids -> StringType.
  *  - polymorphic variants (actions at main.rs:222-234, status at
  *    main.rs:251 vs :301, state-change cause/value at main.rs:333-334)
  *    -> tagged structs: a `*_type` discriminator plus sparse nullable
  *    fields. The ingest edge normalizes serde's enum encoding (bare
  *    string for unit variants, single-key object otherwise) into this
  *    tagged form.
  */
object StreamerSchema {

  /** ChunkHeaderView (main.rs:166-187, reused at :194-214) */
  val chunkHeader: StructType = StructType(Seq(
    StructField("chunk_hash", StringType),
    StructField("prev_block_hash", StringType),
    StructField("outcome_root", StringType),
    StructField("prev_state_root", StringType),
    StructField("encoded_merkle_root", StringType),
    StructField("encoded_length", LongType),
    StructField("height_created", LongType),
    StructField("height_included", LongType),
    StructField("shard_id", LongType),
    StructField("gas_used", LongType),
    StructField("gas_limit", LongType),
    StructField("rent_paid", StringType),
    StructField("validator_reward", StringType),
    StructField("balance_burnt", StringType),
    StructField("outgoing_receipts_root", StringType),
    StructField("tx_root", StringType),
    StructField("validator_proposals", ArrayType(StructType(Seq(
      StructField("account_id", StringType),
      StructField("public_key", StringType),
      StructField("stake", StringType))))),
    StructField("signature", StringType)))

  /** tagged action variant (main.rs:222-234) */
  val action: StructType = StructType(Seq(
    StructField("action_type", StringType),
    StructField("deposit", StringType),
    StructField("public_key", StringType),
    StructField("access_key", StructType(Seq(
      StructField("nonce", LongType),
      StructField("permission", StringType))))))

  /** tagged status variant (main.rs:251 SuccessReceiptId vs :301
    * SuccessValue)
    */
  val status: StructType = StructType(Seq(
    StructField("status_type", StringType),
    StructField("value", StringType)))

  /** ExecutionOutcomeWithIdView (main.rs:238-255) */
  val executionOutcome: StructType = StructType(Seq(
    StructField("proof", ArrayType(StructType(Seq(
      StructField("hash", StringType),
      StructField("direction", StringType))))),
    StructField("block_hash", StringType),
    StructField("id", StringType),
    StructField("outcome", StructType(Seq(
      StructField("logs", ArrayType(StringType)),
      StructField("receipt_ids", ArrayType(StringType)),
      StructField("gas_burnt", LongType),
      StructField("tokens_burnt", StringType),
      StructField("executor_id", StringType),
      StructField("status", status))))))

  /** ReceiptView (main.rs:258-284) */
  val receipt: StructType = StructType(Seq(
    StructField("predecessor_id", StringType),
    StructField("receiver_id", StringType),
    StructField("receipt_id", StringType),
    StructField("receipt", StructType(Seq(
      StructField("signer_id", StringType),
      StructField("signer_public_key", StringType),
      StructField("gas_price", StringType),
      StructField("output_data_receivers", ArrayType(StringType)),
      StructField("input_data_ids", ArrayType(StringType)),
      StructField("actions", ArrayType(action)))))))

  /** IndexerExecutionOutcomeWithReceipt (main.rs:287-330); receipt is
    * nullable (None for local tx outcome, main.rs:254)
    */
  val outcomeWithReceipt: StructType = StructType(Seq(
    StructField("execution_outcome", executionOutcome),
    StructField("receipt", receipt, nullable = true)))

  /** SignedTransactionView + outcome (main.rs:215-257) */
  val transaction: StructType = StructType(Seq(
    StructField("transaction", StructType(Seq(
      StructField("signer_id", StringType),
      StructField("public_key", StringType),
      StructField("nonce", LongType),
      StructField("receiver_id", StringType),
      StructField("actions", ArrayType(action)),
      StructField("signature", StringType),
      StructField("hash", StringType)))),
    StructField("outcome", outcomeWithReceipt)))

  /** StateChangeWithCauseView (main.rs:331-345) */
  val stateChange: StructType = StructType(Seq(
    StructField("cause", StructType(Seq(
      StructField("cause_type", StringType)))),
    StructField("value", StructType(Seq(
      StructField("value_type", StringType),
      StructField("account_id", StringType),
      StructField("account", StructType(Seq(
        StructField("amount", StringType),
        StructField("locked", StringType),
        StructField("code_hash", StringType),
        StructField("storage_usage", LongType),
        StructField("storage_paid_at", LongType)))))))))

  /** BlockHeaderView (main.rs:129-165) */
  val blockHeader: StructType = StructType(Seq(
    StructField("height", LongType),
    StructField("epoch_id", StringType),
    StructField("next_epoch_id", StringType),
    StructField("hash", StringType),
    StructField("prev_hash", StringType),
    StructField("prev_state_root", StringType),
    StructField("chunk_receipts_root", StringType),
    StructField("chunk_headers_root", StringType),
    StructField("chunk_tx_root", StringType),
    StructField("outcome_root", StringType),
    StructField("chunks_included", LongType),
    StructField("challenges_root", StringType),
    StructField("timestamp", LongType),
    StructField("timestamp_nanosec", LongType),
    StructField("random_value", StringType),
    StructField("validator_proposals", ArrayType(StructType(Seq(
      StructField("account_id", StringType),
      StructField("public_key", StringType),
      StructField("stake", StringType))))),
    StructField("chunk_mask", ArrayType(BooleanType)),
    StructField("gas_price", StringType),
    StructField("rent_paid", StringType),
    StructField("validator_reward", StringType),
    StructField("total_supply", StringType),
    StructField("challenges_result", ArrayType(StringType)),
    StructField("last_final_block", StringType),
    StructField("last_ds_final_block", StringType),
    StructField("next_bp_hash", StringType),
    StructField("block_merkle_root", StringType),
    StructField("approvals", ArrayType(StringType, containsNull = true)),
    StructField("signature", StringType),
    StructField("latest_protocol_version", IntegerType)))

  /** IndexerShard (main.rs:189-347); chunk is nullable (main.rs:192,
    * None case at main.rs:538-546)
    */
  val shard: StructType = StructType(Seq(
    StructField("shard_id", LongType),
    StructField("chunk", StructType(Seq(
      StructField("author", StringType),
      StructField("header", chunkHeader),
      StructField("transactions", ArrayType(transaction)),
      StructField("receipts", ArrayType(receipt)))), nullable = true),
    StructField("receipt_execution_outcomes", ArrayType(outcomeWithReceipt)),
    StructField("state_changes", ArrayType(stateChange))))

  /** the full StreamerMessage document (main.rs:118-349) */
  val streamerMessage: StructType = StructType(Seq(
    StructField("block", StructType(Seq(
      StructField("author", StringType),
      StructField("header", blockHeader),
      StructField("chunks", ArrayType(chunkHeader))))),
    StructField("shards", ArrayType(shard))))

  /** BorealisMessage envelope (S5 — main.rs:365,411-412): sequence key =
    * block height, plus payload and publish metadata.
    */
  val envelope: StructType = StructType(Seq(
    StructField("seq_id", LongType),
    StructField("payload", BinaryType),
    StructField("msg_format", StringType),
    StructField("compression", StringType)))
}
