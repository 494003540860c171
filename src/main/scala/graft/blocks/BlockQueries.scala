package graft.blocks

import graft.Q
import graft.functions.ColumnFns._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Block-document (reference-shaped) queries. These run on the embedded
  * golden fixture (borealis-indexer/src/main.rs:118-349) re-keyed over a
  * height range, independent of the star-schema sf dir. Queries whose
  * semantics DuckDB can express (aggregation, unnest-join, projection)
  * carry oracles anchored at `{{FIXTURES}}` — [[graft.Verify]] dumps the
  * flattened entity tables there and substitutes the real path, so the
  * driver's DuckDB gate recomputes them independently. The wire-codec
  * queries (CBOR/base58/compression) stay rows-only; their exact-value
  * coverage lives in the ScalaTest specs.
  */
object BlockQueries {

  /** fixture blocks per catalog run — [[graft.Verify]] dumps the entity
    * tables at exactly this N so the `{{FIXTURES}}` oracles see the same
    * input
    */
  val FixtureN = 64

  private val N = FixtureN // fixture blocks per query run

  /** oracle table anchor: `read_parquet` over one dumped entity table */
  private def fx(entity: String) = s"read_parquet('{{FIXTURES}}/$entity/*.parquet')"

  // S15/S16: the canonical flatten — one row per transaction. The
  // library API keeps `receipt_ids` array-typed; the catalog projection
  // emits harness-sortable scalars (size + joined string) because the
  // driver's rows-only check sorts every output column. Likewise
  // Decimal38 -> VARCHAR (exact digits) and TimestampType -> epoch
  // seconds: the driver's pandas compare hashes DECIMAL/TIMESTAMP
  // differently per engine (round-2 b01/b02 hash misses), while every
  // proven-green output sticks to long/double/date/string.
  private val b01 = Q(
    "b01_flatten_transactions",
    (s, _) =>
      Flatten
        .transactions(Flatten.fixtureDocs(s, Fixtures.baseHeight, N))
        .withColumn("n_receipts", size(col("receipt_ids")).cast(LongType))
        .withColumn("receipt_ids", concat_ws(",", col("receipt_ids")))
        .withColumn("tokens_burnt", col("tokens_burnt").cast(StringType))
        .withColumn("block_time_s", unix_timestamp(col("block_time")))
        .drop("block_time"),
    Some(s"""
      SELECT * EXCLUDE (block_time)
             REPLACE (array_to_string(receipt_ids, ',') AS receipt_ids,
                      CAST(tokens_burnt AS VARCHAR) AS tokens_burnt),
             CAST(len(receipt_ids) AS BIGINT) AS n_receipts,
             CAST(floor(epoch(block_time)) AS BIGINT) AS block_time_s
      FROM ${fx("transactions")}
    """.trim))

  // SURVEY §7 phase-2 flagship: gas/tokens burnt per executor per day
  // (nested access + explode + Decimal38 agg + nano->timestamp).
  private val b02 = Q(
    "b02_gas_by_executor",
    (s, _) =>
      Flatten
        .executionOutcomes(Flatten.fixtureDocs(s, Fixtures.baseHeight, N))
        .groupBy(col("executor_id"), col("block_date"))
        .agg(
          sum(col("gas_burnt")).as("total_gas"),
          // exact u128 total as digit string — see b01 note on the
          // driver's DECIMAL hashing
          sum(col("tokens_burnt")).cast(StringType).as("total_tokens"),
          count(lit(1)).as("n_outcomes")),
    Some(s"""
      SELECT executor_id, block_date,
             CAST(sum(gas_burnt) AS BIGINT) AS total_gas,
             CAST(CAST(sum(tokens_burnt) AS DECIMAL(38,0)) AS VARCHAR) AS total_tokens,
             count(*) AS n_outcomes
      FROM ${fx("execution_outcomes")}
      GROUP BY 1, 2
    """.trim))

  // S18: null-chunk branch — per-shard counts with has_chunk flag.
  private val b03 = Q(
    "b03_shard_counts",
    (s, _) => Flatten.shards(Flatten.fixtureDocs(s, Fixtures.baseHeight, N)),
    Some(s"SELECT * FROM ${fx("shards")}"))

  // S5/S6/S7: envelope wrap + dual wire format (JSON bytes and CBOR
  // bytes) with sizes.
  private val b04 = Q(
    "b04_envelope_wire",
    (s, _) => {
      import s.implicits._
      val raw = Fixtures.blocksJson(Fixtures.baseHeight, N).toDF("value")
      raw
        .select(
          get_json_object(col("value"), "$.block.header.height").cast(LongType).as("seq_id"),
          col("value"))
        .select(
          col("seq_id"),
          to_cbor(col("value")).as("payload_cbor"),
          encode(col("value"), "UTF-8").as("payload_json"))
        .select(
          col("seq_id"),
          length(col("payload_cbor")).cast(LongType).as("cbor_bytes"),
          length(col("payload_json")).cast(LongType).as("json_bytes"),
          (length(col("payload_json")) - length(col("payload_cbor"))).cast(LongType)
            .as("cbor_savings"))
    })

  // S14: decode roundtrip — CBOR bytes back to documents, re-flattened.
  private val b05 = Q(
    "b05_cbor_roundtrip",
    (s, _) => {
      import s.implicits._
      val cbor = Fixtures.blocksJson(Fixtures.baseHeight, N).toDF("value")
        .select(to_cbor(col("value")).as("bin"))
      val decoded = Flatten.parse(s, cbor.select(from_cbor(col("bin")).as("value")))
      Flatten.blocks(decoded)
        .select(
          col("block_height"),
          col("block_hash"),
          // digit string, not Decimal38 — see b01 note
          col("total_supply").cast(StringType).as("total_supply"),
          col("n_shards"))
    })

  // base58 codec over block hashes: decode to 32 bytes, re-encode.
  private val b06 = Q(
    "b06_base58",
    (s, _) =>
      Flatten
        .blocks(Flatten.fixtureDocs(s, Fixtures.baseHeight, N))
        .select(
          col("block_height"),
          col("epoch_id"),
          base58_decode(col("epoch_id")).as("decoded"),
          base58_encode(base58_decode(col("epoch_id"))).as("reencoded"))
        .withColumn("bytes_len", length(col("decoded")).cast(LongType))
        .withColumn("roundtrip_ok", col("reencoded") === col("epoch_id"))
        .drop("decoded"))

  // tx -> final execution outcome across blocks (main.rs:121-124): the
  // receipt_id produced by the tx joins the outcome that lands in a
  // LATER block; equi-join on receipt id + range guard, aggregated gas.
  private val b07 = Q(
    "b07_tx_outcome_join",
    (s, _) => {
      val docs = Flatten.fixtureDocs(s, Fixtures.baseHeight, N)
      val tx = Flatten
        .transactions(docs)
        .select(
          col("block_height").as("tx_height"),
          col("tx_hash"),
          explode(col("receipt_ids")).as("receipt_id"))
      val outcomes = Flatten
        .executionOutcomes(docs)
        .select(
          col("block_height").as("outcome_height"),
          col("outcome_id"),
          col("gas_burnt"),
          col("status_type"))
      tx.join(outcomes, tx("receipt_id") === outcomes("outcome_id") &&
          col("outcome_height") >= col("tx_height"))
        .select("tx_hash", "tx_height", "outcome_height", "gas_burnt", "status_type")
    },
    Some(s"""
      WITH t AS (SELECT tx_hash, block_height AS tx_height,
                        unnest(receipt_ids) AS receipt_id
                 FROM ${fx("transactions")}),
           o AS (SELECT block_height AS outcome_height, outcome_id, gas_burnt, status_type
                 FROM ${fx("execution_outcomes")})
      SELECT t.tx_hash, t.tx_height, o.outcome_height, o.gas_burnt, o.status_type
      FROM t JOIN o ON o.outcome_id = t.receipt_id AND o.outcome_height >= t.tx_height
    """.trim))

  // S8: compressed envelope wire — wrap with zstd and lz4, unwrap,
  // verify the roundtrip and report compression ratios.
  private val b08 = Q(
    "b08_envelope_compressed",
    (s, _) => {
      import s.implicits._
      val raw = Fixtures.blocksJson(Fixtures.baseHeight, N).toDF("value")
      val z = Envelope.wrap(raw, "cbor", Some("zstd"))
      val l = Envelope.wrap(raw, "cbor", Some("lz4"))
      val zBack = Envelope.unwrap(z).withColumnRenamed("value", "z_value")
      val sizes = z.select(col("seq_id"), length(col("payload")).cast(LongType).as("zstd_bytes"))
        .join(l.select(col("seq_id"), length(col("payload")).cast(LongType).as("lz4_bytes")), "seq_id")
      raw
        .select(get_json_object(col("value"), "$.block.header.height").as("h").cast(LongType)
          .as("seq_id"), col("value"))
        .join(zBack, "seq_id")
        .join(sizes, "seq_id")
        .select(
          col("seq_id"),
          (col("value") === col("z_value")).as("roundtrip_ok"),
          length(col("value")).cast(LongType).as("raw_bytes"),
          col("zstd_bytes"),
          col("lz4_bytes"))
    })

  // Polymorphic-variant rollup (SURVEY §1.3 "hard" item 3): the
  // tagged-struct action encoding aggregated per variant — null-gated
  // counts prove the per-variant fields (deposit for Transfer,
  // public_key/permission for AddKey) stay confined to their variant,
  // and the Decimal38 deposit sum rides the exact-digits VARCHAR image
  // (driver-harness type rules, cf. b01/b02).
  private val b09 = Q(
    "b09_action_variants",
    (s, _) =>
      Flatten
        .txActions(Flatten.fixtureDocs(s, Fixtures.baseHeight, N))
        .groupBy("action_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("deposit")).cast(StringType).as("total_deposit"),
          count(col("public_key")).as("n_with_key"),
          count(col("access_key_permission")).as("n_with_permission")),
    Some(s"""
      SELECT action_type, count(*) AS n,
             CAST(SUM(deposit) AS VARCHAR) AS total_deposit,
             count(public_key) AS n_with_key,
             count(access_key_permission) AS n_with_permission
      FROM ${fx("tx_actions")}
      GROUP BY action_type
    """.trim))

  // SURVEY §1.3's open-set variant problem, closed with Spark-4 VARIANT
  // over the reference's OWN polymorphic payload (main.rs:222-234; b09
  // only tags it into a closed struct): the action JSON is parsed ONCE
  // per row into the binary VARIANT encoding (try_parse_json — a
  // malformed payload becomes a NULL every extraction skips, cf. q46),
  // then each per-variant field is a typed variant_get path extraction
  // — deposit lands as DECIMAL(38,0) directly, no string re-parse per
  // access (plan-audited: exactly one parse_json in the plan). The
  // oracle recomputes from the same JSON text with DuckDB's
  // json_extract_string, so the whole parse+extract machinery is
  // cross-checked, not just the aggregation.
  private val b10 = Q(
    "b10_action_variant_shred",
    (s, _) =>
      Flatten
        .txActions(Flatten.fixtureDocs(s, Fixtures.baseHeight, N))
        .select(expr("try_parse_json(action_json)").as("v"))
        .select(
          expr("variant_get(v, '$.action_type', 'string')").as("action_type"),
          expr("variant_get(v, '$.deposit', 'decimal(38,0)')").as("deposit"),
          expr("variant_get(v, '$.public_key', 'string')").as("public_key"),
          expr("variant_get(v, '$.access_key.permission', 'string')").as("permission"))
        .groupBy("action_type")
        .agg(
          count(lit(1)).as("n"),
          // exact u128 digits ride the VARCHAR image (b01/b02 rule)
          sum(col("deposit")).cast(StringType).as("total_deposit"),
          count(col("public_key")).as("n_with_key"),
          count(col("permission")).as("n_with_permission")),
    Some(s"""
      SELECT json_extract_string(action_json, '$$.action_type') AS action_type,
             count(*) AS n,
             CAST(CAST(SUM(CAST(json_extract_string(action_json, '$$.deposit') AS DECIMAL(38,0)))
                       AS DECIMAL(38,0)) AS VARCHAR) AS total_deposit,
             count(json_extract_string(action_json, '$$.public_key')) AS n_with_key,
             count(json_extract_string(action_json, '$$.access_key.permission')) AS n_with_permission
      FROM ${fx("tx_actions")}
      GROUP BY 1
    """.trim))

  def queries: Seq[Q] = Seq(b01, b02, b03, b04, b05, b06, b07, b08, b09, b10)
}
