package graft.blocks

import graft.Q
import graft.functions.ColumnFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Block-document (reference-shaped) queries. These run on the embedded
  * golden fixture (borealis-indexer/src/main.rs:118-349) re-keyed over a
  * height range, independent of the star-schema sf dir. Queries whose
  * semantics DuckDB can express (aggregation, unnest-join, projection)
  * carry oracles anchored at `{{FIXTURES}}` — [[graft.Verify]] dumps the
  * flattened entity tables there and substitutes the real path, so the
  * driver's DuckDB gate recomputes them independently. The wire-codec
  * queries (CBOR/base58/compression) emit INVARIANT outputs — md5 and
  * byte-length of the raw side (recomputable by DuckDB from the dumped
  * `raw_blocks` fixture) plus roundtrip/size booleans the oracle states
  * as constants — so the driver's hash gate covers them too; exact
  * codec bytes stay covered by the ScalaTest specs.
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

  /** The raw wire documents (seq_id, value) — the codec queries' shared
    * input, also dumped by [[graft.Verify]] as the `raw_blocks` oracle
    * fixture so b04/b08 can anchor md5/byte-length invariants in DuckDB.
    */
  def rawBlocks(s: SparkSession): DataFrame = {
    import s.implicits._
    Fixtures.blocksJson(Fixtures.baseHeight, N).toDF("value")
      .select(
        get_json_object(col("value"), "$.block.header.height").cast(LongType).as("seq_id"),
        col("value"))
  }

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
  // bytes). Oracle-checkable image: the JSON side (md5 + byte length)
  // is recomputed by DuckDB from the raw_blocks fixture; the CBOR side
  // rides the `cbor_ok` invariant (non-empty AND strictly smaller than
  // the JSON — true for this block document, where CBOR drops quotes/
  // braces for length-prefixed fields). Exact CBOR bytes: CodecSpec.
  private val b04 = Q(
    "b04_envelope_wire",
    (s, _) =>
      rawBlocks(s)
        .select(
          col("seq_id"),
          encode(col("value"), "UTF-8").as("jb"),
          to_cbor(col("value")).as("cb"))
        .select(
          col("seq_id"),
          md5(col("jb")).as("json_md5"),
          length(col("jb")).cast(LongType).as("json_bytes"),
          (length(col("cb")) > 0 && length(col("cb")) < length(col("jb")))
            .cast(LongType).as("cbor_ok")),
    Some(s"""
      SELECT seq_id, md5(value) AS json_md5,
             CAST(octet_length(encode(value)) AS BIGINT) AS json_bytes,
             CAST(1 AS BIGINT) AS cbor_ok
      FROM ${fx("raw_blocks")}
    """.trim))

  // S14: decode roundtrip — CBOR bytes back to documents, re-flattened.
  // Oracle: the same projection straight off the `blocks` fixture table
  // (dumped WITHOUT the codec in the path) — if encode→decode→parse→
  // flatten corrupts anything, the Spark side diverges from the fixture
  // and the driver's hash goes red.
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
    },
    Some(s"""
      SELECT block_height, block_hash,
             total_supply_raw AS total_supply, n_shards
      FROM ${fx("blocks")}
    """.trim))

  // base58 codec over block hashes: decode to 32 bytes, re-encode.
  // Oracle invariants: a NEAR epoch id is the base58 of a 32-byte hash,
  // so decode must yield exactly 32 bytes and re-encode must reproduce
  // the input verbatim — DuckDB states both as constants over the
  // fixture's epoch_id column. Arbitrary-payload coverage: CodecSpec.
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
        .withColumn("roundtrip_ok", (col("reencoded") === col("epoch_id")).cast(LongType))
        .drop("decoded"),
    Some(s"""
      SELECT block_height, epoch_id, epoch_id AS reencoded,
             CAST(32 AS BIGINT) AS bytes_len,
             CAST(1 AS BIGINT) AS roundtrip_ok
      FROM ${fx("blocks")}
    """.trim))

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

  // S8: compressed envelope wire — wrap with zstd AND lz4, unwrap both,
  // verify the roundtrips. Oracle-checkable image (cf. b04): the raw
  // side (md5 + bytes) recomputes from the raw_blocks fixture; the
  // codec side rides `{zstd,lz4}_ok` invariants (payload non-empty AND
  // unwrap reproduces the input byte-for-byte). Ratios: CodecSpec.
  private val b08 = Q(
    "b08_envelope_compressed",
    (s, _) => {
      val raw = rawBlocks(s)
      val z = Envelope.wrap(raw, "cbor", Some("zstd"))
      val l = Envelope.wrap(raw, "cbor", Some("lz4"))
      val zBack = Envelope.unwrap(z).select(col("seq_id"), col("value").as("z_value"))
      val lBack = Envelope.unwrap(l).select(col("seq_id"), col("value").as("l_value"))
      val sizes = z.select(col("seq_id"), length(col("payload")).cast(LongType).as("zstd_bytes"))
        .join(l.select(col("seq_id"), length(col("payload")).cast(LongType).as("lz4_bytes")), "seq_id")
      raw
        .join(zBack, "seq_id")
        .join(lBack, "seq_id")
        .join(sizes, "seq_id")
        .select(
          col("seq_id"),
          md5(encode(col("value"), "UTF-8")).as("raw_md5"),
          length(encode(col("value"), "UTF-8")).cast(LongType).as("raw_bytes"),
          (col("z_value") === col("value") && col("zstd_bytes") > 0)
            .cast(LongType).as("zstd_ok"),
          (col("l_value") === col("value") && col("lz4_bytes") > 0)
            .cast(LongType).as("lz4_ok"))
    },
    Some(s"""
      SELECT seq_id, md5(value) AS raw_md5,
             CAST(octet_length(encode(value)) AS BIGINT) AS raw_bytes,
             CAST(1 AS BIGINT) AS zstd_ok,
             CAST(1 AS BIGINT) AS lz4_ok
      FROM ${fx("raw_blocks")}
    """.trim))

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
