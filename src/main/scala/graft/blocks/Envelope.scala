package graft.blocks

import graft.functions.ColumnFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The publish envelope (SURVEY §2 S5-S9): sequence key = block height
  * (BorealisMessage::new(height, payload),
  * borealis-indexer/src/main.rs:365,411-412), payload encoded CBOR or
  * JSON (main.rs:377/:424), optionally LZ4F/Zstd compressed
  * (main.rs:366-375).
  *
  * Reference quirk reproduced faithfully (SURVEY §1.2): when
  * compression is on, the payload inside the envelope is ALWAYS the
  * JSON serialization, regardless of the outer msg format
  * (main.rs:367,414; the consumer decodes compressed payloads with a
  * JSON parser at consumer main.rs:273).
  */
object Envelope {

  /** raw JSON-lines documents (`value` column) -> wire envelopes */
  def wrap(raw: DataFrame, msgFormat: String, compression: Option[String]): DataFrame = {
    require(msgFormat == "cbor" || msgFormat == "json", s"unknown msg format $msgFormat")
    val jsonBytes = encode(col("value"), "UTF-8")
    val encoded = compression match {
      case Some("lz4") => lz4_compress(jsonBytes)
      case Some("zstd") => zstd_compress(jsonBytes)
      case Some(other) => throw new IllegalArgumentException(s"unknown compression $other")
      case None => if (msgFormat == "cbor") to_cbor(col("value")) else jsonBytes
    }
    raw.select(
      get_json_object(col("value"), "$.block.header.height").cast(LongType).as("seq_id"),
      encoded.as("payload"),
      lit(msgFormat).as("msg_format"),
      lit(compression.getOrElse("none")).as("compression"))
  }

  /** wire envelopes -> raw JSON documents (`seq_id`, `value`) */
  def unwrap(env: DataFrame): DataFrame = {
    val decoded = when(col("compression") === "lz4", decode(lz4_decompress(col("payload")), "UTF-8"))
      .when(col("compression") === "zstd", decode(zstd_decompress(col("payload")), "UTF-8"))
      .when(col("msg_format") === "cbor", from_cbor(col("payload")))
      .otherwise(decode(col("payload"), "UTF-8"))
    env.select(col("seq_id"), decoded.as("value"))
  }
}
