package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Online quality-aware keeper election — the streaming form of the
  * batch dedup-cluster keeper vote (d09): as documents arrive, the
  * best-quality document per fingerprint survives and every decision is
  * emitted as an append-only log.
  *
  * Built on Spark 4's `transformWithState` (the arbitrary-state API that
  * supersedes `flatMapGroupsWithState`): typed per-key [[ValueState]]
  * holding the current keeper, optional state TTL for unbounded
  * fingerprint spaces. This is the op `DocIngest`'s
  * `dropDuplicatesWithinWatermark` gate cannot express: drop-dups keeps
  * the FIRST arrival per fingerprint, while training-data curation wants
  * the BEST one (reference analogue: the reference keeps the latest
  * re-serialization of a replayed block, borealis-indexer/src/main.rs
  * dedup window — "first wins" there is a protocol choice, not a data-
  * quality one).
  *
  * Decisions (per arriving doc):
  *  - "admit": first document seen for this fingerprint — current keeper;
  *  - "supersede": strictly better quality than the stored keeper — it
  *    becomes the keeper (downstream compacts by taking the LAST
  *    admit/supersede per fingerprint);
  *  - "drop": equal-or-worse than the stored keeper.
  * Ties break toward the incumbent (stable under replay).
  *
  * 100 TB design: state is one (doc_id, quality) pair per DISTINCT
  * fingerprint — the deduped cardinality, not the stream volume — hash-
  * partitioned across executors by the grouping key and stored in the
  * RocksDB state store (required by transformWithState; HDFS-backed
  * store does not support it). For fingerprint spaces that grow without
  * bound, pass a TTL: expired keepers simply re-admit on next sight,
  * trading cross-window dedup for bounded state — the same trade
  * `dropDuplicatesWithinWatermark` makes with its watermark.
  */
object KeeperGate {

  case class Doc(fp: String, doc_id: Long, quality: Double)
  case class Keeper(doc_id: Long, quality: Double)
  case class Decision(fp: String, doc_id: Long, quality: Double, decision: String)

  /** Per-fingerprint election. Within a micro-batch, rows are processed
    * in (quality desc, doc_id asc) order so output is deterministic
    * regardless of shuffle arrival order.
    */
  class Election(ttl: TTLConfig) extends StatefulProcessor[String, Doc, Decision] {
    @transient private var keeper: ValueState[Keeper] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Keeper]("keeper", Encoders.product[Keeper], ttl)

    override def handleInputRows(
        fp: String,
        rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Decision] = {
      val ordered = rows.toSeq.sortBy(d => (-d.quality, d.doc_id))
      val out = Seq.newBuilder[Decision]
      for (d <- ordered) {
        if (!keeper.exists()) {
          keeper.update(Keeper(d.doc_id, d.quality))
          out += Decision(fp, d.doc_id, d.quality, "admit")
        } else if (d.quality > keeper.get().quality) {
          keeper.update(Keeper(d.doc_id, d.quality))
          out += Decision(fp, d.doc_id, d.quality, "supersede")
        } else {
          out += Decision(fp, d.doc_id, d.quality, "drop")
        }
      }
      out.result().iterator
    }
  }

  /** Wire the election over a (streaming) typed Dataset. Requires the
    * RocksDB state store provider on the session (see
    * [[graft.SparkSessions]] — transformWithState rejects the default
    * HDFS-backed store).
    */
  def apply(
      spark: SparkSession,
      docs: Dataset[Doc],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Decision] = {
    import spark.implicits._
    docs
      .groupByKey(_.fp)
      .transformWithState(new Election(ttl), TimeMode.None(), OutputMode.Append())
  }
}
