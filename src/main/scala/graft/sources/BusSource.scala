package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.catalog.SupportsWrite
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graftbus` — a DataSourceV2 micro-batch streaming source over a
  * file-backed, partitioned, append-only message log: the sandbox
  * image of the reference's JetStream subject (file-backed stream,
  * durable consumer, replay-from-start, explicit ack —
  * borealis-consumer/src/main.rs:574-592,640-669). No broker runs in
  * this sandbox, so the BROKER is modeled (a directory of per-partition
  * append-only logs on any shared filesystem) while the CLIENT half —
  * the part a Spark engine actually owns — is fully real:
  *
  *  - **offset control (S3/S13)**: offsets are per-partition byte
  *    positions, serialized into the checkpoint as JSON; a restarted
  *    query resumes from the committed offset exactly like a durable
  *    JetStream consumer resumes from its ack floor. `startingoffsets`
  *    earliest|latest ≡ `DeliverPolicy::All` | `::New`.
  *  - **admission control (S4)**: `maxbytespertrigger` caps each
  *    micro-batch (Spark's `ReadMaxBytes` limit), so a backfill drains
  *    the log in bounded batches before tailing — the
  *    `StreamWhileSyncing` gate without a hand-rolled actor.
  *  - **partitioned parallel read (S16)**: one `InputPartition` per bus
  *    partition per batch; readers are executor-side and independent.
  *  - **torn-write safety**: producers may crash mid-line; consumers
  *    only ever advance to the last newline-terminated record, so a
  *    partial trailing line is invisible until its terminator lands
  *    (the file-source analog of a partially-published message never
  *    being delivered).
  *
  * Schema is Kafka-shaped — `partition INT, offset BIGINT, value
  * STRING` — so `selectExpr("value")` slots into the source-agnostic
  * [[graft.streaming.BlockIngest.startFrom]] unchanged, which is the
  * point: swapping file-drop ingest for bus ingest touches ONE line of
  * caller code, same as swapping in `format("kafka")` on a cluster
  * with a real broker.
  *
  * Scale notes: the log directory must live on a filesystem all
  * executors see (the same contract JetStream's file store has for its
  * server). Offsets are byte positions, so `latestOffsets` stats the
  * file and only scans backward from EOF for the torn-tail probe —
  * O(tail), not O(log). Batch reads (`spark.read.format("graftbus")`)
  * plan the full range once for bulk bootstrap (S22 shape).
  */
class BusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftbus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BusSource.Schema
  // write-side schemas are caller-shaped (`value` + optional
  // `partition`), so the provider must accept an external schema; reads
  // ignore it (BusScan always produces the canonical read schema)
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graftbus requires .option(\"path\", <topic dir>)")
    new BusTable(path, schema)
  }
}

object BusSource {
  val Schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  private def logFile(dir: String, p: Int) = new java.io.File(dir, s"p$p/log")

  /** producer/admin half (tests and probes): create a topic directory
    * with `partitions` empty per-partition logs
    */
  def createTopic(dir: String, partitions: Int): Unit =
    (0 until partitions).foreach { p =>
      val f = logFile(dir, p)
      f.getParentFile.mkdirs()
      f.createNewFile(): Unit
    }

  /** append newline-terminated records to one partition's log (the
    * publish op, main.rs:362-379; append-only like a JetStream file
    * store — records are immutable once their terminator is written)
    */
  def append(dir: String, partition: Int, lines: Seq[String]): Unit = {
    val out = new java.io.FileOutputStream(logFile(dir, partition), true)
    try out.write(lines.map(_ + "\n").mkString.getBytes("UTF-8"))
    finally out.close()
  }

  /** append raw bytes WITHOUT a terminator — test hook for the
    * torn-write contract (a crashed producer's partial record)
    */
  def appendTorn(dir: String, partition: Int, bytes: Array[Byte]): Unit = {
    val out = new java.io.FileOutputStream(logFile(dir, partition), true)
    try out.write(bytes)
    finally out.close()
  }

  def partitions(dir: String): Seq[Int] = {
    val subs = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    subs.filter(f => f.isDirectory && f.getName.matches("p\\d+"))
      .map(_.getName.drop(1).toInt).sorted.toSeq
  }

  /** per-partition end offsets, advanced only to the last
    * newline-terminated record: scan backward from EOF in one bounded
    * tail read (partial trailing lines stay invisible)
    */
  def latestOffsets(dir: String): Map[Int, Long] =
    partitions(dir).map { p =>
      val f = logFile(dir, p)
      val len = f.length()
      p -> (if (len == 0) 0L else lastTerminated(f, len))
    }.toMap

  private def lastTerminated(f: java.io.File, len: Long): Long = {
    val in = new java.io.RandomAccessFile(f, "r")
    try {
      val chunk = 1 << 16
      var end = len
      while (end > 0) {
        val start = math.max(0L, end - chunk)
        val buf = new Array[Byte]((end - start).toInt)
        in.seek(start)
        in.readFully(buf)
        var i = buf.length - 1
        while (i >= 0) {
          if (buf(i) == '\n') return start + i + 1
          i -= 1
        }
        end = start
      }
      0L
    } finally in.close()
  }
}

private[sources] class BusTable(dir: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftbus:$dir"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BusScan(dir, options)
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new BusWrite(dir, info.schema())
    }
}

private[sources] class BusScan(dir: String, options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = BusSource.Schema
  override def description(): String = s"graftbus $dir"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BusMicroBatchStream(dir, options)
  /** bulk-bootstrap shape: one batch over the full terminated range */
  override def toBatch: Batch = new Batch {
    private val ends = BusSource.latestOffsets(dir)
    override def planInputPartitions(): Array[InputPartition] =
      ends.toArray.sortBy(_._1).map { case (p, end) =>
        BusRange(new java.io.File(dir, s"p$p/log").getAbsolutePath, p, 0L, end)
      }
    override def createReaderFactory(): PartitionReaderFactory = BusReaderFactory
  }
}

/** checkpoint-serializable offset: per-partition byte positions (the
  * consumer's ack floor)
  */
private[sources] case class BusOffset(ends: Map[Int, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private[sources] object BusOffset {
  def fromJson(json: String): BusOffset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    import scala.jdk.CollectionConverters._
    BusOffset(node.properties().asScala.map(e => e.getKey.toInt -> e.getValue.asLong()).toMap)
  }
}

private[sources] class BusMicroBatchStream(dir: String, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val startLatest =
    options.getOrDefault("startingoffsets", "earliest").toLowerCase == "latest"
  private val maxBytes = Option(options.get("maxbytespertrigger")).map(_.toLong)

  /** Trigger.AvailableNow contract: snapshot the log tails once at
    * query start; every batch's admission then caps at the snapshot, so
    * the query drains exactly the pre-subscription backlog (in
    * limit-sized batches) and terminates even while producers keep
    * appending — the WaitForFullSync gate (S4).
    */
  @volatile private var availableNowCap: Option[Map[Int, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(BusSource.latestOffsets(dir))

  override def initialOffset(): Offset =
    if (startLatest) BusOffset(BusSource.latestOffsets(dir))
    else BusOffset(BusSource.partitions(dir).map(_ -> 0L).toMap)

  override def getDefaultReadLimit: ReadLimit =
    maxBytes.map(ReadLimit.maxBytes).getOrElse(ReadLimit.allAvailable())

  /** cap the batch at the limit, advancing partitions round-robin-fairly
    * (each gets an equal share of the byte budget, aligned DOWN to its
    * last record terminator inside the share so no record is split)
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[BusOffset].ends
    val live = BusSource.latestOffsets(dir)
    // under AvailableNow, never admit past the start-of-query snapshot
    val latest = availableNowCap match {
      case Some(cap) => live.map { case (p, e) => p -> math.min(e, cap.getOrElse(p, 0L)) }
      case None => live
    }
    limit match {
      case mb: ReadMaxBytes =>
        val parts = latest.keys.toSeq.sorted
        val share = math.max(1L, mb.maxBytes / math.max(1, parts.size))
        BusOffset(parts.map { p =>
          val s = from.getOrElse(p, 0L)
          val hardEnd = math.min(latest(p), s + share)
          // align the capped end to a record boundary by scanning the
          // [s, hardEnd] window's tail; full-range ends are already aligned
          val end =
            if (hardEnd == latest(p)) hardEnd
            else alignToNewline(new java.io.File(dir, s"p$p/log"), s, hardEnd)
          p -> end
        }.toMap)
      case _ => BusOffset(latest)
    }
  }

  private def alignToNewline(f: java.io.File, start: Long, cap: Long): Long = {
    if (cap <= start) return start
    val in = new java.io.RandomAccessFile(f, "r")
    try {
      val buf = new Array[Byte]((cap - start).toInt)
      in.seek(start)
      in.readFully(buf)
      var i = buf.length - 1
      while (i >= 0) {
        if (buf(i) == '\n') return start + i + 1
        i -= 1
      }
      start // no complete record fits the budget: hold position
    } finally in.close()
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].ends
    val e = end.asInstanceOf[BusOffset].ends
    e.toArray.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s.getOrElse(p, 0L)
      if (endOff > startOff)
        Some(BusRange(new java.io.File(dir, s"p$p/log").getAbsolutePath, p, startOff, endOff))
      else None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = BusReaderFactory
  override def deserializeOffset(json: String): Offset = BusOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // ack ≡ checkpoint commit
  override def stop(): Unit = ()
}

/** one bus partition's byte range for one batch */
private[sources] case class BusRange(path: String, partition: Int, start: Long, end: Long)
    extends InputPartition

private[sources] object BusReaderFactory extends PartitionReaderFactory {
  /** buffered chunk size: bounds reader memory regardless of how large
    * an uncapped (allAvailable) range is, while keeping syscalls at
    * one per megabyte instead of one per byte
    */
  private val ChunkSize = 1 << 20

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[BusRange]
    new PartitionReader[InternalRow] {
      private val in = new java.io.RandomAccessFile(r.path, "r")
      in.seek(r.start)
      private var pos = r.start // logical range cursor
      private val buf = new Array[Byte](ChunkSize)
      private var bufLen = 0
      private var bufOff = 0
      private var row: InternalRow = _
      private val line = new java.io.ByteArrayOutputStream(256)

      private def refill(): Boolean = {
        val want = math.min(ChunkSize.toLong, r.end - pos - (bufLen - bufOff)).toInt
        if (want <= 0) return bufOff < bufLen
        // preserve any un-consumed tail (a record spanning chunks)
        if (bufOff > 0 && bufOff < bufLen)
          System.arraycopy(buf, bufOff, buf, 0, bufLen - bufOff)
        bufLen -= bufOff
        bufOff = 0
        val n = in.read(buf, bufLen, math.min(want, ChunkSize - bufLen))
        if (n > 0) bufLen += n
        bufOff < bufLen
      }

      override def next(): Boolean = {
        if (pos >= r.end) return false
        val recordStart = pos
        line.reset()
        var done = false
        while (!done) {
          if (bufOff >= bufLen && !refill()) done = true // defensive: range should end on '\n'
          else {
            val b = buf(bufOff)
            bufOff += 1
            pos += 1
            if (b == '\n') done = true else line.write(b.toInt)
          }
        }
        row = new GenericInternalRow(Array[Any](
          r.partition, recordStart, UTF8String.fromBytes(line.toByteArray)))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}

/** The PUBLISH half of the bus (reference S9, at-least-once publish —
  * borealis-indexer/src/main.rs:362-379): `df.write`/`writeStream
  * .format("graftbus")` appends rows to the topic's per-partition logs
  * with a two-phase, epoch-idempotent commit:
  *
  *  1. executors buffer rows per bus partition and write each buffer to
  *     a private `pending/` file (attempt-unique name — a zombie task
  *     attempt can never interleave bytes with the winner);
  *  2. the DRIVER's commit appends the winning attempts' pending files
  *     to the logs in (taskId, partition) order and then records the
  *     epoch in a `commits` ledger. A replayed epoch (restart from
  *     checkpoint re-delivers the last unacknowledged batch) finds its
  *     ledger entry and skips the append — the FileStreamSink manifest
  *     idea applied to an append-only log, upgrading Spark's
  *     at-least-once redelivery to exactly-once publish for every
  *     epoch whose ledger line landed. The unclosable window is a
  *     driver crash BETWEEN log append and ledger append (duplicates
  *     on replay): that residue is at-least-once, matching the
  *     reference's own publish contract.
  *
  * Rows route by an explicit `partition` column when the input carries
  * one, else by a stable hash of `value` — pure functions of the row,
  * so a replayed epoch rebuilds byte-identical pending files. Torn-
  * write safety is preserved: log appends are whole newline-terminated
  * blocks, so a crash mid-append leaves only an unterminated tail that
  * readers already ignore.
  */
private[sources] class BusWrite(dir: String, schema: StructType) extends Write {
  require(schema.fieldNames.contains("value") && schema("value").dataType == StringType,
    s"graftbus sink needs a STRING `value` column (got ${schema.simpleString})")
  private val valueIdx = schema.fieldIndex("value")
  private val partIdx = if (schema.fieldNames.contains("partition")) schema.fieldIndex("partition") else -1
  private def nParts: Int = {
    val n = BusSource.partitions(dir).size
    require(n > 0, s"graftbus sink: $dir has no partitions — BusSource.createTopic first")
    n
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val parts = nParts
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      BusWriterFactory(dir, parts, valueIdx, partIdx)
    // batch publish runs the append arm unconditionally: Spark calls
    // commit exactly once per batch write job
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      BusWrite.appendAll(dir, messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      BusWrite.deletePending(messages)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    private val parts = nParts
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      BusWriterFactory(dir, parts, valueIdx, partIdx)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val ledger = new java.io.File(dir, "commits")
      val committed = if (!ledger.exists()) Set.empty[String]
        else scala.io.Source.fromFile(ledger, "UTF-8").getLines().toSet
      if (committed.contains(epochId.toString)) BusWrite.deletePending(messages)
      else {
        BusWrite.appendAll(dir, messages)
        val out = new java.io.FileOutputStream(ledger, true)
        try out.write(s"$epochId\n".getBytes("UTF-8")) finally out.close()
      }
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      BusWrite.deletePending(messages)
  }
}

/** executor-shipped writer factory — a flat value type so neither the
  * Write nor its anonymous Batch/StreamingWrite shells ride along in
  * the task closure (they are driver-side and not serializable)
  */
private[sources] case class BusWriterFactory(
    dir: String, nParts: Int, valueIdx: Int, partIdx: Int)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new BusDataWriter(dir, nParts, valueIdx, partIdx, s"b-$partitionId-$taskId")
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new BusDataWriter(dir, nParts, valueIdx, partIdx, s"e$epochId-$partitionId-$taskId")
}

/** pending-file manifest one task hands the driver: (busPartition, path)
  * pairs, ordered so the driver's append order is deterministic
  */
private[sources] case class BusPendingMsg(taskId: Long, files: Seq[(Int, String)])
    extends WriterCommitMessage

private[sources] object BusWrite {
  def appendAll(dir: String, messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: BusPendingMsg => m }.sortBy(_.taskId)
    for (m <- msgs; (p, path) <- m.files) {
      val src = new java.io.File(path)
      // a pending file enumerated in a commit message that is GONE means
      // records were lost between task commit and epoch commit (cleaned
      // tmp, or an executor-local path the driver can't see — the
      // pending-file handoff requires a filesystem shared between tasks
      // and driver, which local mode guarantees). Silently skipping it
      // would break the sink's exactly-once-per-ledgered-epoch claim at
      // publish, so fail the commit loudly: the epoch stays unledgered
      // and the retry re-produces the pending files.
      if (!src.exists())
        throw new java.io.IOException(
          s"graftbus publish: pending file $path (partition $p, task ${m.taskId}) " +
            "is missing at epoch commit — refusing to commit a partial epoch. " +
            "The pending-file handoff requires a driver-visible shared filesystem.")
      val bytes = java.nio.file.Files.readAllBytes(src.toPath)
      val out = new java.io.FileOutputStream(new java.io.File(dir, s"p$p/log"), true)
      try out.write(bytes) finally out.close()
    }
    deletePending(messages)
  }

  def deletePending(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: BusPendingMsg => m }
      .foreach(_.files.foreach { case (_, path) => new java.io.File(path).delete(): Unit })
}

/** buffers rows per bus partition; task commit flushes each non-empty
  * buffer to one attempt-unique pending file (never the log itself —
  * only the driver's epoch commit touches the logs)
  */
private[sources] class BusDataWriter(
    dir: String, nParts: Int, valueIdx: Int, partIdx: Int, tag: String)
    extends DataWriter[InternalRow] {
  private val bufs = Array.fill(nParts)(new java.io.ByteArrayOutputStream())

  override def write(row: InternalRow): Unit = {
    val value = row.getUTF8String(valueIdx)
    val p =
      if (partIdx >= 0 && !row.isNullAt(partIdx)) Math.floorMod(row.getInt(partIdx), nParts)
      else Math.floorMod(value.hashCode, nParts)
    val b = bufs(p)
    b.write(value.getBytes)
    b.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    val taskId = tag.split("-").last.toLong
    val files = for (p <- 0 until nParts if bufs(p).size() > 0) yield {
      val pending = new java.io.File(dir, s"p$p/pending")
      pending.mkdirs()
      val f = new java.io.File(pending, s"$tag-a${java.util.UUID.randomUUID().toString.take(8)}")
      val out = new java.io.FileOutputStream(f)
      try out.write(bufs(p).toByteArray) finally out.close()
      p -> f.getAbsolutePath
    }
    BusPendingMsg(taskId, files)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
