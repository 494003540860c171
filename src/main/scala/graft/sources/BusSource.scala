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
    BusSource.validateClientOptions(k => Option(properties.get(k)).filter(_.nonEmpty))
    new BusTable(path, schema)
  }
}

object BusSource {
  val Schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  private def partDir(dir: String, p: Int) = new java.io.File(dir, s"p$p")

  /** The ACTIVE log segment of a partition and its base offset. A fresh
    * topic's segment is `log` (base 0); a retention fold replaces it
    * with `<base>.log` — Kafka's own segment-naming idea, which is what
    * makes truncation atomic AND offset-preserving: logical offset =
    * base + physical position, the swap is one rename, and a crash
    * between rename-new and delete-old leaves two segments of which the
    * larger base wins (the fold re-deletes stragglers).
    */
  private[sources] def activeSegment(dir: String, p: Int): (java.io.File, Long) = {
    val pd = partDir(dir, p)
    val segs = Option(pd.listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap { f =>
        f.getName match {
          case "log" => Some((f, 0L))
          case n if n.matches("\\d+\\.log") => Some((f, n.stripSuffix(".log").toLong))
          case _ => None
        }
      }
    if (segs.isEmpty) (new java.io.File(pd, "log"), 0L) else segs.maxBy(_._2)
  }

  /** producer/admin half (tests and probes): create a topic directory
    * with `partitions` empty per-partition logs
    */
  def createTopic(dir: String, partitions: Int): Unit =
    (0 until partitions).foreach { p =>
      val f = new java.io.File(partDir(dir, p), "log")
      f.getParentFile.mkdirs()
      f.createNewFile(): Unit
    }

  /** append newline-terminated records to one partition's log (the
    * publish op, main.rs:362-379; append-only like a JetStream file
    * store — records are immutable once their terminator is written)
    */
  def append(dir: String, partition: Int, lines: Seq[String]): Unit = {
    assertNoRetentionLease(dir)
    val out = new java.io.FileOutputStream(activeSegment(dir, partition)._1, true)
    try out.write(lines.map(_ + "\n").mkString.getBytes("UTF-8"))
    finally out.close()
  }

  /** append raw bytes WITHOUT a terminator — test hook for the
    * torn-write contract (a crashed producer's partial record)
    */
  def appendTorn(dir: String, partition: Int, bytes: Array[Byte]): Unit = {
    val out = new java.io.FileOutputStream(activeSegment(dir, partition)._1, true)
    try out.write(bytes)
    finally out.close()
  }

  def partitions(dir: String): Seq[Int] = {
    val subs = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    subs.filter(f => f.isDirectory && f.getName.matches("p\\d+"))
      .map(_.getName.drop(1).toInt).sorted.toSeq
  }

  /** per-partition EARLIEST retained offsets (the retention floor —
    * 0 until a fold has run)
    */
  def earliestOffsets(dir: String): Map[Int, Long] =
    partitions(dir).map(p => p -> activeSegment(dir, p)._2).toMap

  /** per-partition end offsets, advanced only to the last
    * newline-terminated record: scan backward from EOF in one bounded
    * tail read (partial trailing lines stay invisible)
    */
  def latestOffsets(dir: String): Map[Int, Long] =
    partitions(dir).map { p =>
      val (f, base) = activeSegment(dir, p)
      val len = f.length()
      p -> (base + (if (len == 0) 0L else lastTerminated(f, len)))
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

  // ---------------------------------------------------------------- retention

  private[sources] val RetentionLock = "_retention.lock"
  private val RetentionStaleMs = 15 * 60 * 1000L

  /** Publishers call this before appending: a retention fold in
    * progress owns the logs for its window (the LakeCompact
    * assertNoLease contract applied to the bus).
    */
  def assertNoRetentionLease(dir: String): Unit = {
    val lock = new java.io.File(dir, RetentionLock)
    if (lock.exists() &&
        System.currentTimeMillis() - lock.lastModified() < RetentionStaleMs)
      throw new IllegalStateException(
        s"graftbus: retention fold in progress on $dir (${lock.getPath} held) — " +
          "publish after the fold completes")
  }

  /** Bus log RETENTION fold — the JetStream file-store parity the
    * engine was missing (`RetentionPolicy::Limits` +
    * `DiscardPolicy::Old`, borealis-consumer/src/main.rs:574-582):
    * truncate each partition's log below the COMMITTED ack floor,
    * offsets preserved. Per partition the cut point is
    * `min(ackFloor, end - maxBytesRetained)` aligned DOWN to a record
    * boundary and never below the current floor; the retained tail is
    * copied to a new `<cut>.log` segment (torn trailing bytes
    * preserved) and swapped in by rename. Consumers notice nothing: a
    * mid-stream consumer's offsets are all >= the ack floor, and a
    * fresh `earliest` consumer starts at the retained floor. Reads
    * BELOW the floor are governed by `failOnDataLoss` (Kafka's option,
    * default true). Lease-guarded: one fold at a time, publishers are
    * fenced for the window. Size/floor-based; the age axis is covered
    * by [[retainAboveHeight]] (the wire carries no timestamps, but the
    * envelope's block height is the block bus's age).
    */
  def retain(
      dir: String,
      ackFloor: Map[Int, Long],
      maxBytesRetained: Long = 0L): Unit =
    withRetentionLease(dir) {
      for (p <- partitions(dir)) {
        val (seg, base) = activeSegment(dir, p)
        val len = seg.length()
        val end = base + (if (len == 0) 0L else lastTerminated(seg, len))
        val desired = math.max(base,
          math.min(ackFloor.getOrElse(p, base), end - math.max(0L, maxBytesRetained)))
        foldPartition(dir, p, seg, base, alignDownToRecordStart(seg, base, desired))
      }
    }

  /** HEIGHT-based retention — the honest image of JetStream's `MaxAge`
    * (`StreamConfig`, borealis-consumer/src/main.rs:574-582): the wire
    * carries no timestamps, but the envelope DOES carry the block
    * height (`seq_id`, [[graft.blocks.Envelope]]), and for the block
    * bus height IS the age axis. Drops every record below
    * `heightFloor`: the per-partition cut point is the first record
    * whose height reaches the floor (heights are published in block
    * order, so the log is non-decreasing in height; like Kafka /
    * JetStream age truncation this is PREFIX truncation — the scan
    * stops at the first qualifying record, and any out-of-order
    * straggler behind it survives). Unparseable records are treated as
    * AT the floor (conservative: retain, stop the scan). Faithful to
    * `DiscardPolicy::Old` semantics, MaxAge discards unconsumed
    * records too — there is deliberately no ack-floor input here; a
    * consumer whose committed offset falls below the new floor hits
    * the same `failOnDataLoss` gate as the size/floor fold. Offsets
    * are preserved (base-offset segment naming), and a fresh
    * `earliest` consumer starts at the height floor.
    */
  def retainAboveHeight(
      dir: String,
      heightFloor: Long,
      heightOf: String => Long = defaultHeightOf): Unit =
    withRetentionLease(dir) {
      for (p <- partitions(dir)) {
        val (seg, base) = activeSegment(dir, p)
        foldPartition(dir, p, seg, base,
          firstAtOrAboveHeight(seg, base, heightFloor, heightOf))
      }
    }

  /** COUNT-based retention — the third JetStream Limits axis
    * (`max_msgs` in `StreamConfig`, borealis-consumer/src/main.rs:574-582,
    * beside [[retain]]'s max_bytes and [[retainAboveHeight]]'s MaxAge
    * analog): keep at most `maxMessages` NEWEST complete records per
    * partition, offsets preserved by the same base-offset segment
    * naming. Faithful to `DiscardPolicy::Old`, count truncation
    * discards unconsumed records too — deliberately no ack-floor
    * input; a consumer whose committed offset falls below the new
    * floor hits the same `failOnDataLoss` gate as the other folds.
    * The un-terminated trailing bytes (an in-flight publish) are not
    * a record yet: they never count and always survive.
    */
  def retainMaxMessages(dir: String, maxMessages: Long): Unit = {
    require(maxMessages >= 0L, s"maxMessages must be >= 0: $maxMessages")
    withRetentionLease(dir) {
      for (p <- partitions(dir)) {
        val (seg, base) = activeSegment(dir, p)
        foldPartition(dir, p, seg, base, cutForMaxMessages(seg, base, maxMessages))
      }
    }
  }

  /** logical offset of the first record kept so that exactly the
    * newest `maxMessages` complete records survive: two sequential
    * passes (count, then walk to record index count - max) — no
    * offset table, so memory is O(1) at any log size
    */
  private def cutForMaxMessages(
      seg: java.io.File, base: Long, maxMessages: Long): Long = {
    if (!seg.exists()) return base
    // (complete records, byte offset just after `stop` newlines)
    def scan(stop: Long): (Long, Long) = {
      val in = new java.io.BufferedInputStream(new java.io.FileInputStream(seg), 1 << 16)
      try {
        var newlines = 0L
        var pos = 0L
        var stopOff = if (stop == 0L) 0L else -1L
        var b = in.read()
        while (b >= 0) {
          pos += 1
          if (b == '\n') {
            newlines += 1
            if (newlines == stop) stopOff = pos
          }
          b = in.read()
        }
        (newlines, stopOff)
      } finally in.close()
    }
    val (cnt, _) = scan(-1L)
    if (cnt <= maxMessages) base
    else base + scan(cnt - maxMessages)._2
  }

  private lazy val heightMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** envelope height of one wire record: `seq_id` (the published
    * envelope form), falling back to `$.block.header.height` (a raw
    * block document); anything unparseable reads as Long.MaxValue so
    * the height fold RETAINS it and stops
    */
  private[graft] def defaultHeightOf(record: String): Long =
    try {
      val node = heightMapper.readTree(record)
      val seq = node.path("seq_id")
      if (seq.isNumber) seq.asLong()
      else {
        val h = node.path("block").path("header").path("height")
        if (h.isNumber) h.asLong() else Long.MaxValue
      }
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }

  /** logical offset of the first complete record with height >= floor;
    * the un-terminated trailing bytes (a torn write) always survive
    */
  private def firstAtOrAboveHeight(
      seg: java.io.File, base: Long, floor: Long, heightOf: String => Long): Long = {
    if (!seg.exists()) return base
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(seg), 1 << 16)
    try {
      var recStart = 0L
      val line = new java.io.ByteArrayOutputStream()
      var b = in.read()
      while (b >= 0) {
        if (b == '\n') {
          if (heightOf(new String(line.toByteArray, "UTF-8")) >= floor)
            return base + recStart
          recStart += line.size() + 1
          line.reset()
        } else line.write(b)
        b = in.read()
      }
      base + recStart
    } finally in.close()
  }

  private def withRetentionLease(dir: String)(body: => Unit): Unit = {
    val lock = new java.io.File(dir, RetentionLock)
    if (lock.exists() &&
        System.currentTimeMillis() - lock.lastModified() < RetentionStaleMs)
      throw new IllegalStateException(s"graftbus: retention already in progress on $dir")
    lock.delete()
    require(lock.createNewFile(), s"graftbus: could not take retention lease on $dir")
    try body finally { lock.delete(): Unit }
  }

  /** truncate one partition's log below `cut`: copy the retained tail
    * to a `<cut>.log` segment (offset-preserving base-offset naming),
    * swap by rename, then delete stale segments — the max-base rule
    * already made the fresh one active, so a crash at any point leaves
    * a readable log
    */
  private def foldPartition(
      dir: String, p: Int, seg: java.io.File, base: Long, cut: Long): Unit =
    if (cut > base) {
      val pd = partDir(dir, p)
      // a fold that died mid-copy leaves a *.log.tmp: never visible to
      // readers (activeSegment matches only log/N.log) but the stale-
      // segment sweep below doesn't match it either, so clear crash
      // leftovers here or they leak forever
      Option(pd.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(_.getName.endsWith(".log.tmp")).foreach(_.delete())
      val tmp = new java.io.File(pd, s"$cut.log.tmp")
      copyRange(seg, cut - base, seg.length(), tmp)
      val fresh = new java.io.File(pd, s"$cut.log")
      require(tmp.renameTo(fresh), s"graftbus: segment swap failed for p$p")
      // stale segments (including a crash's leftovers) die last —
      // the max-base rule already made `fresh` the active one
      Option(pd.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName == "log" ||
          (f.getName.matches("\\d+\\.log") && f.getName.stripSuffix(".log").toLong < cut))
        .foreach(_.delete())
    }

  /** greatest record-start logical offset <= desired (a record start is
    * position 0 or any byte after a '\n')
    */
  private def alignDownToRecordStart(seg: java.io.File, base: Long, desired: Long): Long = {
    val phys = desired - base
    if (phys <= 0) return base
    val in = new java.io.RandomAccessFile(seg, "r")
    try {
      val chunk = 1 << 16
      var end = phys
      while (end > 0) {
        val start = math.max(0L, end - chunk)
        val buf = new Array[Byte]((end - start).toInt)
        in.seek(start)
        in.readFully(buf)
        var i = buf.length - 1
        while (i >= 0) {
          if (buf(i) == '\n') return base + start + i + 1
          i -= 1
        }
        end = start
      }
      base
    } finally in.close()
  }

  private def copyRange(src: java.io.File, from: Long, to: Long, dst: java.io.File): Unit = {
    val in = new java.io.RandomAccessFile(src, "r")
    val out = new java.io.FileOutputStream(dst)
    try {
      in.seek(from)
      val buf = new Array[Byte](1 << 20)
      var remaining = to - from
      while (remaining > 0) {
        val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
        if (n <= 0) remaining = 0
        else { out.write(buf, 0, n); remaining -= n }
      }
    } finally { in.close(); out.close() }
  }

  /** The consumer's COMMITTED ack floor read back from a streaming
    * checkpoint (the safe retention input): the offsets of the last
    * batch whose commit marker landed. Returns None before the first
    * commit. Spark's offset log layout: `offsets/<batchId>` holds
    * "v1", a metadata line, then one offset JSON per source —
    * graftbus is the only source in the queries this engine ships, so
    * the LAST line is the BusOffset JSON.
    */
  def committedOffsets(checkpointDir: String): Option[Map[Int, Long]] = {
    val commits = new java.io.File(checkpointDir, "commits")
    val ids = Option(commits.listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(f => f.getName.toLongOption)
    if (ids.isEmpty) return None
    val off = new java.io.File(checkpointDir, s"offsets/${ids.max}")
    if (!off.isFile) return None
    val lines = java.nio.file.Files.readAllLines(off.toPath).toArray(Array.empty[String])
    lines.reverse.find(l => l.trim.startsWith("{") && !l.contains("batchWatermarkMs"))
      .map(l => BusOffset.fromJson(l.trim).ends)
  }

  /** reference consumer client auth/TLS option matrix
    * (borealis-consumer/src/main.rs:421-536: creds file, TLS client
    * cert+key, root certs, user/password, token). The sandbox has no
    * network, so the TRANSPORT half is a no-op — but the validation
    * half is the client contract a deployment hits first, so malformed
    * combinations are rejected the way the reference's matrix rejects
    * them instead of being silently carried.
    */
  private[sources] def validateClientOptions(get: String => Option[String]): Unit = {
    val creds = get("credsfile")
    val user = get("username")
    val pass = get("password")
    val token = get("token")
    val cert = get("tlscert")
    val key = get("tlskey")
    val ca = get("tlscacert")
    val modes = Seq(creds.isDefined, user.isDefined || pass.isDefined, token.isDefined)
    require(modes.count(identity) <= 1,
      "graftbus: credsfile, username/password and token are mutually exclusive auth modes")
    require(user.isDefined == pass.isDefined,
      "graftbus: username and password must be set together")
    require(cert.isDefined == key.isDefined,
      "graftbus: tlscert and tlskey must be set together")
    for (p <- Seq(creds, cert, key, ca).flatten)
      require(new java.io.File(p).isFile, s"graftbus: client config file not found: $p")
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
  /** bulk-bootstrap shape: one batch over the full RETAINED range */
  override def toBatch: Batch = new Batch {
    private val ends = BusSource.latestOffsets(dir)
    override def planInputPartitions(): Array[InputPartition] =
      ends.toArray.sortBy(_._1).map { case (p, end) =>
        val (seg, base) = BusSource.activeSegment(dir, p)
        BusRange(seg.getAbsolutePath, p, base, end, base)
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

  /** `startingOffsets`, Kafka-conformant: `earliest` | `latest` | a
    * per-partition JSON object `{"0": 123, "1": -1, "2": -2}` with
    * Kafka's sentinels (-1 latest, -2 earliest; unmentioned partitions
    * default to earliest). The flat form — graftbus topics are single
    * directories, so there is no topic-name nesting level.
    */
  private val startSpec: Either[Boolean, Map[Int, Long]] = {
    val raw = options.getOrDefault("startingoffsets", "earliest").trim
    if (raw.startsWith("{")) {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(raw)
      import scala.jdk.CollectionConverters._
      Right(node.properties().asScala.map { e =>
        require(e.getKey.forall(_.isDigit),
          s"graftbus: startingOffsets JSON keys must be partition ids, got '${e.getKey}'")
        e.getKey.toInt -> e.getValue.asLong()
      }.toMap)
    } else raw.toLowerCase match {
      case "latest" => Left(true)
      case "earliest" => Left(false)
      case other => throw new IllegalArgumentException(
        s"graftbus: startingOffsets must be earliest, latest or a per-partition " +
          s"JSON object, got '$other'")
    }
  }
  private val maxBytes = Option(options.get("maxbytespertrigger")).map(_.toLong)
  /** Kafka's `failOnDataLoss` (default true): a committed offset that
    * now lies BELOW the retention floor means records were folded away
    * before this consumer read them — fail loudly unless the operator
    * opted into skipping (`false` clamps to the floor with a warning).
    */
  private val failOnDataLoss =
    options.getOrDefault("failondataloss", "true").toBoolean

  /** Trigger.AvailableNow contract: snapshot the log tails once at
    * query start; every batch's admission then caps at the snapshot, so
    * the query drains exactly the pre-subscription backlog (in
    * limit-sized batches) and terminates even while producers keep
    * appending — the WaitForFullSync gate (S4).
    */
  @volatile private var availableNowCap: Option[Map[Int, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(BusSource.latestOffsets(dir))

  override def initialOffset(): Offset = startSpec match {
    case Left(true) => BusOffset(BusSource.latestOffsets(dir))
    // earliest = the RETENTION FLOOR, not 0: a fresh consumer on a
    // folded topic starts at the first retained record
    case Left(false) => BusOffset(BusSource.earliestOffsets(dir))
    case Right(explicit) =>
      val latest = BusSource.latestOffsets(dir)
      val earliest = BusSource.earliestOffsets(dir)
      BusOffset(BusSource.partitions(dir).map { p =>
        p -> (explicit.get(p) match {
          case Some(-1L) => latest(p)
          case Some(-2L) | None => earliest(p)
          case Some(o) =>
            require(o >= 0, s"graftbus: startingOffsets for partition $p is $o " +
              "(only -1 latest / -2 earliest are negative sentinels)")
            o
        })
      }.toMap)
  }

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
            else {
              val (seg, base) = BusSource.activeSegment(dir, p)
              alignToNewline(seg, base, s, hardEnd)
            }
          p -> end
        }.toMap)
      case _ => BusOffset(latest)
    }
  }

  /** offsets logical; the scan window is physical within `f` */
  private def alignToNewline(f: java.io.File, base: Long, start: Long, cap: Long): Long = {
    if (cap <= start) return start
    val in = new java.io.RandomAccessFile(f, "r")
    try {
      val buf = new Array[Byte]((cap - start).toInt)
      in.seek(math.max(0L, start - base))
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
      val (seg, base) = BusSource.activeSegment(dir, p)
      val committed = s.getOrElse(p, base)
      // a committed offset below the retention floor = records folded
      // away before this consumer read them (Kafka's data-loss case)
      val startOff =
        if (committed >= base) committed
        else if (failOnDataLoss)
          throw new IllegalStateException(
            s"graftbus: partition $p offset $committed is below the retention floor " +
              s"$base — records were lost to a retention fold. Set " +
              "failOnDataLoss=false to resume from the floor instead.")
        else {
          System.err.println(s"[graftbus] WARN partition $p offset $committed below " +
            s"retention floor $base — skipping to the floor (failOnDataLoss=false)")
          base
        }
      if (endOff > startOff)
        Some(BusRange(seg.getAbsolutePath, p, startOff, endOff, base))
      else None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = BusReaderFactory
  override def deserializeOffset(json: String): Offset = BusOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // ack ≡ checkpoint commit
  override def stop(): Unit = ()
}

/** one bus partition's byte range for one batch. Offsets are LOGICAL
  * (monotonic across retention folds); `base` is the segment's base
  * offset, so physical position = logical - base.
  */
private[sources] case class BusRange(
    path: String, partition: Int, start: Long, end: Long, base: Long = 0L)
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
      in.seek(r.start - r.base)
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
    BusSource.assertNoRetentionLease(dir)
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
      val out = new java.io.FileOutputStream(BusSource.activeSegment(dir, p)._1, true)
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
