package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared lake-maintenance protocol: fold a streaming sink's
  * accumulated `batch=*` generations (one per micro-batch — the
  * idempotent-replay unit) into a single compacted generation, with
  * crash recovery and no table format.
  *
  * The staged-swap protocol:
  *  1. the compacted copy lands in a dot-prefixed staging dir
  *     (invisible to Spark readers);
  *  2. an `_inputs.manifest` (one input batch dir name per line,
  *     underscore-prefixed so readers skip it) is written LAST into
  *     the staging dir — it is the commit gate;
  *  3. the staging dir is renamed to its visible `batch=` name, THEN
  *     the manifest's input dirs are deleted, then the manifest.
  *
  * A crash at any point is repaired by the recovery pass at the next
  * call: staging without a manifest is an incomplete write and is
  * discarded; staging with one is renamed in and its inputs removed; a
  * visible batch dir still carrying a manifest (crash mid-delete) has
  * its remaining inputs and the manifest removed. Without the staging
  * dir, a crash mid-write would leave a PARTIAL visible generation
  * that re-compaction would bake in as real rows. Readers racing a
  * healthy swap see duplicates at worst for the rename window, never
  * loss.
  *
  * The quiesce contract is MECHANICAL, not advisory: `foldGenerations`
  * holds an exclusive `_maintenance.lock` lease for its duration
  * ([[withLease]]), and every batch-scoped sink (BlockIngest, DocIngest,
  * NearDupGate) calls [[assertNoLease]] before writing a generation —
  * an append racing a compaction fails loudly and is replayed by the
  * stream after the window, never silently lost to the input deletes.
  */
object LakeCompact {
  private val Manifest = "_inputs.manifest"

  /** Maintenance lease file name — underscore-prefixed so parquet
    * readers skip it like the manifest.
    */
  val LockName = "_maintenance.lock"

  /** A lock older than this is a crashed compactor's leftover and may
    * be broken by the next acquirer. Compactions are single Spark jobs
    * far shorter than this; if yours are not, raise `staleMs`.
    */
  val DefaultStaleMs: Long = 15 * 60 * 1000L

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Is a live maintenance lease held on `root`? (Stale locks from a
    * crashed compactor don't count.)
    */
  def leaseHeld(spark: SparkSession, root: String,
      staleMs: Long = DefaultStaleMs): Boolean = {
    val (fs, p) = fsOf(spark, root)
    val lock = new org.apache.hadoop.fs.Path(p, LockName)
    try fs.exists(lock) &&
      System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime <= staleMs
    catch { case _: java.io.FileNotFoundException => false } // lost a race with release
  }

  /** Sink-side half of the quiesce contract: every batch-scoped sink
    * calls this before writing a generation, so an append racing a
    * compaction fails LOUDLY (the stream errors and replays after the
    * maintenance window) instead of silently losing rows to the
    * compactor's input deletes.
    */
  def assertNoLease(spark: SparkSession, root: String,
      staleMs: Long = DefaultStaleMs): Unit =
    if (leaseHeld(spark, root, staleMs))
      throw new IllegalStateException(
        s"maintenance lease held on $root ($LockName): compaction in " +
          "progress — the sink refuses to append until it completes")

  /** Compactor-side half: exclusive create-fail-if-exists lock held for
    * the duration of `body`, released in finally. A second compactor
    * (or any `withLease` user) fails loudly; a crashed holder's lock is
    * broken once it is `staleMs` old.
    *
    * FS contract: create-fail-if-exists is atomic on HDFS-like
    * filesystems (and local fs). Plain S3 gives no such primitive —
    * there, run compaction from a single maintenance scheduler (the
    * usual arrangement) or put the lock on a consistent store; the
    * sink-side check still works unchanged since it only reads.
    *
    * The lease closes the operational race the staged-swap protocol
    * documents (appends racing the compactor's input deletes): sinks
    * check the lease before writing, the compactor takes it before
    * listing. A sink write already in flight when the lease is taken
    * still commits safely — it either lands as the NEWEST generation
    * (never folded, see foldGenerations) or rewrites a batch dir the
    * recovery pass treats as input only if listed in the manifest,
    * which was written after the lease was held.
    */
  /** serializes the break+create+verify acquisition sequence per lock
    * path WITHIN this JVM — the realistic concurrent-compactor case is
    * several streams in one Spark driver racing `compact` on shared
    * roots, and no filesystem rename protocol alone can stop a breaker
    * that observed "stale" from renaming away a lock a faster breaker
    * just re-created (measured: 4 same-JVM racers double-acquire).
    * Cross-process, the token-identity check below narrows the window
    * to a multi-process interleaving inside one acquisition's
    * milliseconds AFTER a genuine 15-minute stale event; stores without
    * atomic create should run compaction from a single scheduler (see
    * the FS contract note).
    */
  private val acquireGuards =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** test seam: runs between the breaker's staleness verdict and its
    * observed-token read — the exact window where a cross-process
    * breaker can replace the stale lock with a LIVE one, making a
    * token-only verify bless deleting the live holder's lease
    * (CompactionSpec's mid-break adversarial case). No-op in
    * production; always reset in a finally by the test.
    */
  private[graft] var breakRaceHook: () => Unit = () => ()

  /** object-store schemes whose "rename" is copy+delete and does NOT
    * preserve mtime — the grave-verify mtime comparison is meaningless
    * there (see the break path in [[withLease]])
    */
  private val CopyRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss", "cos", "swift")

  private[graft] def renamePreservesMtime(fs: org.apache.hadoop.fs.FileSystem): Boolean = {
    val scheme =
      try fs.getScheme
      catch { case _: UnsupportedOperationException => fs.getUri.getScheme }
    !CopyRenameSchemes.contains(Option(scheme).getOrElse("").toLowerCase)
  }

  def withLease[T](spark: SparkSession, root: String,
      staleMs: Long = DefaultStaleMs)(body: => T): T = {
    val (fs, p) = fsOf(spark, root)
    val lock = new org.apache.hadoop.fs.Path(p, LockName)
    val token = java.util.UUID.randomUUID().toString
    def held(): Nothing =
      throw new IllegalStateException(
        s"maintenance lease on $root already held ($LockName exists); " +
          "another compaction is running (or break a stale lock after " +
          s"$staleMs ms)")
    def readToken(path: org.apache.hadoop.fs.Path): String =
      try {
        val in = fs.open(path)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      } catch { case _: java.io.IOException => "" }
    val guard = acquireGuards.computeIfAbsent(
      fs.makeQualified(lock).toString, _ => new Object)
    guard.synchronized {
      // break a stale lock by ATOMIC RENAME to a breaker-unique grave,
      // not delete+create: of N cross-process breakers racing the same
      // stale lock exactly one rename wins, so a second breaker can
      // never delete the lock the first breaker just re-created (the
      // delete+create race would hand the lease to two compactors)
      val staleStatus =
        try Option(fs.getFileStatus(lock))
          .filter(s => System.currentTimeMillis() - s.getModificationTime > staleMs)
        catch { case _: java.io.FileNotFoundException => None }
      for (stale <- staleStatus) {
        // identity of the stale incarnation we intend to break is the
        // (token, mtime) PAIR from the same status the staleness verdict
        // used. The token alone is not enough: if a cross-process
        // breaker broke this lock and re-created a fresh one between
        // our staleness check and this read, `observed` would be the
        // LIVE holder's token and a token-only verify would bless
        // deleting it. The fresh lock's mtime can never equal the
        // stale one's (it is staleMs+ newer), so the pair is decisive.
        val observedMtime = stale.getModificationTime
        breakRaceHook()
        val observed = readToken(lock)
        val grave = new org.apache.hadoop.fs.Path(p, s"$LockName.broken-$token")
        try if (fs.rename(lock, grave)) {
          // verify we renamed the incarnation we OBSERVED stale, not a
          // fresh lock a cross-process breaker re-created between our
          // read and the rename: on mismatch, put it back (or, losing
          // the put-back to a third acquirer, drop it — that evicted
          // holder aborts at its own create-then-verify) and report
          // held. The mtime half of the pair is only decisive where
          // rename PRESERVES mtime (HDFS-like stores); on copy-based-
          // rename object stores the grave's mtime is the rename time
          // and could never match, which would make every stale lock
          // unbreakable (put-back forever) — there the verify degrades
          // to token-only, whose residual race window is the UUID
          // collision of a breaker re-creating the SAME token
          // (impossible) rather than the swap race, and the
          // create-then-verify step below still prevents a double hold.
          val graveMtime =
            try Some(fs.getFileStatus(grave).getModificationTime)
            catch { case _: java.io.FileNotFoundException => None }
          val mtimeOk =
            if (renamePreservesMtime(fs)) graveMtime.contains(observedMtime)
            else true
          if (readToken(grave) == observed && mtimeOk)
            fs.delete(grave, false): Unit
          else {
            if (!fs.rename(grave, lock)) fs.delete(grave, false): Unit
            held()
          }
        }
        catch { case _: java.io.IOException => () } // lost the break race
      }
      val out =
        try fs.create(lock, false)
        catch {
          // only already-exists means "held"; disk-full/permissions/
          // transient FS errors must surface as themselves, not send the
          // operator hunting for a phantom concurrent compactor (note
          // "already exists", not bare "exist" — messages like "parent
          // directory does not exist" are real FS errors)
          case e: java.io.IOException
              if e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
                e.isInstanceOf[java.nio.file.FileAlreadyExistsException] ||
                Option(e.getMessage).exists(_.toLowerCase.contains("already exists")) =>
            held()
        }
      try out.write(s"$token\n".getBytes("UTF-8"))
      finally out.close()
      // create-then-verify: on stores whose create-fail-if-exists is not
      // truly atomic (raw local fs checks then creates), two acquirers
      // can both think they won. Read the lock back; proceed only if it
      // holds OUR token. Worst case both lose and throw — the lock goes
      // stale and is broken at the next attempt; never held twice.
      if (readToken(lock) != token) held()
    }
    // heartbeat: a fold that outlives staleMs must not start LOOKING
    // stale — sinks would resume appending and a second compactor would
    // break the live lock. A daemon thread refreshes the mtime at a
    // third of the staleness horizon for as long as the body runs.
    val beat = new Thread(() => {
      var beating = true
      while (beating && !Thread.interrupted()) {
        try {
          Thread.sleep(math.max(1000L, staleMs / 3))
          fs.setTimes(lock, System.currentTimeMillis(), -1)
        } catch {
          case _: InterruptedException => beating = false
          // a TRANSIENT refresh failure must not kill the heartbeat: a
          // long fold would then drift past staleMs, look stale, and
          // sinks/second compactors would break the LIVE lease
          case _: java.io.IOException => ()
        }
      }
    }, s"graft-lease-heartbeat-$root")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      beat.interrupt()
      // release only OUR lease: if a (genuinely stale) lock was broken
      // and re-acquired by someone else mid-body, deleting theirs would
      // reopen the window they think is closed
      try {
        val in = fs.open(lock)
        val owner =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        if (owner == token) fs.delete(lock, false): Unit
        else System.err.println(
          s"[lease] $root lock now owned by another holder; leaving it")
      } catch { case _: java.io.IOException => () } // lock already gone
    }
  }

  /** Acquire leases on SEVERAL roots for one maintenance window (roots
    * are acquired in sorted order; all released in reverse). Use when a
    * maintenance operation spans multiple lakes a sink checks together
    * — per-root sequential leases would leave gaps a racing micro-batch
    * could start inside (see [[graft.streaming.NearDupGate.compact]]).
    */
  def withLeases[T](spark: SparkSession, roots: Seq[String],
      staleMs: Long = DefaultStaleMs)(body: => T): T =
    roots.sorted.foldRight(() => body) { (root, inner) =>
      () => withLease(spark, root, staleMs)(inner())
    }()

  /** Fold `root`'s batch=* generations into one, re-partitioned inside
    * the compacted generation by `partitionCols` (e.g. lang for the
    * doc lake, block_date for blocks).
    *
    * `liveTag`: the auto-fold path (a sink folding from inside its own
    * micro-batch) passes the batch tag it just wrote so the live
    * generation is excluded BY NAME — exact on every store. Without
    * it the newest-by-mtime generation is excluded, which is only
    * decisive where the store reports real directory mtimes (see
    * [[GateIndex.foldIntoBase]] — on mtime-less prefix listings the
    * fallback degrades to lexicographic order, where `batch=tok-10`
    * sorts before `batch=tok-9`).
    */
  def foldGenerations(
      spark: SparkSession,
      root: String,
      partitionCols: Seq[String] = Nil,
      shrink: Int = 16,
      assumeLeased: Boolean = false,
      liveTag: Option[String] = None): Unit = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def readManifest(dir: org.apache.hadoop.fs.Path): Seq[String] = {
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, Manifest))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    def finishSwap(visible: org.apache.hadoop.fs.Path): Unit = {
      for (name <- readManifest(visible)) {
        val p = new org.apache.hadoop.fs.Path(path, name)
        if (fs.exists(p)) fs.delete(p, true)
      }
      fs.delete(new org.apache.hadoop.fs.Path(visible, Manifest), false): Unit
    }

    if (!fs.exists(path)) return
    // assumeLeased: the caller already holds this root's lease for a
    // wider maintenance window (withLeases) — re-acquiring would deadlock
    def leased[T](body: => T): T =
      if (assumeLeased) body else withLease(spark, root)(body)
    leased {
    // recovery pass: repair whatever a previous run left behind
    for (s <- fs.listStatus(path) if s.isDirectory) {
      val name = s.getPath.getName
      if (name.startsWith(".compact-")) {
        if (fs.exists(new org.apache.hadoop.fs.Path(s.getPath, Manifest))) {
          val visible = new org.apache.hadoop.fs.Path(path, "batch=" + name.stripPrefix(".compact-"))
          fs.rename(s.getPath, visible)
          finishSwap(visible)
        } else fs.delete(s.getPath, true): Unit
      } else if (name.startsWith("batch=") &&
          fs.exists(new org.apache.hadoop.fs.Path(s.getPath, Manifest))) {
        finishSwap(s.getPath)
      }
    }

    val gens = fs.listStatus(path).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("batch="))
    // NEVER fold the live generation: it may be a written-but-
    // uncommitted tail whose micro-batch the stream will REPLAY after
    // restart — folding it would resurrect its rows as duplicates when
    // the replay recreates the dir ("quiesced" does not mean "cleanly
    // committed"). Steady state is therefore two generations: the
    // compacted fold plus the live tail. With a caller-supplied
    // liveTag the exclusion is by NAME; otherwise newest-by-mtime.
    val foldable = liveTag match {
      case Some(tag) => gens.filterNot(_.getPath.getName == s"batch=$tag")
      case None => gens.sortBy(_.getModificationTime).dropRight(1)
    }
    if (foldable.length <= 1) return
    // basePath keeps partition discovery rooted at the lake while the
    // scan reads ONLY the foldable generations (never the live tail)
    val df = spark.read.option("basePath", root)
      .parquet(foldable.map(_.getPath.toString).toIndexedSeq: _*)
      .drop("batch")
    val n = math.max(1, foldable.length / shrink)
    // with a partition layout, hash-cluster on the layout keys so each
    // partition dir gets ~one file — a plain coalesce would make every
    // task write every dir, splintering the fold into (tasks x dirs)
    // small files, the exact problem compaction exists to fix
    val shrunk =
      if (partitionCols.nonEmpty)
        df.repartition(n, partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df.coalesce(n)
    val w = shrunk.write.mode("overwrite")
    val compactTag = s"compact-${System.currentTimeMillis()}"
    val staged = new org.apache.hadoop.fs.Path(path, s".compact-$compactTag")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staged.toString)
    // the manifest is the commit gate, so its write must be atomic: a
    // crash mid-write would otherwise leave a TRUNCATED input list that
    // recovery honors, renaming the fold in while unlisted inputs
    // survive as permanent duplicates. Write-then-rename commits it.
    val tmp = new org.apache.hadoop.fs.Path(staged, Manifest + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(foldable.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new org.apache.hadoop.fs.Path(staged, Manifest))
    val visible = new org.apache.hadoop.fs.Path(path, s"batch=$compactTag")
    fs.rename(staged, visible)
    finishSwap(visible)
    }
  }
}
