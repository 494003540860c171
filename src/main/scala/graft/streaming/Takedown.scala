package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The cross-surface takedown LEDGER — the missing top of the
  * right-to-be-forgotten stack.
  *
  * Each standing surface already forgets crash-atomically on its own
  * ([[graft.llm.LlmQueries]]'s row-filter and retraction folds for the
  * batch indexes, [[GateForget]] for the streaming gates — all through
  * [[FoldCommit]]'s stage → marker → publish → heal protocol). What
  * none of them answers is the PRODUCTION question: a takedown request
  * names a set of ids and must eventually be forgotten from EVERY
  * surface, surviving a crash that lands between two surfaces' folds.
  * One fold is atomic; a sequence of folds across independent roots
  * cannot be — so the honest shape is a resumable saga, not a
  * transaction.
  *
  * The ledger records each request as an atomically-published
  * generation (`takedown=<token>/ids` parquet plus the `surfaces`
  * name-set that exists at request time, staged and renamed into
  * place by [[FoldCommit]], so a half-written request is invisible),
  * then drives it across the registered surfaces with a durable
  * `done-<surface>` marker after each completed fold — and only
  * closes the token when every RECORDED surface is marked:
  *
  *   - a crash BETWEEN surfaces: re-entry skips the marked surfaces
  *     and continues with the rest;
  *   - a crash between a surface's fold and its marker: re-entry
  *     re-runs that one fold — harmless, because every registered
  *     fold is idempotent (filtered rewrites re-filter nothing; the
  *     BM25 retraction derives from postings minus already-visible
  *     tombstones; gate folds re-filter the consolidated generation);
  *   - a crash inside a fold: that surface's own [[FoldCommit]] heal
  *     rolls it forward or back on the next entry, and the re-run is
  *     again a no-op or the intended fold.
  *
  * When every surface is marked, a `_complete` sentinel closes the
  * request; [[resume]] over a closed ledger is a pure listing. The
  * id set is handed to each surface as a collected Seq (bounded by
  * `maxIds`, default 2^20 — the same driver-collect bound as the
  * union-find fast path) so each surface builds the predicate on ITS
  * key column (`doc_id` for the text indexes and gates, `vec_id` for
  * the vector indexes); at any realistic scale a takedown batch is
  * thousands of ids, and Spark compiles `isInCollection` to a
  * broadcast hash set, O(1) per scanned row.
  */
object Takedown {

  /** one standing surface: `forget` receives the request's id set and
    * must run that surface's own (idempotent, crash-atomic) fold
    */
  final case class Surface(name: String, forget: (SparkSession, Seq[Long]) => Unit) {
    require(name.nonEmpty && !name.exists(c => c == '/' || c.isWhitespace),
      s"surface name must be a path-safe token: '$name'")
  }

  private val Complete = "_complete"
  private val SurfacesFile = "surfaces"
  private def gen(token: String) = s"takedown=$token"

  /** register a takedown request: the distinct id set AND the names of
    * the surfaces that exist at request time are staged and published
    * atomically under the ledger; returns the request token (a full
    * UUID — a truncated token's 32-bit space admits collisions that
    * would displace another open request's generation, silently
    * dropping its id set). A request is pure data — nothing is
    * forgotten until [[resume]].
    *
    * Pinning the surface set at REQUEST time is what makes `_complete`
    * honest: without it, a resume invoked with a subset registry would
    * close the request with surfaces unfolded — silent under-deletion
    * in a right-to-be-forgotten path. [[resume]] refuses to close a
    * token until every RECORDED surface carries a done marker.
    */
  def request(
      spark: SparkSession, ledgerDir: String, ids: DataFrame,
      surfaces: Seq[String]): String = {
    require(surfaces.nonEmpty, "a takedown request must name the surfaces it covers")
    require(surfaces.distinct.size == surfaces.size, "surface names must be unique")
    surfaces.foreach(n => require(n.nonEmpty && !n.exists(c => c == '/' || c.isWhitespace),
      s"surface name must be a path-safe token: '$n'"))
    val root = new Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val token = java.util.UUID.randomUUID().toString
    FoldCommit.publish(fs, root, gen(token), Nil) { staging =>
      ids.select(col(ids.columns.head).cast(LongType).as("id")).distinct()
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/ids")
      val out = fs.create(new Path(staging, SurfacesFile), true)
      try out.write(surfaces.sorted.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    token
  }

  /** the surface-name set recorded when `token` was requested. A
    * ledger written BEFORE surface pinning existed has no `surfaces`
    * file — treat such a request as legacy and fall back to the
    * resuming registry's names (exactly the pre-pinning closure
    * semantics that request was made under), rather than letting the
    * open throw and wedge every later token's right-to-be-forgotten
    * processing on one old directory.
    */
  private def recordedSurfaces(
      fs: org.apache.hadoop.fs.FileSystem, reqDir: Path,
      legacyFallback: => Set[String]): Set[String] = {
    val f = new Path(reqDir, SurfacesFile)
    if (!fs.exists(f)) {
      System.err.println(s"[takedown] ${reqDir.getName}: legacy request " +
        "(predates surface pinning) — closing against the resuming registry")
      legacyFallback
    } else {
      val in = fs.open(f)
      try new String(in.readAllBytes(), "UTF-8").linesIterator.filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** request tokens still open (registered, not yet `_complete`) */
  def pending(spark: SparkSession, ledgerDir: String): Seq[String] = {
    val root = new Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    FoldCommit.heal(fs, root)
    fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("takedown="))
      .map(_.getPath.getName.stripPrefix("takedown="))
      .filterNot(t => fs.exists(new Path(root, s"${gen(t)}/$Complete")))
      .sorted
  }

  /** drive every open request through every surface, in lexicographic
    * token order (tokens are random UUIDs, so the order is stable, not
    * temporal); returns the tokens closed by THIS call. Fail-fast: a
    * surface that throws aborts the run with completed surfaces
    * durably marked, and the next resume continues from the failure.
    *
    * A token only closes when every surface RECORDED at request time
    * carries a done marker — a resume invoked with a subset registry
    * folds what it can, durably, and leaves the token pending (loudly)
    * rather than declaring a right-to-be-forgotten request complete
    * with surfaces unfolded. Surfaces registered AFTER the request are
    * folded too when present (idempotent, conservative) but are not
    * required for closure.
    */
  def resume(
      spark: SparkSession, ledgerDir: String, surfaces: Seq[Surface],
      maxIds: Int = 1 << 20): Seq[String] = {
    require(surfaces.map(_.name).distinct.size == surfaces.size,
      "surface names must be unique — the done marker is keyed on them")
    val root = new Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val closed = Seq.newBuilder[String]
    for (token <- pending(spark, ledgerDir)) {
      val reqDir = new Path(root, gen(token))
      val recorded = recordedSurfaces(fs, reqDir, surfaces.map(_.name).toSet)
      val idRows = spark.read.parquet(s"$reqDir/ids")
      val n = idRows.count()
      require(n <= maxIds,
        s"takedown $token names $n ids > maxIds=$maxIds — split the request " +
          "(the id set is driver-collected to build each surface's key predicate)")
      val ids = idRows.select(col("id")).collect().map(_.getLong(0)).toSeq
      for (srf <- surfaces) {
        val marker = new Path(reqDir, s"done-${srf.name}")
        if (!fs.exists(marker)) {
          srf.forget(spark, ids)
          fs.create(marker, true).close()
        }
      }
      val unmet = recorded.filterNot(name => fs.exists(new Path(reqDir, s"done-$name")))
      if (unmet.isEmpty) {
        fs.create(new Path(reqDir, Complete), true).close()
        closed += token
      } else
        System.err.println(s"[takedown] $token stays OPEN: recorded surfaces " +
          s"${unmet.toSeq.sorted.mkString(", ")} absent from this resume's registry — " +
          "re-run with the full surface set to close it")
    }
    closed.result()
  }
}
