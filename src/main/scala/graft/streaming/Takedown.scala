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
  * generation (`takedown=<token>/ids` parquet, staged and renamed into
  * place by [[FoldCommit]], so a half-written request is invisible),
  * then drives it across the registered surfaces with a durable
  * `done-<surface>` marker after each completed fold:
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
  private def gen(token: String) = s"takedown=$token"

  /** register a takedown request: the distinct id set is staged and
    * published atomically under the ledger; returns the request token.
    * A request is pure data — nothing is forgotten until [[resume]].
    */
  def request(spark: SparkSession, ledgerDir: String, ids: DataFrame): String = {
    val root = new Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val token = java.util.UUID.randomUUID().toString.take(8)
    FoldCommit.publish(fs, root, gen(token), Nil) { staging =>
      ids.select(col(ids.columns.head).cast(LongType).as("id")).distinct()
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/ids")
    }
    token
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

  /** drive every open request through every surface, oldest token
    * first; returns the tokens closed by THIS call. Fail-fast: a
    * surface that throws aborts the run with completed surfaces
    * durably marked, and the next resume continues from the failure.
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
      fs.create(new Path(reqDir, Complete), true).close()
      closed += token
    }
    closed.result()
  }
}
