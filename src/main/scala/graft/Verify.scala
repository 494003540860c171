package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** the per-query dump loop, factored from [[main]] so VerifySpec can
    * drive it against the shared test session (main stops its session)
    */
  private[graft] def runQueries(
      spark: SparkSession, sfDir: String, outDir: String,
      only: Set[String] = Set.empty): Unit =
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        // marker/result mutual exclusion: a stale .err from a prior failed
        // local run must not survive a now-green re-run into the same
        // outDir, and a half-written result dir must not survive a failure
        // (a write can die after analysis succeeds) — otherwise the checker
        // can see both a result dir and an err marker for one query.
        Files.deleteIfExists(Paths.get(s"$outDir/$name.err"))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          deleteRecursively(new java.io.File(s"$outDir/$name"))
          // durable error marker: without it a crashed query is
          // indistinguishable from a never-enumerated one in the driver's
          // correctness artifact (r8 silently dropped 15 broken queries).
          // A plain file, not a dir — the checker only walks subdirs.
          try Files.writeString(Paths.get(s"$outDir/$name.err"),
            Option(e.getMessage).getOrElse(e.toString).take(2000))
          catch { case e2: Throwable =>
            System.err.println(s"[verify] $name err-marker write failed: $e2") }
        }
        // queries may cache intermediates (e.g. the shingle index);
        // don't let one query's cache pressure the next 50
        spark.catalog.clearCache()
      }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    // extra args (local iteration only): restrict to the named queries
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSessions.local("graft-verify", cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // Block-fixture oracle inputs: dump the flattened entity tables so
    // the `{{FIXTURES}}`-anchored oracle SQL (BlockQueries) can
    // recompute aggregations/joins over them in DuckDB. Deliberately
    // OUTSIDE outDir: the driver's checker treats every outDir subdir as
    // a query output, and the entity tables carry ArrayType columns its
    // row-sorter cannot hash (round-2 `_fixtures` err).
    val fixDir = new java.io.File("/root/repo/target/verify_fixtures").getAbsolutePath
    blocks.Flatten
      .all(blocks.Flatten.fixtureDocs(spark, blocks.Fixtures.baseHeight, blocks.BlockQueries.FixtureN))
      .foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$fixDir/$name")
      }
    // The raw wire documents (seq_id, value) too: the codec queries'
    // oracles (b04/b08) recompute md5/byte-length invariants over the
    // exact JSON text the envelope wraps — DuckDB can't run CBOR/zstd,
    // but it can verify the raw side and the roundtrip booleans.
    blocks.BlockQueries.rawBlocks(spark)
      .coalesce(1).write.mode("overwrite").parquet(s"$fixDir/raw_blocks")
    runQueries(spark, sfDir, outDir, only)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{{FIXTURES}}", fixDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
