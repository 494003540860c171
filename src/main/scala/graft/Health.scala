package graft

import org.apache.spark.sql.SparkSession

/** Health check (SURVEY §2 S11 — the reference's `check` subcommand:
  * connect, flush with timeout, report rtt). Spark image: open a
  * session, touch one row of each table, report per-table latency as
  * one JSON line. Usage: graft.Health [sfDir]
  */
object Health {
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The one-line JSON report. `status` is "ok" iff EVERY table probe
    * succeeded — a lake with an unreadable table must not report
    * healthy (the reference's check exits non-zero on a failed flush).
    */
  def report(spark: SparkSession, sfDir: String, sessionMs: Double = 0.0): String = {
    val probes = tables.map { t =>
      val s = System.nanoTime()
      val ok =
        try {
          // events needs the nanos-aware loader (TIMESTAMP_NANOS parquet)
          val df = if (t == "events") Tables.events(spark, sfDir) else Tables.t(spark, sfDir, t)
          df.limit(1).count() == 1
        } catch { case _: Throwable => false }
      (t, ok, (System.nanoTime() - s) / 1e6)
    }
    val status = if (probes.forall(_._2)) "ok" else "degraded"
    val fields = probes
      .map { case (t, ok, ms) => f""""$t":{"ok":$ok,"ms":$ms%.1f}""" }
      .mkString(",")
    s"""{"status":"$status","session_ms":${f"$sessionMs%.1f"},"sf":"$sfDir","tables":{$fields}}"""
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val t0 = System.nanoTime()
    val spark = SparkSessions.local("graft-health", 2, logLevel = "ERROR")
    val sessionMs = (System.nanoTime() - t0) / 1e6
    val out = report(spark, sfDir, sessionMs)
    println(out)
    spark.stop()
    if (out.contains(""""status":"degraded"""")) sys.exit(1)
  }
}
