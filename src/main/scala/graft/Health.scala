package graft

import org.apache.spark.sql.SparkSession

/** Health check (SURVEY §2 S11 — the reference's `check` subcommand:
  * connect, flush with timeout, report rtt). Spark image: open a
  * session, touch one row of each table, report per-table latency as
  * one JSON line. Usage: graft.Health [sfDir]
  */
object Health {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val t0 = System.nanoTime()
    val spark = SparkSessions.local("graft-health", 2, logLevel = "ERROR")
    val sessionMs = (System.nanoTime() - t0) / 1e6
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val probes = tables.map { t =>
      val s = System.nanoTime()
      val ok =
        try {
          // events needs the nanos-aware loader (TIMESTAMP_NANOS parquet)
          val df = if (t == "events") Tables.events(spark, sfDir) else Tables.t(spark, sfDir, t)
          df.limit(1).count() == 1
        } catch { case _: Throwable => false }
      f""""$t":{"ok":$ok,"ms":${(System.nanoTime() - s) / 1e6}%.1f}"""
    }
    println(
      s"""{"status":"ok","session_ms":${f"$sessionMs%.1f"},"sf":"$sfDir","tables":{${probes.mkString(",")}}}""")
    spark.stop()
  }
}
