package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc SQL entry point — the "switch your queries over" surface.
  * Registers every lake table as a view and runs arbitrary SQL with the
  * engine's extensions active (`SparkSessions.local` wires
  * `GraftExtensions`, so `simhash48`, `zorder2`, `from_cbor`, … resolve
  * by name), mirroring how the reference exposes its data to downstream
  * consumers as queryable subjects rather than an API
  * (borealis-consumer/src/main.rs:652-669 — the consumer is exactly
  * this: subscribe and interrogate). Usage:
  *
  * {{{ tools/run.sh graft.Sql <sfDir> "<sql>" [--explain] [--limit N] }}}
  *
  * Results print as JSON lines (capped at `--limit`, default 1000);
  * `--explain` writes the formatted physical plan to stderr first, so
  * plan audits don't contaminate the data stream.
  */
object Sql {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register each lake table under its bare name. `events` goes
    * through the nanos-aware loader; everything else is a plain scan.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    for (t <- tables) {
      val df = if (t == "events") Tables.events(spark, sfDir) else Tables.t(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }

  /** `@name` runs the cataloged query of that name; anything else is
    * parsed as SQL over the registered tables.
    */
  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame =
    if (sql.startsWith("@")) {
      val name = sql.drop(1).trim
      Catalog.byName.getOrElse(name,
        throw new IllegalArgumentException(
          s"no catalog query named '$name' (see graft.Catalog)")).run(spark, sfDir)
    } else {
      registerTables(spark, sfDir)
      spark.sql(sql)
    }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    if (args.length < 2) {
      System.err.println("usage: graft.Sql <sfDir> <sql> [--explain] [--limit N]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val sql = args(1)
    val explain = args.contains("--explain")
    val limit = args.sliding(2).collectFirst {
      case Array("--limit", n) => n.toInt
    }.getOrElse(1000)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8)
    val spark = SparkSessions.local("graft-sql", cpus, logLevel = "ERROR")
    try {
      val df = run(spark, sfDir, sql)
      if (explain) System.err.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      df.toJSON.take(limit).foreach(println)
    } finally spark.stop()
  }
}
