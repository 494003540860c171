package graft.tools

/** Diagnostic harness for the headline streaming metric: runs the
  * Bench blocks/s probe (fixture JSON -> parse -> 8-table flatten ->
  * checkpointed lake) `reps` times in ONE JVM and prints each rep, so
  * run-to-run spread can be separated into JVM/JIT warmup vs genuine
  * pipeline cost. Usage: StreamProbe [nBlocks] [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val nBlocks = args.headOption.map(_.toInt).getOrElse(2000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.SparkSessions.local("graft-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    for (i <- 1 to reps) {
      // the exact Bench pipeline — fixture drop, ingest, cleanup — so
      // the diagnostic can never drift from the metric it explains
      val rate = graft.Bench.ingestRun(spark, nBlocks)
      println(f"[probe] rep $i: $rate%.0f blocks/s ($nBlocks blocks)")
    }
    spark.stop()
  }
}
