package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

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
      val rate = once(spark, nBlocks)
      println(f"[probe] rep $i: $rate%.0f blocks/s ($nBlocks blocks)")
    }
    spark.stop()
  }

  def once(spark: SparkSession, nBlocks: Int): Double = {
    val base = Files.createTempDirectory("graft_probe").toString
    try {
      val src = s"$base/src"
      Files.createDirectories(Paths.get(src))
      val groups = graft.blocks.Fixtures.blocksJson(1000000L, nBlocks).grouped(500).zipWithIndex
      for ((g, i) <- groups)
        Files.write(Paths.get(s"$src/blocks_$i.jsonl"), g.mkString("\n").getBytes("UTF-8"))
      val t0 = System.nanoTime()
      graft.streaming.BlockIngest
        .start(spark, src, s"$base/lake", s"$base/ckpt")
        .awaitTermination()
      nBlocks / ((System.nanoTime() - t0) / 1e9)
    } finally {
      import scala.jdk.CollectionConverters._
      try Files.walk(Paths.get(base)).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
      catch { case _: Throwable => () }
    }
  }
}
