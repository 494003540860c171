package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** S22 bulk-lake-bootstrap composition check. A real s3a round-trip
  * needs a network/broker this sandbox doesn't have, but the failure
  * mode worth guarding is cheaper than that: a config key in
  * [[graft.sources.CloudLake.s3aConf]] that the Hadoop conf layer
  * rejects, or whose presence breaks the ordinary FS resolution the
  * bootstrap path itself uses. So: apply the FULL S22 option set to the
  * live session's Hadoop configuration, then run the real
  * [[graft.sources.CloudLake.bootstrap]] through an explicit `file:`
  * URI (the code path is scheme-agnostic — only the URI changes on a
  * cluster) and read the entity lake back.
  */
class CloudLakeSpec extends AnyFunSuite {
  import TestSpark._

  test("s3a option set composes with the live session and a bootstrap runs through it") {
    val hc = spark.sparkContext.hadoopConfiguration
    val applied = sources.CloudLake.s3aConf(anonymous = true) ++
      sources.CloudLake.s3aConf(anonymous = false)
    val saved = applied.keys.map { k =>
      val hk = k.stripPrefix("spark.hadoop.")
      hk -> Option(hc.get(hk))
    }.toMap
    try {
      // the session-builder path prefixes hadoop keys with spark.hadoop.;
      // applying them to hadoopConfiguration is the same wiring at the
      // layer the FS actually reads
      for ((k, v) <- sources.CloudLake.s3aConf(anonymous = true))
        hc.set(k.stripPrefix("spark.hadoop."), v)
      assert(hc.get("fs.s3a.committer.name") == "magic")
      assert(hc.get("fs.s3a.aws.credentials.provider")
        .contains("AnonymousAWSCredentialsProvider"))
      // the non-anonymous arm swaps only the provider chain
      for ((k, v) <- sources.CloudLake.s3aConf(anonymous = false))
        hc.set(k.stripPrefix("spark.hadoop."), v)
      assert(hc.get("fs.s3a.aws.credentials.provider")
        .contains("IAMInstanceCredentialsProvider"))

      // bootstrap through an explicit scheme'd URI with the s3a options
      // live: proves the option set never leaks into non-s3a FS
      // resolution and the backfill path accepts a full URI source
      val base = Files.createTempDirectory("graft_cloudlake").toString
      val src = s"$base/drop"
      Files.createDirectories(java.nio.file.Paths.get(src))
      Files.write(
        java.nio.file.Paths.get(s"$src/blocks.jsonl"),
        blocks.Fixtures.blocksJson(500000L, 8).mkString("\n").getBytes("UTF-8"))
      val lake = s"$base/lake"
      sources.CloudLake.bootstrap(spark, s"file://$src", s"file://$lake")
      val got = spark.read.parquet(s"file://$lake/blocks")
      assert(got.count() == 8)
      assert(got.select("block_height").distinct().count() == 8)
    } finally {
      // restore whatever the shared session had — other suites must not
      // inherit this test's committer/provider settings
      for ((k, old) <- saved) old match {
        case Some(v) => hc.set(k, v)
        case None => hc.unset(k)
      }
    }
  }
}
