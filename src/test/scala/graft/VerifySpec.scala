package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The Verify dump loop's failure contract: a crashed query must leave
  * a durable `<name>.err` marker the driver can surface, never a
  * silent omission (round 8 lost 15 queries to exactly that), and one
  * query's failure must not stop the rest of the sweep.
  */
class VerifySpec extends AnyFunSuite {
  import TestSpark._

  test("a crashed query leaves an .err marker and the sweep continues past it") {
    val out = Files.createTempDirectory("graft_verify_err").toString
    // an empty sf dir: both queries crash at the parquet read; BOTH
    // must leave markers — proving the sweep survives a failure
    // instead of aborting at the first one
    val emptySf = Files.createTempDirectory("graft_verify_sf").toString

    Verify.runQueries(spark, emptySf, out,
      Set("q01_pricing_summary", "q02_filter_project"))

    for (name <- Seq("q01_pricing_summary", "q02_filter_project")) {
      val err = Paths.get(s"$out/$name.err")
      assert(Files.exists(err), s"crashed $name left no .err marker")
      assert(Files.readString(err).nonEmpty, s"$name err marker is empty")
      assert(!Files.isDirectory(Paths.get(s"$out/$name")),
        s"crashed $name must not leave a result dir")
    }
  }

  test("a successful query writes parquet and no .err marker") {
    val out = Files.createTempDirectory("graft_verify_ok").toString
    Verify.runQueries(spark, sf, out, Set("q01_pricing_summary"))
    assert(Files.isDirectory(Paths.get(s"$out/q01_pricing_summary")))
    assert(!Files.exists(Paths.get(s"$out/q01_pricing_summary.err")))
  }
}
