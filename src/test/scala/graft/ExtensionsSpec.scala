package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The session-extension optimizer rule: the portable SQL dedup-hash
  * recipe must be rewritten to the native codegen expression.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  private val sqlForm = "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)"

  test("conv(substr(md5)) SQL form is rewritten to md5_prefix64 by the optimizer") {
    // parquet-backed source so ConvertToLocalRelation can't fold the
    // projection away before we can inspect it
    val df = Tables.documents(spark, sf)
      .selectExpr(s"${sqlForm.replace("md5(s)", "md5(text)")} as h")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("md5_prefix64"),
      s"rule did not fire; optimized plan:\n$optimized")
    assert(!optimized.toLowerCase.contains("conv("), "conv should be gone")
  }

  test("rewrite preserves values exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val samples = Seq("", "x", "ünïcødé ☃") ++
      (0 until 100).map(_ => rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
    val df = samples.toDF("s")
    val mismatches = df.select(
        expr(sqlForm).as("rewritten"),
        graft.functions.ColumnFns.md5_prefix64(col("s")).as("native"))
      .filter(col("rewritten") =!= col("native")).count()
    assert(mismatches == 0)
  }

  test("the narrow pattern leaves other conv/md5 uses untouched") {
    import spark.implicits._
    // different substring bounds -> NOT our hash; must keep original semantics
    val r = Seq("abc").toDF("s")
      .selectExpr("cast(conv(substr(md5(s), 1, 8), 16, 10) as bigint) as h8")
      .collect()(0).getLong(0)
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("abc".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    assert(r == expected)
  }
}
