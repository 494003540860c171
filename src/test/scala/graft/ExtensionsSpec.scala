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

  test("zorder2 interleaves bits exactly and is bijective on the grid") {
    val z = graft.functions.HashUtil.zorder2(_, _)
    assert(z(0L, 0L) == 0L)
    assert(z(1L, 0L) == 1L) // x bit 0 -> position 0
    assert(z(0L, 1L) == 2L) // y bit 0 -> position 1
    assert(z(3L, 0L) == 5L) // 0b11 -> 0b0101
    assert(z(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(z(0xffffffffL, 0xffffffffL) == -1L) // all 64 bits set
    // bijective on a 64x64 grid
    val keys = for (x <- 0L until 64L; y <- 0L until 64L) yield z(x, y)
    assert(keys.distinct.size == 64 * 64)
    // locality: adjacent cells differ in few z-bits on average vs random pairs
    val adj = (0L until 63L).map(x => java.lang.Long.bitCount(z(x, 7L) ^ z(x + 1, 7L)))
    assert(adj.sum.toDouble / adj.size < 4.0, "adjacent cells should be z-close")
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
