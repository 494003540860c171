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

  test("injected SQL functions resolve in a session that never called register") {
    // newSession() builds a FRESH function registry (temp functions
    // registered by ColumnFns.register do NOT carry over) but re-applies
    // spark.sql.extensions — so resolution here proves the
    // injectFunction path a pure-SQL user depends on
    val s2 = spark.newSession()
    val r = s2.sql(
      """SELECT md5_prefix64('graft')                          AS h,
                simhash48('a b c')                             AS sh,
                zorder2(5, 9)                                  AS z,
                nfc_normalize('café')                    AS n,
                round(cosine_similarity(array(cast(1.0 as double), cast(0.0 as double)),
                                        array(cast(0.6 as double), cast(0.8 as double))), 6) AS cos,
                from_cbor(to_cbor('{"a":1}'))                  AS rt,
                base58_encode(base58_decode('StV1DL6CwTryKyV')) AS b58
      """).collect().head
    import graft.functions.HashUtil
    import org.apache.spark.unsafe.types.UTF8String
    assert(r.getAs[Long]("h") ==
      HashUtil.md5Prefix64("graft".getBytes("UTF-8")))
    assert(r.getAs[Long]("sh") == HashUtil.simhash48(UTF8String.fromString("a b c")))
    assert(r.getAs[Long]("z") == HashUtil.zorder2(5L, 9L))
    assert(r.getAs[String]("n") == "café", "not composed to NFC")
    assert(r.getAs[Double]("cos") == 0.6)
    assert(r.getAs[String]("rt") == """{"a":1}""")
    assert(r.getAs[String]("b58") == "StV1DL6CwTryKyV")
    // and the injected functions type-check like the registered ones
    intercept[org.apache.spark.sql.AnalysisException] {
      s2.sql("SELECT simhash48(42)").collect()
    }
    // wrong arity is a clean "<name> expects N arguments" error, not a
    // NoSuchElementException out of the builder
    val arity = intercept[Exception] {
      s2.sql("SELECT md5_prefix64()").collect()
    }
    assert(arity.getMessage.contains("md5_prefix64 expects 1 argument"),
      arity.getMessage)
    // the compression codecs ride the same injection: SQL round-trips
    // recover the input and the compressed forms actually differ
    val c = s2.sql(
      """SELECT cast(lz4_decompress(lz4_compress(b)) as string)   AS lz4_rt,
                cast(zstd_decompress(zstd_compress(b)) as string) AS zstd_rt,
                lz4_compress(b) = zstd_compress(b)                AS same_wire
         FROM (SELECT cast(repeat('graft wire ', 64) as binary) AS b)
      """).collect().head
    assert(c.getAs[String]("lz4_rt") == "graft wire " * 64)
    assert(c.getAs[String]("zstd_rt") == "graft wire " * 64)
    assert(!c.getAs[Boolean]("same_wire"))
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
