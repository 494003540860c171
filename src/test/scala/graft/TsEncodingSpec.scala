package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary for the events table's `ts` column.
  *
  * The driver regenerates the testdata between rounds, and the parquet
  * logical type of `ts` has already drifted once: TIMESTAMP(NANOS) in
  * rounds 1-7 (Spark reads as Long under `nanosAsLong`), then
  * TIMESTAMP(MICROS, local) in round 8 (Spark TIMESTAMP_NTZ) — which
  * silently killed all 15 events queries at analysis time. This spec
  * writes the same instants under every plausible encoding and pins
  * [[Tables.events]] to one contract: `ts` TimestampType, `ts_ns` epoch
  * nanos BIGINT, identical values regardless of the file's encoding.
  *
  * Reference framing: the reference's transport tolerated format drift
  * via explicit enums (borealis-indexer/src/configs.rs:83-87); our lake
  * edge needs the same tolerance at the schema level.
  */
class TsEncodingSpec extends AnyFunSuite {
  import TestSpark._
  import scala.jdk.CollectionConverters._

  // three instants incl. a non-zero sub-second to catch unit mixups
  private val micros = Seq(1700000000000000L, 1700000123456789L, 1708000000250000L)

  /** write a one-column events.parquet under `enc`, return its dir */
  private def writeFixture(enc: String): String = {
    val dir = Files.createTempDirectory(s"graft_tsenc_$enc").toString
    val df = enc match {
      case "long_nanos" =>
        // image of the TIMESTAMP(NANOS) generation: under nanosAsLong the
        // reader surfaces it as a plain BIGINT of epoch nanos (Spark
        // cannot write true nanos parquet, so write the post-read shape)
        spark.createDataFrame(
          micros.map(m => Row(m * 1000L)).asJava,
          StructType(Seq(StructField("ts", LongType))))
      case "timestamp" =>
        spark.createDataFrame(
          micros.map(m => Row(java.time.Instant.EPOCH.plusNanos(m * 1000L))).asJava,
          StructType(Seq(StructField("ts", TimestampType))))
      case "timestamp_ntz" =>
        // round-8 testdata shape: TIMESTAMP(MICROS, isAdjustedToUTC=false)
        spark.createDataFrame(
          micros.map(m =>
            Row(java.time.LocalDateTime.ofInstant(
              java.time.Instant.EPOCH.plusNanos(m * 1000L), java.time.ZoneOffset.UTC))).asJava,
          StructType(Seq(StructField("ts", TimestampNTZType))))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loaded(enc: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, writeFixture(enc))
    assert(df.schema("ts").dataType == TimestampType,
      s"$enc: ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    assert(df.schema("ts_ns").dataType == LongType,
      s"$enc: ts_ns must be BIGINT, got ${df.schema("ts_ns").dataType}")
    df.select(unix_micros(col("ts")), col("ts_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  test("events ts contract holds under all three historical encodings") {
    val expected = micros.sorted.map(m => (m, m * 1000L))
    for (enc <- Seq("long_nanos", "timestamp", "timestamp_ntz"))
      assert(loaded(enc) == expected, s"encoding $enc diverged from the ts/ts_ns contract")
  }

  test("the live testdata's events encoding is one the loader handles") {
    // if the driver regenerates into a fourth encoding, fail HERE with
    // the observed type, not deep inside 15 analysis errors
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val t = raw.schema("ts").dataType
    assert(Seq(LongType, TimestampType, TimestampNTZType).contains(t),
      s"events.ts drifted to unhandled type $t — add a Tables.events branch")
    // and the loader actually yields consistent ts/ts_ns on it
    val df = Tables.events(spark, sf)
    val bad = df.filter(unix_micros(col("ts")) * 1000L =!= col("ts_ns")).count()
    assert(bad == 0, s"$bad rows where ts and ts_ns disagree")
  }

  test("relational tables' live schemas match the column contract queries compile against") {
    // the TPC-H-ish side of the drift canary: every dtype here is one
    // the catalog's queries AND the DuckDB oracle currently agree on.
    // A regeneration that changes one (int32 key -> int64, double
    // money -> decimal, NTZ date -> adjusted-UTC) fails HERE with the
    // observed schema, not as dozens of downstream hash mismatches.
    def s(name: String) = spark.read.parquet(s"$sf/$name.parquet").schema
    val region = s("region")
    assert(region("r_regionkey").dataType == IntegerType, region.treeString)
    val nation = s("nation")
    assert(nation("n_nationkey").dataType == IntegerType, nation.treeString)
    assert(nation("n_regionkey").dataType == IntegerType, nation.treeString)
    val customer = s("customer")
    assert(customer("c_custkey").dataType == LongType, customer.treeString)
    assert(customer("c_nationkey").dataType == IntegerType, customer.treeString)
    assert(customer("c_acctbal").dataType == DoubleType, customer.treeString)
    val orders = s("orders")
    assert(orders("o_orderkey").dataType == LongType, orders.treeString)
    assert(orders("o_totalprice").dataType == DoubleType, orders.treeString)
    // the date columns currently arrive as TIMESTAMP(MICROS, local) ->
    // Spark TIMESTAMP_NTZ; DuckDB reads the same file as naive
    // TIMESTAMP, so both engines see identical wall-clock values. A
    // drift to adjusted-UTC would flip Spark to TimestampType while
    // DuckDB stays naive — surface it here, deliberately.
    assert(orders("o_orderdate").dataType == TimestampNTZType, orders.treeString)
    val li = s("lineitem")
    assert(li("l_orderkey").dataType == LongType, li.treeString)
    assert(li("l_linenumber").dataType == IntegerType, li.treeString)
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      assert(li(c).dataType == DoubleType, li.treeString)
    assert(li("l_shipdate").dataType == TimestampNTZType, li.treeString)
    val supplier = s("supplier")
    assert(supplier("s_suppkey").dataType == LongType, supplier.treeString)
    assert(supplier("s_nationkey").dataType == IntegerType, supplier.treeString)
    assert(supplier("s_acctbal").dataType == DoubleType, supplier.treeString)
    val part = s("part")
    assert(part("p_partkey").dataType == LongType, part.treeString)
    assert(part("p_retailprice").dataType == DoubleType, part.treeString)
    assert(part("p_size").dataType == IntegerType, part.treeString)
  }

  test("documents/embeddings live schemas match the column contract queries compile against") {
    // the same early-warning for the other driver-regenerated tables:
    // every catalog query's column references are pinned here, and a
    // type drift (e.g. int64 doc_id -> int32, float embedding ->
    // double) fails with the observed schema instead of 40 downstream
    // analysis/hash errors
    val docs = Tables.documents(spark, sf).schema
    assert(docs("doc_id").dataType == LongType, docs.treeString)
    assert(docs("text").dataType == StringType, docs.treeString)
    assert(docs("lang").dataType == StringType, docs.treeString)
    assert(docs("source").dataType == StringType, docs.treeString)
    assert(docs("n_chars").dataType == LongType, docs.treeString)
    val emb = Tables.embeddings(spark, sf).schema
    assert(emb("vec_id").dataType == LongType, emb.treeString)
    assert(emb("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
      emb("embedding").dataType == ArrayType(FloatType, containsNull = false), emb.treeString)
    assert(emb("label").dataType == IntegerType, emb.treeString)
  }
}
