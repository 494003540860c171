package graft

import graft.blocks.{Fixtures, Flatten}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Flatten correctness against the golden fixture values from the
  * reference's worked example (borealis-indexer/src/main.rs:118-349).
  */
class BlocksSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Flatten.fixtureDocs(spark, Fixtures.baseHeight, 10)

  test("schema parses the golden fixture without corruption") {
    val b = Flatten.blocks(docs)
    assert(b.count() == 10)
    val r = b.filter(col("block_height") === Fixtures.baseHeight + 1).collect()(0)
    assert(r.getAs[String]("author") == "test.near")
    assert(r.getAs[java.math.BigDecimal]("total_supply").toString ==
      "2050206401403887985811862247311434")
    assert(r.getAs[Long]("timestamp_ns") == Fixtures.baseTsNanos + 1000000000L)
    assert(r.getAs[Long]("n_shards") == 1L)
  }

  test("golden transaction values: gas_burnt / tokens_burnt / status variant") {
    val tx = Flatten.transactions(docs)
    // heights ending %5==0 are chunk-less; fixture base 63596 → 63600 has no chunk
    assert(tx.count() == 8)
    val r = tx.filter(col("block_height") === Fixtures.baseHeight).collect()(0)
    assert(r.getAs[Long]("gas_burnt") == 424555062500L)
    assert(r.getAs[java.math.BigDecimal]("tokens_burnt").toString == "424555062500000000000")
    assert(r.getAs[String]("status_type") == "SuccessReceiptId")
    assert(r.getAs[String]("executor_id") == "test.near")
    assert(r.getAs[Long]("n_actions") == 3L)
  }

  test("tx_actions explodes the polymorphic variant list in order") {
    val a = Flatten
      .txActions(docs)
      .filter(col("block_height") === Fixtures.baseHeight)
      .orderBy("action_index")
      .collect()
    assert(a.map(_.getAs[String]("action_type")).toSeq ==
      Seq("CreateAccount", "Transfer", "AddKey"))
    assert(a(1).getAs[java.math.BigDecimal]("deposit").toString == "40000000000000000000000000")
    assert(a(2).getAs[String]("access_key_permission") == "FullAccess")
    assert(a(0).get(a(0).fieldIndex("deposit")) == null)
  }

  test("null-chunk shard survives (S18) and counts gate on has_chunk") {
    val sh = Flatten.shards(docs)
    val noChunk = sh.filter(!col("has_chunk")).collect()
    assert(noChunk.length == 2) // 63600, 63605
    assert(noChunk.forall(r => r.get(r.fieldIndex("n_transactions")) == null))
    assert(noChunk.forall(_.getAs[Long]("n_outcomes") == 1L))
  }

  test("u128 overflow guard: 39-digit value nulls, raw preserved") {
    import spark.implicits._
    val big = "9" * 39
    val doc = Fixtures.blockJson(1L).replace("2050206401403887985811862247311434", big)
    val b = Flatten.blocks(Flatten.parse(spark, Seq(doc).toDF("value"))).collect()(0)
    assert(b.get(b.fieldIndex("total_supply")) == null)
    assert(b.getAs[String]("total_supply_raw") == big)
  }

  test("prev_hash chains consecutive heights") {
    val b = Flatten.blocks(docs).select("block_height", "block_hash", "prev_hash")
    val self = b.select(col("block_height").as("h"), col("block_hash").as("bh"))
    val joined = b.join(self, b("prev_hash") === self("bh"))
    assert(joined.filter(col("block_height") =!= col("h") + 1).count() == 0)
    assert(joined.count() == 9)
  }

  test("b02 flagship aggregates Decimal38 exactly") {
    val r = Catalog.byName("b02_gas_by_executor").run(spark, sf).collect()
    assert(r.nonEmpty)
    val one = r.filter(_.getAs[String]("executor_id") == "some.test.near").head
    val n = one.getAs[Long]("n_outcomes")
    // catalog projection emits the exact u128 total as a digit string
    // (driver-harness type rule); compare as BigDecimal
    assert(new java.math.BigDecimal(one.getAs[String]("total_tokens")) ==
      new java.math.BigDecimal("424555062500000000000").multiply(java.math.BigDecimal.valueOf(n)))
  }

  test("b07 tx->outcome join matches every tx exactly once") {
    val df = Catalog.byName("b07_tx_outcome_join").run(spark, sf)
    import org.apache.spark.sql.functions.countDistinct
    val n = df.agg(countDistinct(col("tx_hash"))).collect()(0).getLong(0)
    assert(df.count() == n) // one outcome per tx in the fixture
    assert(n > 0)
  }
}
