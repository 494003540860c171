package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ad-hoc SQL entry point: plain analytics and engine functions
  * both resolve through one `graft.Sql.run` call.
  */
class SqlSpec extends AnyFunSuite {
  import TestSpark._

  test("plain SQL over registered lake tables") {
    val rows = Sql.run(spark, sf,
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1""").collect()
    assert(rows.length == 3) // A/N/R
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.t(spark, sf, "lineitem").count())
  }

  test("engine functions resolve by name in ad-hoc SQL") {
    val r = Sql.run(spark, sf,
      """SELECT doc_id, simhash48(text) AS sh, md5_prefix64(text) AS fp
        FROM documents ORDER BY doc_id LIMIT 3""").collect()
    assert(r.length == 3)
    assert(r.forall(_.getAs[Long]("sh") != 0L))
  }

  test("@name runs the catalog entry; unknown names fail with the catalog pointer") {
    val rows = Sql.run(spark, sf, "@q01_pricing_summary").collect()
    assert(rows.nonEmpty)
    val ex = intercept[IllegalArgumentException] {
      Sql.run(spark, sf, "@no_such_query")
    }
    assert(ex.getMessage.contains("no_such_query"))
  }

  test("events view is nanos-aware: timestamp operations work in SQL") {
    val r = Sql.run(spark, sf,
      """SELECT CAST(count(*) AS BIGINT) AS n
        FROM events WHERE ts >= timestamp'2024-01-01 00:00:00'""").collect()
    assert(r(0).getAs[Long]("n") > 0)
  }
}
