package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** S11 smoke test: the health probe's JSON line parses, reports ok for
  * a healthy lake (all 10 tables), and degrades loudly for a broken one.
  */
class HealthSpec extends AnyFunSuite {
  import TestSpark._

  test("report is one valid JSON object: status ok, all 10 tables ok") {
    val out = Health.report(spark, sf)
    val j = JsonMethods.parse(out)
    assert((j \ "status") == JString("ok"), out)
    val tables = (j \ "tables").asInstanceOf[JObject].obj
    assert(tables.map(_._1).toSet == Set("region", "nation", "customer",
      "supplier", "part", "orders", "lineitem", "events", "documents",
      "embeddings"))
    for ((name, v) <- tables) {
      assert((v \ "ok") == JBool(true), s"table $name not ok: $out")
      val JDouble(ms) = (v \ "ms"): @unchecked
      assert(ms >= 0.0)
    }
  }

  test("report degrades when the lake is unreadable") {
    val out = Health.report(spark, "/tmp/graft_no_such_lake")
    assert((JsonMethods.parse(out) \ "status") == JString("degraded"), out)
  }
}
