package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-semantics invariants for the dedup cluster contraction (d09). */
class ClustersSpec extends AnyFunSuite {
  import TestSpark._

  test("d09: labels are a fixpoint — every near-dup pair lands in one cluster") {
    val cl = Catalog.byName("d09_dedup_clusters").run(spark, sf)
    val pairs = Catalog.byName("d03_minhash_lsh").run(spark, sf)
    val l1 = cl.select(col("doc_id").as("d1"), col("cluster").as("c1"))
    val l2 = cl.select(col("doc_id").as("d2"), col("cluster").as("c2"))
    val split = pairs.join(l1, "d1").join(l2, "d2")
      .filter(col("c1") =!= col("c2")).count()
    assert(split == 0, "a verified near-dup pair must never straddle clusters")
  }

  test("d09: cluster root is a member and the unique keeper") {
    val cl = Catalog.byName("d09_dedup_clusters").run(spark, sf).cache()
    // root is a member of its own cluster
    val roots = cl.select(col("cluster")).distinct()
    val orphaned = roots.join(
      cl.select(col("doc_id").as("cluster")), Seq("cluster"), "left_anti").count()
    assert(orphaned == 0, "every cluster root must itself be a row")
    // exactly one keeper per cluster, and it is the min member
    val badKeep = cl.groupBy("cluster")
      .agg(sum("keep").as("nkeep"), min("doc_id").as("mn"),
        max(when(col("keep") === 1, col("doc_id"))).as("kept"))
      .filter(col("nkeep") =!= 1 || col("kept") =!= col("mn") || col("kept") =!= col("cluster"))
      .count()
    assert(badKeep == 0)
    cl.unpersist()
  }

  test("connectedComponents contracts a 3-chain that pairwise LSH would report as 2 edges") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2") // chain: 1-2-3; 4 isolated
    val got = llm.Clusters.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("connectedComponents matches a union-find reference on random graphs") {
    import spark.implicits._
    // deterministic pseudo-random graphs spanning the awkward shapes:
    // long chains (diameter stress), dense blobs, isolated nodes
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 12 + trial * 8
      val ids = (1L to n.toLong).toSeq
      val edges = (1 to n).flatMap { _ =>
        val a = ids(rnd.nextInt(n)); val b = ids(rnd.nextInt(n))
        if (a != b) Some((math.min(a, b), math.max(a, b))) else None
      }.distinct ++ (1L until 6L).map(i => (i, i + 1)) // embedded 6-chain

      // local union-find reference
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for ((a, b) <- edges) parent(find(a)) = find(b)
      val expected = ids.map { i =>
        val members = ids.filter(j => find(j) == find(i))
        i -> members.min
      }.toMap

      // default path (these graphs are broadcast-sized → driver
      // union-find) AND the forced-distributed star path must both
      // match the reference: broadcastEdgeLimit = 0 drives every graph
      // through the contraction loop regardless of size
      val got = llm.Clusters.connectedComponents(
          ids.toDF("doc_id"), edges.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial=$trial n=$n edges=${edges.size}")
      val star = llm.Clusters.connectedComponents(
          ids.toDF("doc_id"), edges.toDF("d1", "d2"), broadcastEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == expected, s"star path diverged: trial=$trial")
      // the retained label-propagation implementation is an independent
      // algorithm — all must agree with the reference and each other
      val lp = llm.Clusters.labelPropagation(
          ids.toDF("doc_id"), edges.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lp == expected, s"labelProp diverged: trial=$trial")
    }
  }

  test("star contraction collapses a 64-chain in O(log n) alternations") {
    import spark.implicits._
    // the shape that motivated the upgrade: diameter 63 means min-label
    // propagation needs 63 rounds (past MaxRounds = 20), while
    // large-star/small-star halves path lengths every alternation
    val n = 64L
    val nodes = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("d1", "d2")
    val (_, rounds) = llm.Clusters.starContraction(pairs)
    assert(rounds <= 10, s"took $rounds alternations for a 64-chain")
    // force the distributed path so the chain exercises the full
    // contraction end-to-end (the default would union-find 63 edges)
    val got = llm.Clusters.connectedComponents(nodes, pairs, broadcastEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n).map(_ -> 0L).toMap)
    // the diameter-bound form cannot finish this chain within MaxRounds
    // — and must say so instead of returning half-propagated labels
    intercept[IllegalStateException] {
      llm.Clusters.labelPropagation(nodes, pairs).collect()
    }
  }
}
