package graft.llm

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup cluster contraction: near-dup PAIRS (d03) are only half a
  * dedup pipeline — to actually drop duplicates you need connected
  * COMPONENTS of the pair graph and one keeper per component (a chain
  * a~b~c must collapse to one survivor even though (a,c) was never
  * emitted as a pair).
  *
  * Implementation: iterative min-label propagation to a fixpoint.
  * Each round is one shuffle join + aggregation (label := min over self
  * and neighbors); rounds needed = component diameter, which for
  * near-dup clusters is tiny in practice (dup clusters are dense).
  * At 100 TB the same loop holds — each round is a pair of
  * key-partitioned shuffles, nothing driver-side grows with the corpus
  * — with two standard upgrades documented inline: alternating
  * large-star/small-star contraction (halves round count on skewed
  * graphs) and periodic checkpointing (lineage truncation, done here
  * via localCheckpoint).
  */
object Clusters {

  /** max propagation rounds — a safety bound, not a tuning knob: the
    * loop exits as soon as a round changes no label (diameter reached).
    */
  val MaxRounds = 20

  /** Connected components of an undirected edge list over `nodes`:
    * returns (doc_id, cluster) where cluster = min doc_id reachable.
    * Singletons keep themselves as cluster root.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    // both directions once, materialized once: every round re-reads it
    val edges = pairs.select(col("d1"), col("d2"))
      .union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .cache()
    // propagate only over the near-dup subgraph (docs that appear in at
    // least one pair) — a vanishing fraction of the corpus at any scale.
    // Untouched docs are singletons and join back at the end, so the
    // per-round joins never touch the full node set.
    val touched = edges.select(col("d1").as("doc_id")).distinct()
    var labels = touched
      .select(col("doc_id"), col("doc_id").as("cluster"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (round < MaxRounds && !converged) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("d2"), col("cluster").as("c2")), "d2")
        .groupBy("d1").agg(min("c2").as("nmin"))
      // carry the previous label through the projection so convergence
      // detection is a scan of the checkpointed frame, not another join
      val next = labels
        .join(nbrMin.select(col("d1").as("doc_id"), col("nmin")), Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"),
          col("cluster").as("prev"))
        .localCheckpoint() // truncate lineage: each round starts from materialized labels
      val changed = next.filter(col("cluster") =!= col("prev")).count()
      labels = next.drop("prev")
      converged = changed == 0
      round += 1
    }
    edges.unpersist()
    val singletons = nodes
      .join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster"))
    labels.union(singletons)
  }

  // -- d09: near-dup clusters + keeper election over d03's verified
  //    pairs. Output: every doc with its cluster root, cluster size,
  //    and keep flag (root survives, other members are the dedup drop
  //    set). The oracle computes min-reachable-id via a recursive
  //    transitive closure — exponential-ish in DuckDB but exact at
  //    oracle scale; the Spark side is the scalable path.
  private val d09 = Q(
    "d09_dedup_clusters",
    (s, d) => {
      val labels = connectedComponents(
        Tables.documents(s, d).select("doc_id"),
        LlmQueries.nearDupPairs(s, d))
      val w = Window.partitionBy("cluster")
      labels
        .withColumn("cluster_size", count(lit(1)).over(w))
        .withColumn("keep", when(col("doc_id") === col("cluster"), 1L).otherwise(0L))
        .select("doc_id", "cluster", "cluster_size", "keep")
    },
    Some(s"""
      WITH RECURSIVE ${LlmQueries.pairsCtes},
      edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.d2 FROM reach r JOIN edges e ON r.dst = e.d1
      ),
      cl AS (SELECT src AS doc_id, min(dst) AS cluster FROM reach GROUP BY src)
      SELECT doc_id, cluster,
             count(*) OVER (PARTITION BY cluster) AS cluster_size,
             CAST(CASE WHEN doc_id = cluster THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM cl
    """.trim))

  def queries: Seq[Q] = Seq(d09)
}
