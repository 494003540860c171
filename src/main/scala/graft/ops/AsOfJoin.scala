package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of (point-in-time) join.
  *
  * Spark has no native ASOF JOIN (DuckDB does; the reference's
  * tx->outcome matching across blocks — borealis-indexer/src/main.rs:121-124
  * — is exactly this shape). The naive formulation
  * `left JOIN right ON key AND r.ts <= l.ts` + "keep max r.ts" explodes to
  * O(|left| x |matching right|) before the dedup, which is fatal at 100 TB.
  *
  * This implementation is the single-shuffle union+window formulation:
  * tag both sides, union, and for every left row take the last non-null
  * right payload at-or-before it within its key partition. Cost: one
  * shuffle on the key + one sort — the same cost as a sort-merge join,
  * with no row explosion, no skew amplification, and it streams within
  * each key partition (rowsBetween running frame).
  */
object AsOfJoin {

  /** Left as-of join: every row of `left` joined to the latest row of
    * `right` with `right.ts <= left.ts` for the same `key`.
    * `rightPayload` columns must exist in `right` and not collide with
    * `left` columns. Right rows ordered before left rows on ts ties
    * (i.e. a right row at exactly left.ts matches).
    *
    * CONTRACT: right payload columns must be non-null and unique per
    * (key, ts) — pre-aggregate the right side (as q22 does). The
    * union+window encoding uses null as the "no right row here" marker,
    * so a genuinely-null payload would be skipped (forward-filled from
    * an older row), and duplicate (key, ts) right rows would tie-break
    * arbitrarily.
    */
  /** shared precondition: the output schema is left ++ payload, so a
    * payload name already on the left would produce ambiguous columns
    * (asofNative) or be silently nulled-and-refilled (asofLeft's
    * alignment loop) — reject it up front on both paths
    */
  private def requireNoCollision(left: DataFrame, rightPayload: Seq[String]): Unit = {
    val collisions = rightPayload.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"rightPayload collides with left columns: ${collisions.mkString(", ")}")
  }

  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[String]): DataFrame = {
    requireNoCollision(left, rightPayload)
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    var r = right
      .select((Seq(col(key), col(ts)) ++ rightPayload.map(col)): _*)
      .withColumn("__side", lit(0))
    // align schemas for unionByName
    for (c <- leftCols if !Seq(key, ts).contains(c))
      r = r.withColumn(c, lit(null))
    var lAligned = l
    for (c <- rightPayload) lAligned = lAligned.withColumn(c, lit(null))

    val unioned = lAligned.unionByName(r.select(lAligned.columns.map(col): _*))
    // right rows sort before left rows at equal ts => <= semantics
    val w = Window
      .partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__side") === 1)
      .select((leftCols ++ rightPayload).map(col): _*)
  }

  /** Same semantics through the whole-operator Catalyst path: a custom
    * [[graft.plans.AsOfJoinNode]] planned by the injected
    * [[graft.plans.AsOfJoinStrategy]] into a sorted-merge
    * [[graft.plans.AsOfJoinExec]] (one shuffle + sort per side, O(1)
    * merge state). Unlike [[asofLeft]] this does not union the sides,
    * carries no marker columns through the shuffle, and places no
    * non-null contract on the payload (null payloads join exactly).
    * Right rows must still be unique per (key, ts) for a deterministic
    * winner. Rows with a null key or null ts never match.
    *
    * Catalyst treats the custom node as opaque — filters and column
    * pruning do not push THROUGH it — so project/filter both inputs
    * down to what the join needs before calling (as q22b does); the
    * children's own scans still prune/push normally.
    *
    * `rightPayload` names must not collide with `left` columns (the
    * output schema is left ++ payload), and the key/ts columns must
    * have the SAME data type on both sides — each side hash-partitions
    * by its own expression, so e.g. an int-vs-long key would send equal
    * keys to different partitions and silently lose matches. Both are
    * validated here.
    */
  def asofNative(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[String]): DataFrame = {
    requireNoCollision(left, rightPayload)
    // re-alias every right column: fresh exprIds so a self-join (both
    // sides reading the same source) can't produce ambiguous references
    val r = right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    for (c <- Seq(key, ts)) {
      val (lt, rt) = (attr(lPlan, c).dataType, attr(rPlan, c).dataType)
      require(lt == rt, s"as-of column $c type mismatch: left $lt vs right $rt")
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      left.sparkSession,
      graft.plans.AsOfJoinNode(
        lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, ts), attr(rPlan, ts),
        rightPayload.map(attr(rPlan, _))))
  }
}
