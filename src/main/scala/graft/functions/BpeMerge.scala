package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One greedy left-to-right BPE merge pass over a token ARRAY — the
  * compiled kernel under the v05/v06/v08/x07 merge rounds.
  *
  * The winning pair is known driver-side when each round's plan is
  * built (`mergeRounds` collects the 1-row argmax to emit the merge
  * table), so it rides INSIDE the expression and the round's stream
  * rewrite is a pure map over the cached token arrays — zero
  * exchanges, no per-round doc_id repartition, no window sorts. The
  * previous shape ran six chained window functions (lead, running sum,
  * island row_number, lag) over the fully EXPLODED (doc_id, i, w)
  * stream, paying a full-stream exchange + two sorts per round.
  *
  * Semantics (oracle parity with the window algebra it replaces —
  * CurationKernelSpec pins row-for-row equality): scan ascending; an
  * unconsumed position i with (toks[i], toks[i+1]) == (p1, p2) merges
  * into `p1_p2` and consumes i+1; merged or not, scanning resumes
  * after the position — exactly the island/even-offset election of the
  * window form (within a run of overlapping matches, which requires
  * p1 == p2, the even offsets merge). Null elements (absent from
  * `split` output, but typed possible) compare unequal and pass
  * through. A null array stays null.
  */
case class BpeMergeGreedy(child: Expression, p1: String, p2: String)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge needs an array<string>, got $other")
    }

  @transient private lazy val p1U: UTF8String = UTF8String.fromString(p1)
  @transient private lazy val p2U: UTF8String = UTF8String.fromString(p2)
  @transient private lazy val mergedU: UTF8String =
    UTF8String.fromString(p1 + "_" + p2)

  override protected def nullSafeEval(input: Any): Any =
    BpeMergeGreedy.merge(input.asInstanceOf[ArrayData], p1U, p2U, mergedU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p1Ref = ctx.addReferenceObj("bpeP1", p1U, "UTF8String")
    val p2Ref = ctx.addReferenceObj("bpeP2", p2U, "UTF8String")
    val mRef = ctx.addReferenceObj("bpeMerged", mergedU, "UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeMergeGreedy.merge($c, $p1Ref, $p2Ref, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeGreedy =
    copy(child = newChild)

  override def prettyName: String = "bpe_merge"

  override def toString: String = s"bpe_merge($child, $p1, $p2)"
}

object BpeMergeGreedy {

  /** the compiled greedy merge pass; called from both interpreted eval
    * and generated code
    */
  def merge(toks: ArrayData, p1: UTF8String, p2: UTF8String,
      merged: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    var k = 0
    while (i < n) {
      val w = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (i + 1 < n && w != null && w.equals(p1) && !toks.isNullAt(i + 1) &&
          toks.getUTF8String(i + 1).equals(p2)) {
        out(k) = merged
        i += 2
      } else {
        out(k) = w
        i += 1
      }
      k += 1
    }
    if (k == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}
