package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling straight to the 60-bit md5 image — the
  * compiled kernel under the h64-keyed dedup pipelines (d03/d05/d08/
  * d11/d15/d17/d18, their composed x-entries, and the streaming
  * near-dup gate).
  *
  * `shingle_h64s(toks, n, maxPos)` maps a token array to the array of
  * 60-bit hashes of its DISTINCT n-gram shingles over the first
  * `maxPos` positions, in first-occurrence order. It is the one-pass
  * compiled image of the expression chain it replaces —
  * `array_distinct(transform(sequence(0, least(size - n, maxPos - 1)),
  * i -> concat_ws(' ', slice(toks, i + 1, n))))` exploded through
  * `md5_prefix64` — which ran as interpreted higher-order nodes
  * allocating a sliced array and a joined string per position, before
  * a per-row md5 expression. Distinctness is by the shingle STRING
  * (exactly `array_distinct`'s rule): two distinct shingles colliding
  * in h64 still emit two (equal) hash rows, so downstream df counts
  * and intersections match the old shape bit-for-bit
  * (CurationKernelSpec pins the equivalence).
  *
  * Degenerate inputs follow the expression form: fewer than n tokens
  * would make `sequence` descend, so CALLERS filter `size >= n` (the
  * kernel returns an empty array for safety); null tokens (absent from
  * `split` output) are skipped inside a shingle exactly like
  * `concat_ws`; a null array stays null.
  */
case class ShingleH64s(child: Expression, n: Int, maxPos: Int)
    extends UnaryExpression {

  require(n >= 1 && maxPos >= 1, "shingle_h64s: n and maxPos must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_h64s needs an array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleH64s.hashes(input.asInstanceOf[ArrayData], n, maxPos)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleH64s.hashes($c, $n, $maxPos);")

  override protected def withNewChildInternal(newChild: Expression): ShingleH64s =
    copy(child = newChild)

  override def prettyName: String = "shingle_h64s"

  override def toString: String = s"shingle_h64s($child, n=$n, maxPos=$maxPos)"
}

object ShingleH64s {

  private val Space = UTF8String.fromString(" ")

  /** the one-pass shingle+hash fold; called from both interpreted eval
    * and generated code
    */
  def hashes(toks: ArrayData, n: Int, maxPos: Int): ArrayData = {
    val size = toks.numElements()
    val count = Math.min(size - n + 1, maxPos)
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    // distinct by the SHINGLE STRING, first-occurrence order — the
    // array_distinct contract (h64 collisions still emit both rows)
    val seen = new java.util.LinkedHashSet[UTF8String](Math.max(8, count))
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) {
        // concat_ws skips nulls; split output never contains them
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Long](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) {
      out(k) = HashUtil.md5Prefix64(it.next().getBytes)
      k += 1
    }
    new GenericArrayData(out)
  }
}
