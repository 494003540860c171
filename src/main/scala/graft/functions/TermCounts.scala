package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency counting as ONE in-row pass — the
  * compiled kernel under every `(doc_id, term, tf)` relation (the s12
  * inline tf, the s13/s22 standing-index build and probe slices, the
  * x09/x10 and ServeGate hybrid-release BM25 builds, t05's tf, and the
  * hybrid query-term extraction).
  *
  * `term_counts(toks)` maps a token array to
  * `array<struct<term, tf>>` in FIRST-OCCURRENCE order. The
  * `explode(split) -> groupBy(doc_id, term).count` formulation it
  * replaces shuffled the full token stream by (doc_id, term) to
  * reassemble rows that were never apart: every token of a doc lives
  * in the doc's own row, so its term histogram is a pure row-local
  * fold. Exploding the RESULT yields the identical (doc_id, term, tf)
  * multiset with zero exchanges — downstream term- or doc-keyed
  * aggregates (df, dl) then ship partial-aggregate-sized rows only.
  *
  * Semantics match the aggregate form exactly: null tokens group as
  * one null key (emitted with a null term, tf = their count), empty
  * strings are ordinary terms, a null array stays null (the image of
  * explode dropping the doc).
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TermCounts.OutType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"term_counts needs an array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.count($c);")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)

  override def prettyName: String = "term_counts"
}

object TermCounts {

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = true),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  /** the in-row histogram fold; called from both interpreted eval and
    * generated code
    */
  def count(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    // first-occurrence order: LinkedHashMap keeps emission deterministic
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](Math.max(8, n))
    var nulls = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) nulls += 1L
      else {
        val w = toks.getUTF8String(i)
        val cnt = m.get(w)
        if (cnt == null) m.put(w, Array(1L)) else cnt(0) += 1L
      }
      i += 1
    }
    val out = new Array[AnyRef](m.size + (if (nulls > 0) 1 else 0))
    var k = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue()(0))
      k += 1
    }
    if (nulls > 0) { out(k) = InternalRow(null, nulls) }
    new GenericArrayData(out)
  }
}
