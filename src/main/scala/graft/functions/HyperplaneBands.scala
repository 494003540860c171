package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH banding of one embedding — the compiled
  * kernel under `Similarity.hyperplaneBands` (d06/d10/d14's banded
  * candidate generation, x05's cluster stage, the semantic streaming
  * gate, and ScaleProbe's dedup-tail probes).
  *
  * The ±1 hyperplane weights (md5-derived, oracle-shared) ride INSIDE
  * the expression, and all `planes` sign tests run as one compiled
  * loop per row. The expression tree this replaces evaluated one
  * interpreted `aggregate(zip_with(...))` dot product per plane —
  * allocating a 64-element product array each — under a 64-literal
  * CreateArray per plane.
  *
  * Numeric contract (SimilaritySpec pins row equality): the dot is the
  * HOF's left fold in index order over (double)emb[d] * w[d]; the sign
  * test is a strict `> 0`. Degenerate inputs keep the expression
  * form's coalesce discipline: a null embedding, a length != Dims, or
  * any null element nulls every plane's dot, and `when(dot > 0, bit)
  * .otherwise(0)` then lands every band on bv = 0 — so the kernel
  * emits all-zero band values (never a null row) and `nullable` is
  * false.
  *
  * Output: array<struct<band INT, bv BIGINT>> of length
  * planes / bandBits, band b packing bits i of planes b*bandBits+i.
  */
case class HyperplaneBandsPack(
    child: Expression,
    weights: IndexedSeq[IndexedSeq[Double]],
    bandBits: Int) extends UnaryExpression {

  require(weights.nonEmpty && bandBits >= 1 && weights.length % bandBits == 0,
    s"plane count ${weights.length} must be a positive multiple of bandBits=$bandBits")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("bv", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bands needs a float/double array, got $other")
    }

  @transient private lazy val wArr: Array[Array[Double]] = weights.map(_.toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    HyperplaneBandsPack.bands(v.asInstanceOf[ArrayData], isFloat, wArr, bandBits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("hpWeights", wArr, "double[][]")
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.HyperplaneBandsPack.bands(
          ${childGen.isNull} ? null : ${childGen.value},
          $isFloat, $wRef, $bandBits);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandsPack =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bands"

  // the default toString would inline every weight into plan dumps
  override def toString: String =
    s"hyperplane_bands($child, planes=${weights.length}, bandBits=$bandBits)"
}

object HyperplaneBandsPack {

  /** the compiled sign-test-and-pack loop; called from both
    * interpreted eval and generated code
    */
  def bands(
      emb: ArrayData,
      isFloat: Boolean,
      weights: Array[Array[Double]],
      bandBits: Int): ArrayData = {
    val dims = weights(0).length
    val nBands = weights.length / bandBits
    // the HOF form's zip_with pads length mismatches with null and a
    // null element nulls the fold, so ANY irregular input lands every
    // plane's when(...) on the otherwise(0) branch
    var valid = emb != null && emb.numElements() == dims
    if (valid) {
      var d = 0
      while (valid && d < dims) {
        if (emb.isNullAt(d)) valid = false
        d += 1
      }
    }
    val out = new Array[AnyRef](nBands)
    var b = 0
    while (b < nBands) {
      var bv = 0L
      if (valid) {
        var i = 0
        while (i < bandBits) {
          val w = weights(b * bandBits + i)
          var acc = 0.0
          var d = 0
          while (d < dims) {
            acc += (if (isFloat) emb.getFloat(d).toDouble else emb.getDouble(d)) * w(d)
            d += 1
          }
          if (acc > 0) bv += (1L << i)
          i += 1
        }
      }
      out(b) = InternalRow(b, bv)
      b += 1
    }
    new GenericArrayData(out)
  }
}
