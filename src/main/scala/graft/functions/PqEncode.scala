package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization encode of one embedding against a FROZEN
  * codebook — the compiled kernel under `Similarity.pqEncodeWith`
  * (e02/s08/s09/s10 and every standing-index build).
  *
  * The codebook rides INSIDE the expression (ascending-code arrays, at
  * most PqCodewords rows), so the encode is a pure map over the corpus
  * scan — zero exchanges — and the m x |codes| x subDims argmin loop
  * runs as one compiled method instead of ~1k interpreted higher-order
  * `aggregate`/`element_at` nodes per row (measured 'x7 on the e02
  * corpus at sf0.1).
  *
  * Numeric contract (oracle parity, bit-for-bit with the HOF
  * formulation it replaces — SimilaritySpec pins the equivalence):
  * per subspace `s`, d(c) = round6(sum_i pow(emb[s*sub+i] -
  * cv[s*sub+i], 2)) accumulated in index order with `Math.pow(x, 2.0)`
  * (NOT x*x — the exact arithmetic of the expression tree this
  * compiles), round6 = Spark Round's double path (NaN/Inf passthrough,
  * else BigDecimal.valueOf + setScale(6, HALF_UP)); the argmin fold
  * runs in ascending-code order with a strict less-than, so ties keep
  * the LOWEST code — the oracle's ORDER BY d ASC, code ASC. The result
  * packs each subspace's code into 4 bits: sum_s code_s * 2^(4s).
  *
  * Degenerate inputs keep the fold shape's documented semantics: a
  * null embedding, or a subspace with any null / out-of-range element,
  * nulls every candidate distance equally, and the subspace encodes to
  * the LOWEST code (never a null pq) — so `nullable` is false.
  */
case class PqEncodePack(
    child: Expression,
    codes: IndexedSeq[Long],
    cvs: IndexedSeq[IndexedSeq[Double]],
    m: Int) extends UnaryExpression {

  require(codes.nonEmpty && codes.length == cvs.length,
    s"codebook shape: ${codes.length} codes vs ${cvs.length} codewords")
  require(codes == codes.sorted, "codes must be ascending (tie-break contract)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs a float/double array, got $other")
    }

  @transient private lazy val codesArr: Array[Long] = codes.toArray
  @transient private lazy val cvsArr: Array[Array[Double]] = cvs.map(_.toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqEncodePack.encode(v.asInstanceOf[ArrayData], isFloat, codesArr, cvsArr, m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val codesRef = ctx.addReferenceObj("pqCodes", codesArr, "long[]")
    val cvsRef = ctx.addReferenceObj("pqCvs", cvsArr, "double[][]")
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = graft.functions.PqEncodePack.encode(
          ${childGen.isNull} ? null : ${childGen.value},
          $isFloat, $codesRef, $cvsRef, $m);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodePack =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"

  // the default toString would inline every codeword into plan dumps
  override def toString: String =
    s"pq_encode($child, m=$m, codewords=${codes.length})"
}

/** Two-level (residual) PQ encode of one embedding — the compiled
  * kernel under `Similarity.residualPqEncodeWith` (e04, the s26/s27
  * RQ family, and the x09/x10 serving-index builds via
  * `ivfRqIndexRows`). Level 1 encodes against `cvs1` exactly like
  * [[PqEncodePack]]; level 2 encodes the level-1 residual (exact
  * double subtraction against the chosen codeword) against the
  * full-dim concatenated level-2 codewords `wvs2`. Per-subspace
  * distances are the same round6 doubles as the expression tree this
  * compiles; the error sums accumulate them as exact decimal
  * micro-units (the cast-to-DECIMAL(18,6)-and-sum discipline), so
  * `err1`/`err2` are bit-identical to the composed formulation.
  *
  * Output struct: (pq BIGINT, pq2 BIGINT, err1 DOUBLE, err2 DOUBLE).
  * A degenerate subspace (null / missing elements, or a non-finite
  * best distance) encodes both levels to the LOWEST code and nulls
  * both error sums — the image of the old shape's null-propagating
  * decimal sum.
  */
case class PqResidualPack(
    child: Expression,
    codes1: IndexedSeq[Long],
    cvs1: IndexedSeq[IndexedSeq[Double]],
    codes2: IndexedSeq[Long],
    wvs2: IndexedSeq[IndexedSeq[Double]],
    m: Int) extends UnaryExpression {

  require(codes1.nonEmpty && codes1.length == cvs1.length, "level-1 codebook shape")
  require(codes2.nonEmpty && codes2.length == wvs2.length, "level-2 codebook shape")
  require(codes1 == codes1.sorted && codes2 == codes2.sorted,
    "codes must be ascending (tie-break contract)")

  override def dataType: DataType = StructType(Seq(
    StructField("pq", LongType, nullable = false),
    StructField("pq2", LongType, nullable = false),
    StructField("err1", DoubleType, nullable = true),
    StructField("err2", DoubleType, nullable = true)))
  override def nullable: Boolean = false

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_residual_encode needs a float/double array, got $other")
    }

  @transient private lazy val codes1Arr: Array[Long] = codes1.toArray
  @transient private lazy val cvs1Arr: Array[Array[Double]] = cvs1.map(_.toArray).toArray
  @transient private lazy val codes2Arr: Array[Long] = codes2.toArray
  @transient private lazy val wvs2Arr: Array[Array[Double]] = wvs2.map(_.toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    PqResidualPack.encode(v.asInstanceOf[ArrayData], isFloat,
      codes1Arr, cvs1Arr, codes2Arr, wvs2Arr, m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val c1 = ctx.addReferenceObj("rqCodes1", codes1Arr, "long[]")
    val v1 = ctx.addReferenceObj("rqCvs1", cvs1Arr, "double[][]")
    val c2 = ctx.addReferenceObj("rqCodes2", codes2Arr, "long[]")
    val v2 = ctx.addReferenceObj("rqWvs2", wvs2Arr, "double[][]")
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.functions.PqResidualPack.encode(
          ${childGen.isNull} ? null : ${childGen.value},
          $isFloat, $c1, $v1, $c2, $v2, $m);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqResidualPack =
    copy(child = newChild)

  override def prettyName: String = "pq_residual_encode"

  // the default toString would inline every codeword into plan dumps
  override def toString: String =
    s"pq_residual_encode($child, m=$m, codewords=${codes1.length}+${codes2.length})"
}

object PqResidualPack {

  /** the compiled two-level argmin-and-pack; called from both
    * interpreted eval and generated code
    */
  def encode(
      emb: ArrayData,
      isFloat: Boolean,
      codes1: Array[Long],
      cvs1: Array[Array[Double]],
      codes2: Array[Long],
      wvs2: Array[Array[Double]],
      m: Int): InternalRow = {
    val dims = cvs1(0).length
    val sub = dims / m
    val n = if (emb == null) 0 else emb.numElements()
    val res = new Array[Double](sub)
    var pq = 0L; var pq2 = 0L
    var e1 = 0L; var e2 = 0L
    var errsValid = true
    var s = 0
    while (s < m) {
      val base = s * sub
      var code1 = codes1(0); var code2 = codes2(0)
      var valid = base + sub <= n
      var i = 0
      while (valid && i < sub) {
        if (emb.isNullAt(base + i)) valid = false
        i += 1
      }
      if (valid) {
        // level 1: argmin over the frozen codebooks (ascending code,
        // strict <, same round6'd Math.pow sum as the HOF tree)
        var bestD1 = Double.PositiveInfinity; var bestIdx = 0
        var c = 0
        while (c < cvs1.length) {
          val cv = cvs1(c)
          var d = 0.0
          var j = 0
          while (j < sub) {
            val x = (if (isFloat) emb.getFloat(base + j).toDouble
                     else emb.getDouble(base + j)) - cv(base + j)
            d += Math.pow(x, 2.0)
            j += 1
          }
          d = PqEncodePack.round6(d)
          if (d < bestD1) { bestD1 = d; bestIdx = c }
          c += 1
        }
        code1 = codes1(bestIdx)
        // the level-1 residual of this subspace (exact double subtract)
        var j = 0
        while (j < sub) {
          res(j) = (if (isFloat) emb.getFloat(base + j).toDouble
                    else emb.getDouble(base + j)) - cvs1(bestIdx)(base + j)
          j += 1
        }
        // level 2: argmin of the residual over the residual codewords
        var bestD2 = Double.PositiveInfinity; var bestIdx2 = 0
        c = 0
        while (c < wvs2.length) {
          val w = wvs2(c)
          var d = 0.0
          var k = 0
          while (k < sub) {
            val x = res(k) - w(base + k)
            d += Math.pow(x, 2.0)
            k += 1
          }
          d = PqEncodePack.round6(d)
          if (d < bestD2) { bestD2 = d; bestIdx2 = c }
          c += 1
        }
        code2 = codes2(bestIdx2)
        if (java.lang.Double.isFinite(bestD1) && java.lang.Double.isFinite(bestD2)) {
          // exact decimal accumulation: round6'd distances are 6-dp
          // decimals, so micro-units are integers (the
          // cast(DECIMAL(18,6)) + sum image)
          e1 += Math.round(bestD1 * 1e6)
          e2 += Math.round(bestD2 * 1e6)
        } else errsValid = false
      } else errsValid = false
      pq += code1 * (1L << (4 * s))
      pq2 += code2 * (1L << (4 * s))
      s += 1
    }
    InternalRow(pq, pq2,
      if (errsValid) (e1.toDouble / 1e6): java.lang.Double else null,
      if (errsValid) (e2.toDouble / 1e6): java.lang.Double else null)
  }
}

object PqEncodePack {

  /** Spark Round's DoubleType path, exactly (decompiled contract:
    * NaN/Inf passthrough, else scala BigDecimal(d) == valueOf(d), then
    * setScale(6, HALF_UP))
    */
  private[functions] def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** the compiled argmin-and-pack loop; called from both interpreted
    * eval and generated code
    */
  def encode(
      emb: ArrayData,
      isFloat: Boolean,
      codes: Array[Long],
      cvs: Array[Array[Double]],
      m: Int): Long = {
    val dims = cvs(0).length
    val sub = dims / m
    val n = if (emb == null) 0 else emb.numElements()
    var pq = 0L
    var s = 0
    while (s < m) {
      val base = s * sub
      var bestCode = codes(0)
      // a subspace touching any null / missing element nulls EVERY
      // candidate's distance -> lowest code (the fold shape's coalesce
      // discipline)
      var valid = base + sub <= n
      var i = 0
      while (valid && i < sub) {
        if (emb.isNullAt(base + i)) valid = false
        i += 1
      }
      if (valid) {
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cvs.length) {
          val cv = cvs(c)
          var d = 0.0
          var j = 0
          while (j < sub) {
            val x = (if (isFloat) emb.getFloat(base + j).toDouble
                     else emb.getDouble(base + j)) - cv(base + j)
            d += Math.pow(x, 2.0)
            j += 1
          }
          d = round6(d)
          if (d < bestD) { bestD = d; bestCode = codes(c) }
          c += 1
        }
      }
      pq += bestCode * (1L << (4 * s))
      s += 1
    }
    pq
  }
}
