package graft

import graft.functions.{PqEncodePack, PqResidualPack}
import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, FloatType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled PQ kernels ([[PqEncodePack]] / [[PqResidualPack]])
  * bit-for-bit to the composed-operator formulations they replaced
  * (crossJoin(broadcast) + groupBy min-struct argmin over round6'd
  * higher-order subspace distances — the r9-certified expression
  * tree). The kernels are what e02/e04, the s08-s10/s26-s27 search
  * families, and the x09/x10 serving builds encode with; if their
  * arithmetic ever drifts from the declarative form (rounding mode,
  * accumulation order, tie-break, degenerate-input handling), these
  * tests fail before the DuckDB oracle gate ever runs.
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  private def emb: DataFrame = Tables.embeddings(spark, sf)

  /** squared-L2 between subspace s of `emb` and `cv`, exactly as the
    * pre-kernel expression tree computed it (pow + index-order
    * accumulate + round6)
    */
  private def subDistRef(s: Int, sub: Int) =
    round(
      aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0),
        (acc, i) => acc +
          pow(element_at(col("embedding"), lit(s * sub) + i + 1).cast(DoubleType) -
            element_at(col("cv"), lit(s * sub) + i + 1).cast(DoubleType), 2.0)),
      6)

  /** the composed (pre-kernel) PQ encode — kept HERE as the reference
    * formulation the kernel must match
    */
  private def composedPqEncode(embeddings: DataFrame, books: DataFrame): DataFrame = {
    val sub = Similarity.Dims / Similarity.PqM
    val aggs = (0 until Similarity.PqM).map(s =>
      min(struct(subDistRef(s, sub), col("code"))).as(s"b$s"))
    embeddings
      .crossJoin(broadcast(books))
      .groupBy("vec_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        (0 until Similarity.PqM).map(s => col(s"b$s.code") * lit(1L << (4 * s)))
          .reduce(_ + _).as("pq"))
  }

  /** the composed (pre-kernel) two-level residual encode */
  private def composedResidualEncode(
      embeddings: DataFrame, books1: DataFrame, books2: DataFrame): DataFrame = {
    val sub = Similarity.Dims / Similarity.PqM
    def resExpr(s: Int) = expr(
      s"transform(sequence(0, ${sub - 1}), i -> " +
        s"cast(element_at(embedding, ${s * sub} + i + 1) as double) - " +
        s"cast(element_at(cv, ${s * sub} + i + 1) as double))")
    val aggs1 = (0 until Similarity.PqM).map(s =>
      min(struct(subDistRef(s, sub).as("d"), col("code").as("code"),
        resExpr(s).as("r"))).as(s"b$s"))
    val lvl1 = embeddings
      .crossJoin(broadcast(books1))
      .groupBy("vec_id")
      .agg(aggs1.head, aggs1.tail: _*)
      .select(
        (col("vec_id") +:
          (0 until Similarity.PqM).map(s => col(s"b$s.code") * lit(1L << (4 * s)))
            .reduce(_ + _).as("pq") +:
          (0 until Similarity.PqM).map(s => col(s"b$s.d").cast(DecimalType(18, 6)))
            .reduce(_ + _).as("err1") +:
          (0 until Similarity.PqM).map(s => col(s"b$s.r").as(s"r$s"))): _*)
    def dist2(s: Int) =
      round(
        aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0),
          (acc, i) => acc +
            pow(element_at(col(s"r$s"), i + 1) - element_at(col(s"w$s"), i + 1), 2.0)),
        6)
    val aggs2 = (0 until Similarity.PqM).map(s =>
      min(struct(dist2(s).as("d"), col("code2").as("code2"))).as(s"c$s"))
    lvl1
      .crossJoin(broadcast(books2))
      .groupBy("vec_id", "pq", "err1")
      .agg(aggs2.head, aggs2.tail: _*)
      .select(
        col("vec_id"),
        col("pq"),
        (0 until Similarity.PqM).map(s => col(s"c$s.code2") * lit(1L << (4 * s)))
          .reduce(_ + _).as("pq2"),
        col("err1").cast(DoubleType).as("err1"),
        (0 until Similarity.PqM).map(s => col(s"c$s.d").cast(DecimalType(18, 6)))
          .reduce(_ + _).cast(DoubleType).as("err2"))
  }

  test("compiled pq_encode == composed formulation, bit-for-bit, whole corpus") {
    val books = Similarity.sampledCodebooks(emb)
    val kernel = Similarity.pqEncodeWith(emb, books)
    val composed = composedPqEncode(emb, books)
    assert(kernel.exceptAll(composed).count() == 0 &&
      composed.exceptAll(kernel).count() == 0,
      "pq codes diverged between the compiled kernel and the expression tree")
    assert(kernel.count() == emb.count())
  }

  test("compiled residual encode == composed two-level formulation, bit-for-bit") {
    val books1 = Similarity.sampledCodebooks(emb)
    val books2 = Similarity.residualCodebooksWide(emb, books1)
    val kernel = Similarity.residualPqEncodeWith(emb, books1, books2)
    val composed = composedResidualEncode(emb, books1, books2)
    assert(kernel.exceptAll(composed).count() == 0 &&
      composed.exceptAll(kernel).count() == 0,
      "residual encode diverged between the compiled kernel and the expression tree")
    // the errors are real doubles with exact decimal accumulation —
    // non-degenerate corpus must yield non-null errs
    assert(kernel.filter(col("err1").isNull || col("err2").isNull).count() == 0)
  }

  test("kernel degenerate semantics: null / short / null-element embeddings take the lowest code") {
    val codes = Array(0L, 1L)
    val cvs = Array(
      Array.fill(Similarity.Dims)(0.0),
      Array.fill(Similarity.Dims)(5.0))
    val m = Similarity.PqM
    def enc(a: GenericArrayData) =
      PqEncodePack.encode(a, false, codes, cvs, m)
    // null embedding -> every subspace at the lowest code (0) -> pq 0
    assert(PqEncodePack.encode(null, false, codes, cvs, m) == 0L)
    // short embedding: in-range subspaces encode normally (all-2.0 is
    // nearer codeword 0 than codeword 5), missing subspaces take code 0
    val short = new GenericArrayData(Array.fill(8)(2.0).map(x => x: Any))
    assert(enc(short) == 0L)
    // a null element poisons ONLY its subspace
    val withNull: Array[Any] = Array.fill[Any](Similarity.Dims)(4.0)
    withNull(9) = null // subspace 1
    val full = new GenericArrayData(Array.fill[Any](Similarity.Dims)(4.0))
    val poisoned = new GenericArrayData(withNull)
    val fullPq = enc(full)
    val poisonedPq = enc(poisoned)
    // 4.0 is nearer 5.0: full encodes every subspace to code 1
    assert(fullPq == (0 until m).map(s => 1L << (4 * s)).sum)
    // poisoned: subspace 1 drops to code 0, all others unchanged
    assert(poisonedPq == fullPq - (1L << 4))
    // residual kernel: the same poisoning nulls both error sums but
    // still packs both levels
    val row = PqResidualPack.encode(poisoned, false, codes, cvs, codes, cvs, m)
    assert(!row.isNullAt(0) && !row.isNullAt(1))
    assert(row.isNullAt(2) && row.isNullAt(3),
      "a degenerate subspace must null the error sums")
    val clean = PqResidualPack.encode(full, false, codes, cvs, codes, cvs, m)
    assert(!clean.isNullAt(2) && !clean.isNullAt(3))
  }

  test("hyperplane_bands kernel matches the per-plane aggregate(zip_with) form") {
    import spark.implicits._
    val planes = 12
    val bandBits = 4
    // degenerate rows alongside the real corpus: null embedding, short
    // array, null element — each must land every band on bv = 0 in
    // BOTH formulations
    val weird = Seq[(Long, Seq[java.lang.Float])](
      (100001L, null),
      (100002L, Seq(1.0f, -2.0f)),
      (100003L, (0 until Similarity.Dims).map(d =>
        if (d == 7) null else java.lang.Float.valueOf(d.toFloat - 30f))))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast(ArrayType(FloatType)))
    val base = emb.select(col("vec_id"), col("embedding")).limit(200)
      .unionByName(weird)
    // the pre-kernel expression chain — kept HERE as the reference
    val refBands = {
      val bandCols = (0 until planes / bandBits).map { b =>
        val bv = (0 until bandBits)
          .map { i =>
            val p = b * bandBits + i
            val w = array((0 until Similarity.Dims).map(d =>
              lit(Similarity.weight(p, d))): _*)
            when(Similarity.dot(col("embedding"), w) > 0, lit(1L << i))
              .otherwise(lit(0L))
          }
          .reduce(_ + _)
        struct(lit(b).as("band"), bv.as("bv"))
      }
      base.select(col("vec_id"), explode(array(bandCols: _*)).as("bd"))
        .select(col("vec_id"), col("bd.band"), col("bd.bv"))
    }
    val kernel = Similarity.hyperplaneBands(base, planes, bandBits)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows(kernel) == rows(refBands))
    // every degenerate row must be PRESENT with all-zero band values
    val weirdRows = kernel.filter(col("vec_id") >= 100001L).collect()
    assert(weirdRows.length == 3 * planes / bandBits)
    assert(weirdRows.forall(_.getLong(2) == 0L))
  }
}
