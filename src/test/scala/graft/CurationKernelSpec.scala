package graft

import graft.functions.ColumnFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled BPE merge kernel
  * ([[graft.functions.BpeMergeGreedy]]) row-for-row to the
  * window-algebra island election it replaced (lead + running-sum +
  * island row_number + lag over the exploded (doc_id, i, w) stream —
  * the formulation the generated v05/v06/x07 oracle CTEs still run
  * verbatim in DuckDB). The kernel is what every `mergeRounds` round
  * rewrites the token stream with; if its greedy left-to-right
  * semantics ever drift from the declarative form (overlap election
  * within equal-token runs, multi-island docs, boundary positions),
  * these tests fail before the oracle gate ever runs.
  */
class CurationKernelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** the pre-kernel window-algebra merge — kept HERE as the reference
    * formulation the kernel must match (the exact expression chain
    * removed from Curation.mergeRound)
    */
  private def windowMergeRef(toks: DataFrame, p1: String, p2: String): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    val wIsl = Window.partitionBy("doc_id", "island").orderBy("i")
    toks
      .withColumn("wn", lead(col("w"), 1).over(wDoc))
      .withColumn("m",
        coalesce(col("w") === lit(p1) && col("wn") === lit(p2), lit(false)))
      .withColumn("mrn", sum(when(col("m"), 1L).otherwise(0L)).over(wDoc))
      .withColumn("island", when(col("m"), col("i") - col("mrn")))
      .withColumn("rel", when(col("m"), row_number().over(wIsl) - 1))
      .withColumn("start", col("m") && col("rel") % 2 === 0)
      .withColumn("consumed", coalesce(lag(col("start"), 1).over(wDoc), lit(false)))
      .filter(!col("consumed"))
      .select(col("doc_id"), col("i"),
        when(col("start"), concat(lit(p1), lit("_"), lit(p2)))
          .otherwise(col("w")).as("w"))
  }

  /** kernel output exploded back to (doc_id, ordinal, w) for order-
    * preserving comparison (the reference keeps original gapped i, so
    * compare POSITION-ORDERED token sequences per doc)
    */
  private def seqs(df: DataFrame, ord: String, tok: String): Map[Long, Seq[String]] =
    df.select(col("doc_id"), col(ord).cast("long"), col(tok))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (d, rows) =>
        d -> rows.sortBy(_.getLong(1)).map(_.getString(2)).toSeq
      }

  private def check(corpus: Seq[(Long, Seq[String])], p1: String, p2: String): Unit = {
    val arr = corpus.toDF("doc_id", "toks")
      .select(col("doc_id"), col("toks").cast("array<string>"))
    val kernel = arr
      .select(col("doc_id"),
        posexplode(ColumnFns.bpe_merge(col("toks"), p1, p2)).as(Seq("i", "w")))
    val exploded = corpus.flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
    }.toDF("doc_id", "i", "w")
    val ref = windowMergeRef(exploded, p1, p2)
    assert(seqs(kernel, "i", "w") == seqs(ref, "i", "w"),
      s"kernel != window reference for pair ($p1,$p2) on $corpus")
  }

  test("equal-token runs elect even offsets (the island rule)") {
    check(Seq(1L -> Seq("a", "a", "a")), "a", "a")
    check(Seq(1L -> Seq("a", "a", "a", "a")), "a", "a")
    check(Seq(1L -> Seq("a", "a", "a", "a", "a")), "a", "a")
    check(Seq(1L -> Seq("b", "a", "a", "a", "b", "a", "a")), "a", "a")
  }

  test("disjoint matches all merge; boundaries and no-ops hold") {
    check(Seq(1L -> Seq("a", "b", "a", "b")), "a", "b")
    check(Seq(1L -> Seq("a", "b", "c", "a", "b")), "a", "b")
    check(Seq(1L -> Seq("x", "a", "b")), "a", "b")
    check(Seq(1L -> Seq("a", "b")), "a", "b")
    check(Seq(1L -> Seq("a")), "a", "b")
    check(Seq(1L -> Seq("")), "a", "b")
    check(Seq(1L -> Seq("x", "y", "z")), "a", "b")
    // merged-token collision: a pre-existing "a_b" token is inert
    check(Seq(1L -> Seq("a_b", "a", "b", "a_b")), "a", "b")
  }

  test("multi-doc corpora merge independently (randomized sweep)") {
    val rnd = new scala.util.Random(421701)
    val vocab = Vector("a", "b", "c", "ab", "a_b")
    val corpus = (1L to 40L).map { d =>
      d -> Vector.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.length)))
    }
    check(corpus, "a", "b")
    check(corpus, "a", "a")
    check(corpus, "c", "a")
    check(corpus, "zz", "zz") // no match anywhere: identity
  }

  test("term_counts matches the explode + groupBy aggregate form (incl. null/empty tokens)") {
    val rnd = new scala.util.Random(131717)
    val vocab = Vector("a", "b", "c", "", "aa", "b")
    val corpus: Seq[(Long, Seq[String])] = (1L to 50L).map { d =>
      d -> Vector.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.length)))
    } :+ (99L -> Seq.empty[String])
    val arr = corpus.toDF("doc_id", "toks")
      .select(col("doc_id"), col("toks").cast("array<string>"))
    val kernel = arr
      .select(col("doc_id"), explode(ColumnFns.term_counts(col("toks"))).as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val ref = arr
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(kernel == ref)
    // null tokens group as one null key, exactly like groupBy
    val withNulls = Seq((1L, Seq("a", null, "a", null, null))).toDF("doc_id", "toks")
    val kn = withNulls
      .select(col("doc_id"), explode(ColumnFns.term_counts(col("toks"))).as("tc"))
      .select(col("tc.term"), col("tc.tf"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(kn == Set((Some("a"), 2L), (None, 3L)))
  }

  test("shingle_h64s matches the array_distinct(transform) + md5 expression form") {
    val n = 3
    val maxPos = 64
    val rnd = new scala.util.Random(90517)
    val vocab = Vector("a", "b", "c", "d", "", "aa b") // incl. empty + space-bearing
    val corpus: Seq[(Long, Seq[String])] = (1L to 60L).map { d =>
      d -> Vector.fill(rnd.nextInt(80))(vocab(rnd.nextInt(vocab.length)))
    } :+ (97L -> Seq("x", "y")) :+ (98L -> Seq("x")) :+ (99L -> Seq.empty[String])
    val arr = corpus.toDF("doc_id", "toks")
      .select(col("doc_id"), col("toks").cast("array<string>"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val kernel = rows(arr.filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(ColumnFns.shingle_h64s(col("toks"), n, maxPos)).as("h64")))
    // the expression chain Dedup.shingles runs (strings then md5) —
    // kept here as the reference the kernel must match
    val ref = rows(arr.filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(expr(
          s"array_distinct(transform(sequence(0, least(size(toks) - $n, ${maxPos - 1})), " +
            s"i -> concat_ws(' ', slice(toks, i + 1, $n))))")).as("shingle"))
      .select(col("doc_id"), ColumnFns.md5_prefix64(col("shingle")).as("h64")))
    assert(kernel == ref)
    // duplicates-by-value must be preserved per doc (array_distinct is
    // by string, not by hash): a doc repeating a shingle far apart
    // yields ONE row, adjacent distinct shingles yield each row
    val dup = Seq((1L, Seq("p", "q", "r", "z", "p", "q", "r"))).toDF("doc_id", "toks")
    val k2 = dup.select(explode(ColumnFns.shingle_h64s(col("toks"), n, maxPos)))
      .count()
    assert(k2 == 4L) // pqr, qrz, rzp, zpq — the repeated pqr dedupes
  }

  test("three chained rounds match the chained window reference (v05's loop shape)") {
    val rnd = new scala.util.Random(171717)
    val vocab = Vector("a", "b", "c", "d")
    val corpus = (1L to 30L).map { d =>
      d -> Vector.fill(rnd.nextInt(10) + 1)(vocab(rnd.nextInt(vocab.length)))
    }
    // reference: explode once, chain window merges with the same
    // winner-selection rule the engine uses (tc desc, p1, p2)
    var refStream = corpus.flatMap { case (d, ts) =>
      ts.zipWithIndex.map { case (w, i) => (d, i.toLong, w) }
    }.toDF("doc_id", "i", "w")
    var arrStream = corpus.toDF("doc_id", "toks")
      .select(col("doc_id"), col("toks").cast("array<string>"))
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    for (_ <- 1 to 3) {
      val top = refStream
        .withColumn("wn", lead(col("w"), 1).over(wDoc))
        .filter(col("wn").isNotNull)
        .groupBy(col("w").as("p1"), col("wn").as("p2")).agg(count(lit(1)).as("tc"))
        .orderBy(col("tc").desc, col("p1"), col("p2")).limit(1)
        .collect()
      val (p1, p2) = (top.head.getString(0), top.head.getString(1))
      refStream = windowMergeRef(refStream, p1, p2)
      arrStream = arrStream.withColumn("toks",
        ColumnFns.bpe_merge(col("toks"), p1, p2))
    }
    val kernel = arrStream.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("i", "w")))
    assert(seqs(kernel, "i", "w") == seqs(refStream, "i", "w"))
  }
}
