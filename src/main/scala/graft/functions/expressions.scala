package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the codecs Spark lacks (SURVEY §4.2
  * "custom work actually needed"): CBOR envelope encode/decode (S6/S14)
  * and base58 for the hash columns. Each is a null-intolerant unary
  * expression evaluated per-row on executors; CodegenFallback keeps them
  * inside the generated pipeline (one virtual call per row) without
  * hand-written codegen.
  */

/** json string -> CBOR bytes (the reference's `.to_cbor()`, main.rs:377) */
case class JsonToCbor(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = Cbor.jsonToCbor(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): JsonToCbor = copy(c)
  override def prettyName: String = "to_cbor"
}

/** CBOR bytes -> json string (consumer decode path, consumer
  * main.rs:263-266)
  */
case class CborToJson(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Cbor.cborToJson(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): CborToJson = copy(c)
  override def prettyName: String = "from_cbor"
}

/** base58 string -> decoded bytes */
case class Base58Decode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = Base58.decode(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Base58Decode = copy(c)
  override def prettyName: String = "base58_decode"
}

/** bytes -> base58 string */
case class Base58Encode(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Base58.encode(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): Base58Encode = copy(c)
  override def prettyName: String = "base58_encode"
}

/** The 60-bit md5 image used across the dedup pipelines.
  * [[Md5Prefix64]] computes it from the digest bytes directly.
  */
object HashUtil {
  /** ≡ `cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)`: the first
    * 15 hex chars are the top 60 bits of the first 8 digest bytes
    */
  def md5Prefix64(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Bit-interleave the low 32 bits of x and y into a 64-bit Z-order
    * (Morton) key: bit b of x lands at position 2b, bit b of y at
    * 2b+1. Sorting/partitioning a lake by this key co-locates rows
    * that are close in BOTH dimensions, so min/max parquet zone maps
    * prune 2-D range predicates — the standard layout technique for
    * 100 TB scans.
    */
  def zorder2(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      var r = v & 0xffffffffL
      r = (r | (r << 16)) & 0x0000ffff0000ffffL
      r = (r | (r << 8)) & 0x00ff00ff00ff00ffL
      r = (r | (r << 4)) & 0x0f0f0f0f0f0f0f0fL
      r = (r | (r << 2)) & 0x3333333333333333L
      r = (r | (r << 1)) & 0x5555555555555555L
      r
    }
    spread(x) | (spread(y) << 1)
  }

  /** 48-bit SimHash over space-separated words — the single-pass native
    * form of the HOF pipeline `aggregate(transform(split(text,' '),
    * md5_prefix64), votes…)`: one MD5 per word, a 48-wide vote
    * accumulator, sign bits packed at the end. Word splitting keeps
    * empty tokens (including a trailing one) to match `split(text,' ')`
    * / DuckDB `string_split` semantics exactly — oracle parity depends
    * on hashing the same token stream.
    */
  def simhash48(text: UTF8String): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](48)
    val md = java.security.MessageDigest.getInstance("MD5")
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = h >>> 4
        var b = 0
        while (b < 48) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 48) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Unicode text-normalization kernel (see [[NfcNormalize]]). */
object TextNorm {
  /** NFC-normalize a UTF8String. Fast path: NFC is the identity on
    * pure-ASCII input (the overwhelming majority of an English corpus),
    * detectable from the raw UTF-8 bytes without decoding — so the
    * common case is one byte scan, no String round-trip, no Normalizer
    * call. Only rows with a high byte pay the decode+normalize cost.
    */
  def nfc(s: UTF8String): UTF8String = {
    // scan in place via getByte: getBytes would memcpy the text out of
    // its UnsafeRow buffer for every row, defeating the fast path
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0)
        return UTF8String.fromString(
          java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
      i += 1
    }
    s
  }
}

/** Native codegen NFC normalization — canonical composition of combining
  * sequences (e + U+0301 -> é), the first step of any text-curation
  * pipeline (mixed-provenance corpora carry both encodings of the same
  * visible text, which breaks exact dedup and fingerprinting). Spark has
  * no builtin for this; DuckDB's `nfc_normalize` is the oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = TextNorm.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
  override def prettyName: String = "nfc_normalize"
}

/** Native codegen form of the dedup hash
  * `conv(substr(md5(s), 1, 15), 16, 10)` — same 60-bit value (oracle
  * parity preserved, property-tested in CodecSpec) without
  * materializing the 32-char hex string, the substring copy, or the
  * radix re-parse per row. This sits in the innermost loop of
  * shingle/minhash pipelines (one call per distinct shingle).
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashUtil.md5Prefix64(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.md5Prefix64($c.getBytes())")
  override protected def withNewChildInternal(c: Expression): Md5Prefix64 = copy(c)
  override def prettyName: String = "md5_prefix64"
}

/** Native codegen 48-bit SimHash (see [[HashUtil.simhash48]]) — replaces
  * a 4-level interpreted HOF pipeline (split → transform-md5 → zip_with
  * vote fold → bit pack) with one static call per row. Same signature
  * bits, oracle parity verified by the d04 gate.
  */
case class SimHash48(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashUtil.simhash48(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.simhash48($c)")
  override protected def withNewChildInternal(c: Expression): SimHash48 = copy(c)
  override def prettyName: String = "simhash48"
}

/** Native codegen Z-order (Morton) key over two long columns — the
  * lake-clustering sort key (see [[HashUtil.zorder2]]).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  // ImplicitCast (not bare ExpectsInputTypes): SQL integer literals —
  // `zorder2(5, 9)`, the common spelling — widen int -> bigint like any
  // numeric builtin, while string inputs still fail analysis under ANSI
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    HashUtil.zorder2(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashUtil.zorder2($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(l, r)
  override def prettyName: String = "zorder2"
}

/** Column-level entry points (the user-facing function surface). */
object ColumnFns {
  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  def to_cbor(col: Column): Column = c(JsonToCbor(e(col)))
  def from_cbor(col: Column): Column = c(CborToJson(e(col)))
  def base58_decode(col: Column): Column = c(Base58Decode(e(col)))
  def base58_encode(col: Column): Column = c(Base58Encode(e(col)))
  def lz4_compress(col: Column): Column = c(Lz4Compress(e(col)))
  def lz4_decompress(col: Column): Column = c(Lz4Decompress(e(col)))
  def zstd_compress(col: Column): Column = c(ZstdCompress(e(col)))
  def zstd_decompress(col: Column): Column = c(ZstdDecompress(e(col)))
  def md5_prefix64(col: Column): Column = c(Md5Prefix64(e(col)))
  def simhash48(col: Column): Column = c(SimHash48(e(col)))
  def zorder2(x: Column, y: Column): Column = c(ZOrder2(e(x), e(y)))
  def nfc_normalize(col: Column): Column = c(NfcNormalize(e(col)))
  def bpe_merge(col: Column, p1: String, p2: String): Column =
    c(BpeMergeGreedy(e(col), p1, p2))
  def term_counts(col: Column): Column = c(TermCounts(e(col)))
  def shingle_h64s(col: Column, n: Int, maxPos: Int): Column =
    c(ShingleH64s(e(col), n, maxPos))

  /** name -> builder for every SQL-callable engine function: the ONE
    * list both [[register]] (temp functions on an existing session) and
    * [[graft.plans.GraftExtensions]] (`injectFunction`, so a SQL-only
    * user configuring `spark.sql.extensions=graft.plans.GraftExtensions`
    * gets the full surface with zero graft API calls) draw from.
    */
  // arity-checked builders: a wrong-arity SQL call gets a clean
  // "<name> expects N arguments" instead of a raw NoSuchElementException
  // out of args.head during resolution
  private def unary(name: String, f: Expression => Expression) =
    name -> ((args: Seq[Expression]) => {
      require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
      f(args.head)
    })
  private def binary(name: String, f: (Expression, Expression) => Expression) =
    name -> ((args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      f(args(0), args(1))
    })

  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    unary("md5_prefix64", Md5Prefix64.apply),
    unary("simhash48", SimHash48.apply),
    binary("zorder2", ZOrder2.apply),
    unary("nfc_normalize", NfcNormalize.apply),
    binary("cosine_similarity", CosineSimilarity.apply),
    unary("to_cbor", JsonToCbor.apply),
    unary("from_cbor", CborToJson.apply),
    unary("base58_encode", Base58Encode.apply),
    unary("base58_decode", Base58Decode.apply),
    unary("lz4_compress", Lz4Compress.apply),
    unary("lz4_decompress", Lz4Decompress.apply),
    unary("zstd_compress", ZstdCompress.apply),
    unary("zstd_decompress", ZstdDecompress.apply))

  /** Register the SQL-callable functions on a session so `expr(...)`
    * strings and HOF lambdas can use them (done by
    * `SparkSessions.local` for every engine entry point).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}
