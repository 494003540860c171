package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Minimal, dependency-free CBOR (RFC 8949) codec for JSON-shaped data.
  *
  * The reference publishes every envelope as CBOR or JSON
  * (borealis-indexer/src/main.rs:377 `.to_cbor()`, :424
  * `.to_json_bytes()`; decode at borealis-consumer/src/main.rs:260-286).
  * Spark has `to_json`/`from_json` built in but no CBOR, and the Spark
  * classpath ships no CBOR library — so this implements the subset the
  * block documents need: major types 0/1 (ints), 2 (byte strings,
  * decoded to base64 text on the JSON side), 3 (text), 4 (arrays),
  * 5 (maps), 7 (false/true/null + float64). Encoding uses
  * shortest-form lengths (canonical-leaning); map key order is
  * preserved as parsed, matching serde_cbor's behavior for struct
  * serialization.
  */
object Cbor {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  def jsonToCbor(json: String): Array[Byte] = encode(mapper.readTree(json))

  def cborToJson(bytes: Array[Byte]): String =
    mapper.writeValueAsString(decode(ByteBuffer.wrap(bytes)))

  // ---- encode ----

  def encode(n: JsonNode): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writeNode(out, n)
    out.flush()
    bos.toByteArray
  }

  private def writeTypeAndLen(out: DataOutputStream, major: Int, v: Long): Unit = {
    val mt = major << 5
    if (v < 24) out.writeByte(mt | v.toInt)
    else if (v < (1L << 8)) { out.writeByte(mt | 24); out.writeByte(v.toInt) }
    else if (v < (1L << 16)) { out.writeByte(mt | 25); out.writeShort(v.toInt) }
    else if (v < (1L << 32)) { out.writeByte(mt | 26); out.writeInt(v.toInt) }
    else { out.writeByte(mt | 27); out.writeLong(v) }
  }

  private def writeNode(out: DataOutputStream, n: JsonNode): Unit = {
    if (n == null || n.isNull) out.writeByte(0xf6)
    else if (n.isBoolean) out.writeByte(if (n.asBoolean()) 0xf5 else 0xf4)
    else if (n.isIntegralNumber && n.canConvertToLong) {
      val v = n.asLong()
      if (v >= 0) writeTypeAndLen(out, 0, v)
      else writeTypeAndLen(out, 1, -(v + 1))
    } else if (n.isBigInteger || n.isBigDecimal || n.isFloatingPointNumber) {
      if (n.isIntegralNumber) writeBigInt(out, n.bigIntegerValue())
      else {
        out.writeByte(0xfb); out.writeLong(java.lang.Double.doubleToLongBits(n.asDouble()))
      }
    } else if (n.isTextual) writeText(out, n.asText())
    else if (n.isArray) {
      writeTypeAndLen(out, 4, n.size().toLong)
      val it = n.elements()
      while (it.hasNext) writeNode(out, it.next())
    } else if (n.isObject) {
      writeTypeAndLen(out, 5, n.size().toLong)
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        writeText(out, e.getKey)
        writeNode(out, e.getValue)
      }
    } else writeText(out, n.asText())
  }

  /** Integer beyond i64 (RFC 8949 §3.4.3, matching serde_cbor/ciborium
    * byte-for-byte): values whose u64 image fits stay major type 0/1
    * (preferred serialization — appendix-A vector
    * `18446744073709551615 = 0x1bffffffffffffffff`); anything wider is
    * tag 2 (positive) / tag 3 (negative, content = -1 - n) over the
    * minimal big-endian magnitude bytes.
    */
  private def writeBigInt(out: DataOutputStream, bi: java.math.BigInteger): Unit = {
    def magnitudeBytes(m: java.math.BigInteger): Array[Byte] = {
      val raw = m.toByteArray
      if (raw.length > 1 && raw(0) == 0) raw.drop(1) else raw // strip sign byte
    }
    if (bi.signum() >= 0) {
      if (bi.bitLength() <= 64) { out.writeByte(0x1b); out.writeLong(bi.longValue()) }
      else {
        out.writeByte(0xc2)
        val b = magnitudeBytes(bi)
        writeTypeAndLen(out, 2, b.length.toLong); out.write(b)
      }
    } else {
      val m = bi.negate().subtract(java.math.BigInteger.ONE) // -1 - n
      if (m.bitLength() <= 64) { out.writeByte(0x3b); out.writeLong(m.longValue()) }
      else {
        out.writeByte(0xc3)
        val b = magnitudeBytes(m)
        writeTypeAndLen(out, 2, b.length.toLong); out.write(b)
      }
    }
  }

  private def writeText(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    writeTypeAndLen(out, 3, b.length.toLong)
    out.write(b)
  }

  // ---- decode ----

  def decode(buf: ByteBuffer): JsonNode = {
    val ib = buf.get() & 0xff
    val major = ib >> 5
    val info = ib & 0x1f
    major match {
      case 0 =>
        val v = readLen(buf, info)
        // v is the raw u64: ≥ 2^63 doesn't fit a signed long node
        if (v >= 0) longNode(v)
        else nf.numberNode(new java.math.BigInteger(java.lang.Long.toUnsignedString(v)))
      case 1 =>
        val v = readLen(buf, info)
        if (v >= 0 && v < Long.MaxValue) longNode(-(v + 1))
        else nf.numberNode(java.math.BigInteger.valueOf(-1)
          .subtract(new java.math.BigInteger(java.lang.Long.toUnsignedString(v))))
      case 2 =>
        val b = if (info == 31) readChunks(buf, 2)
        else { val a = new Array[Byte](readBoundedLen(buf, info)); buf.get(a); a }
        nf.textNode(java.util.Base64.getEncoder.encodeToString(b))
      case 3 =>
        val b = if (info == 31) readChunks(buf, 3)
        else { val a = new Array[Byte](readBoundedLen(buf, info)); buf.get(a); a }
        nf.textNode(new String(b, StandardCharsets.UTF_8))
      case 4 =>
        if (info == 31) {
          // indefinite-length array (RFC 8949 §3.2.2): items to the break
          val arr: ArrayNode = nf.arrayNode()
          while (!atBreak(buf)) arr.add(decode(buf))
          buf.get() // consume the break
          arr
        } else {
          // every element costs >= 1 input byte, so remaining bounds the
          // element count too — reject before the capacity-len prealloc
          val len = readBoundedLen(buf, info)
          val arr: ArrayNode = nf.arrayNode(len)
          var i = 0
          while (i < len) { arr.add(decode(buf)); i += 1 }
          arr
        }
      case 5 =>
        val obj: ObjectNode = nf.objectNode()
        if (info == 31) {
          // indefinite-length map: key/value pairs to the break
          while (!atBreak(buf)) {
            val k = decode(buf)
            obj.set[JsonNode](k.asText(), decode(buf))
          }
          buf.get() // consume the break
        } else {
          val len = readBoundedLen(buf, info)
          var i = 0
          while (i < len) {
            val k = decode(buf)
            obj.set[JsonNode](k.asText(), decode(buf))
            i += 1
          }
        }
        obj
      case 7 =>
        info match {
          case 20 => nf.booleanNode(false)
          case 21 => nf.booleanNode(true)
          case 22 | 23 => nf.nullNode()
          case 25 => nf.numberNode(halfToDouble(buf.getShort & 0xffff))
          case 26 => nf.numberNode(java.lang.Float.intBitsToFloat(buf.getInt).toDouble)
          case 27 => nf.numberNode(java.lang.Double.longBitsToDouble(buf.getLong))
          case 31 => throw new IllegalArgumentException(
            "unexpected break (0xff) outside an indefinite-length item")
          case _ => throw new IllegalArgumentException(s"unsupported simple value $info")
        }
      case 6 => // tag 2/3 = bignum (RFC 8949 §3.4.3); other tags: skip
        val tag = readLen(buf, info)
        if (tag == 2L || tag == 3L) {
          val inner = buf.get() & 0xff
          require(inner >> 5 == 2, s"bignum content must be a byte string, got major ${inner >> 5}")
          val b = new Array[Byte](readBoundedLen(buf, inner & 0x1f)); buf.get(b)
          val mag = new java.math.BigInteger(1, b)
          nf.numberNode(
            if (tag == 2L) mag else java.math.BigInteger.valueOf(-1).subtract(mag))
        } else decode(buf)
      case _ => throw new IllegalArgumentException(s"unsupported major type $major")
    }
  }

  private def longNode(v: Long): JsonNode = nf.numberNode(v)

  /** is the next byte the 0xff break stop code? (peek, no consume) */
  private def atBreak(buf: ByteBuffer): Boolean =
    (buf.get(buf.position()) & 0xff) == 0xff

  /** concatenate an indefinite-length string's definite chunks (RFC
    * 8949 §3.2.3: chunks must be definite-length strings of the SAME
    * major type; nesting is forbidden)
    */
  private def readChunks(buf: ByteBuffer, major: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      val b = buf.get() & 0xff
      if (b == 0xff) done = true
      else {
        require(b >> 5 == major && (b & 0x1f) != 31,
          s"indefinite-length chunk must be a definite chunk of major $major, got $b")
        val a = new Array[Byte](readBoundedLen(buf, b & 0x1f))
        buf.get(a); out.write(a)
      }
    }
    out.toByteArray
  }

  /** IEEE 754 half-precision -> double, RFC 8949 appendix D's exact
    * arithmetic (subnormals, infinities and NaN included)
    */
  private def halfToDouble(h: Int): Double = {
    val exp = (h >> 10) & 0x1f
    val mant = h & 0x3ff
    val mag =
      if (exp == 0) mant * math.pow(2, -24)
      else if (exp != 31) (mant + 1024) * math.pow(2, exp - 25)
      else if (mant == 0) Double.PositiveInfinity
      else Double.NaN
    if ((h & 0x8000) != 0) -mag else mag
  }

  private def readLen(buf: ByteBuffer, info: Int): Long = info match {
    case x if x < 24 => x.toLong
    case 24 => (buf.get() & 0xff).toLong
    case 25 => (buf.getShort & 0xffff).toLong
    case 26 => buf.getInt & 0xffffffffL
    case 27 => buf.getLong
    case _ => throw new IllegalArgumentException(s"unsupported length info $info")
  }

  /** Read a definite length that is about to size an allocation (a
    * byte-array copy, or an element-count loop where each element
    * costs >= 1 input byte) and BOUND it by the bytes actually
    * remaining — the declared-before-decode discipline
    * [[graft.functions.MediaCodecs]] applies to media headers. Without
    * it a 12-byte hostile input declaring a ~2 GB string forces the
    * full allocation (or a NegativeArraySizeException past 2^31)
    * before the read ever fails.
    */
  private def readBoundedLen(buf: ByteBuffer, info: Int): Int = {
    val len = readLen(buf, info)
    if (len < 0 || len > buf.remaining)
      throw new IllegalArgumentException(
        s"declared length $len exceeds the ${buf.remaining} bytes remaining " +
          "— truncated or hostile CBOR input")
    len.toInt
  }
}
