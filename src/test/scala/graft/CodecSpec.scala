package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.blocks.Fixtures
import graft.functions.{Base58, Cbor}
import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("CBOR round-trips the golden block document losslessly") {
    val json = Fixtures.blockJson(Fixtures.baseHeight)
    val bytes = Cbor.jsonToCbor(json)
    val back = Cbor.cborToJson(bytes)
    assert(mapper.readTree(back) == mapper.readTree(json))
    // CBOR must be denser than JSON for this document
    assert(bytes.length < json.getBytes("UTF-8").length)
  }

  test("CBOR encodes RFC 8949 appendix-A examples correctly") {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    assert(hex(Cbor.jsonToCbor("0")) == "00")
    assert(hex(Cbor.jsonToCbor("10")) == "0a")
    assert(hex(Cbor.jsonToCbor("23")) == "17")
    assert(hex(Cbor.jsonToCbor("24")) == "1818")
    assert(hex(Cbor.jsonToCbor("1000000")) == "1a000f4240")
    assert(hex(Cbor.jsonToCbor("-1")) == "20")
    assert(hex(Cbor.jsonToCbor("-1000")) == "3903e7")
    assert(hex(Cbor.jsonToCbor("\"a\"")) == "6161")
    assert(hex(Cbor.jsonToCbor("\"IETF\"")) == "6449455446")
    assert(hex(Cbor.jsonToCbor("[1,2,3]")) == "83010203")
    assert(hex(Cbor.jsonToCbor("{\"a\":1,\"b\":[2,3]}")) == "a26161016162820203")
    assert(hex(Cbor.jsonToCbor("false")) == "f4")
    assert(hex(Cbor.jsonToCbor("true")) == "f5")
    assert(hex(Cbor.jsonToCbor("null")) == "f6")
    assert(hex(Cbor.jsonToCbor("1.1")) == "fb3ff199999999999a")
  }

  test("CBOR decodes foreign-producer shapes: indefinite lengths + half-floats (RFC 8949 appendix A)") {
    def fromHex(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def dec(h: String): String = Cbor.cborToJson(fromHex(h))
    // the engine's own writer never emits these (preferred
    // serialization is definite lengths + f64), but a foreign CBOR
    // producer may — appendix A's indefinite examples, verbatim:
    // (_ "strea", "ming")
    assert(dec("7f657374726561646d696e67ff") == "\"streaming\"")
    // [_ 1, [2, 3], [_ 4, 5]]  — nesting both shapes
    assert(dec("9f018202039f0405ffff") == "[1,[2,3],[4,5]]")
    // [1, [2, 3], [_ 4, 5]]
    assert(dec("83018202039f0405ff") == "[1,[2,3],[4,5]]")
    // {_ "a": 1, "b": [_ 2, 3]}
    assert(dec("bf61610161629f0203ffff") == "{\"a\":1,\"b\":[2,3]}")
    // {_ "Fun": true, "Amt": -2}
    assert(dec("bf6346756ef563416d7421ff") == "{\"Fun\":true,\"Amt\":-2}")
    // [_ ] (empty indefinite array)
    assert(dec("9fff") == "[]")
    // (_ h'0102', h'030405') — indefinite byte string, chunks concatenate
    // (byte strings surface base64, the engine's binary-column contract)
    assert(dec("5f42010243030405ff") ==
      "\"" + java.util.Base64.getEncoder.encodeToString(
        Array[Byte](1, 2, 3, 4, 5)) + "\"")
    // half-floats, appendix A's exact doubles
    assert(dec("f93c00") == "1.0")
    assert(dec("f90001") == "5.9604644775390625E-8")
    assert(dec("f97bff") == "65504.0")
    assert(dec("f9c400") == "-4.0")
    assert(dec("f98000") == "-0.0")
    assert(dec("f97c00") == "\"Infinity\"" || dec("f97c00") == "Infinity")
    // a break outside any indefinite item is a loud error, not a value
    intercept[IllegalArgumentException](dec("ff"))
    // chunks must be definite and of the same major type
    intercept[IllegalArgumentException](dec("5f6161ff")) // text chunk in a byte string
    intercept[IllegalArgumentException](dec("5f5f4101ffff")) // nested indefinite chunk
  }

  test("CBOR bignum vectors (RFC 8949 appendix A + §3.4.3 tag 2/3)") {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    // u64 edge: stays major type 0 (preferred serialization)
    assert(hex(Cbor.jsonToCbor("18446744073709551615")) == "1bffffffffffffffff")
    assert(hex(Cbor.jsonToCbor("-18446744073709551616")) == "3bffffffffffffffff")
    // beyond u64: tag-2 / tag-3 bignum over minimal magnitude bytes
    assert(hex(Cbor.jsonToCbor("18446744073709551616")) == "c249010000000000000000")
    assert(hex(Cbor.jsonToCbor("-18446744073709551617")) == "c349010000000000000000")
    // round-trip: decode restores the exact integers (u128 scale)
    for (v <- Seq(
        "18446744073709551615", "18446744073709551616",
        "-18446744073709551616", "-18446744073709551617",
        "340282366920938463463374607431768211455")) // u128 max
      assert(Cbor.cborToJson(Cbor.jsonToCbor(v)) == v)
  }

  private val jsonGen: Gen[String] = {
    val scalar = Gen.oneOf(
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue).map(_.toString),
      Gen.alphaNumStr.map(s => "\"" + s + "\""),
      Gen.oneOf("true", "false", "null"))
    def obj(depth: Int): Gen[String] =
      if (depth <= 0) scalar
      else
        Gen.oneOf(
          scalar,
          Gen.listOfN(3, obj(depth - 1)).map(_.mkString("[", ",", "]")),
          Gen.listOfN(3, obj(depth - 1)).flatMap { vs =>
            Gen.listOfN(3, Gen.identifier).map { ks =>
              ks.distinct.zip(vs).map { case (k, v) => "\"" + k + "\":" + v }
                .mkString("{", ",", "}")
            }
          })
    obj(3)
  }

  test("CBOR round-trip property over random JSON trees") {
    check(Prop.forAll(jsonGen) { js =>
      mapper.readTree(Cbor.cborToJson(Cbor.jsonToCbor(js))) == mapper.readTree(js)
    })
  }

  /** An INDEPENDENT test-only CBOR writer that deliberately emits the
    * non-canonical forms our production encoder never produces —
    * non-shortest lengths, indefinite-length strings split into random
    * chunks, indefinite arrays and maps — seeded per tree, so the
    * generative cross-check exercises the decoder against a second
    * implementation of the RFC. (The ideal cross-check would be
    * jackson-dataformat-cbor, but this Spark distribution ships only
    * jackson-dataformat-yaml and the sandbox resolves no new jars.)
    */
  private def advEncode(js: String, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val out = new java.io.ByteArrayOutputStream()
    def writeLen(major: Int, v: Long): Unit = {
      val mt = major << 5
      // randomly widen the length form: 0x17 can legally travel as
      // 0x18 17, 0x19 0017, 0x1a 00000017 or 0x1b 00...17
      val form = rnd.nextInt(4)
      if (v < 24 && form == 0) out.write(mt | v.toInt)
      else if (v < (1L << 8) && form <= 1) { out.write(mt | 24); out.write(v.toInt) }
      else if (v < (1L << 16) && form <= 2) {
        out.write(mt | 25); out.write((v >> 8).toInt); out.write(v.toInt & 0xff)
      } else if (v < (1L << 32)) {
        out.write(mt | 26)
        for (s <- Seq(24, 16, 8, 0)) out.write((v >> s).toInt & 0xff)
      } else {
        out.write(mt | 27)
        for (s <- 56 to 0 by -8) out.write((v >> s).toInt & 0xff)
      }
    }
    def writeNode(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      if (n.isNull) out.write(0xf6)
      else if (n.isBoolean) out.write(if (n.asBoolean()) 0xf5 else 0xf4)
      else if (n.isIntegralNumber) {
        val v = n.asLong()
        if (v >= 0) writeLen(0, v) else writeLen(1, -(v + 1))
      } else if (n.isTextual) {
        val b = n.asText().getBytes("UTF-8")
        if (b.length >= 2 && rnd.nextBoolean()) {
          // indefinite-length text: split into 2 definite chunks
          out.write(0x7f)
          val cut = 1 + rnd.nextInt(b.length - 1)
          writeLen(3, cut.toLong); out.write(b, 0, cut)
          writeLen(3, (b.length - cut).toLong); out.write(b, cut, b.length - cut)
          out.write(0xff)
        } else { writeLen(3, b.length.toLong); out.write(b) }
      } else if (n.isArray) {
        val it = n.elements()
        if (rnd.nextBoolean()) {
          out.write(0x9f)
          while (it.hasNext) writeNode(it.next())
          out.write(0xff)
        } else {
          writeLen(4, n.size().toLong)
          while (it.hasNext) writeNode(it.next())
        }
      } else if (n.isObject) {
        val it = n.fields()
        def pairs(): Unit = while (it.hasNext) {
          val e = it.next()
          writeNode(nodeText(e.getKey)); writeNode(e.getValue)
        }
        if (rnd.nextBoolean()) { out.write(0xbf); pairs(); out.write(0xff) }
        else { writeLen(5, n.size().toLong); pairs() }
      } else fail(s"unexpected node $n")
    }
    writeNode(mapper.readTree(js))
    out.toByteArray
  }

  private def nodeText(s: String) =
    com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.textNode(s)

  test("CBOR decode property vs an independent non-canonical writer (indefinite + wide lengths)") {
    check(Prop.forAll(jsonGen, Arbitrary.arbitrary[Long]) { (js, seed) =>
      mapper.readTree(Cbor.cborToJson(advEncode(js, seed))) == mapper.readTree(js)
    })
  }

  test("CBOR half-float property: every non-NaN 16-bit pattern matches the RFC appendix-D arithmetic") {
    // test-side reference, written independently from the codec: RFC
    // 8949 appendix D's ldexp formulation
    def ref(h: Int): Double = {
      val exp = (h >> 10) & 0x1f
      val mant = h & 0x3ff
      val mag =
        if (exp == 0) StrictMath.scalb(mant.toDouble, -24)
        else if (exp != 31) StrictMath.scalb((mant + 1024).toDouble, exp - 25)
        else if (mant == 0) Double.PositiveInfinity
        else Double.NaN
      if ((h & 0x8000) != 0) -mag else mag
    }
    // exhaustive, not sampled: 65536 patterns decode in milliseconds.
    // Compare on the decoded NODE (Infinity/NaN don't survive a JSON
    // text round-trip)
    for (h <- 0 until 0x10000) {
      val bytes = Array[Byte](0xf9.toByte, (h >> 8).toByte, h.toByte)
      val got = Cbor.decode(java.nio.ByteBuffer.wrap(bytes)).doubleValue()
      val want = ref(h)
      assert(java.lang.Double.compare(got, want) == 0 ||
        (got.isNaN && want.isNaN), f"f9$h%04x: got $got want $want")
    }
  }

  test("CBOR hostile declared lengths fail fast, before any allocation") {
    def fromHex(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // each input is a handful of bytes declaring a gigabyte-to-
    // petabyte-scale item; the decoder must reject on the DECLARED
    // length vs bytes-remaining, not allocate and fail on the read
    val hostile = Seq(
      "5a7fffffff",           // byte string declaring ~2 GiB
      "5b0000000100000000",   // byte string declaring 2^32 (> Int.MaxValue)
      "7a7fffffff",           // text string, same game
      "9a7fffffff",           // definite array of 2^31-1 elements
      "ba7fffffff",           // definite map of 2^31-1 pairs
      "7f7a7fffffffff",       // hostile chunk inside an indefinite text
      "c25a7fffffff",         // bignum content declaring ~2 GiB
      "5b7fffffffffffffff")   // byte string declaring 2^63-1
    for (h <- hostile) {
      val e = intercept[IllegalArgumentException](Cbor.cborToJson(fromHex(h)))
      assert(e.getMessage.contains("exceeds"), s"$h: ${e.getMessage}")
    }
    // near-miss sanity: a declared length exactly equal to remaining
    // still decodes (the guard is len > remaining, not >=)
    assert(Cbor.cborToJson(fromHex("43010203")) != null)
  }

  test("CBOR golden bytes: hand-assembled RFC 8949 encoding of a worked envelope payload") {
    // The byte-parity fixture for the wire-format ops (b04/b05/b08 are
    // rows-only under DuckDB forever): a miniature block envelope whose
    // EXPECTED bytes are assembled token by token from RFC 8949 rules —
    // never by calling the codec — then compared byte-for-byte against
    // (a) the JVM encoder and (b) the Spark-side Envelope.wrap path.
    val json =
      """{"block":{"header":{"height":63596,"timestamp":1618497610803345000,""" +
      """"hash":"5X37niQW","chunks_included":1,""" +
      """"total_supply":2050206401403887985811862247311434}},""" +
      """"shards":[0,1,null],"final":true}"""
    val expectedHex = Seq(
      "a3",                                 // map(3) {block, shards, final}
      "65", "626c6f636b",                   // text(5) "block"
      "a1",                                 //   map(1) {header}
      "66", "686561646572",                 //   text(6) "header"
      "a5",                                 //     map(5)
      "66", "686569676874",                 //     text(6) "height"
      "19", "f86c",                         //       uint16 63596
      "69", "74696d657374616d70",           //     text(9) "timestamp"
      "1b", "16760f0079c07668",             //       uint64 1618497610803345000
      "64", "68617368",                     //     text(4) "hash"
      "68", "355833376e695157",             //       text(8) "5X37niQW"
      "6f", "6368756e6b735f696e636c75646564", //   text(15) "chunks_included"
      "01",                                 //       uint 1
      "6c", "746f74616c5f737570706c79",     //     text(12) "total_supply"
      "c2", "4e", "65153e2af9312cd344b13afa084a", // tag(2) bignum, 14 bytes
      "66", "736861726473",                 // text(6) "shards"
      "83", "00", "01", "f6",               //   array(3) [0, 1, null]
      "65", "66696e616c",                   // text(5) "final"
      "f5"                                  //   true
    ).mkString
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    assert(hex(Cbor.jsonToCbor(json)) == expectedHex)
    assert(mapper.readTree(Cbor.cborToJson(Cbor.jsonToCbor(json))) == mapper.readTree(json))

    // the b04/b05 Spark path emits the identical wire bytes
    val spark = TestSpark.spark
    import spark.implicits._
    val env = graft.blocks.Envelope.wrap(Seq(json).toDF("value"), "cbor", None).collect()(0)
    assert(env.getAs[Long]("seq_id") == 63596L)
    assert(hex(env.getAs[Array[Byte]]("payload")) == expectedHex)

    // b08: the compressed envelope round-trips to the exact source text
    for (c <- Seq("lz4", "zstd")) {
      val rt = graft.blocks.Envelope.unwrap(
        graft.blocks.Envelope.wrap(Seq(json).toDF("value"), "cbor", Some(c))).collect()(0)
      assert(rt.getAs[String]("value") == json, s"compression=$c")
    }
  }

  test("base58 known vectors") {
    assert(Base58.encode("Hello World!".getBytes("UTF-8")) == "2NEpo7TZRRrLZSi2U")
    assert(new String(Base58.decode("2NEpo7TZRRrLZSi2U"), "UTF-8") == "Hello World!")
    // leading zeros preserved
    assert(Base58.encode(Array[Byte](0, 0, 1)) == "112")
    assert(Base58.decode("112").toSeq == Seq[Byte](0, 0, 1))
    // 32-byte hash round-trip (NEAR CryptoHash shape)
    val h = "5X37niQWWcihDGQjsvDMHYKLCurNJyQLxCeLgneDb8mk"
    assert(Base58.decode(h).length == 32)
    assert(Base58.encode(Base58.decode(h)) == h)
  }

  test("base58 round-trip property") {
    check(Prop.forAll(Arbitrary.arbitrary[Array[Byte]]) { b =>
      Base58.decode(Base58.encode(b)).toSeq == b.toSeq
    })
  }

  test("lz4 / zstd payload round-trip property (S8 wire formats)") {
    import graft.functions.Compression._
    check(Prop.forAll(Arbitrary.arbitrary[Array[Byte]]) { b =>
      lz4Decompress(lz4Compress(b)).toSeq == b.toSeq &&
      zstdDecompress(zstdCompress(b)).toSeq == b.toSeq
    })
    // a real block document compresses well
    val doc = Fixtures.blockJson(Fixtures.baseHeight).getBytes("UTF-8")
    assert(zstdCompress(doc).length < doc.length / 2)
    assert(lz4Compress(doc).length < doc.length)
  }

  test("WAV writer/parser round-trip property; canonical 44-byte header") {
    import graft.functions.MediaCodecs._
    check(Prop.forAll(Gen.listOf(Arbitrary.arbitrary[Short]), Gen.choose(1, 192000)) {
      (ss, rate) =>
        val wav = wavParse(wavWrite(ss.toArray, rate))
        wav.sampleRate == rate && wav.samples.toSeq == ss &&
        wav.channels == 1 && wav.bitsPerSample == 16
    })
    val bytes = wavWrite(Array[Short](1, -1), 8000)
    assert(bytes.length == 44 + 4)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    // PCM16 LE: 1 -> 01 00, -1 -> ff ff
    assert(bytes.slice(44, 48).toSeq == Seq[Byte](1, 0, -1, -1))
  }

  test("WAV parser walks unknown chunks (LIST before data, odd-size padding)") {
    import graft.functions.MediaCodecs._
    val base = wavWrite(Array[Short](5, -5, 7), 16000)
    // splice a 3-byte LIST chunk (odd size => 1 pad byte) between fmt and data
    val head = base.take(36) // RIFF..WAVE + fmt chunk
    val tail = base.drop(36) // data chunk
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ "abc".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = head ++ list ++ tail
    val wav = wavParse(spliced)
    assert(wav.samples.toSeq == Seq[Short](5, -5, 7) && wav.sampleRate == 16000)
    // structural corruption is rejected, not guessed at
    intercept[IllegalArgumentException](wavParse(base.take(10)))
    intercept[IllegalArgumentException](wavParse("JUNK".getBytes ++ base.drop(4)))
  }

  test("PPM writer/parser round-trip; header comments and whitespace per spec") {
    import graft.functions.MediaCodecs._
    val rgb = Array.tabulate(2 * 3 * 3)(i => (i * 37 % 256).toByte)
    val img = ppmParse(ppmWrite(3, 2, rgb))
    assert(img.w == 3 && img.h == 2 && img.rgb.toSeq == rgb.toSeq)
    // a spec-legal header with comment lines and mixed whitespace
    val commented = "P6 # comment\n# another\n 3\t2 # dims\n255\n".getBytes("US-ASCII") ++ rgb
    val img2 = ppmParse(commented)
    assert(img2.w == 3 && img2.h == 2 && img2.rgb.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException](ppmParse(ppmWrite(3, 2, rgb).dropRight(1)))
    intercept[IllegalArgumentException](
      ppmParse("P6\n1 1\n65535\n??????".getBytes("US-ASCII")))
  }

  test("animated GIF writes a real multi-frame container and round-trips losslessly") {
    import graft.functions.MediaCodecs._
    val w = 9; val h = 7
    // three frames of web-safe palette indices (0..215)
    val frames = (0 until 3).map { f =>
      Array.tabulate(w * h)(i => ((i * 13 + f * 41) % 216).toByte)
    }
    val bytes = gifWrite(w, h, frames)
    // wire-format pin: a real GIF89a container, not a raster dump
    assert(new String(bytes.take(6), "US-ASCII") == "GIF89a")
    val anim = gifParse(bytes)
    assert(anim.w == w && anim.h == h && anim.frames.length == 3,
      s"decoded ${anim.frames.length} frames at ${anim.w}x${anim.h}")
    // losslessness: each decoded RGB value is the palette entry exactly
    for ((idx, rgb) <- frames.zip(anim.frames); i <- 0 until w * h) {
      val v = idx(i) & 0xff
      assert((rgb(i * 3) & 0xff) == (v / 36) * 51)
      assert((rgb(i * 3 + 1) & 0xff) == ((v / 6) % 6) * 51)
      assert((rgb(i * 3 + 2) & 0xff) == (v % 6) * 51)
    }
    // a single frame still decodes (n_frames read from the container)
    assert(gifParse(gifWrite(4, 3, frames.take(1).map(_.take(12)))).frames.length == 1)
    intercept[Exception](gifParse(bytes.take(10))) // truncated container
  }

  test("μ-law: JDK codec decode equals the G.711 expansion on all 256 codewords") {
    import graft.functions.MediaCodecs._
    // every possible codeword through a real format-tag-7 container and
    // the JDK's ULAW→PCM conversion provider — the proof that lets the
    // DuckDB oracle replay the decode as pure integer math
    val codes = Array.tabulate(256)(i => i.toByte)
    val (sr, dec) = ulawWavDecode(ulawWavWrite(codes, 8000))
    assert(sr == 8000 && dec.length == 256)
    for (i <- 0 until 256)
      assert(dec(i) == ulawExpand(codes(i)),
        s"codeword $i: jdk=${dec(i)} formula=${ulawExpand(codes(i))}")
    // the canonical anchors: digital silence is 0xFF and round-trips to
    // exact zero; full-scale clips to ±32124 (mant 15, segment 7)
    assert(ulawEncode(0) == 0xff.toByte && ulawExpand(0xff.toByte) == 0)
    assert(ulawExpand(ulawEncode(32767)) == 32124)
    assert(ulawExpand(ulawEncode(-32768)) == -32124)
  }

  test("μ-law companding error is segment-centre bounded: |round-trip − clip(v)| ≤ 4·2^seg ≤ 512") {
    import graft.functions.MediaCodecs._
    check(Prop.forAll(Arbitrary.arbitrary[Short]) { s =>
      val d = ulawExpand(ulawEncode(s)).toInt
      val clipped = math.max(-32635, math.min(32635, s.toInt))
      val m = math.abs(clipped) + 132
      val seg = 31 - Integer.numberOfLeadingZeros(m) - 7
      math.abs(d - clipped) <= (4 << seg) && math.abs(d - clipped) <= 512 &&
      // companding never flips a sign (a negative may decode to exact 0)
      (if (clipped > 0) d >= 0 else if (clipped < 0) d <= 0 else d == 0)
    })
  }

  test("μ-law container rejects structural corruption instead of guessing") {
    import graft.functions.MediaCodecs._
    val good = ulawWavWrite(Array.tabulate(16)(_.toByte), 8000)
    intercept[Exception](ulawWavDecode(good.take(20)))
    intercept[Exception](ulawWavDecode("JUNK".getBytes ++ good.drop(4)))
    // a PCM16 container is NOT silently mis-decoded as μ-law
    intercept[Exception](ulawWavDecode(wavWrite(Array[Short](1, -1), 8000)))
  }

  test("sniff identifies every codec-ladder container by magic bytes, and nothing else") {
    import graft.functions.MediaCodecs._
    val rgb = Array.tabulate(12 * 9 * 3)(i => (i % 251).toByte)
    assert(sniff(pngWrite(12, 9, rgb)).contains("png"))
    assert(sniff(jpegWrite(12, 9, rgb)).contains("jpeg"))
    assert(sniff(ppmWrite(12, 9, rgb)).contains("ppm"))
    assert(sniff(gifWrite(4, 3, Seq(Array.tabulate(12)(_.toByte)))).contains("gif"))
    // the RIFF prelude is identical for both WAV forms: the fmt-tag
    // chunk walk is what disambiguates them
    assert(sniff(wavWrite(Array[Short](1, -2, 3), 8000)).contains("wav-pcm"))
    assert(sniff(ulawWavWrite(Array[Byte](1, 2, 3), 8000)).contains("wav-ulaw"))
    // unknowns and torn headers are None, never a guess or a throw
    assert(sniff(Array[Byte]()).isEmpty)
    assert(sniff("JUNKJUNKJUNKJUNK".getBytes).isEmpty)
    assert(sniff(pngWrite(12, 9, rgb).take(6)).isEmpty) // torn magic
    assert(sniff(wavWrite(Array[Short](1), 8000).take(14)).isEmpty) // RIFF, no fmt
    // a RIFF/WAVE with an unsupported fmt tag is unrecognized
    val exotic = wavWrite(Array[Short](1, 2), 8000)
    exotic(20) = 0x55 // fmt tag -> 0x0055 (ITU G.728, not decodable here)
    assert(sniff(exotic).isEmpty)
  }

  test("RIFF walks tolerate an odd-size unpadded trailing chunk (spec-legal, commonly written)") {
    import graft.functions.MediaCodecs._
    // a valid PCM WAV with a 5-byte "note" chunk appended and NO pad
    // byte: the advance past it must clamp, not throw
    val base = wavWrite(Array[Short](100, -200, 300), 8000)
    val note = "note".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "hello".getBytes("US-ASCII")
    val trailing = base ++ note
    // patch the RIFF size field (not that the parsers trust it)
    val bb = java.nio.ByteBuffer.wrap(trailing).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, trailing.length - 8)
    assert(wavParse(trailing).samples.toSeq == Seq[Short](100, -200, 300))
    assert(sniff(trailing).contains("wav-pcm"))
    // sniff's own walk: the odd unpadded chunk sits BEFORE any fmt tag,
    // so the walk must clamp and end as None — never throw
    val noFmt = "RIFF".getBytes ++ Array[Byte](13, 0, 0, 0) ++ "WAVE".getBytes ++ note
    assert(sniff(noFmt).isEmpty)
    assert(declaredUnits("wav-pcm", noFmt) == -1L)
  }

  test("declaredUnits reads every format's size from the header alone") {
    import graft.functions.MediaCodecs._
    val rgb = Array.tabulate(12 * 9 * 3)(i => (i % 251).toByte)
    assert(declaredUnits("png", pngWrite(12, 9, rgb)) == 108L)
    assert(declaredUnits("jpeg", jpegWrite(12, 9, rgb)) == 108L)
    assert(declaredUnits("ppm", ppmWrite(12, 9, rgb)) == 108L)
    val gif = gifWrite(5, 4, Seq.tabulate(3)(f => Array.tabulate(20)(i => ((i + f) % 216).toByte)))
    assert(declaredUnits("gif", gif) == 60L) // 5*4 px × 3 frames
    assert(declaredUnits("wav-pcm", wavWrite(Array[Short](1, -2, 3), 8000)) == 3L)
    assert(declaredUnits("wav-ulaw", ulawWavWrite(Array[Byte](1, 2, 3, 4), 8000)) == 4L)
    // torn headers declare nothing (the decoder will reject them)
    assert(declaredUnits("png", pngWrite(12, 9, rgb).take(20)) == -1L)
    assert(declaredUnits("gif", gif.take(8)) == -1L)
    assert(declaredUnits("unknown-token", rgb) == -1L)
  }

  test("decode-bomb guard: crafted oversize headers are refused with the codec never entered") {
    import graft.functions.MediaCodecs._
    import graft.llm.Multimodal
    import CraftedMedia.{craftedGif, craftedPng}
    // 40000×40000 = 1.6e9 declared pixels from 64 real bytes
    val bomb = craftedPng(40000L, 40000L)
    assert(sniff(bomb).contains("png"))
    assert(declaredUnits("png", bomb) == 1600000000L)
    intercept[OversizeMediaException](Multimodal.decodeStats("png", bomb))
    // 1000 declared frames of a 2000×2000 canvas = 4e9 units in ~14 KB
    val gifBomb = craftedGif(2000, 2000, 1000)
    assert(declaredUnits("gif", gifBomb) == 4000000000L)
    intercept[OversizeMediaException](Multimodal.decodeStats("gif", gifBomb))
    // within budget a crafted header falls through to the REAL codec,
    // which rejects the garbage body (no IDAT, bad CRC) — proof the
    // guard is a pre-filter, not a replacement for decode
    intercept[Exception](Multimodal.decodeStats("png", craftedPng(4L, 3L)))
    // and a genuine blob under budget still decodes
    val ok = Multimodal.decodeStats("png",
      pngWrite(6, 5, Array.tabulate(90)(i => (i % 97).toByte)))
    assert(ok.n_units == 30L)
  }

  test("decoder SPI: an external codec registers and both sniff and the m02 arm route it") {
    import graft.llm.Multimodal
    // a toy "mp3": ID3 magic, one header byte declaring sample count /
    // 1000, body = samples. Stands in for any JDK-external perceptual
    // codec; the REAL integration point a production deployment fills.
    val toy = new Multimodal.MediaDecoder {
      val fmt = "mp3"
      def sniff(bytes: Array[Byte]): Boolean =
        bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'
      def declaredUnits(bytes: Array[Byte]): Long =
        if (bytes.length < 4) -1L else (bytes(3) & 0xff).toLong * 1000L
      def decode(bytes: Array[Byte]): Multimodal.DecodedStats = {
        val body = bytes.drop(4)
        Multimodal.DecodedStats("audio", 1L, body.length.toLong,
          body.map(b => math.abs(b.toLong)).sum, body.map(b => math.abs(b.toLong)).max)
      }
    }
    Multimodal.registerDecoder(toy)
    try {
      val blob = "ID3".getBytes ++ Array[Byte](1) ++ Array[Byte](10, -20, 30)
      assert(Multimodal.sniffMedia(blob).contains("mp3"))
      val st = Multimodal.decodeStats("mp3", blob)
      assert(st.kind == "audio" && st.n_units == 3L && st.sum_vals == 60L && st.peak == 30L)
      // the guard applies to externals through their own declaration
      val bomb = "ID3".getBytes ++ Array[Byte](-1) // declares 255,000 units
      intercept[graft.functions.MediaCodecs.OversizeMediaException](
        Multimodal.decodeStats("mp3", bomb, maxUnits = 1000L))
      // built-in tokens stay reserved; double registration refused
      intercept[IllegalArgumentException](Multimodal.registerDecoder(toy))
    } finally Multimodal.unregisterDecoder("mp3")
    // after unregistration the token routes nowhere again
    intercept[IllegalArgumentException](Multimodal.decodeStats("mp3", "ID3x".getBytes))
  }

  test("BMP/TIFF/AIFF/AU: JDK decodes are hash-gated lossless; headers declare; truncations reject") {
    import graft.functions.MediaCodecs._
    val rgb = Array.tabulate(12 * 9 * 3)(i => (i % 251).toByte)
    // 24-bit BMP and TIFF are lossless containers: the decode must
    // reproduce the exact raster, not just the dimensions
    for ((fmt, bytes) <- Seq("bmp" -> bmpWrite(12, 9, rgb),
        "tiff" -> tiffWrite(12, 9, rgb))) {
      assert(sniff(bytes).contains(fmt), fmt)
      assert(declaredUnits(fmt, bytes) == 12L * 9, fmt)
      val img = pngParse(bytes) // ImageIO sniffs the container
      assert(img.w == 12 && img.h == 9, fmt)
      assert(img.rgb.toSeq == rgb.toSeq, s"$fmt decode must be lossless")
    }
    // PCM16 AIFF and AU: lossless sample round-trip through javax.sound
    val ss = Array.tabulate[Short](600)(i => (math.sin(i * 0.1) * 12000).toInt.toShort)
    for ((fmt, bytes) <- Seq("aiff" -> aiffWrite(ss, 8000), "au" -> auWrite(ss, 8000))) {
      assert(sniff(bytes).contains(fmt), fmt)
      assert(declaredUnits(fmt, bytes) == 600L, fmt)
      val w = javaSoundParse(bytes)
      assert(w.sampleRate == 8000 && w.channels == 1, fmt)
      assert(w.samples.toSeq == ss.toSeq, s"$fmt decode must be lossless")
    }
    // TIFF is both-endian: a big-endian (MM) header declares the same
    val mm = tiffWrite(12, 9, rgb)
    if ((mm(0) & 0xff) == 0x49) { // JDK writes II; hand-check MM via bytes
      val tiny = Array[Byte](0x4d, 0x4d, 0, 0x2a, 0, 0, 0, 8, // MM magic, IFD@8
        0, 2, // 2 entries
        1, 0, 0, 3, 0, 0, 0, 1, 0, 12, 0, 0, // tag 256 SHORT w=12
        1, 1, 0, 3, 0, 0, 0, 1, 0, 9, 0, 0)  // tag 257 SHORT h=9
      assert(sniff(tiny).contains("tiff"))
      assert(declaredUnits("tiff", tiny) == 12L * 9)
    }
    // TRUNCATED headers: either unrecognized at the sniff, or sniffed
    // but declaring nothing (-1, which the ingest guard refuses as
    // corrupt) — never a throw, never a trusted decode
    assert(sniff(bmpWrite(12, 9, rgb).take(20)).isEmpty) // below the DIB field
    val tornTiff = tiffWrite(12, 9, rgb).take(6) // magic ok, IFD offset torn
    assert(sniff(tornTiff).contains("tiff") &&
      declaredUnits("tiff", tornTiff) == -1L)
    val tornAiff = aiffWrite(ss, 8000).take(12) // FORM..AIFF, no COMM
    assert(sniff(tornAiff).contains("aiff") &&
      declaredUnits("aiff", tornAiff) == -1L)
    val tornAu = auWrite(ss, 8000).take(12) // .snd, header cut mid-field
    assert(sniff(tornAu).contains("au") &&
      declaredUnits("au", tornAu) == -1L)
    // "BM" alone is not a BMP: the DIB revision field must be sane
    assert(sniff("BMJUNKJUNKJUNKJUNKJUNKJUNKJUNK".getBytes).isEmpty)
  }

  test("PPM nearest-neighbor resize matches a brute-force reference") {
    import graft.functions.MediaCodecs._
    check(Prop.forAll(Gen.choose(1, 12), Gen.choose(1, 12), Gen.choose(1, 8), Gen.choose(1, 8)) {
      (w, h, dw, dh) =>
        val rgb = Array.tabulate(w * h * 3)(i => ((i * 131 + 7) % 256).toByte)
        val out = ppmResize(Ppm(w, h, rgb), dw, dh)
        val expect = for {
          v <- 0 until dh; u <- 0 until dw; c <- 0 until 3
        } yield rgb(((v * h / dh) * w + (u * w / dw)) * 3 + c)
        out.w == dw && out.h == dh && out.rgb.toSeq == expect
    })
  }
}
