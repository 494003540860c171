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
}
