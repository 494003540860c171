package graft.functions

/** Base58 (Bitcoin alphabet) codec — the reference's hashes, keys and
  * signatures are base58 strings (CryptoHash fields at
  * borealis-indexer/src/main.rs:131-163). Implemented from the public
  * algorithm description; no external dependency.
  */
object Base58 {
  private val Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val Indexes: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def encode(input: Array[Byte]): String = {
    if (input.isEmpty) return ""
    var zeros = 0
    while (zeros < input.length && input(zeros) == 0) zeros += 1
    val num = input.clone()
    val sb = new StringBuilder
    var start = zeros
    // repeated divmod 58 over the big-endian byte array
    while (start < num.length) {
      var rem = 0
      var i = start
      while (i < num.length) {
        val digit = (num(i) & 0xff) + (rem << 8)
        num(i) = (digit / 58).toByte
        rem = digit % 58
        i += 1
      }
      sb.append(Alphabet(rem))
      if (num(start) == 0) start += 1
    }
    ("1" * zeros) + sb.reverse.toString
  }

  def decode(input: String): Array[Byte] = {
    if (input.isEmpty) return Array.emptyByteArray
    var zeros = 0
    while (zeros < input.length && input(zeros) == '1') zeros += 1
    val bytes = new Array[Byte](input.length) // upper bound
    var length = 0
    var i = zeros
    while (i < input.length) {
      val c = input(i)
      val digit = if (c < 128) Indexes(c.toInt) else -1
      if (digit < 0) throw new IllegalArgumentException(s"invalid base58 char '$c'")
      var carry = digit
      var j = 0
      while (j < length || carry != 0) {
        carry += 58 * (bytes(j) & 0xff)
        bytes(j) = (carry & 0xff).toByte
        carry >>= 8
        j += 1
      }
      length = j
      i += 1
    }
    val out = new Array[Byte](zeros + length)
    var k = 0
    while (k < length) { out(zeros + k) = bytes(length - 1 - k); k += 1 }
    out
  }
}
