package graft

/** hand-built HOSTILE media blobs for the decode-bomb guard specs:
  * tiny real byte counts whose headers declare enormous decoded sizes
  * — the exact shape a poisoned crawl/upload feed delivers
  */
object CraftedMedia {

  /** 64-byte PNG whose IHDR declares w×h — tiny bytes, huge claim */
  def craftedPng(w: Long, h: Long): Array[Byte] = {
    val out = new Array[Byte](64)
    val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig.indices.foreach(i => out(i) = sig(i).toByte)
    val bb = java.nio.ByteBuffer.wrap(out)
    bb.position(8); bb.putInt(13); bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w.toInt); bb.putInt(h.toInt)
    bb.put(8.toByte); bb.put(2.toByte) // bit depth 8, truecolor
    out
  }

  /** small GIF whose block stream declares `frames` full-canvas frames */
  def craftedGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le16(w); le16(h); bos.write(0); bos.write(0); bos.write(0) // no GCT
    for (_ <- 0 until frames) {
      bos.write(0x2c); le16(0); le16(0); le16(w); le16(h); bos.write(0) // descriptor
      bos.write(2) // LZW min code size
      bos.write(1); bos.write(0x42) // one 1-byte data sub-block
      bos.write(0) // sub-block terminator
    }
    bos.write(0x3b)
    bos.toByteArray
  }
}
