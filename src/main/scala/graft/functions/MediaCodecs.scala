package graft.functions

/** REAL pure-JVM media container codecs: hand-written RIFF/PCM WAV
  * (audio) and PPM P6 (image) parsers for the uncompressed formats,
  * plus the JDK's own ImageIO codecs for PNG (lossless), JPEG (lossy)
  * and multi-frame animated GIF — so the multimodal pipeline's decode
  * step is genuinely real for every JDK-reachable format; the only
  * media gap is perceptual codecs the JDK itself lacks (MP3/H.264),
  * because this container ships no external codec libraries — their
  * decoder would slot into [[graft.llm.Multimodal]]'s router arms.
  *
  * Everything here is byte-exact and integer-only on the hot path, so
  * decoded statistics are reproducible by the DuckDB oracle from the
  * same integer formulas — a wrong header offset, endianness slip, or
  * off-by-one in either the writer or the parser diverges the numbers
  * and fails the hash gate.
  */
object MediaCodecs {

  // ---------------------------------------------------------------- WAV

  /** minimal RIFF/WAVE writer: PCM16 mono little-endian, the canonical
    * 44-byte header layout
    */
  def wavWrite(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen) // riff chunk size
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // fmt chunk size (PCM)
    buf.putShort(1) // audio format: PCM
    buf.putShort(1) // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    for (s <- samples) buf.putShort(s)
    buf.array()
  }

  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Short])

  /** real RIFF parser: walks the chunk list (tolerating extra chunks
    * like LIST/INFO in any position and odd-length chunk padding per
    * the RIFF spec), reads the fmt contract, decodes the data chunk's
    * little-endian PCM16 frames. Throws on structural corruption
    * rather than guessing.
    */
  def wavParse(bytes: Array[Byte]): Wav = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12, s"truncated RIFF: ${bytes.length} bytes")
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt // riff size (trusted only as a hint; chunk walk is bounded by the buffer)
    require(tag() == "WAVE", "RIFF is not WAVE")
    var sampleRate = -1; var channels = -1; var bits = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      require(size >= 0 && size <= buf.remaining(), s"chunk $id overruns container")
      val chunkStart = buf.position()
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmt = buf.getShort
          require(fmt == 1, s"not PCM (format $fmt)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
        case "data" =>
          data = new Array[Byte](size)
          buf.get(data)
        case _ => () // skip unknown chunk (LIST, fact, ...)
      }
      // advance to next chunk: declared size + RIFF word-align padding —
      // CLAMPED to the buffer, because writers commonly omit the final
      // pad byte after an odd-size trailing chunk (a spec-legal file
      // that a raw position() call would reject with an off-by-one)
      buf.position(math.min(chunkStart + size + (size & 1), buf.limit()))
    }
    require(sampleRate > 0 && bits == 16 && channels == 1,
      s"unsupported fmt: rate=$sampleRate bits=$bits ch=$channels")
    require(data != null, "no data chunk")
    val n = data.length / 2
    val out = new Array[Short](n)
    val db = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { out(i) = db.getShort; i += 1 }
    Wav(sampleRate, channels, bits, out)
  }

  // ------------------------------------------------- G.711 μ-law WAV

  /** G.711 μ-law compressor — the classic CCITT segment algorithm
    * (clip 32635, bias 0x84, floor-log2 segment, truncated 4-bit
    * mantissa), hand-written so the DuckDB oracle can replay
    * encode∘decode as pure integer math. The DECODE side goes through
    * the JDK's own javax.sound codec ([[ulawWavDecode]]); CodecSpec
    * proves the two agree on every one of the 256 codewords.
    */
  def ulawEncode(sample: Short): Byte = {
    val v = sample.toInt
    val sign = if (v < 0) 0x80 else 0
    val m = math.min(math.abs(v), 32635) + 132
    val e = 31 - Integer.numberOfLeadingZeros(m) - 7 // floor-log2(m) − 7; m ≥ 132 ⇒ e ∈ [0,7]
    val mant = (m >> (e + 3)) & 0x0f
    (~(sign | (e << 4) | mant)).toByte
  }

  /** the G.711 expansion formula — what the oracle replays in SQL and
    * what the spec checks the JDK codec's output against, code by code
    */
  def ulawExpand(code: Byte): Short = {
    val u = (~code) & 0xff
    val t = (((u & 0x0f) << 3) + 132) << ((u >> 4) & 7)
    (if ((u & 0x80) != 0) 132 - t else t - 132).toShort
  }

  /** RIFF/WAVE writer for the COMPRESSED telephony layout: format tag
    * 7 (WAVE_FORMAT_MULAW), 8 bits/sample, block align 1, and the
    * 18-byte fmt chunk (cbSize = 0) non-PCM formats require
    */
  def ulawWavWrite(codes: Array[Byte], sampleRate: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer
      .allocate(46 + codes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(38 + codes.length) // riff chunk size
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(18) // fmt chunk size (non-PCM: 16 + cbSize field)
    buf.putShort(7) // audio format: WAVE_FORMAT_MULAW
    buf.putShort(1) // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate) // byte rate: 1 byte/sample
    buf.putShort(1) // block align
    buf.putShort(8) // bits per sample
    buf.putShort(0) // cbSize: no format extension
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(codes.length)
    buf.put(codes)
    buf.array()
  }

  /** REAL compressed-audio decode via the JDK's own javax.sound codec
    * stack — WaveFileReader parses the format-tag-7 container, the
    * ULAW→PCM_SIGNED FormatConversionProvider expands the companded
    * bytes to 16-bit linear; no external library, and no stub. Returns
    * (sampleRate, PCM16 samples).
    */
  def ulawWavDecode(bytes: Array[Byte]): (Int, Array[Short]) = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val src = ais.getFormat
      require(src.getEncoding == AudioFormat.Encoding.ULAW,
        s"not a μ-law stream: ${src.getEncoding}")
      require(src.getChannels == 1, s"unsupported channels: ${src.getChannels}")
      val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, 1, 2, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(dst, ais)
      val out = pcm.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val samples = new Array[Short](out.length / 2)
      var i = 0
      while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
      (src.getSampleRate.toInt, samples)
    } finally ais.close()
  }

  // --------------------------------------------- AIFF / AU (javax.sound)

  /** Decode an AIFF or AU container through the JDK's own javax.sound
    * readers, normalized to interleaved PCM16 (whatever the stored
    * encoding — 8/16-bit PCM, μ-law AU — the JDK converter widens it).
    * Multi-channel containers keep their interleaving; the stats /
    * fingerprint arms operate per sample, so channels ride through.
    */
  def javaSoundParse(bytes: Array[Byte]): Wav = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val src = ais.getFormat
      val ch = src.getChannels
      require(ch > 0, s"channel-less audio stream")
      val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, ch, 2 * ch, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(dst, ais)
      val out = pcm.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val samples = new Array[Short](out.length / 2)
      var i = 0
      while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
      Wav(src.getSampleRate.toInt, ch, 16, samples)
    } finally ais.close()
  }

  private def javaSoundWrite(samples: Array[Short], sampleRate: Int,
      kind: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, true) // AIFF/AU are BE
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) >> 8).toByte
      raw(2 * i + 1) = samples(i).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    try AudioSystem.write(ais, kind, out) finally ais.close()
    out.toByteArray
  }

  /** mono PCM16 AIFF writer (fixtures + sinks), JDK encoder */
  def aiffWrite(samples: Array[Short], sampleRate: Int): Array[Byte] =
    javaSoundWrite(samples, sampleRate,
      javax.sound.sampled.AudioFileFormat.Type.AIFF)

  /** mono PCM16 Sun AU writer (fixtures + sinks), JDK encoder */
  def auWrite(samples: Array[Short], sampleRate: Int): Array[Byte] =
    javaSoundWrite(samples, sampleRate,
      javax.sound.sampled.AudioFileFormat.Type.AU)

  // ------------------------------------------------ BMP / TIFF (ImageIO)

  private def imageIoWrite(w: Int, h: Int, rgb: Array[Byte], fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(i) & 0xff) << 16) |
          ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK $fmt writer")
    out.toByteArray
  }

  /** 24-bit BMP writer (fixtures + sinks) — lossless, JDK encoder */
  def bmpWrite(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    imageIoWrite(w, h, rgb, "bmp")

  /** TIFF writer (fixtures + sinks) — lossless, the JDK 9+ plugin */
  def tiffWrite(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    imageIoWrite(w, h, rgb, "tiff")

  // -------------------------------------------------- container sniff

  /** magic-byte format detection across the whole codec ladder —
    * what a real ingest must do, because arriving blobs carry no
    * trustworthy kind column. Returns the format token
    * (`png | jpeg | gif | ppm | bmp | tiff | wav-pcm | wav-ulaw |
    * aiff | au`) or None for anything unrecognized; WAV disambiguates
    * the audio format by walking the RIFF chunks to the fmt tag
    * (1 = PCM, 7 = μ-law), because the 12-byte RIFF/WAVE prelude is
    * identical for both. BMP additionally checks that the DIB header
    * size field names a known header revision ("BM" alone is two ASCII
    * letters any text file can open with). Sniffing never throws: a
    * torn header is just None.
    */
  def sniff(bytes: Array[Byte]): Option[String] = {
    def at(i: Int) = if (i < bytes.length) bytes(i) & 0xff else -1
    def ascii(from: Int, s: String): Boolean =
      bytes.length >= from + s.length &&
        s.indices.forall(i => at(from + i) == s.charAt(i).toInt)
    if (at(0) == 0x89 && ascii(1, "PNG") && at(4) == 0x0d && at(5) == 0x0a &&
      at(6) == 0x1a && at(7) == 0x0a) Some("png")
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("jpeg")
    else if (ascii(0, "GIF87a") || ascii(0, "GIF89a")) Some("gif")
    else if (ascii(0, "P6") && (at(2) == ' ' || at(2) == '\n' || at(2) == '\t' ||
      at(2) == '\r' || at(2) == '#')) Some("ppm")
    else if (at(0) == 'B' && at(1) == 'M' && bytes.length >= 26 && {
      // the DIB header size field (LE u32 at 14) must name a known
      // revision: CORE 12, INFO 40, V2 52, V3 56, OS/2 64, V4 108, V5 124
      val dib = at(14).toLong | (at(15).toLong << 8) |
        (at(16).toLong << 16) | (at(17).toLong << 24)
      Set(12L, 40L, 52L, 56L, 64L, 108L, 124L).contains(dib)
    }) Some("bmp")
    else if ((at(0) == 0x49 && at(1) == 0x49 && at(2) == 0x2a && at(3) == 0x00) ||
      (at(0) == 0x4d && at(1) == 0x4d && at(2) == 0x00 && at(3) == 0x2a)) Some("tiff")
    else if (ascii(0, "FORM") && ascii(8, "AIFF")) Some("aiff")
    else if (ascii(0, ".snd")) Some("au")
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) {
      // walk chunks to the fmt tag; bail to None on any structural tear
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.position(12)
      var res: Option[String] = None
      var go = true
      while (go && buf.remaining() >= 8) {
        val id = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
        val size = buf.getInt
        if (size < 0 || size > buf.remaining()) go = false // torn chunk: None
        else if (id == "fmt " && size >= 2) {
          res = buf.getShort.toInt match {
            case 1 => Some("wav-pcm")
            case 7 => Some("wav-ulaw")
            case _ => None // a WAV we cannot decode is unrecognized
          }
          go = false
        } else {
          // bounded advance: an odd-size unpadded TRAILING chunk would
          // put position past the limit and throw — sniffing never
          // throws, so a pad that runs off the end just ends the walk
          val next = buf.position().toLong + size + (size & 1)
          if (next >= buf.limit()) go = false
          else buf.position(next.toInt)
        }
      }
      res
    } else None
  }

  // ----------------------------------- header bounds (decode-bomb guard)

  /** thrown by the decode guard BEFORE any codec runs: the header
    * declares more decoded units than the caller's budget allows. A
    * dedicated type so ingest surfaces can verdict `rejected:oversize`
    * distinctly from `rejected:corrupt`.
    */
  final class OversizeMediaException(msg: String) extends RuntimeException(msg)

  /** default decode budget in UNITS (pixels·frames / samples): 2^26 ≈
    * 67M units ≈ a 192 MB RGB raster or 128 MB PCM buffer — roomy for
    * any legitimate single blob, and small enough that one guarded
    * decode can never take out an executor task. Callers facing an
    * untrusted feed pass their own (usually tighter) budget.
    */
  val MaxDeclaredUnits: Long = 1L << 26

  /** Decoded size in UNITS (pixels·frames for rasters, samples for
    * audio) declared by the HEADER ALONE — no codec entered, no
    * allocation proportional to the declaration, O(header) work. This
    * is the armor between [[sniff]] and the real decode: a crafted
    * 64-byte PNG header can declare a 10^9-pixel raster, and the JDK
    * codec would earnestly attempt the multi-GB allocation
    * (`OutOfMemoryError` is not catchable-in-place, and Spark's task
    * retry would replay the same poison pill), so the guard must read
    * the claim WITHOUT honoring it.
    *
    * Returns -1 when the header is too torn to declare anything — every
    * covered format makes its dimensions reachable by a bounded header
    * walk (PNG's IHDR is the mandatory first chunk; every JPEG carries
    * a SOF segment; GIF/PPM/WAV dimensions precede the payload), so -1
    * means the real decoder would reject the blob anyway.
    */
  def declaredUnits(fmt: String, bytes: Array[Byte]): Long = {
    def u8(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    def be32(i: Int): Long =
      if (i + 3 >= bytes.length) -1L
      else ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3))
    def le16(i: Int): Int = if (i + 1 >= bytes.length) -1 else u8(i) | (u8(i + 1) << 8)
    def be16(i: Int): Int = if (i + 1 >= bytes.length) -1 else (u8(i) << 8) | u8(i + 1)
    fmt match {
      case "png" =>
        // 8-byte signature, then the mandatory IHDR chunk: len+type at
        // 8..15, width/height as the first two big-endian u32 fields
        if (bytes.length < 24 || be32(8) != 13L ||
          !(u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')) -1L
        else {
          val w = be32(16); val h = be32(20)
          if (w <= 0 || h <= 0) -1L else w * h
        }
      case "jpeg" =>
        // segment walk to the first SOFn marker (C0–CF minus C4/C8/CC),
        // whose payload is [len][precision][height u16][width u16]
        var i = 2; var units = -1L // -1 = still walking; -2 = torn (mapped to -1 below)
        while (units == -1L && i + 3 < bytes.length) {
          if (u8(i) != 0xff) units = -2L // desynced marker stream: torn
          else {
            val m = u8(i + 1)
            if (m == 0xff) i += 1 // fill bytes before a marker are legal
            else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
            else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              val h = be16(i + 5); val w = be16(i + 7)
              units = if (w > 0 && h > 0) w.toLong * h else -2L
            } else {
              val len = be16(i + 2)
              if (len < 2) units = -2L else i += 2 + len
            }
          }
        }
        math.max(units, -1L)
      case "gif" =>
        // logical screen w/h, then a block walk COUNTING image
        // descriptors (the per-frame cost is the full canvas, so units
        // = w·h·frames); sub-block skipping never decodes LZW data
        val w = le16(6); val h = le16(8)
        if (w <= 0 || h <= 0 || bytes.length < 14) -1L
        else {
          var i = 13
          if ((u8(10) & 0x80) != 0) i += 3 * (1 << ((u8(10) & 7) + 1)) // global color table
          var frames = 0L; var go = true
          def skipSubBlocks(): Unit = {
            var n = u8(i)
            while (n > 0) { i += 1 + n; n = u8(i) }
            i += 1 // the 0-length terminator
          }
          while (go && i < bytes.length) {
            u8(i) match {
              case 0x2c => // image descriptor
                frames += 1
                val packed = u8(i + 9)
                i += 10
                if (packed >= 0 && (packed & 0x80) != 0) i += 3 * (1 << ((packed & 7) + 1))
                i += 1 // LZW minimum code size
                skipSubBlocks()
              case 0x21 => i += 2; skipSubBlocks() // extension: label then sub-blocks
              case 0x3b => go = false // trailer
              case _ => go = false // torn block stream: frames so far stand
            }
          }
          if (frames == 0) -1L else w.toLong * h * frames
        }
      case "ppm" =>
        // the decoder's own header tokenizer, stopped before the raster
        var pos = 2; var w = -1L; var h = -1L
        def token(): String = {
          var in = true
          while (in && pos < bytes.length) {
            val c = bytes(pos)
            if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
            else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
            else in = false
          }
          val start = pos
          while (pos < bytes.length && !" \n\r\t".contains(bytes(pos).toChar)) pos += 1
          new String(bytes, start, pos - start, "US-ASCII")
        }
        try { w = token().toLong; h = token().toLong } catch { case _: NumberFormatException => }
        if (w <= 0 || h <= 0) -1L else w * h
      case "bmp" =>
        // BITMAPFILEHEADER (14 bytes) then the DIB header: CORE (12)
        // carries u16 w/h; every later revision carries i32 w/h, with
        // a NEGATIVE height meaning top-down row order (same pixel
        // count)
        def le32i(i: Int): Long =
          if (i + 3 >= bytes.length) Long.MinValue
          else (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong
        val dib = le32i(14)
        val (w, h) =
          if (dib == 12L) (le16(18).toLong, le16(20).toLong)
          else (le32i(18), math.abs(le32i(22)))
        if (w <= 0 || h <= 0 || h == Long.MinValue) -1L else w * h
      case "tiff" =>
        // bounded walk of the FIRST image file directory: width is tag
        // 256, height tag 257, each a left-justified SHORT or LONG in
        // the entry's 4-byte value field
        if (bytes.length < 8) -1L
        else {
          val le = u8(0) == 0x49
          def r16(i: Int): Int = if (le) le16(i) else be16(i)
          def r32(i: Int): Long =
            if (i + 3 >= bytes.length) -1L
            else if (le) (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | (u8(i + 3).toLong << 24)
            else be32(i)
          val ifd = r32(4)
          if (ifd < 8 || ifd + 2 > bytes.length) -1L
          else {
            val n = r16(ifd.toInt)
            var w = -1L; var h = -1L
            var k = 0
            while (k < n && ifd + 2 + 12L * k + 12 <= bytes.length) {
              val off = (ifd + 2 + 12L * k).toInt
              val tag = r16(off); val typ = r16(off + 2)
              val v: Long =
                if (typ == 3) r16(off + 8).toLong // SHORT, left-justified
                else if (typ == 4) r32(off + 8)   // LONG
                else -1L
              if (tag == 256) w = v else if (tag == 257) h = v
              k += 1
            }
            if (w <= 0 || h <= 0) -1L else w * h
          }
        }
      case "aiff" =>
        // big-endian IFF chunk walk to COMM: channels u16, then
        // numSampleFrames u32; units = frames x channels (samples)
        if (bytes.length < 12) -1L
        else {
          var i = 12; var units = -1L
          while (units == -1L && i + 8 <= bytes.length) {
            val id = new String(bytes, i, 4, "US-ASCII")
            val size = be32(i + 4)
            if (size < 0 || i + 8 + size > bytes.length) units = -2L // torn
            else if (id == "COMM" && size >= 6) {
              val ch = be16(i + 8); val frames = be32(i + 10)
              units = if (ch > 0 && frames > 0) frames * ch else -2L
            } else i += 8 + size.toInt + (size.toInt & 1)
          }
          math.max(units, -1L)
        }
      case "au" =>
        // fixed big-endian header: dataOffset, dataSize, encoding;
        // 0xffffffff dataSize means "to EOF"
        if (bytes.length < 24) -1L
        else {
          val dataOff = be32(4)
          val rawSize = be32(8)
          val size =
            if (rawSize == 0xffffffffL) bytes.length.toLong - dataOff else rawSize
          val bytesPer = be32(12) match {
            case 1L | 2L | 27L => 1L // μ-law / 8-bit PCM / A-law
            case 3L => 2L            // 16-bit PCM
            case 4L => 3L
            case 5L | 6L => 4L
            case 7L => 8L
            case _ => -1L
          }
          if (dataOff < 24 || size <= 0 || bytesPer <= 0) -1L else size / bytesPer
        }
      case "wav-pcm" | "wav-ulaw" =>
        // chunk walk to the data chunk's declared byte size; PCM16 is
        // 2 bytes/sample, μ-law 1 (its decode expands 2x — bounded)
        val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        if (bytes.length < 12) -1L
        else {
          buf.position(12)
          var units = -1L // -1 = still walking; -2 = torn (mapped to -1 below)
          while (units == -1L && buf.remaining() >= 8) {
            val id = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
            val size = buf.getInt
            if (size < 0 || size > buf.remaining()) units = -2L // torn
            else if (id == "data") units = if (fmt == "wav-pcm") size / 2L else size.toLong
            else {
              val next = buf.position().toLong + size + (size & 1)
              if (next >= buf.limit()) units = -2L
              else buf.position(next.toInt)
            }
          }
          math.max(units, -1L)
        }
      case _ => -1L // unknown token: no header knowledge, caller decides
    }
  }

  // ---------------------------------------------------------------- PPM

  /** minimal PPM P6 writer: binary RGB, maxval 255 */
  def ppmWrite(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"pixel buffer ${rgb.length} != ${w * h * 3}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  final case class Ppm(w: Int, h: Int, rgb: Array[Byte])

  /** real PPM P6 parser: handles the spec's whitespace runs and
    * `#`-comment lines between header tokens, asserts maxval 255,
    * reads exactly w*h*3 raster bytes
    */
  def ppmParse(bytes: Array[Byte]): Ppm = {
    var pos = 0
    def skipWs(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val c = bytes(pos)
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
        else in = false
      }
    }
    def token(): String = {
      skipWs()
      val start = pos
      while (pos < bytes.length && !" \n\r\t".contains(bytes(pos).toChar)) pos += 1
      new String(bytes, start, pos - start, "US-ASCII")
    }
    require(token() == "P6", "not a P6 PPM")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(maxval == 255, s"unsupported maxval $maxval")
    pos += 1 // the single whitespace byte after maxval, per spec
    require(bytes.length - pos >= w * h * 3,
      s"raster truncated: ${bytes.length - pos} < ${w * h * 3}")
    val rgb = java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3)
    Ppm(w, h, rgb)
  }

  /** real nearest-neighbor resize on a parsed raster: integer source
    * mapping `src = dst * srcDim / dstDim` (floor), byte-exact and
    * therefore oracle-reproducible
    */
  def ppmResize(img: Ppm, dw: Int, dh: Int): Ppm = {
    val out = new Array[Byte](dw * dh * 3)
    var v = 0
    while (v < dh) {
      val sy = v * img.h / dh
      var u = 0
      while (u < dw) {
        val sx = u * img.w / dw
        val si = (sy * img.w + sx) * 3
        val di = (v * dw + u) * 3
        out(di) = img.rgb(si); out(di + 1) = img.rgb(si + 1); out(di + 2) = img.rgb(si + 2)
        u += 1
      }
      v += 1
    }
    Ppm(dw, dh, out)
  }

  /** REAL compressed-image encode: 8-bit RGB PNG via the JDK's own
    * codec (`javax.imageio` — zlib/deflate + PNG filters live in
    * `java.base`/`java.desktop`, no external library). PNG is
    * LOSSLESS, so a decode must return the exact raster — which is
    * what makes a compressed codec oracle-checkable at all: the
    * statistics of the decoded pixels equal the generator formulas
    * bit-for-bit, same as the uncompressed PPM path.
    */
  def pngWrite(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"pixel buffer ${rgb.length} != ${w * h * 3}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", bos))
      throw new IllegalStateException("JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** REAL lossy encode: baseline JPEG through the JDK codec (default
    * quality). Decoded pixels are NOT the input pixels — consumers
    * must assert bounded-error invariants, never equality (m09).
    */
  def jpegWrite(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"pixel buffer ${rgb.length} != ${w * h * 3}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "jpeg", bos))
      throw new IllegalStateException("JDK JPEG writer unavailable")
    bos.toByteArray
  }

  /** REAL compressed-image decode: inflate + defilter through the JDK
    * PNG reader, back to the packed RGB raster ([[Ppm]] is just "a
    * raster" — the container it came from doesn't matter downstream).
    */
  def pngParse(bytes: Array[Byte]): Ppm = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException("not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val i = (y * w + x) * 3
        rgb(i) = ((p >> 16) & 0xff).toByte
        rgb(i + 1) = ((p >> 8) & 0xff).toByte
        rgb(i + 2) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Ppm(w, h, rgb)
  }

  // ---------------------------------------------------------------- GIF

  /** a decoded multi-frame animation: packed RGB raster per frame */
  case class GifAnim(w: Int, h: Int, frames: Seq[Array[Byte]])

  /** the web-safe 6-level-per-channel palette (216 entries, level*51):
    * every color is exactly representable in a GIF's 8-bit palette, so
    * the LZW round-trip is lossless BY CONSTRUCTION and multi-frame
    * decode becomes hash-checkable (the m08 lossless argument extended
    * to an animated container)
    */
  private lazy val WebSafePalette: java.awt.image.IndexColorModel = {
    val n = 216
    val r = new Array[Byte](n); val g = new Array[Byte](n); val b = new Array[Byte](n)
    var i = 0
    while (i < n) {
      r(i) = ((i / 36) * 51).toByte
      g(i) = (((i / 6) % 6) * 51).toByte
      b(i) = ((i % 6) * 51).toByte
      i += 1
    }
    new java.awt.image.IndexColorModel(8, n, r, g, b)
  }

  /** ANIMATED GIF writer through the JDK's own encoder
    * (`writeToSequence`): each frame is a full-canvas palette-indexed
    * raster (indices into [[WebSafePalette]], r*36 + g*6 + b levels).
    * Multi-frame + LZW-compressed — the real container m03's frame
    * sampling needed, with zero non-JDK libraries.
    */
  def gifWrite(w: Int, h: Int, frameIndices: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (fr <- frameIndices) {
        require(fr.length == w * h, s"frame raster ${fr.length} != ${w * h}")
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, WebSafePalette)
        img.getRaster.setDataElements(0, 0, w, h, fr)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** REAL multi-frame decode: the JDK GIF reader LZW-decompresses every
    * frame back to its palette raster; frames come back as full-canvas
    * packed RGB (our writer emits full frames, so no disposal
    * compositing is needed — asserted by the frame dimensions).
    */
  def gifParse(bytes: Array[Byte]): GifAnim = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "not a decodable image container")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, "no frames in container")
      val first = reader.read(0)
      val (w, h) = (first.getWidth, first.getHeight)
      def rgbOf(img: java.awt.image.BufferedImage): Array[Byte] = {
        require(img.getWidth == w && img.getHeight == h,
          s"partial frame ${img.getWidth}x${img.getHeight} in a full-frame stream")
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val i = (y * w + x) * 3
            rgb(i) = ((p >> 16) & 0xff).toByte
            rgb(i + 1) = ((p >> 8) & 0xff).toByte
            rgb(i + 2) = (p & 0xff).toByte
            x += 1
          }
          y += 1
        }
        rgb
      }
      GifAnim(w, h, rgbOf(first) +: (1 until n).map(i => rgbOf(reader.read(i))))
    } finally { reader.dispose(); iis.close() }
  }
}
