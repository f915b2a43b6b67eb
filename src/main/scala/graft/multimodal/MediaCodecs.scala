package graft.multimodal

/** Pure-JVM media codecs for the multimodal column family — the real-decode
  * counterpart to the documented stub seam in MultimodalQueries (the same
  * playbook as text/PdfText.scala for F12: zero dependencies, a genuine
  * binary format, fully spec-covered).
  *
  * Two uncompressed container formats with real structure to parse:
  *
  *   - BMP (Windows device-independent bitmap): BITMAPFILEHEADER +
  *     BITMAPINFOHEADER, 24-bit BGR pixel array stored BOTTOM-UP with each
  *     row padded to a 4-byte boundary. The decoder validates the magic,
  *     follows bfOffBits to the pixel array (so optional color tables /
  *     gap bytes are handled), walks rows bottom-up, and skips padding.
  *   - WAV (RIFF/WAVE): chunk-walked container — the decoder iterates the
  *     chunk list (handling unknown chunks like LIST/INFO by skipping
  *     their declared size, plus the RIFF odd-size pad byte), reads the
  *     fmt chunk (PCM, mono, 16-bit) and decodes the data chunk's
  *     little-endian signed samples.
  *
  * Reference behavior modeled: the reference's binary-document path
  * (pe-org-air-platform/app/pipelines/document_parser.py:61-77) decodes
  * opaque uploaded payloads into typed features; these codecs give the
  * Spark engine the same capability for image/audio payloads without any
  * native library.
  *
  * All multi-byte integers are little-endian per both formats' specs.
  */
object MediaCodecs {

  // ---------------------------------------------------------------- BMP --

  /** Decoded 24-bit image: `pixels(y)(x)` = (b, g, r) with y=0 the TOP row
    * (the decoder un-reverses BMP's bottom-up storage). */
  final case class BmpImage(width: Int, height: Int,
      pixels: Array[Array[(Int, Int, Int)]])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def w16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def w32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  /** Bytes of padding after each BMP pixel row (rows align to 4 bytes). */
  def bmpRowPad(width: Int): Int = (4 - (width * 3) % 4) % 4

  /** Encode a 24-bit uncompressed BMP. `data` supplies the pixel-array
    * bytes in ROW-MAJOR TOP-DOWN (B,G,R per pixel) reading order — exactly
    * `width*height*3` bytes; the encoder writes rows bottom-up with
    * padding, as the format requires. */
  def encodeBmp(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    require(data.length == width * height * 3,
      s"need ${width * height * 3} pixel bytes, got ${data.length}")
    val pad = bmpRowPad(width)
    val rowBytes = width * 3 + pad
    val pixelArraySize = rowBytes * height
    val out = new java.io.ByteArrayOutputStream(54 + pixelArraySize)
    // BITMAPFILEHEADER (14 bytes)
    out.write('B'); out.write('M')
    w32(out, 54 + pixelArraySize) // bfSize
    w16(out, 0); w16(out, 0) // reserved
    w32(out, 54) // bfOffBits
    // BITMAPINFOHEADER (40 bytes)
    w32(out, 40) // biSize
    w32(out, width)
    w32(out, height) // positive => bottom-up
    w16(out, 1) // planes
    w16(out, 24) // bpp
    w32(out, 0) // BI_RGB (uncompressed)
    w32(out, pixelArraySize)
    w32(out, 2835); w32(out, 2835) // 72 dpi
    w32(out, 0); w32(out, 0) // palette
    // pixel array: bottom row first
    var y = height - 1
    while (y >= 0) {
      out.write(data, y * width * 3, width * 3)
      var p = 0
      while (p < pad) { out.write(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** Decode a 24-bit uncompressed bottom-up BMP. Throws on malformed
    * payloads (bad magic, unsupported bpp/compression, truncation). */
  def decodeBmp(payload: Array[Byte]): BmpImage = {
    require(payload.length >= 54, "BMP truncated before headers")
    require(payload(0) == 'B' && payload(1) == 'M', "not a BMP (magic)")
    val offBits = le32(payload, 10)
    val width = le32(payload, 18)
    val height = le32(payload, 22)
    val bpp = le16(payload, 28)
    val compression = le32(payload, 30)
    require(bpp == 24, s"unsupported bpp $bpp (only 24-bit)")
    require(compression == 0, s"unsupported compression $compression")
    require(width > 0 && height > 0, "unsupported dimensions")
    // size checks in Long: a hostile header (width ~ 2^30) overflows the
    // 32-bit products to negative, which would pass the require and turn
    // "throws on malformed" into a multi-GB allocation bomb
    val pad = bmpRowPad(width)
    val rowBytesL = width.toLong * 3 + pad
    require(offBits >= 0 &&
      payload.length.toLong >= offBits.toLong + rowBytesL * height,
      "pixel array truncated")
    val rowBytes = rowBytesL.toInt // safe: bounded by payload.length above
    val px = Array.ofDim[(Int, Int, Int)](height, width)
    var y = 0
    while (y < height) {
      // storage row y holds image row (height-1-y): bottom-up
      val base = offBits + y * rowBytes
      val iy = height - 1 - y
      var x = 0
      while (x < width) {
        val o = base + x * 3
        px(iy)(x) = (payload(o) & 0xff, payload(o + 1) & 0xff, payload(o + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, px)
  }

  // ---------------------------------------------------------------- WAV --

  /** Decoded PCM audio: 16-bit signed samples, channel-interleaved. */
  final case class WavAudio(channels: Int, sampleRate: Int,
      bitsPerSample: Int, samples: Array[Short])

  /** Encode a mono 16-bit PCM WAV at the given rate. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    w32(out, 36 + dataSize) // RIFF size
    out.write('W'); out.write('A'); out.write('V'); out.write('E')
    out.write('f'); out.write('m'); out.write('t'); out.write(' ')
    w32(out, 16) // fmt chunk size
    w16(out, 1) // PCM
    w16(out, 1) // mono
    w32(out, sampleRate)
    w32(out, sampleRate * 2) // byte rate
    w16(out, 2) // block align
    w16(out, 16) // bits per sample
    out.write('d'); out.write('a'); out.write('t'); out.write('a')
    w32(out, dataSize)
    samples.foreach { s => w16(out, s & 0xffff) }
    out.toByteArray
  }

  /** Decode a PCM WAV by walking the RIFF chunk list — unknown chunks
    * (LIST, fact, …) are skipped by their declared size (+ the odd-size
    * pad byte the RIFF spec requires), so chunk order doesn't matter.
    * Throws on malformed payloads or non-PCM/non-16-bit encodings. */
  def decodeWav(payload: Array[Byte]): WavAudio = {
    require(payload.length >= 12, "WAV truncated before RIFF header")
    require(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F', "not a RIFF container")
    require(payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' &&
      payload(11) == 'E', "not a WAVE form")
    var pos = 12
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var samples: Array[Short] = null
    while (pos + 8 <= payload.length) {
      val id = new String(payload.slice(pos, pos + 4), "US-ASCII")
      val size = le32(payload, pos + 4)
      val body = pos + 8
      // Long math, mirroring the BMP guard: a hostile declared size near
      // Int.MaxValue would overflow `body + size` to negative, pass an
      // Int-arithmetic check, and the data branch would then attempt a
      // ~2 GB allocation / out-of-bounds reads. After this require, all
      // Int arithmetic below is overflow-safe (body + size ≤ length).
      require(size >= 0 && body.toLong + size <= payload.length,
        s"chunk $id truncated")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          val tag = le16(payload, body)
          require(tag == 1, s"unsupported format tag $tag (only PCM)")
          channels = le16(payload, body + 2)
          sampleRate = le32(payload, body + 4)
          bits = le16(payload, body + 14)
          require(bits == 16, s"unsupported bits/sample $bits (only 16)")
        case "data" =>
          require(bits == 16, "data chunk before fmt chunk")
          val n = size / 2
          val arr = new Array[Short](n)
          var i = 0
          while (i < n) {
            arr(i) = ((payload(body + 2 * i) & 0xff) |
              ((payload(body + 2 * i + 1) & 0xff) << 8)).toShort
            i += 1
          }
          samples = arr
        case _ => () // unknown chunk: skip
      }
      pos = body + size + (size % 2) // RIFF pads odd chunks to even
    }
    require(samples != null, "no data chunk")
    WavAudio(channels, sampleRate, bits, samples)
  }
}
