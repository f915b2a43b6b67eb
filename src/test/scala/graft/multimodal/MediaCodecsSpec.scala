package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real-decode multimodal seam: the BMP/WAV codecs behind
  * q_multimodal_decode_real. Golden-byte fixtures assert the exact binary
  * layout (headers, bottom-up rows, row padding, little-endian samples);
  * round trips assert decode inverts encode; the RIFF chunk walk is
  * exercised with an unknown chunk AND an odd-sized chunk (pad byte);
  * malformed payloads must throw, not mis-decode. */
class MediaCodecsSpec extends AnyFunSuite {

  // ------------------------------------------------------------------ BMP

  test("BMP golden bytes: 2x2 image encodes to the documented layout") {
    // pixels top-down row-major, (B,G,R) triples
    val data = Array[Byte](
      1, 2, 3, 4, 5, 6, // top row: px(0,0)=(1,2,3) px(0,1)=(4,5,6)
      7, 8, 9, 10, 11, 12) // bottom row
    val p = MediaCodecs.encodeBmp(2, 2, data)
    assert(p.length === 54 + 2 * (6 + 2)) // 2 rows of 6 data + 2 pad
    assert(p(0) === 'B'.toByte && p(1) === 'M'.toByte)
    assert(p(10) === 54.toByte) // bfOffBits
    assert(p(18) === 2.toByte && p(22) === 2.toByte) // width, height
    assert(p(28) === 24.toByte) // bpp
    // pixel array starts with the BOTTOM image row
    assert(p.slice(54, 60).toSeq === Seq[Byte](7, 8, 9, 10, 11, 12))
    assert(p(60) === 0.toByte && p(61) === 0.toByte) // row padding
    assert(p.slice(62, 68).toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("BMP round trip: decode inverts encode incl. padding and row order") {
    val w = 15 // 45-byte rows -> 3 pad bytes (the query geometry)
    val h = 4
    val data = Array.tabulate[Byte](w * h * 3)(i => ((i * 7 + 3) % 251).toByte)
    val img = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(w, h, data))
    assert(img.width === w && img.height === h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      assert(img.pixels(y)(x) ===
        ((data(o) & 0xff, data(o + 1) & 0xff, data(o + 2) & 0xff)),
        s"pixel ($x,$y)")
    }
  }

  test("BMP honors bfOffBits gaps (color-table bytes before pixels)") {
    val p = MediaCodecs.encodeBmp(1, 1, Array[Byte](10, 20, 30))
    // splice 8 junk bytes between headers and pixel array, patch bfOffBits
    val gap = Array[Byte](9, 9, 9, 9, 9, 9, 9, 9)
    val spliced = p.take(54) ++ gap ++ p.drop(54)
    spliced(10) = (54 + 8).toByte
    val img = MediaCodecs.decodeBmp(spliced)
    assert(img.pixels(0)(0) === ((10, 20, 30)))
  }

  test("BMP rejects malformed payloads") {
    val ok = MediaCodecs.encodeBmp(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp("notabitmap".getBytes ++ new Array[Byte](60))
    }.getMessage.contains("magic"))
    val truncated = ok.dropRight(3)
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(truncated)
    }.getMessage.contains("truncated"))
    val bpp8 = ok.clone(); bpp8(28) = 8
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(bpp8)
    }.getMessage.contains("bpp"))
  }

  // ------------------------------------------------------------------ WAV

  test("WAV golden bytes: header fields and little-endian samples") {
    val p = MediaCodecs.encodeWav(8000, Array[Short](1, -1, 256))
    assert(p.length === 44 + 6)
    assert(new String(p.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(p.slice(8, 12), "US-ASCII") === "WAVE")
    assert(p(20) === 1.toByte && p(22) === 1.toByte) // PCM, mono
    assert(((p(24) & 0xff) | ((p(25) & 0xff) << 8)) === 8000 % 65536)
    assert(p(34) === 16.toByte) // bits
    assert(p.slice(44, 50).toSeq ===
      Seq[Byte](1, 0, -1, -1, 0, 1)) // 1, -1, 256 little-endian
  }

  test("WAV round trip preserves every sample incl. extremes") {
    val samples = Array[Short](0, 1, -1, 127, -128, 32767, -32768, 12345)
    val wav = MediaCodecs.decodeWav(MediaCodecs.encodeWav(44100, samples))
    assert(wav.channels === 1 && wav.sampleRate === 44100 && wav.bitsPerSample === 16)
    assert(wav.samples.toSeq === samples.toSeq)
  }

  test("WAV chunk walk skips unknown and odd-sized chunks") {
    val p = MediaCodecs.encodeWav(8000, Array[Short](5, -5))
    // build: RIFF hdr + LIST chunk (odd size 3 -> 1 pad byte) + rest of p
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 42, 42, 42, 0)
    val spliced = p.take(12) ++ extra ++ p.drop(12)
    val wav = MediaCodecs.decodeWav(spliced)
    assert(wav.samples.toSeq === Seq[Short](5, -5))
  }

  test("WAV rejects malformed payloads") {
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav("RIFXjunkWAVE".getBytes ++ new Array[Byte](8))
    }.getMessage.contains("RIFF"))
    val p = MediaCodecs.encodeWav(8000, Array[Short](1))
    val noData = p.take(36) // drop the data chunk
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav(noData)
    }.getMessage.contains("data chunk"))
  }

  test("WAV rejects a declared chunk size that overflows Int arithmetic") {
    // data-chunk size 0x7ffffff0: body + size overflows Int to negative,
    // which an Int-arithmetic bounds check would PASS — and the decoder
    // would then attempt a ~2 GB allocation. The Long-math guard must
    // reject it as truncated instead (same class as the BMP dimension
    // guard).
    val p = MediaCodecs.encodeWav(8000, Array[Short](1, 2, 3))
    val hostile = p.clone()
    val dataAt = p.indexOfSlice("data".getBytes("US-ASCII"))
    assert(dataAt > 0)
    hostile(dataAt + 4) = 0xf0.toByte
    hostile(dataAt + 5) = 0xff.toByte
    hostile(dataAt + 6) = 0xff.toByte
    hostile(dataAt + 7) = 0x7f.toByte
    assert(intercept[IllegalArgumentException] {
      MediaCodecs.decodeWav(hostile)
    }.getMessage.contains("truncated"))
  }
}
