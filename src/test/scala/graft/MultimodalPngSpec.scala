package graft

import graft.engine.ml.Multimodal.{PngCodec, pngRoundTripStats}
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 gates for the PNG codec (the first compressed multimodal
  * format — WavCodec discipline): round-trip across ALL FIVE scanline
  * filters, independent-decoder gates in BOTH directions against
  * javax.imageio's PNG codec, per-field tamper tests including CRC
  * corruption, and a closed-form recomputation pin for the declared
  * query's stats.
  */
class MultimodalPngSpec extends AnyFunSuite {

  private val w = 13
  private val h = 9
  private val pixels = Array.tabulate(w * h) { i =>
    val x = i % w; val y = i / w
    (((x * 37 + y * 11) % 256) << 16) |
      (((x * 5 + y * 73) % 256) << 8) | ((x * 97 + y * 3) % 256)
  }

  test("encode/decode round-trips pixels under every filter type") {
    for (ft <- 0 to 4) {
      val bytes = PngCodec.encodeRgb24(w, h, pixels, _ => ft)
      val dec = PngCodec.decodeRgb24(bytes)
      assert(dec.ok, s"filter $ft failed to decode")
      assert(dec.width == w && dec.height == h)
      assert(dec.rawLen == (1L + 3 * w) * h)
      assert(dec.pixels.toSeq == pixels.toSeq, s"filter $ft pixel drift")
    }
    // mixed filters per row — the declared query's corpus shape
    val mixed = PngCodec.encodeRgb24(w, h, pixels, y => y % 5)
    assert(PngCodec.decodeRgb24(mixed).pixels.toSeq == pixels.toSeq)
  }

  test("the JDK's independent javax.imageio reader accepts our bytes") {
    val bytes = PngCodec.encodeRgb24(w, h, pixels, y => (y + 2) % 5)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "imageio rejected our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) == pixels(y * w + x),
        s"pixel ($x,$y) disagrees with imageio")
  }

  test("our decoder reads javax.imageio's independently-written bytes") {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, pixels(y * w + x))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val dec = PngCodec.decodeRgb24(out.toByteArray)
    assert(dec.ok, "our decoder rejected imageio's PNG")
    assert(dec.width == w && dec.height == h)
    assert(dec.pixels.toSeq == pixels.toSeq,
      "pixels decoded from imageio's bytes disagree")
  }

  test("tampered signature, IHDR fields, CRC or truncation fail decode") {
    val good = PngCodec.encodeRgb24(w, h, pixels, y => y % 5)
    def tampered(off: Int, b: Byte) = { val c = good.clone(); c(off) = b; c }
    // re-stamp the IHDR CRC after the flip so the FIELD validation
    // branch is exercised, not just the CRC check (r13 review: with a
    // stale CRC these assertions passed without ever reaching the
    // bitDepth/colorType/interlace checks)
    def ihdrField(off: Int, b: Byte) = {
      val c = good.clone(); c(off) = b
      val crc = new java.util.zip.CRC32
      crc.update(c, 12, 4 + 13)
      java.nio.ByteBuffer.wrap(c).putInt(12 + 4 + 13, crc.getValue.toInt)
      c
    }
    assert(!PngCodec.decodeRgb24(tampered(0, 'X'.toByte)).ok) // signature
    assert(!PngCodec.decodeRgb24(ihdrField(24, 16)).ok) // bit depth 16
    assert(!PngCodec.decodeRgb24(ihdrField(25, 6)).ok) // color type RGBA
    assert(!PngCodec.decodeRgb24(ihdrField(26, 1)).ok) // compression 1
    assert(!PngCodec.decodeRgb24(ihdrField(27, 1)).ok) // filter method 1
    assert(!PngCodec.decodeRgb24(ihdrField(28, 1)).ok) // interlaced
    // stale-CRC variants of the same flips: the CRC layer catches them
    assert(!PngCodec.decodeRgb24(tampered(24, 16)).ok)
    assert(!PngCodec.decodeRgb24(tampered(28, 1)).ok)
    // flip one byte INSIDE the IDAT payload: the chunk CRC must catch it
    assert(!PngCodec.decodeRgb24(tampered(8 + 25 + 8 + 2,
      (good(8 + 25 + 8 + 2) ^ 0x55).toByte)).ok)
    assert(!PngCodec.decodeRgb24(good.dropRight(13)).ok) // no IEND
    assert(!PngCodec.decodeRgb24(Array[Byte](1, 2, 3)).ok)
    assert(!PngCodec.decodeRgb24(good.take(8 + 25)).ok) // header only
  }

  test("spec-invalid chunk ordering fails even with valid CRCs") {
    val good = PngCodec.encodeRgb24(w, h, pixels, y => y % 5)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length)
      out.put(typ.getBytes("US-ASCII")); out.put(data)
      val crc = new java.util.zip.CRC32
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val sig = good.take(8)
    val ihdr = good.slice(8, 8 + 25)
    val rest = good.drop(8 + 25) // IDAT..IEND
    val anc = chunk("teXt", Array[Byte](1, 2)) // ancillary (lowercase t)
    val crit = chunk("QRST", Array[Byte](1, 2)) // unknown CRITICAL
    // baseline: an ancillary chunk between IHDR and IDAT is fine
    assert(PngCodec.decodeRgb24(sig ++ ihdr ++ anc ++ rest).ok)
    // IHDR must be the FIRST chunk
    assert(!PngCodec.decodeRgb24(sig ++ anc ++ ihdr ++ rest).ok)
    // unknown critical chunk must fail, not skip
    assert(!PngCodec.decodeRgb24(sig ++ ihdr ++ crit ++ rest).ok)
    // IDAT run interrupted by another chunk, then more IDAT: fail
    val idatLen = java.nio.ByteBuffer.wrap(good).getInt(8 + 25)
    val idat = good.slice(8 + 25, 8 + 25 + 12 + idatLen)
    val iend = good.takeRight(12)
    val split = idat.length / 2
    // (re-chunk the two halves so each carries a valid CRC)
    val payload = idat.slice(8, 8 + idatLen)
    val half1 = chunk("IDAT", payload.take(split))
    val half2 = chunk("IDAT", payload.drop(split))
    // consecutive halves decode fine (multi-IDAT support)
    assert(PngCodec.decodeRgb24(sig ++ ihdr ++ half1 ++ half2 ++ iend).ok)
    // an ancillary chunk BETWEEN the halves breaks consecutiveness
    assert(!PngCodec.decodeRgb24(
      sig ++ ihdr ++ half1 ++ anc ++ half2 ++ iend).ok)
  }

  /** Rebuild a PNG from the good one with its IDAT payload replaced
    * and the chunk CRC re-stamped — reaches the zlib layer with valid
    * chunk framing. */
  private def withIdat(good: Array[Byte], idat: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.wrap(good)
    val ihdrEnd = 8 + 12 + 13
    val out = java.nio.ByteBuffer.allocate(ihdrEnd + 12 + idat.length + 12)
    out.put(good, 0, ihdrEnd)
    out.putInt(idat.length)
    out.put("IDAT".getBytes("US-ASCII"))
    out.put(idat)
    val crc = new java.util.zip.CRC32
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(idat)
    out.putInt(crc.getValue.toInt)
    out.put(good, good.length - 12, 12) // IEND
    assert(bb.getInt(ihdrEnd) >= 0)
    out.array()
  }

  test("FDICT zlib stream fails decode instead of hanging; stripped " +
      "adler trailer fails instead of skipping the checksum") {
    val good = PngCodec.encodeRgb24(w, h, pixels)
    // raw filtered stream the good IDAT would inflate to
    val stride = 3 * w
    val raw = new Array[Byte]((1 + stride) * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = pixels(y * w + x)
      val o = y * (1 + stride) + 1 + 3 * x
      raw(o) = ((p >> 16) & 0xff).toByte
      raw(o + 1) = ((p >> 8) & 0xff).toByte
      raw(o + 2) = (p & 0xff).toByte
    }
    // FDICT: deflate with a preset dictionary — Inflater then returns
    // 0 forever with needsDictionary()=true (the r13 hang finding)
    val defl = new java.util.zip.Deflater()
    defl.setDictionary("dict".getBytes("US-ASCII"))
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val os = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) os.write(buf, 0, defl.deflate(buf))
    defl.end()
    assert(!PngCodec.decodeRgb24(withIdat(good, os.toByteArray)).ok)
    // stripped adler-32 trailer: inflates to exactly rawLen but the
    // integrity checksum is never reached — must fail, not pass
    val d2 = new java.util.zip.Deflater()
    d2.setInput(raw); d2.finish()
    val os2 = new java.io.ByteArrayOutputStream()
    while (!d2.finished()) os2.write(buf, 0, d2.deflate(buf))
    d2.end()
    val full = os2.toByteArray
    assert(!PngCodec.decodeRgb24(withIdat(good, full.dropRight(4))).ok)
    // sanity: the same reassembly with the COMPLETE stream decodes
    assert(PngCodec.decodeRgb24(withIdat(good, full)).ok)
  }

  test("a crafted Int-wrapping IHDR dimension fails instead of throwing") {
    val good = PngCodec.encodeRgb24(w, h, pixels)
    def withDim(off: Int, v: Int) = {
      val c = good.clone()
      val bb = java.nio.ByteBuffer.wrap(c)
      bb.putInt(off, v)
      // re-stamp the IHDR CRC so the dimension check itself is hit
      val crc = new java.util.zip.CRC32
      crc.update(c, 12, 4 + 13)
      bb.putInt(12 + 4 + 13, crc.getValue.toInt)
      c
    }
    for (bad <- Seq(0x40000000, Int.MaxValue, 716000000)) {
      assert(!PngCodec.decodeRgb24(withDim(16, bad)).ok) // width
      assert(!PngCodec.decodeRgb24(withDim(20, bad)).ok) // height
    }
    // the ENCODER also rejects wrap-prone dimensions cleanly (65536^2
    // wraps width*height to 0 in Int, so a length-0 pixel array would
    // otherwise slip past the require and AIOOBE mid-encode)
    intercept[IllegalArgumentException] {
      PngCodec.encodeRgb24(65536, 65536, Array.empty[Int])
    }
  }

  test("pngRoundTripStats matches a direct closed-form recomputation") {
    for (id <- Seq(0L, 1L, 7L, 59L, 12345L, 999983L)) {
      val wI = (8 + id % 11).toInt
      val hI = (8 + id % 5).toInt
      val dd = (id % 239).toInt
      def r(x: Int, y: Int) = (dd * 2 + x * 5 + y * 13) % 256
      def g(x: Int, y: Int) = (dd * 11 + x * 3 + y * 7) % 256
      def b(x: Int, y: Int) = (dd * 5 + x * 17 + y * 2) % 256
      val st = pngRoundTripStats(id)
      assert(st.header_ok)
      assert(st.width == wI && st.height == hI)
      assert(st.raw_len == (1L + 3 * wI) * hI)
      val coords = for (y <- 0 until hI; x <- 0 until wI) yield (x, y)
      assert(st.r_sum == coords.map { case (x, y) => r(x, y).toLong }.sum)
      assert(st.g_sum == coords.map { case (x, y) => g(x, y).toLong }.sum)
      assert(st.b_sum == coords.map { case (x, y) => b(x, y).toLong }.sum)
      val edges = (for (y <- 0 until hI; x <- 1 until wI) yield {
        val l0 = r(x - 1, y) + g(x - 1, y) + b(x - 1, y)
        val l1 = r(x, y) + g(x, y) + b(x, y)
        if (math.abs(l1 - l0) > 128) 1L else 0L
      }).sum
      assert(st.edges == edges)
    }
  }
}
