package graft

import graft.engine.ml.Multimodal.{BmpCodec, bmpRoundTripStats}
import org.scalatest.funsuite.AnyFunSuite

/** Golden gates for the REAL byte-level BMP codec (round 12): the
  * encoded bytes must round-trip exactly (including the bottom-up row
  * flip and 4-byte row padding), be accepted by the JDK's own
  * independent javax.imageio BMP reader with identical pixels, and the
  * decoder must refuse tampered headers. The oracle-side check
  * (CORRECTNESS) proves stats parity; these prove the BYTES are a
  * spec-conformant BMP, which the oracle cannot see.
  */
class MultimodalBmpSpec extends AnyFunSuite {

  // 5 wide (15-byte rows -> 1 pad byte) x 3 tall: exercises padding
  // and the bottom-up flip with an asymmetric image
  private val w = 5
  private val h = 3
  private val pixels = Array.tabulate(w * h) { i =>
    val x = i % w; val y = i / w
    ((17 * x + 5) % 256 << 16) | ((31 * y + 9) % 256 << 8) |
      ((x * 40 + y * 70) % 256)
  }

  test("BGR24 encode/decode round-trips pixels and header exactly") {
    val bytes = BmpCodec.encodeBgr24(w, h, pixels)
    // 54-byte header + 3 rows of 16 (15 data + 1 pad)
    assert(bytes.length == 54 + 3 * 16)
    val dec = BmpCodec.decodeBgr24(bytes)
    assert(dec.ok)
    assert(dec.width == w)
    assert(dec.height == h)
    assert(dec.pixels.toSeq == pixels.toSeq)
  }

  test("the JDK's independent javax.imageio reader accepts our bytes") {
    val bytes = BmpCodec.encodeBgr24(w, h, pixels)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the BMP bytes")
    assert(img.getWidth == w)
    assert(img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) == pixels(y * w + x),
        s"JDK-decoded pixel ($x,$y) differs from what we encoded")
  }

  test("a width that needs no padding also round-trips") {
    val w4 = 4; val h4 = 2 // 12-byte rows, already 4-aligned
    val px = Array.tabulate(w4 * h4)(i => (i * 37 + 11) % 0xffffff)
    val dec = BmpCodec.decodeBgr24(BmpCodec.encodeBgr24(w4, h4, px))
    assert(dec.ok && dec.pixels.toSeq == px.toSeq)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(BmpCodec.encodeBgr24(w4, h4, px)))
    for (y <- 0 until h4; x <- 0 until w4)
      assert((img.getRGB(x, y) & 0xffffff) == px(y * w4 + x))
  }

  test("tampered magic, bpp, compression or size fields fail the decode") {
    val good = BmpCodec.encodeBgr24(w, h, pixels)
    def tampered(off: Int, b: Byte) = { val c = good.clone(); c(off) = b; c }
    assert(!BmpCodec.decodeBgr24(tampered(0, 'X'.toByte)).ok) // signature
    assert(!BmpCodec.decodeBgr24(tampered(28, 8)).ok) // bpp != 24
    assert(!BmpCodec.decodeBgr24(tampered(30, 1)).ok) // compressed
    assert(!BmpCodec.decodeBgr24(good.dropRight(2)).ok) // truncated
    assert(!BmpCodec.decodeBgr24(Array[Byte](1, 2, 3)).ok)
  }

  test("a crafted Int-wrapping width fails the decode instead of throwing") {
    // width >= ~716M wraps 3*width negative in 32-bit arithmetic; the
    // bounds check must run in Long so this returns ok=false rather
    // than escaping as AIOOBE/NegativeArraySizeException (ADVICE r12).
    val good = BmpCodec.encodeBgr24(w, h, pixels)
    def withInt(off: Int, v: Int) = {
      val c = good.clone()
      java.nio.ByteBuffer.wrap(c)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(off, v)
      c
    }
    for (wBad <- Seq(716000000, Int.MaxValue, 0x40000000)) {
      val r = BmpCodec.decodeBgr24(withInt(18, wBad)) // width field
      assert(!r.ok)
    }
    // height large enough that width*height overflows Int
    assert(!BmpCodec.decodeBgr24(withInt(22, Int.MaxValue / 2)).ok)
  }

  test("bmpRoundTripStats matches a direct closed-form recomputation") {
    for (id <- Seq(0L, 1L, 8L, 62L, 12345L, 999983L)) {
      val wI = (8 + id % 9).toInt
      val hI = (8 + id % 7).toInt
      val dd = (id % 251).toInt
      def b(x: Int, y: Int) = (dd * 3 + x * 7 + y * 11) % 256
      def g(x: Int, y: Int) = (dd * 5 + x * 13 + y * 3) % 256
      def r(x: Int, y: Int) = (dd * 7 + x * 2 + y * 17) % 256
      val st = bmpRoundTripStats(id)
      assert(st.header_ok)
      assert(st.width == wI && st.height == hI)
      assert(st.n_bytes == 54 + hI * ((3 * wI + 3) / 4 * 4))
      val coords = for (y <- 0 until hI; x <- 0 until wI) yield (x, y)
      assert(st.b_sum == coords.map { case (x, y) => b(x, y).toLong }.sum)
      assert(st.g_sum == coords.map { case (x, y) => g(x, y).toLong }.sum)
      assert(st.r_sum == coords.map { case (x, y) => r(x, y).toLong }.sum)
      val edges = (for (y <- 0 until hI; x <- 1 until wI) yield {
        val l0 = b(x - 1, y) + g(x - 1, y) + r(x - 1, y)
        val l1 = b(x, y) + g(x, y) + r(x, y)
        if (math.abs(l1 - l0) > 128) 1L else 0L
      }).sum
      assert(st.edges == edges)
    }
  }

  test("chunk-walking WAV decode handles a LIST chunk before data") {
    import graft.engine.ml.Multimodal.WavCodec
    val samples = Array[Short](3, -4, 500, -32768, 32767)
    val canonical = WavCodec.encodePcm16(samples, 8000)
    // splice a 10-byte LIST chunk (odd payload -> pad byte) between
    // fmt and data: spec-valid, rejected by the old fixed-offset parse
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0) // pad to even
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(canonical, 0, 36) // RIFF..WAVE + fmt chunk
    spliced.write(listChunk)
    spliced.write(canonical, 36, canonical.length - 36) // data chunk
    val bytes = spliced.toByteArray
    // fix the RIFF size field for the extra chunk
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bytes.length - 8)
    val dec = WavCodec.decodePcm16(bytes)
    assert(dec.ok, "chunk-walking parse must accept a LIST chunk")
    assert(dec.sampleRate == 8000)
    assert(dec.samples.toSeq == samples.toSeq)
  }
}
