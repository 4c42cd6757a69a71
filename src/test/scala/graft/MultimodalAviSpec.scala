package graft

import graft.engine.ml.Multimodal.{AviCodec, aviRoundTripStats}
import org.scalatest.funsuite.AnyFunSuite

/** Golden gates for the REAL byte-level AVI codec (round 12): the
  * encoded container must round-trip frames exactly (row flip, stride
  * padding, movi order), survive a spec-valid JUNK chunk, and refuse
  * tampered headers. No JDK AVI reader exists for an independent-
  * decoder gate (WAV has javax.sound, BMP has javax.imageio), so the
  * header fields are additionally asserted byte-by-byte against the
  * spec layout the encoder claims to write.
  */
class MultimodalAviSpec extends AnyFunSuite {

  private val w = 5 // 15-byte rows -> 1 pad byte per row
  private val h = 3
  private val frames = Array.tabulate(4)(f =>
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((11 * x + 3 * f + 7) % 256 << 16) |
        ((5 * y + 17 * f + 1) % 256 << 8) | ((x * 31 + y * 13 + f) % 256)
    })

  test("DIB24 encode/decode round-trips frames and dims exactly") {
    val bytes = AviCodec.encodeDib24(w, h, frames)
    val dec = AviCodec.decodeDib24(bytes)
    assert(dec.ok)
    assert(dec.width == w && dec.height == h)
    assert(dec.frames.length == frames.length)
    dec.frames.zip(frames).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
  }

  test("header fields sit at the spec offsets the encoder claims") {
    val bytes = AviCodec.encodeDib24(w, h, frames, fps = 10)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    assert(tag(0) == "RIFF" && tag(8) == "AVI ")
    assert(bb.getInt(4) == bytes.length - 8) // RIFF size
    assert(tag(12) == "LIST" && tag(20) == "hdrl")
    assert(tag(24) == "avih" && bb.getInt(28) == 56)
    assert(bb.getInt(32) == 100000) // usec/frame at 10 fps
    assert(bb.getInt(32 + 16) == frames.length) // dwTotalFrames
    assert(bb.getInt(32 + 32) == w && bb.getInt(32 + 36) == h)
    // total size matches the closed form the oracle replays
    val fs = h * ((3 * w + 3) / 4 * 4)
    assert(bytes.length == 232 + frames.length * (24 + fs))
  }

  test("a JUNK padding chunk between hdrl and movi still decodes") {
    val bytes = AviCodec.encodeDib24(w, h, frames)
    val hdrlEnd = 12 + 8 + 192 // RIFF hdr + LIST hdrl chunk
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ Array.fill[Byte](6)(0x55)
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, hdrlEnd)
    out.write(junk)
    out.write(bytes, hdrlEnd, bytes.length - hdrlEnd)
    val spliced = out.toByteArray
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8) // fix RIFF size
    val dec = AviCodec.decodeDib24(spliced)
    assert(dec.ok, "chunk walk must skip a JUNK chunk")
    assert(dec.frames.length == frames.length)
    dec.frames.zip(frames).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
  }

  test("tampered signature, size, frame length or count fail the decode") {
    val good = AviCodec.encodeDib24(w, h, frames)
    def tampered(off: Int, b: Byte) = { val c = good.clone(); c(off) = b; c }
    assert(!AviCodec.decodeDib24(tampered(0, 'X'.toByte)).ok) // RIFF
    assert(!AviCodec.decodeDib24(tampered(8, 'X'.toByte)).ok) // AVI
    assert(!AviCodec.decodeDib24(tampered(4, 1)).ok) // RIFF size
    assert(!AviCodec.decodeDib24(tampered(32 + 16, 9)).ok) // frame count
    assert(!AviCodec.decodeDib24(good.dropRight(4)).ok) // truncated
    assert(!AviCodec.decodeDib24(Array[Byte](1, 2, 3)).ok)
  }

  test("encodeDib24 rejects dimensions that would wrap the Short rcFrame") {
    // rcFrame right/bottom are written as Shorts; without a bound a
    // >32767 dimension silently corrupts the emitted header for
    // external consumers (decode ignores rcFrame, masking it).
    intercept[IllegalArgumentException] {
      AviCodec.encodeDib24(40000, 2, Array(new Array[Int](80000)))
    }
    intercept[IllegalArgumentException] {
      AviCodec.encodeDib24(2, 40000, Array(new Array[Int](80000)))
    }
  }

  test("aviRoundTripStats matches a direct closed-form recomputation") {
    for (id <- Seq(0L, 1L, 7L, 59L, 12345L, 999983L)) {
      val wI = (8 + id % 5).toInt
      val hI = (8 + id % 3).toInt
      val nF = (4 + id % 4).toInt
      val dd = (id % 251).toInt
      def b(x: Int, y: Int, f: Int) = (dd * 3 + x * 7 + y * 11 + f * 19) % 256
      def g(x: Int, y: Int, f: Int) = (dd * 5 + x * 13 + y * 3 + f * 23) % 256
      def r(x: Int, y: Int, f: Int) = (dd * 7 + x * 2 + y * 17 + f * 29) % 256
      val st = aviRoundTripStats(id)
      assert(st.header_ok)
      assert(st.width == wI && st.height == hI && st.n_frames == nF)
      val fs = hI * ((3 * wI + 3) / 4 * 4)
      assert(st.n_bytes == 232 + nF * (24 + fs))
      val sites = for (f <- 0 until nF; y <- 0 until hI; x <- 0 until wI)
        yield (x, y, f)
      assert(st.b_sum == sites.map { case (x, y, f) => b(x, y, f).toLong }.sum)
      assert(st.g_sum == sites.map { case (x, y, f) => g(x, y, f).toLong }.sum)
      assert(st.r_sum == sites.map { case (x, y, f) => r(x, y, f).toLong }.sum)
      val motion = sites.filter(_._3 > 0).count { case (x, y, f) =>
        val lum = b(x, y, f) + g(x, y, f) + r(x, y, f)
        val prev = b(x, y, f - 1) + g(x, y, f - 1) + r(x, y, f - 1)
        math.abs(lum - prev) > 128
      }
      assert(st.motion == motion)
    }
  }
}
