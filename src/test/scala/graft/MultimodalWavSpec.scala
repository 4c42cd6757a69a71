package graft

import graft.engine.ml.Multimodal.{WavCodec, wavRoundTripStats}
import org.scalatest.funsuite.AnyFunSuite

/** Golden gates for the REAL byte-level WAV codec (round 11): the
  * encoded bytes must round-trip exactly, be accepted by the JDK's
  * own independent javax.sound parser with the same sample values,
  * and the decoder must refuse tampered headers. The oracle-side
  * check (CORRECTNESS) proves stats parity; these prove the BYTES are
  * a spec-conformant WAV, which the oracle cannot see.
  */
class MultimodalWavSpec extends AnyFunSuite {

  private val samples =
    Array[Short](0, 1000, -1000, 32767, -32768, 7, -7)

  test("PCM16 encode/decode round-trips samples and header exactly") {
    val bytes = WavCodec.encodePcm16(samples, 8000)
    assert(bytes.length == 44 + samples.length * 2)
    val dec = WavCodec.decodePcm16(bytes)
    assert(dec.ok)
    assert(dec.sampleRate == 8000)
    assert(dec.channels == 1)
    assert(dec.bits == 16)
    assert(dec.samples.toSeq == samples.toSeq)
  }

  test("the JDK's independent javax.sound parser accepts our bytes") {
    import javax.sound.sampled.AudioSystem
    val bytes = WavCodec.encodePcm16(samples, 8000)
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f)
    assert(fmt.getChannels == 1)
    assert(fmt.getSampleSizeInBits == 16)
    assert(!fmt.isBigEndian)
    assert(in.getFrameLength == samples.length)
    val raw = in.readAllBytes()
    val bb = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val jdkSamples = Array.fill(samples.length)(bb.getShort())
    assert(jdkSamples.toSeq == samples.toSeq,
      "JDK-decoded PCM differs from the samples we encoded")
  }

  test("tampered magic, format or length fields fail the decode") {
    val good = WavCodec.encodePcm16(samples, 8000)
    def tampered(off: Int, b: Byte) = {
      val c = good.clone(); c(off) = b; c
    }
    assert(!WavCodec.decodePcm16(tampered(0, 'X'.toByte)).ok) // RIFF
    assert(!WavCodec.decodePcm16(tampered(8, 'X'.toByte)).ok) // WAVE
    assert(!WavCodec.decodePcm16(tampered(20, 9)).ok) // fmt != PCM
    assert(!WavCodec.decodePcm16(tampered(34, 8)).ok) // bits != 16
    assert(!WavCodec.decodePcm16(good.dropRight(2)).ok) // truncated
    assert(!WavCodec.decodePcm16(Array[Byte](1, 2, 3)).ok)
  }

  test("wavRoundTripStats matches a direct waveform recomputation") {
    for (id <- Seq(0L, 1L, 63L, 64L, 12345L)) {
      val n = (64 + id % 64).toInt
      val s = Array.tabulate(n)(i => (id * 31 + i * 17) % 2001 - 1000)
      val st = wavRoundTripStats(id, 8000)
      assert(st.header_ok)
      assert(st.n_bytes == 44 + 2 * n)
      assert(st.sample_rate == 8000)
      assert(st.n_samples == n)
      assert(st.peak_abs == s.map(math.abs).max)
      assert(st.sum_sq == s.map(v => v * v).sum)
      val zc = (1 until n).count(i => (s(i - 1) < 0) != (s(i) < 0))
      assert(st.zero_crossings == zc)
    }
  }
}
