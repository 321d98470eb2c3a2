package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** MediaCodec: real container bytes in, parsed metadata out. */
class MediaCodecSpec extends AnyFunSuite {

  test("PNG round trip: real signature, IHDR dims, CRC32, IEND") {
    val b = MediaCodec.encodePng(640, 480)
    assert(b.length == 45)
    // real PNG magic
    assert((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
    val m = MediaCodec.parse(b)
    assert(m.kind == "image/png" && m.width == 640 && m.height == 480 &&
      m.frames == 1)
    // IHDR CRC is a real CRC32 over type+data
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13)
    val stored = ((b(29) & 0xFFL) << 24) | ((b(30) & 0xFFL) << 16) |
      ((b(31) & 0xFFL) << 8) | (b(32) & 0xFFL)
    assert(stored == (crc.getValue & 0xFFFFFFFFL))
  }

  test("JPEG round trip: SOI/APP0/SOF0 walk finds dimensions") {
    val b = MediaCodec.encodeJpeg(1024, 3)
    assert(b.length == 41)
    assert((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
    val m = MediaCodec.parse(b)
    assert(m.kind == "image/jpeg" && m.width == 1024 && m.height == 3)
  }

  test("WAV round trip: RIFF chunk walk computes frames from data/fmt") {
    val b = MediaCodec.encodeWav(16000, 75)
    assert(b.length == 44 + 150)
    val m = MediaCodec.parse(b)
    assert(m.kind == "audio/wav" && m.sampleRate == 16000 && m.frames == 75)
  }

  test("WAV PCM decode + audio features: real 16-bit LE samples round-trip") {
    // hand-built PCM: a square wave ±1000 → known RMS and crossings
    val samples = Array.tabulate(40)(k => if (k % 4 < 2) 1000 else -1000)
    val dataBytes = samples.flatMap(s =>
      Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte))
    val wav =
      "RIFF".getBytes("US-ASCII") ++
        Array[Byte]((36 + 80).toByte, 0, 0, 0) ++
        "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
        Array[Byte](16, 0, 0, 0, 1, 0, 1, 0) ++
        Array[Byte](0x40, 0x1F, 0, 0) ++ // 8000 Hz
        Array[Byte]((0x80 & 0xFF).toByte, 0x3E, 0, 0, 2, 0, 16, 0) ++
        "data".getBytes("US-ASCII") ++ Array[Byte](80, 0, 0, 0) ++ dataBytes
    val pcm = MediaCodec.wavPcmSamples(wav)
    assert(pcm.toSeq == samples.toSeq)
    val f = MediaCodec.audioFeatures(pcm, 8000)
    assert(f.nSamples == 40)
    assert(f.rms == 1000.0) // constant magnitude → RMS exact
    assert(f.zeroCrossings == 19) // sign flips every 2 samples over 40
    assert(f.durationMs == 40 * 1000 / 8000)
    // synthesized payloads decode too
    val synth = MediaCodec.encodeWav(16000, 50)
    assert(MediaCodec.wavPcmSamples(synth).length == 50)
    assert(MediaCodec.wavPcmSamples(Array.fill(20)(1.toByte)).isEmpty)
  }

  test("malformed payloads parse as unknown, never throw") {
    assert(MediaCodec.parse(null).kind == "unknown")
    assert(MediaCodec.parse(Array.empty[Byte]).kind == "unknown")
    assert(MediaCodec.parse(Array.fill(32)(0x42.toByte)).kind == "unknown")
    // truncated PNG: signature only
    assert(MediaCodec.parse(MediaCodec.encodePng(5, 5).take(10)).kind == "unknown")
    // JPEG with EOI before any SOF
    assert(MediaCodec.parse(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte) ++ Array.fill(10)(0.toByte))
      .kind == "unknown")
  }

  test("synthesize: formulas match the parsed facts for all three kinds") {
    for (id <- 0L until 30L) {
      val b = MediaCodec.synthesize(id)
      val m = MediaCodec.parse(b)
      (id % 3) match {
        case 0 =>
          assert(m.kind == "image/png")
          assert(m.width == MediaCodec.pngWidth(id))
          assert(m.height == MediaCodec.pngHeight(id))
        case 1 =>
          assert(m.kind == "image/jpeg")
          assert(m.width == MediaCodec.pngWidth(id))
          assert(m.height == MediaCodec.pngHeight(id))
        case _ =>
          assert(m.kind == "audio/wav")
          assert(m.sampleRate == MediaCodec.wavSampleRate(id))
          assert(m.frames == MediaCodec.wavSamples(id))
      }
    }
  }
}
