package graft

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AvCodec

/** Audio/video codec tests: WAV encode->decode round-trips (RIFF chunk
  * walk, real PCM16 sample decode — exact RMS/peak), MP4 box-structure
  * round-trips (mvhd v0 + hand-crafted v1, trak counting, largesize
  * and unknown-box handling), malformed-payload totality. */
class AvCodecSpec extends AnyFunSuite {

  test("WAV square-wave round-trip: rate/channels/frames + exact RMS/peak") {
    val samples = AvCodec.squareWave(nFrames = 480, channels = 2,
      amplitude = 5000, halfPeriod = 3)
    val bytes = AvCodec.encodeWavPcm16(16000, 2, samples)
    val d = AvCodec.decodeWav(bytes).get
    assert(d.format == "wav" && d.sampleRate == 16000 && d.channels == 2)
    assert(d.bitsPerSample == 16 && d.nFrames == 480L)
    assert(d.durationS == 480.0 / 16000)
    assert(d.rms == 5000.0 && d.peak == 5000)
  }

  test("WAV decode: arbitrary PCM16 samples give the exact fold RMS") {
    val samples = Array.tabulate(101)(i => ((i * 523) % 30000 - 15000).toShort)
    val bytes = AvCodec.encodeWavPcm16(8000, 1, samples)
    val d = AvCodec.decodeWav(bytes).get
    val sumSq = samples.foldLeft(0.0)((a, s) => a + s.toDouble * s.toDouble)
    assert(d.rms == math.sqrt(sumSq / samples.length))
    assert(d.peak == samples.map(s => math.abs(s.toInt)).max)
    assert(d.nFrames == 101L)
  }

  test("WAV chunk walk skips unknown chunks and honors odd-length padding") {
    // craft: RIFF [LIST(3 bytes, padded)] [fmt ] [data]
    val base = AvCodec.encodeWavPcm16(8000, 1,
      AvCodec.squareWave(10, 1, 1234, 2))
    val out = new ByteArrayOutputStream()
    out.write(base, 0, 12) // RIFF header + WAVE
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte](3, 0, 0, 0)) // odd length 3
    out.write(Array[Byte](1, 2, 3, 0)) // 3 payload + 1 pad byte
    out.write(base, 12, base.length - 12) // fmt + data
    val crafted = out.toByteArray
    // fix the RIFF size field (bytes 4..7, little-endian)
    val riffLen = crafted.length - 8
    for (i <- 0 until 4) crafted(4 + i) = ((riffLen >>> (8 * i)) & 0xff).toByte
    val d = AvCodec.decodeWav(crafted).get
    assert(d.rms == 1234.0 && d.nFrames == 10L && d.sampleRate == 8000)
  }

  test("WAV rejects non-PCM, non-16-bit, truncated and garbage payloads") {
    val good = AvCodec.encodeWavPcm16(8000, 1, AvCodec.squareWave(10, 1, 100, 1))
    val float32 = good.clone; float32(20) = 3 // fmt audioFormat = IEEE float
    assert(AvCodec.decodeWav(float32).isEmpty)
    val bits8 = good.clone; bits8(34) = 8 // fmt bitsPerSample = 8
    assert(AvCodec.decodeWav(bits8).isEmpty)
    assert(AvCodec.decodeWav(good.take(30)).isEmpty)
    assert(AvCodec.decodeWav(Array.fill[Byte](64)(0x41)).isEmpty)
    // data chunk length overrunning the payload must fail, not crash
    val overrun = good.clone
    overrun(40) = (-1).toByte; overrun(41) = (-1).toByte
    assert(AvCodec.decodeWav(overrun).isEmpty)
  }

  test("MP4 metadata round-trip: brand, timescale, duration, tracks") {
    val bytes = AvCodec.encodeMp4Meta("mp42", 90000L, 2700000L, 3)
    val d = AvCodec.decodeMp4(bytes).get
    assert(d.format == "mp4" && d.brand == "mp42")
    assert(d.timescale == 90000L && d.durationUnits == 2700000L)
    assert(d.durationS == 30.0 && d.nTracks == 3)
  }

  test("MP4 zero tracks and zero duration decode cleanly") {
    val d = AvCodec.decodeMp4(AvCodec.encodeMp4Meta("isom", 600L, 0L, 0)).get
    assert(d.durationUnits == 0L && d.durationS == 0.0 && d.nTracks == 0)
  }

  test("MP4 mvhd version-1 (64-bit duration) parses") {
    // splice a v1 mvhd into an encoded container: version byte 1,
    // creation/modification widen to 8 bytes, duration to 8 bytes
    def be32(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val p = new ByteArrayOutputStream()
    p.write(Array[Byte](1, 0, 0, 0)) // version 1 + flags
    p.write(be64(0L)); p.write(be64(0L)) // creation, modification
    p.write(be32(48000L)) // timescale
    p.write(be64(1L << 33)) // duration > 32 bits
    p.write(be32(0x00010000L)); p.write(Array[Byte](1, 0, 0, 0)) // rate, vol+res
    p.write(new Array[Byte](8)) // reserved
    p.write(be32(0x00010000L)); p.write(new Array[Byte](12))
    p.write(be32(0x00010000L)); p.write(new Array[Byte](12))
    p.write(be32(0x40000000L))
    p.write(new Array[Byte](24)); p.write(be32(1L)) // pre_defined, next_track
    val mvhd = be32(8L + p.size()) ++ "mvhd".getBytes("US-ASCII") ++ p.toByteArray
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    val ftypP = "isom".getBytes("US-ASCII") ++ be32(0L) ++ "isom".getBytes("US-ASCII")
    val ftyp = be32(8L + ftypP.length) ++ "ftyp".getBytes("US-ASCII") ++ ftypP
    val d = AvCodec.decodeMp4(ftyp ++ moov).get
    assert(d.timescale == 48000L && d.durationUnits == (1L << 33))
    assert(d.nTracks == 0)
  }

  test("decimateWav keeps every Nth frame and divides the sample rate") {
    // stereo: frame f = (100+f, -(100+f)) so kept frames are checkable
    val frames = 1000
    val samples = Array.tabulate[Short](frames * 2)(i =>
      (if (i % 2 == 0) 100 + i / 2 else -(100 + i / 2)).toShort)
    val wav = AvCodec.encodeWavPcm16(8000, 2, samples)
    val out = AvCodec.decimateWav(wav, 4).get
    val d = AvCodec.decodeWav(out).get
    assert(d.sampleRate == 2000 && d.channels == 2 && d.nFrames == 250)
    // duration is preserved (fewer frames at a lower rate)
    assert(math.abs(d.durationS - frames / 8000.0) < 1e-9)
    val (_, _, kept) = AvCodec.wavSamples(out).get
    assert(kept(0) == 100 && kept(1) == -100)     // frame 0
    assert(kept(2) == 104 && kept(3) == -104)     // frame 4
    assert(kept(498) == 100 + 996)                // frame 996
    // non-PCM input -> None
    assert(AvCodec.decimateWav("junk".getBytes, 2).isEmpty)
  }

  test("MP4 rejects overrunning boxes and non-ftyp payloads") {
    val good = AvCodec.encodeMp4Meta("isom", 600L, 600L, 1)
    assert(AvCodec.decodeMp4(good.take(40)).isEmpty)
    assert(AvCodec.decodeMp4("not an mp4 file at all........".getBytes).isEmpty)
    // box size smaller than its header must fail, not loop
    val bad = good.clone
    bad(0) = 0; bad(1) = 0; bad(2) = 0; bad(3) = 4 // ftyp size = 4 < 8
    assert(AvCodec.decodeMp4(bad).isEmpty)
  }
}
