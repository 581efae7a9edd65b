package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JpegCodec

/** SOF3 lossless decode (T.81 Annex H) + the formal hierarchical
  * rejection. Lossless means the decoded samples ARE the encoder's
  * input, so every fixture checks the mean EXACTLY (no tolerance).
  * The container's libjpeg (v62 ABI) has no lossless codec to
  * conformance-pin against, so independence comes from golden byte
  * pinning of the encoder output + hand-decoded micro-fixtures. */
class JpegLosslessSpec extends AnyFunSuite {

  /** Deterministic pseudo-random 8-bit samples. */
  private def noise(n: Int, seed: Long): Array[Int] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0xff).toInt
    }
  }

  private def meanOf(xs: Array[Int]): Double =
    xs.map(_.toDouble).sum / xs.length

  test("round-trips exactly under every predictor 1-7") {
    val w = 23; val h = 17
    val samples = noise(w * h, 42L)
    for (pred <- 1 to 7) {
      val bytes = JpegCodec.encodeLosslessJpeg(w, h, samples, predictor = pred)
      val got = JpegCodec.decodeLossless(bytes)
      assert(got.isDefined, s"predictor $pred failed to decode")
      val (gw, gh, mean) = got.get
      assert(gw == w && gh == h, s"predictor $pred geometry")
      assert(mean == meanOf(samples), s"predictor $pred mean drift")
    }
  }

  test("gradient image (correlated samples, small diffs) round-trips") {
    val w = 64; val h = 48
    val samples = Array.tabulate(w * h)(i => ((i % w) * 255 / (w - 1) + i / w) % 256)
    val bytes = JpegCodec.encodeLosslessJpeg(w, h, samples, predictor = 4)
    assert(JpegCodec.decodeLossless(bytes).map(_._3).contains(meanOf(samples)))
    // correlated data should compress: the file is smaller than raw
    assert(bytes.length < w * h)
  }

  test("restart intervals reset prediction on both sides") {
    val w = 16; val h = 16
    val samples = noise(w * h, 7L)
    val bytes = JpegCodec.encodeLosslessJpeg(w, h, samples, predictor = 1,
      restartInterval = 37) // mid-row restarts
    assert(JpegCodec.decodeLossless(bytes).map(_._3).contains(meanOf(samples)))
  }

  test("decodePixels dispatches SOF3 files") {
    val w = 9; val h = 5
    val samples = Array.fill(w * h)(200)
    val bytes = JpegCodec.encodeLosslessJpeg(w, h, samples)
    assert(JpegCodec.decodePixels(bytes).contains((w, h, 200.0)))
  }

  test("hand-decoded micro-fixture: constant row, predictor 1") {
    // 4x1 image, samples 100,100,100,100: first sample default-predicts
    // 128 (diff -28, SSSS 5), the rest predict left (diff 0, SSSS 0)
    val bytes = JpegCodec.encodeLosslessJpeg(4, 1, Array(100, 100, 100, 100))
    assert(JpegCodec.decodeLossless(bytes).contains((4, 1, 100.0)))
  }

  test("golden bytes: the encoder output is pinned") {
    // any encoder change that silently alters the bitstream (and so
    // what the decoder is being tested against) must fail loudly
    val bytes = JpegCodec.encodeLosslessJpeg(8, 2,
      Array(0, 255, 1, 254, 2, 253, 3, 252, 10, 20, 30, 40, 50, 60, 70, 80),
      predictor = 2)
    val hex = bytes.map(b => f"${b & 0xff}%02x").mkString
    assert(hex == GoldenHex, hex)
  }

  private val GoldenHex =
    "ffd8ffc3000b080002000801011100ffc4001f00000105010101010101000000" +
    "00000000000102030405060708090a0bffda0008010100020000f9ff00efff00" +
    "807efdf80fefbf817ef9b5f0a6efc53d87c7de87f29fffd9"

  test("16-bit-precision headers and SSSS 16 path don't crash the walk") {
    // hand-built SOF3 with precision 12 and a truncated scan: decoder
    // must return None cleanly, never throw
    val bad = Array(0xff, 0xd8, 0xff, 0xc3, 0x00, 0x0b, 12, 0, 1, 0, 1,
      1, 1, 0x11, 0, 0xff, 0xd9).map(_.toByte)
    assert(JpegCodec.decodeLossless(bad).isEmpty)
  }

  test("hierarchical frames (SOF5-7/13-15) are rejected by every decoder") {
    // minimal hierarchical-sequential file head: SOI + DHP + SOF5
    def frame(sof: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def seg(m: Int, payload: Array[Int]): Unit = {
        out.write(0xff); out.write(m)
        val len = payload.length + 2
        out.write(len >> 8); out.write(len & 0xff); payload.foreach(out.write)
      }
      out.write(0xff); out.write(0xd8) // SOI
      seg(0xde, Array(8, 0, 16, 0, 16, 1, 1, 0x11, 0)) // DHP
      seg(sof, Array(8, 0, 16, 0, 16, 1, 1, 0x11, 0))  // hierarchical SOFn
      seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
      out.write(0xff); out.write(0xd9)
      out.toByteArray
    }
    for (sof <- Seq(0xc5, 0xc6, 0xc7, 0xcd, 0xce, 0xcf)) {
      assert(JpegCodec.decodePixels(frame(sof)).isEmpty, f"SOF $sof%02x")
      assert(JpegCodec.decodeLossless(frame(sof)).isEmpty, f"SOF $sof%02x")
    }
    // a pyramid whose FIRST frame is a non-differential SOF0/SOF2/SOF3
    // must also be rejected — the DHP marker alone marks the file
    // hierarchical; decoding the (downsampled) first frame as a
    // standalone image would surface wrong geometry
    for (sof <- Seq(0xc0, 0xc2, 0xc3)) {
      assert(JpegCodec.decodePixels(frame(sof)).isEmpty, f"DHP+SOF $sof%02x")
    }
  }

  test("decodeLosslessPixels returns the exact encoded plane") {
    val w = 36; val h = 32
    val samples = noise(w * h, 7L)
    val bytes = JpegCodec.encodeLosslessJpeg(w, h, samples)
    val Some((dw, dh, px)) = JpegCodec.decodeLosslessPixels(bytes)
    assert(dw == w && dh == h)
    assert(px.toSeq == samples.toSeq)
  }

  test("dHash: invariant to uniform brightness shift, sensitive to gradients") {
    import graft.operators.Multimodal
    val w = 36; val h = 32
    val base = Array.tabulate(w * h)(i =>
      Multimodal.patternPixel(0L, i % w, i / w))
    val shifted = base.map(v => math.min(v + 17, 255))
    assert(Multimodal.dhashBits(w, h, base) == Multimodal.dhashBits(w, h, shifted))
    // flipping the horizontal gradient must flip bits
    val mirrored = Array.tabulate(w * h)(i => base(i / w * w + (w - 1 - i % w)))
    assert(Multimodal.dhashBits(w, h, base) != Multimodal.dhashBits(w, h, mirrored))
  }

  test("dHash: exact for block sums whose cross-products overflow Long") {
    import graft.operators.Multimodal
    // 4608x4096 plane of huge values: block sums ~2^48, cross-products
    // ~2^66 — a wrapped Long product would flip bits; compare against
    // a BigInt-only reference computed here
    val w = 4608; val h = 4096
    val big = 1 << 30
    val px = Array.tabulate(w * h)(i => if (i % w < w / 2) 7 else big)
    val (hi, lo) = Multimodal.dhashBits(w, h, px)
    val sums = Array.fill(8, 9)(BigInt(0)); val cnts = Array.fill(8, 9)(BigInt(0))
    for (y <- 0 until h; x <- 0 until w) {
      sums(y * 8 / h)(x * 9 / w) += px(y * w + x)
      cnts(y * 8 / h)(x * 9 / w) += 1
    }
    var ehi = 0L; var elo = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (sums(r)(c + 1) * cnts(r)(c) > sums(r)(c) * cnts(r)(c + 1)) {
        val idx = r * 8 + c
        if (idx >= 32) ehi |= 1L << (idx - 32) else elo |= 1L << idx
      }
    assert((hi, lo) == ((ehi, elo)))
  }

  test("dHash decodes PNG payloads: gray and RGB luma match the raw plane") {
    import graft.operators.{ImageCodec, Multimodal}
    val spark = SparkSpec.session
    import spark.implicits._
    val w = 36; val h = 32
    def pix(x: Int, y: Int): Int = Multimodal.patternPixel(4L, x, y)
    val plane = Array.tabulate(w * h)(i => pix(i % w, i / w))
    val expected = Multimodal.dhashBits(w, h, plane)
    val gray = ImageCodec.encodePng(w, h, 1, (x, y, _) => pix(x, y))
    // r=g=b=v makes the Rec.601 luma exactly v
    val rgb = ImageCodec.encodePng(w, h, 3, (x, y, _) => pix(x, y))
    val rows = Multimodal.dhashImages(
        Seq((1L, gray), (2L, rgb)).toDF("doc_id", "media"), "doc_id", "media")
      .collect().sortBy(_.getLong(0))
    rows.foreach { r =>
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert((r.getLong(3), r.getLong(4)) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("resizeImages resizes lossless-JPEG payloads pixel-exactly") {
    import graft.operators.Multimodal
    val spark = SparkSpec.session
    import spark.implicits._
    val w = 24; val h = 16
    val samples = noise(w * h, 11L)
    val bytes = JpegCodec.encodeLosslessJpeg(w, h, samples)
    val out = Multimodal.resizeImages(
        Seq((1L, bytes)).toDF("doc_id", "media"), "doc_id", "media", 12, 8)
      .collect()(0).getAs[Array[Byte]]("media")
    val Some((rw, rh, px)) = JpegCodec.decodeLosslessPixels(out)
    assert(rw == 12 && rh == 8)
    // nearest-neighbor grid: out(x,y) = in(x*w/12, y*h/8)
    for (y <- 0 until 8; x <- 0 until 12)
      assert(px(y * 12 + x) == samples((y * h / 8) * w + (x * w / 12)),
        s"($x,$y)")
  }

  test("dhashImages is total: undecodable payloads yield the (-1,-1) row") {
    val spark = SparkSpec.session
    import spark.implicits._
    val junk = Seq((1L, Array[Byte](1, 2, 3)),
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x00)))
      .toDF("doc_id", "media")
    val rows = graft.operators.Multimodal.dhashImages(junk, "doc_id", "media")
      .collect().sortBy(_.getLong(0))
    assert(rows.forall(r => r.getInt(1) == -1 && r.getInt(2) == -1 &&
      r.getLong(3) == 0L && r.getLong(4) == 0L))
  }
}
