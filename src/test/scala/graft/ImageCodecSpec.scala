package graft

import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ImageCodec, Multimodal}

/** Real-codec tests: PNG encode->decode round-trips (exact pixel
  * brightness through zlib + all row filters), JPEG SOF header walk,
  * GIF/BMP headers, fingerprint fallback for unknown bytes. */
class ImageCodecSpec extends AnyFunSuite {

  test("gray PNG round-trip: dims + exact gradient brightness") {
    val (w, h) = (37, 23)
    val pix = (x: Int, y: Int) => (x * 7 + y * 13) % 256
    val bytes = ImageCodec.encodePng(w, h, 1, (x, y, _) => pix(x, y))
    val d = ImageCodec.decode(bytes).get
    assert(d.format == "png" && d.width == w && d.height == h && d.nFrames == 1L)
    val expected = (for (y <- 0 until h; x <- 0 until w) yield pix(x, y).toDouble)
      .sum / (w * h)
    assert(d.brightness.contains(expected))
  }

  test("RGB PNG round-trip: brightness averages all three channels") {
    val bytes = ImageCodec.encodePng(5, 4, 3,
      (x, y, c) => (x * 50 + y * 20 + c * 10) % 256)
    val d = ImageCodec.decode(bytes).get
    assert(d.format == "png" && d.width == 5 && d.height == 4)
    val expected = (for (y <- 0 until 4; x <- 0 until 5; c <- 0 until 3)
      yield ((x * 50 + y * 20 + c * 10) % 256).toDouble).sum / (5 * 4 * 3)
    assert(d.brightness.contains(expected))
  }

  test("PNG decoder undoes Sub/Up/Average/Paeth row filters") {
    // 4x4 grayscale, one row per filter type 1..4, filtered by hand
    // with the spec formulas; the decoder must recover the pixels
    val p = Array(
      Array(10, 20, 30, 40), Array(15, 25, 35, 45),
      Array(100, 90, 80, 70), Array(7, 255, 0, 128))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pr = a + b - c
      val pa = math.abs(pr - a); val pb = math.abs(pr - b); val pc = math.abs(pr - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new ByteArrayOutputStream()
    for (y <- 0 until 4) {
      val f = y + 1
      raw.write(f)
      for (x <- 0 until 4) {
        val left = if (x > 0) p(y)(x - 1) else 0
        val up = if (y > 0) p(y - 1)(x) else 0
        val ul = if (x > 0 && y > 0) p(y - 1)(x - 1) else 0
        val pred = f match {
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw.write((p(y)(x) - pred) & 0xff)
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(ImageCodec.PngSignature)
    val ihdr = Array[Byte](0, 0, 0, 4, 0, 0, 0, 4, 8, 0, 0, 0, 0)
    ImageCodec.pngChunk(out, "IHDR", ihdr)
    ImageCodec.pngChunk(out, "IDAT", ImageCodec.zlibDeflate(raw.toByteArray))
    ImageCodec.pngChunk(out, "IEND", Array.emptyByteArray)
    val d = ImageCodec.decode(out.toByteArray).get
    assert(d.width == 4 && d.height == 4)
    assert(d.brightness.contains(p.flatten.map(_.toDouble).sum / 16))
  }

  test("Adam7 interlaced PNG decodes to the same pixels as its sequential twin") {
    // odd dims exercise the empty-row/column pass edge cases; RGB
    // exercises the byte-wise bpp>1 filtering per pass
    for ((w, h, ch) <- Seq((37, 23, 1), (8, 8, 3), (5, 3, 3), (1, 1, 1), (2, 9, 1))) {
      val pix = (x: Int, y: Int, c: Int) => (x * 7 + y * 13 + c * 29) % 256
      val seq7 = ImageCodec.decode(ImageCodec.encodePngAdam7(w, h, ch, pix)).get
      val plain = ImageCodec.decode(ImageCodec.encodePng(w, h, ch, pix)).get
      assert(seq7.width == w && seq7.height == h, s"dims for $w x $h")
      assert(seq7.brightness.isDefined, s"interlaced $w x $h x$ch undecoded")
      assert(seq7.brightness == plain.brightness, s"brightness for $w x $h x$ch")
    }
    // interlaced resize works too (decode path is shared)
    val big = ImageCodec.encodePngAdam7(16, 16, 1, (x, _, _) => x * 16)
    val resized = ImageCodec.resizePng(big, 4, 4)
    assert(resized.isDefined)
    assert(ImageCodec.decode(resized.get).get.width == 4)
  }

  test("16-bit PNG decodes via the high byte") {
    // v = g*257 sets both bytes to g, so the high-byte reduction is
    // exact and brightness equals the 8-bit twin's
    val pix8 = (x: Int, y: Int) => (x * 11 + y * 3) % 256
    val d16 = ImageCodec.decode(
      ImageCodec.encodePng16Gray(19, 7, (x, y) => pix8(x, y) * 257)).get
    val d8 = ImageCodec.decode(
      ImageCodec.encodePng(19, 7, 1, (x, y, _) => pix8(x, y))).get
    assert(d16.width == 19 && d16.height == 7)
    assert(d16.brightness == d8.brightness)
    // a gradient that differs only below the high byte floors to it
    val dLow = ImageCodec.decode(
      ImageCodec.encodePng16Gray(4, 4, (x, y) => 0x1200 + x + y)).get
    assert(dLow.brightness.contains(0x12.toDouble))
  }

  test("JPEG: marker walk finds SOF0 dims past APP0/DQT segments") {
    val out = new ByteArrayOutputStream()
    def w(xs: Int*): Unit = xs.foreach(out.write)
    w(0xff, 0xd8)                               // SOI
    w(0xff, 0xe0, 0x00, 0x10)                   // APP0, len 16
    w('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    w(0xff, 0xdb, 0x00, 0x06, 0, 1, 2, 3)       // DQT (dummy), len 6 = 2 + 4 data
    w(0xff, 0xc0, 0x00, 0x0b, 8)                // SOF0, len 11, precision 8
    w(0x01, 0x20)                               // height 288
    w(0x01, 0x90)                               // width 400
    w(1, 1, 0x11, 0)                            // 1 component
    val d = ImageCodec.decode(out.toByteArray).get
    assert(d.format == "jpeg" && d.width == 400 && d.height == 288)
    assert(d.brightness.isEmpty)
  }

  test("GIF and BMP header dims") {
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, (0xf0 - 256).toByte, 0x00) ++ new Array[Byte](10)
    val g = ImageCodec.decode(gif).get
    assert(g.format == "gif" && g.width == 320 && g.height == 240)
    val bmp = new Array[Byte](30)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 100; bmp(22) = 50
    val b = ImageCodec.decode(bmp).get
    assert(b.format == "bmp" && b.width == 100 && b.height == 50)
  }

  test("unknown bytes -> None; decodeRecord falls back to fingerprint") {
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    val m = Multimodal.decodeRecord(
      Multimodal.MediaRecord(7L, "plain text payload".getBytes))
    assert(m.format == "fingerprint" && m.doc_id == 7L && m.n_bytes == 18L)
    // and a real payload routes to the codec, not the stub
    val png = Multimodal.decodeRecord(
      Multimodal.MediaRecord(8L, ImageCodec.encodePngGray(33, 21, 99)))
    assert(png.format == "png" && png.width == 33 && png.height == 21 &&
      png.brightness == 99.0)
  }

  test("JPEG: constant-gray baseline round-trips brightness exactly") {
    for ((w, h, g) <- Seq((8, 8, 0), (8, 8, 255), (16, 24, 128), (9, 13, 77),
      (64, 80, 201), (1, 1, 42))) {
      val d = ImageCodec.decode(graft.operators.JpegCodec.encodeGrayJpeg(w, h, g)).get
      assert(d.format == "jpeg" && d.width == w && d.height == h, s"($w,$h,$g)")
      assert(d.brightness.contains(g.toDouble), s"($w,$h,$g) -> ${d.brightness}")
    }
  }

  test("JPEG: AC coefficients decode through Huffman+RLE+IDCT correctly") {
    import graft.operators.JpegCodec
    // one 8x8 block with DC, low/high-frequency ACs, a negative value,
    // and a >16 zero run (forces a ZRL symbol in the stream)
    val coefs = new Array[Int](64)
    coefs(0) = 100          // DC
    coefs(1) = 40           // AC (0,1)
    coefs(8) = -24          // AC (1,0), negative
    coefs(63) = 17          // last zigzag position after a long run
    val jpeg = JpegCodec.encodeCoefJpeg(8, 8, Seq(coefs))
    val got = JpegCodec.decodeBaseline(jpeg).get
    // independent reference IDCT straight from the T.81 formula
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    var sum = 0.0
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c(u) * c(v) * coefs(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      sum += math.max(0.0, math.min(255.0, math.rint(s / 4.0 + 128.0)))
    }
    assert(math.abs(got._3 - sum / 64.0) < 1e-9, s"got ${got._3} want ${sum / 64.0}")
  }

  test("JPEG: DC differences chain across blocks, edge blocks crop") {
    import graft.operators.JpegCodec
    // 2x1 blocks, 12px wide (right block cropped to 4 columns): block
    // DCs differ so the DIFF path (not just first-DC) is exercised
    val b0 = new Array[Int](64); b0(0) = 8 * (50 - 128)
    val b1 = new Array[Int](64); b1(0) = 8 * (200 - 128)
    val jpeg = JpegCodec.encodeCoefJpeg(12, 8, Seq(b0, b1))
    val (w, h, br) = JpegCodec.decodeBaseline(jpeg).get
    assert(w == 12 && h == 8)
    // 8 columns at 50 + 4 columns at 200
    assert(math.abs(br - (8 * 50.0 + 4 * 200.0) / 12.0) < 1e-9, s"br=$br")
  }

  test("JPEG: randomized coefficient blocks round-trip against a reference IDCT") {
    import graft.operators.JpegCodec
    val rnd = new scala.util.Random(20260812L)
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    def refMean(blocks: Seq[Array[Int]], w: Int, blocksX: Int): Double = {
      // reference decode: per-block IDCT, crop columns beyond w
      var sum = 0.0; var cnt = 0L
      blocks.zipWithIndex.foreach { case (coefs, bi) =>
        val px0 = (bi % blocksX) * 8
        for (y <- 0 until 8; x <- 0 until 8) {
          if (px0 + x < w) {
            var s = 0.0
            for (v <- 0 until 8; u <- 0 until 8)
              s += c(u) * c(v) * coefs(v * 8 + u) *
                math.cos((2 * x + 1) * u * math.Pi / 16) *
                math.cos((2 * y + 1) * v * math.Pi / 16)
            sum += math.max(0.0, math.min(255.0, math.rint(s / 4.0 + 128.0)))
            cnt += 1
          }
        }
      }
      sum / cnt
    }
    for (trial <- 1 to 12) {
      val blocksX = 1 + rnd.nextInt(3)
      val w = blocksX * 8 - rnd.nextInt(8)
      val blocks = Seq.fill(blocksX)(
        Array.tabulate(64)(i =>
          if (rnd.nextDouble() < 0.7) 0 // sparse, like real quantized data
          else rnd.nextInt(511) - 255))
      val jpeg = JpegCodec.encodeCoefJpeg(w, 8, blocks)
      val (gw, gh, br) = JpegCodec.decodeBaseline(jpeg)
        .getOrElse(fail(s"trial $trial failed to decode"))
      assert(gw == w && gh == 8)
      val want = refMean(blocks, w, blocksX)
      assert(math.abs(br - want) < 1e-9, s"trial $trial: got $br want $want")
    }
  }

  test("JPEG: progressive (SOF2) decodes to exactly the baseline pixels") {
    import graft.operators.JpegCodec
    // hand-built blocks covering every progressive mechanism: DC
    // successive approximation (odd + even, negative DCs), newly
    // significant ±1 ACs (refinement scan), already-significant ACs
    // needing correction bits (odd magnitudes), long zero runs (ZRL
    // in both first and refinement scans), band-split coefficients
    val b0 = new Array[Int](64)
    b0(0) = 8 * (77 - 128) + 1 // odd negative DC: refine bit set
    b0(1) = 1                  // newly significant in the refine scan
    b0(8) = -3                 // odd magnitude: correction bit 1
    b0(16) = 4                 // even magnitude: correction bit 0
    b0(63) = -1                // new ±1 after a >16 zero-history run (ZRL)
    val b1 = new Array[Int](64)
    b1(0) = 8 * (200 - 128)    // even DC
    b1(2) = 40                 // low band (scan 2)
    b1(40) = -17               // high band (scan 3), odd
    val blocks = Seq(b0, b1)
    val prog = JpegCodec.encodeProgressiveJpeg(16, 8, blocks)
    val base = JpegCodec.encodeCoefJpeg(16, 8, blocks)
    assert(JpegCodec.decodeBaseline(prog).isEmpty) // SOF2: not baseline
    val got = JpegCodec.decodePixels(prog).getOrElse(fail("progressive decode failed"))
    val want = JpegCodec.decodeBaseline(base).get
    assert(got == want, s"progressive $got vs baseline $want") // bit-exact
    // the table dispatch sees it as a decodable jpeg
    val d = ImageCodec.decode(prog).get
    assert(d.format == "jpeg" && d.width == 16 && d.height == 8 &&
      d.brightness.contains(want._3))
  }

  test("JPEG: randomized progressive fixtures match their baseline re-encodes") {
    import graft.operators.JpegCodec
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 12) {
      val blocksX = 1 + rnd.nextInt(4)
      val w = blocksX * 8 - rnd.nextInt(8)
      val blocks = Seq.fill(blocksX)(
        Array.tabulate(64) { i =>
          val p = rnd.nextDouble()
          if (p < 0.6) 0
          else if (p < 0.8) rnd.nextInt(3) - 1 // ±1s: refinement births
          else rnd.nextInt(511) - 255
        })
      val prog = JpegCodec.encodeProgressiveJpeg(w, 8, blocks)
      val base = JpegCodec.encodeCoefJpeg(w, 8, blocks)
      val got = JpegCodec.decodePixels(prog)
        .getOrElse(fail(s"trial $trial: progressive decode failed"))
      val want = JpegCodec.decodeBaseline(base).get
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("JPEG: color progressive interleaved DC scan + skipped chroma AC scans") {
    import graft.operators.JpegCodec
    // luma at grays 40/220 with ACs; chroma carries DISTINCT nonzero
    // coefficients — a broken interleaved-DC walk or a mis-skipped
    // chroma AC scan would corrupt the luma means
    val y = Seq(40, 220).map { g =>
      val b = new Array[Int](64); b(0) = 8 * (g - 128) + 1; b(5) = 3; b
    }
    val cb = Seq.fill(2) { val b = new Array[Int](64); b(0) = 111; b(3) = -9; b }
    val cr = Seq.fill(2) { val b = new Array[Int](64); b(0) = -77; b(7) = 5; b }
    val prog = JpegCodec.encodeProgressiveColorJpeg(16, 8, y, cb, cr)
    val base = JpegCodec.encodeYCbCrJpeg(16, 8, y, cb, cr)
    val got = JpegCodec.decodePixels(prog).getOrElse(fail("color progressive failed"))
    val want = JpegCodec.decodeBaseline(base).get
    assert(got == want, s"progressive $got vs baseline $want")
  }

  test("JPEG: color progressive decodes to full RGB (all planes retained)") {
    import graft.operators.JpegCodec
    val rnd = new scala.util.Random(20260813L)
    def mkBlocks(n: Int) = Seq.fill(n)(Array.tabulate(64)(_ =>
      if (rnd.nextDouble() < 0.7) 0 else rnd.nextInt(201) - 100))
    val (w, h, blocksX) = (13, 8, 2)
    val y = mkBlocks(blocksX); val cb = mkBlocks(blocksX); val cr = mkBlocks(blocksX)
    val prog = JpegCodec.encodeProgressiveColorJpeg(w, h, y, cb, cr)
    val (gw, gh, rgb) = JpegCodec.decodeRgbProgressive(prog)
      .getOrElse(fail("rgb decode failed"))
    assert(gw == w && gh == h && rgb.length == w * h * 3)
    // reference: textbook float IDCT per plane -> round/clamp ->
    // JFIF YCbCr->RGB; must match the decoder byte-for-byte
    def idctPix(blocks: Seq[Array[Int]]): (Int, Int) => Int = {
      def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      (x, y0) => {
        val coefs = blocks((y0 / 8) * blocksX + (x / 8))
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8)
          s += c(u) * c(v) * coefs(v * 8 + u) *
            math.cos((2 * (x % 8) + 1) * u * math.Pi / 16) *
            math.cos((2 * (y0 % 8) + 1) * v * math.Pi / 16)
        math.max(0.0, math.min(255.0, math.rint(s / 4.0 + 128.0))).toInt
      }
    }
    val fy = idctPix(y); val fcb = idctPix(cb); val fcr = idctPix(cr)
    def clamp(d: Double) = math.max(0, math.min(255, math.rint(d).toInt))
    for (py <- 0 until h; px <- 0 until w) {
      val o = (py * w + px) * 3
      val yy = fy(px, py).toDouble
      val cbv = fcb(px, py) - 128.0; val crv = fcr(px, py) - 128.0
      assert((rgb(o) & 0xff) == clamp(yy + 1.402 * crv), s"R at ($px,$py)")
      assert((rgb(o + 1) & 0xff) ==
        clamp(yy - 0.344136 * cbv - 0.714136 * crv), s"G at ($px,$py)")
      assert((rgb(o + 2) & 0xff) == clamp(yy + 1.772 * cbv), s"B at ($px,$py)")
    }
    // the luma brightness contract is unchanged by chroma retention
    val base = JpegCodec.encodeYCbCrJpeg(w, h, y, cb, cr)
    assert(JpegCodec.decodePixels(prog) == JpegCodec.decodeBaseline(base))
    // grayscale progressive replicates Y into all three channels
    val gray = JpegCodec.encodeProgressiveJpeg(16, 8, mkBlocks(2))
    val (_, _, g3) = JpegCodec.decodeRgbProgressive(gray).get
    for (i <- 0 until 16 * 8)
      assert(g3(i * 3) == g3(i * 3 + 1) && g3(i * 3) == g3(i * 3 + 2))
  }

  test("JPEG: restart markers reset DC prediction correctly") {
    import graft.operators.JpegCodec
    // 6 blocks, restart every 2: DC prediction must reset at each RST
    // or the decoded means drift block over block
    val grays = Seq(30, 60, 90, 120, 150, 180)
    val blocks = grays.map { g =>
      val b = new Array[Int](64); b(0) = 8 * (g - 128); b
    }
    val jpeg = JpegCodec.encodeCoefJpeg(48, 8, blocks, restartInterval = 2)
    // byte-level: DRI segment present and at least one RST marker
    def hasMarker(m: Int) = jpeg.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
    assert(hasMarker(0xdd) && hasMarker(0xd0))
    val (w, _, br) = JpegCodec.decodeBaseline(jpeg).get
    assert(w == 48)
    assert(math.abs(br - grays.sum / 6.0) < 1e-9, s"br=$br")
  }

  test("JPEG: 3-component interleaved scan decodes luma; chroma advances the stream") {
    import graft.operators.JpegCodec
    // Y blocks at grays 40 and 220; chroma carries DISTINCT non-zero
    // coefficients (wrong interleaving would corrupt the Y means)
    def dcBlock(dc: Int) = { val b = new Array[Int](64); b(0) = dc; b }
    val yB = Seq(dcBlock(8 * (40 - 128)), dcBlock(8 * (220 - 128)))
    val cbB = Seq(dcBlock(8 * 33), { val b = dcBlock(8 * -17); b(5) = 21; b })
    val crB = Seq({ val b = dcBlock(8 * 70); b(10) = -9; b }, dcBlock(0))
    val jpeg = JpegCodec.encodeYCbCrJpeg(16, 8, yB, cbB, crB)
    val (w, h, br) = JpegCodec.decodeBaseline(jpeg).get
    assert(w == 16 && h == 8)
    assert(math.abs(br - (40.0 + 220.0) / 2) < 1e-9, s"br=$br")
    // and through the dispatch: still reported as jpeg with brightness
    val d = ImageCodec.decode(jpeg).get
    assert(d.format == "jpeg" && d.brightness.contains(br))
  }

  test("JPEG: 4:2:0 subsampled (Y 2x2) decodes the full-resolution luma plane") {
    import graft.operators.JpegCodec
    // 16x16 = one MCU with four Y blocks of distinct grays; the luma
    // placement math must land each in its quadrant (a swap or offset
    // error changes nothing in the mean, so ALSO check a 32x16 image
    // where wrong mcu indexing would misplace whole columns)
    def dcBlock(g: Int) = { val b = new Array[Int](64); b(0) = 8 * (g - 128); b }
    val y1 = Seq(10, 50, 90, 130).map(dcBlock)
    val j1 = JpegCodec.encodeSubsampledJpeg(16, 16, y1,
      Seq(dcBlock(200)), Seq(dcBlock(60)))
    val (w1, h1, br1) = JpegCodec.decodeBaseline(j1).get
    assert(w1 == 16 && h1 == 16)
    assert(math.abs(br1 - (10 + 50 + 90 + 130) / 4.0) < 1e-9, s"br=$br1")
    // 32x16: two MCUs across; give the right MCU different grays
    val y2 = Seq(
      // block raster order (blocksX=4): row 0: m0b0 m0b1 m1b0 m1b1
      10, 20, 110, 120,
      30, 40, 130, 140).map(dcBlock)
    val j2 = JpegCodec.encodeSubsampledJpeg(32, 16, y2,
      Seq(dcBlock(0), dcBlock(0)), Seq(dcBlock(0), dcBlock(0)))
    val (w2, _, br2) = JpegCodec.decodeBaseline(j2).get
    assert(w2 == 32)
    assert(math.abs(br2 - (10 + 20 + 110 + 120 + 30 + 40 + 130 + 140) / 8.0) < 1e-9,
      s"br=$br2")
  }

  test("resizePng: nearest-neighbor downsample preserves structure") {
    // constant gray: any resize keeps the exact brightness
    val g = ImageCodec.resizePng(ImageCodec.encodePngGray(64, 48, 201), 16, 12).get
    val gd = ImageCodec.decode(g).get
    assert(gd.width == 16 && gd.height == 12 && gd.brightness.contains(201.0))
    // half-black half-white vertical split at RGB: downsample keeps the
    // 50/50 split exactly when widths are even
    val bw = ImageCodec.encodePng(32, 8, 3, (x, _, _) => if (x < 16) 0 else 255)
    val half = ImageCodec.resizePng(bw, 8, 4).get
    assert(ImageCodec.decode(half).get.brightness.contains(127.5))
    // upsample works too; palette/undecodable input -> None
    assert(ImageCodec.resizePng(ImageCodec.encodePngGray(4, 4, 7), 16, 16)
      .flatMap(ImageCodec.decode).get.brightness.contains(7.0))
    assert(ImageCodec.resizePng("junk".getBytes, 4, 4).isEmpty)
  }

  test("palette (PLTE) PNGs decode brightness and resize through the table") {
    // hand-built 4x2 indexed PNG: palette {0:(10,20,30), 1:(200,100,0)}
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new Array[Byte](13)
    ihdr(3) = 4; ihdr(7) = 2           // width 4, height 2 (BE int32s)
    ihdr(8) = 8; ihdr(9) = 3           // depth 8, color type 3 (palette)
    ImageCodec.pngChunk(out, "IHDR", ihdr)
    ImageCodec.pngChunk(out, "PLTE",
      Array[Byte](10, 20, 30, 200.toByte, 100, 0))
    val scanlines = Array[Byte](0, 0, 1, 0, 1, /*row1*/ 0, 1, 1, 0, 0)
    ImageCodec.pngChunk(out, "IDAT", ImageCodec.zlibDeflate(scanlines))
    ImageCodec.pngChunk(out, "IEND", Array.empty)
    val png = out.toByteArray
    val d = ImageCodec.decode(png).get
    assert(d.format == "png" && d.width == 4 && d.height == 2)
    // entries: (10+20+30)/3 = 20 and (200+100+0)/3 = 100; 4 of each
    assert(d.brightness.contains(60.0), d.brightness)
    // resize resolves indices through the palette into RGB
    val small = ImageCodec.resizePng(png, 2, 1).get
    val ds = ImageCodec.decode(small).get
    // nearest-neighbor picks row 0 columns 0 and 2 -> both index 0
    assert(ds.width == 2 && ds.height == 1 && ds.brightness.contains(20.0))
  }

  test("palette PNG with out-of-range indices is undecodable, not a crash") {
    // same 4x2 indexed PNG but scanlines reference index 2 while PLTE
    // holds 2 entries — must read as None (metadata still fine), never
    // ArrayIndexOutOfBounds from the palette lookup
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new Array[Byte](13)
    ihdr(3) = 4; ihdr(7) = 2
    ihdr(8) = 8; ihdr(9) = 3
    ImageCodec.pngChunk(out, "IHDR", ihdr)
    ImageCodec.pngChunk(out, "PLTE",
      Array[Byte](10, 20, 30, 200.toByte, 100, 0))
    val scanlines = Array[Byte](0, 0, 2, 0, 1, /*row1*/ 0, 1, 2, 0, 0)
    ImageCodec.pngChunk(out, "IDAT", ImageCodec.zlibDeflate(scanlines))
    ImageCodec.pngChunk(out, "IEND", Array.empty)
    val png = out.toByteArray
    val d = ImageCodec.decode(png).get
    assert(d.width == 4 && d.height == 2 && d.brightness.isEmpty)
    assert(ImageCodec.resizePng(png, 2, 1).isEmpty)
  }

  test("APNG acTL frame count is surfaced") {
    val base = ImageCodec.encodePngGray(4, 4, 10)
    // splice an acTL chunk (8-byte payload: num_frames, num_plays)
    // right after IHDR (sig 8 + IHDR chunk 12+13 = 33 bytes)
    val acTL = new ByteArrayOutputStream()
    ImageCodec.pngChunk(acTL, "acTL", Array[Byte](0, 0, 0, 5, 0, 0, 0, 0))
    val spliced = base.take(33) ++ acTL.toByteArray ++ base.drop(33)
    assert(ImageCodec.decode(spliced).get.nFrames == 5L)
  }

  test("JPEG: non-interleaved multi-scan decodes to its interleaved twin's pixels") {
    import graft.operators.JpegCodec
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 10) {
      val blocksX = 1 + rnd.nextInt(4); val blocksY = 1 + rnd.nextInt(3)
      val w = blocksX * 8 - rnd.nextInt(8) // uneven dims: edge-crop math
      val h = blocksY * 8 - rnd.nextInt(8)
      def blocks() = Seq.fill(blocksX * blocksY)(
        Array.tabulate(64)(i =>
          if (rnd.nextDouble() < 0.7) 0 else rnd.nextInt(511) - 255))
      val (y, cb, cr) = (blocks(), blocks(), blocks())
      val non = JpegCodec.encodeNonInterleavedJpeg(w, h, y, cb, cr)
      val inter = JpegCodec.encodeYCbCrJpeg(w, h, y, cb, cr)
      val got = JpegCodec.decodeBaseline(non)
        .getOrElse(fail(s"trial $trial: non-interleaved decode failed"))
      val want = JpegCodec.decodeBaseline(inter).get
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("JPEG: non-interleaved scan order is irrelevant (chroma scans skipped)") {
    import graft.operators.JpegCodec
    // chroma carries dense coefficients: a decoder that entropy-decoded
    // the cb scan as luma (instead of marker-skipping it) would return
    // a wildly different mean
    def dcBlock(g: Int) = { val b = new Array[Int](64); b(0) = 8 * (g - 128); b }
    val y = Seq(dcBlock(40), dcBlock(220))
    val cb = Seq.fill(2) { val b = dcBlock(17); b(5) = 21; b(13) = -7; b }
    val cr = Seq.fill(2) { val b = dcBlock(-90); b(9) = 13; b }
    for (order <- Seq(Seq(0, 1, 2), Seq(1, 0, 2), Seq(1, 2, 0))) {
      val j = JpegCodec.encodeNonInterleavedJpeg(16, 8, y, cb, cr, scanOrder = order)
      val (w, h, br) = JpegCodec.decodeBaseline(j)
        .getOrElse(fail(s"order $order: decode failed"))
      assert(w == 16 && h == 8)
      assert(math.abs(br - (40.0 + 220.0) / 2) < 1e-9, s"order $order br=$br")
    }
  }

  test("JPEG: non-interleaved restart intervals count single-block MCUs") {
    import graft.operators.JpegCodec
    val rnd = new scala.util.Random(7L)
    def blocks() = Seq.fill(6)(
      Array.tabulate(64)(i => if (rnd.nextDouble() < 0.7) 0 else rnd.nextInt(201) - 100))
    val (y, cb, cr) = (blocks(), blocks(), blocks())
    val non = JpegCodec.encodeNonInterleavedJpeg(48, 8, y, cb, cr, restartInterval = 2)
    val plain = JpegCodec.encodeNonInterleavedJpeg(48, 8, y, cb, cr)
    assert(JpegCodec.decodeBaseline(non) == JpegCodec.decodeBaseline(plain))
    assert(JpegCodec.decodeBaseline(non).isDefined)
  }
}
