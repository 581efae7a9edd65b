package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JpegArith, JpegCodec}

/** Arithmetic-coded JPEG (T.81 Annex D/E/F) conformance.
  *
  * The decode direction is pinned by GENUINE libjpeg fixtures
  * (src/test/resources/jpeg, produced by tools/jpegarith/gen.c
  * against the system libjpeg, which implements arithmetic coding):
  * the Scala decoder must reproduce `jpeg_read_coefficients` output
  * bit-for-bit — gray, gray+restart-markers, 4:4:4 and 4:2:0 color.
  * That makes the QM-coder, the Table D.3 state machine, and the
  * Annex F conditioning models independently verified, not just
  * self-consistent. The encode direction round-trips through our own
  * decoder and is cross-checked against libjpeg at fixture-
  * generation time (gen.c `mean`).
  */
class JpegArithSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/jpeg/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private def loadCoef(name: String): Seq[(Int, Int, Int, Array[Array[Int]])] = {
    val lines = new String(resource(name), "US-ASCII").split("\n")
    val nc = lines(0).trim.toInt
    var li = 1
    (0 until nc).map { _ =>
      val hdr = lines(li).trim.split(" ").map(_.toInt); li += 1
      val blocks = (0 until hdr(1) * hdr(2)).map { _ =>
        val r = lines(li).trim.split(" ").map(_.toInt); li += 1; r
      }.toArray
      (hdr(0), hdr(1), hdr(2), blocks)
    }
  }

  private val fixtures = Seq(
    "arith_gray", "arith_gray_rst", "arith_c444", "arith_c420", // SOF9
    "arith_pgray", "arith_p444", "arith_p420")                  // SOF10 progressive

  test("decoded coefficients match libjpeg bit-for-bit on every fixture") {
    for (f <- fixtures) {
      val img = JpegArith.decodeCoefficients(resource(s"$f.jpg"))
        .getOrElse(fail(s"$f: decode failed"))
      val gold = loadCoef(s"$f.coef")
      assert(img.comps.length == gold.length, s"$f: component count")
      for (((_, wb, hb, gblocks), comp) <- gold.zip(img.comps)) {
        assert(comp.wBlocks == wb && comp.hBlocks == hb, s"$f: block geometry")
        for (bi <- gblocks.indices; k <- 0 until 64)
          assert(comp.blocks(bi)(k) == gblocks(bi)(k),
            s"$f comp ${comp.id} block $bi coef $k")
      }
    }
  }

  test("decodeSequential produces plausible dimensions and brightness") {
    for (f <- fixtures) {
      val (w, h, mean) = JpegArith.decodeSequential(resource(s"$f.jpg"))
        .getOrElse(fail(s"$f: pixel decode failed"))
      assert(w == 64 && h == 48, s"$f: $w x $h")
      assert(mean > 20 && mean < 240, s"$f: mean $mean")
    }
  }

  test("decodePixels dispatches SOF9 files to the arithmetic path") {
    val b = resource("arith_gray.jpg")
    assert(JpegCodec.decodeBaseline(b).isEmpty) // not its format
    val (w, h, _) = JpegCodec.decodePixels(b).getOrElse(fail("dispatch failed"))
    assert(w == 64 && h == 48)
  }

  test("constant-gray arithmetic encode round-trips bit-exactly") {
    for (g <- Seq(0, 1, 77, 128, 200, 255); (w, h) <- Seq((16, 16), (24, 9), (63, 41))) {
      val jpg = JpegArith.encodeArithGrayJpeg(w, h, g)
      val (dw, dh, mean) = JpegArith.decodeSequential(jpg)
        .getOrElse(fail(s"gray $g ${w}x$h: decode failed"))
      assert(dw == w && dh == h)
      assert(mean == g.toDouble, s"gray $g: got $mean")
    }
  }

  test("coefficient-level arithmetic round-trip over adversarial blocks") {
    // deterministic pseudo-random coefficient patterns covering long
    // zero runs, EOB-at-k positions, +/-1s, and large magnitudes in
    // both Kx regimes
    val zigzag = Array( // natural index of zigzag position k (T.81 fig. 5)
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    val rng = new scala.util.Random(20260814)
    val wb = 5; val hb = 3
    val blocks = Array.tabulate(wb * hb) { bi =>
      val c = new Array[Int](64)
      c(0) = rng.nextInt(2048) - 1024
      for (_ <- 0 until (bi % 13)) {
        val k = 1 + rng.nextInt(63)
        val mag = 1 << rng.nextInt(12)
        c(zigzag(k)) = (rng.nextInt(2 * mag) - mag) match {
          case 0 => 1
          case v => v
        }
      }
      c
    }
    val jpg = JpegArith.encodeArithCoef(wb * 8, hb * 8, Array.fill(64)(1), blocks)
    val img = JpegArith.decodeCoefficients(jpg).getOrElse(fail("decode failed"))
    val got = img.comps.head.blocks
    for (bi <- blocks.indices; k <- 0 until 64)
      assert(got(bi)(k) == blocks(bi)(k), s"block $bi coef $k")
  }

  test("corrupt-byte fuzzing: decoder returns None/Some promptly, never hangs") {
    // same hardening discipline as the HDF5 parser fuzz: flipped bytes
    // in headers OR entropy data must yield a prompt Option, never an
    // exception escaping decodeCoefficients, a hang, or an OOM — the
    // QM decoder pads zeros at markers/EOF, every scan loop is bounded
    // by frame geometry, and magnitude trees cap at 0x8000
    val rnd = new scala.util.Random(0x20260814L)
    var decoded = 0; var total = 0
    val t0 = System.nanoTime()
    for (f <- Seq("arith_gray", "arith_gray_rst", "arith_p420")) {
      val base = resource(s"$f.jpg")
      for (_ <- 1 to 120) {
        val mutated = base.clone()
        for (_ <- 0 to rnd.nextInt(4)) {
          val pos = rnd.nextInt(mutated.length)
          mutated(pos) = rnd.nextInt(256).toByte
        }
        total += 1
        if (JpegArith.decodeCoefficients(mutated).isDefined) decoded += 1
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"fuzz took ${secs}s over $total mutants")
    // entropy-data flips mostly still decode (to wrong pixels — fine);
    // only header-region flips should kill the parse
    assert(decoded > total / 4, s"only $decoded/$total decoded — fixture suspicious")
  }
}
