package graft.operators

import java.io.ByteArrayOutputStream

/** Dependency-free baseline-sequential JPEG codec (ITU-T T.81), the
  * dominant web-image format — completes the real-pixel media lane
  * next to the PNG codec (reference has no media decode at all; the
  * pipeline need is filtering/statistics over image columns at scale).
  *
  * DECODE: marker walk (DQT/SOF0/SOF1/DHT/DRI/SOS), canonical Huffman
  * entropy decode with byte-unstuffing and restart markers, dequant,
  * separable float IDCT, mean of the luma plane (component 0) cropped
  * to the real image size. Supports any number of components with
  * arbitrary sampling factors (the luma accumulates at its own
  * resolution; chroma blocks are decoded to advance the bitstream),
  * in both the interleaved single-scan layout and the non-interleaved
  * multi-scan layout (one scan per component, T.81 A.2.2 — old
  * encoders; chroma scans are marker-skipped without entropy decode).
  * Progressive (SOF2) files decode too — per-component coefficient
  * accumulation across scans, with [[decodeRgbProgressive]] exposing
  * the full-color result (chroma upsample + JFIF YCbCr->RGB).
  * Arithmetic-coded and hierarchical files return None — the caller
  * falls back to header-only metadata.
  *
  * ENCODE: 1-component baseline with an all-ones quant table and the
  * Annex K standard Huffman tables. A constant-gray image quantizes
  * exactly (DC = 8·(g−128), q=1), so decode(encode(g)).brightness == g
  * bit-exactly — what the DuckDB oracle re-derives.
  */
object JpegCodec {

  // ---------------------------------------------------------------- tables

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** natural index -> zigzag position (DQT tables are stored in zigzag
    * order, T.81 B.2.4.1, so dequantizing a natural-order coefficient
    * needs this inverse). */
  private val ZigZagInv: Array[Int] = {
    val a = new Array[Int](64)
    var z = 0
    while (z < 64) { a(ZigZag(z)) = z; z += 1 }
    a
  }

  // Annex K.3 standard luminance Huffman tables
  private val StdDcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcValues = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val StdAcCounts = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcValues: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman table: per code length, the smallest/largest
    * code and the index of its first symbol. */
  private final class Huff(counts: Array[Int], val values: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1); k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
  }

  private val cosT: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0) *
        (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
    t
  }

  // ---------------------------------------------------------------- decode

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    /** next entropy bit; skips 0xFF00 stuffing; -1 at a marker/EOF. */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1           // stuffed 0xFF
          else { pos -= 1; return -1 }      // real marker: stop
        }
        acc = v; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { val x = bit(); if (x < 0) return -1; v = (v << 1) | x; i += 1 }
      v
    }
    def reset(): Unit = nBits = 0
    /** Skip pad bytes and consume the next RSTn marker. Everything
      * between the last MCU and the marker is padding; entropy data
      * cannot contain a bare 0xFF + D0-D7 thanks to byte stuffing. */
    def restart(): Boolean = {
      reset()
      while (pos + 1 < b.length) {
        if ((b(pos) & 0xff) == 0xff) {
          val m = b(pos + 1) & 0xff
          if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
          else if (m == 0x00) pos += 2 // stuffed pad byte: skip the pair
          else return false            // a different marker: corrupt scan
        } else pos += 1
      }
      false
    }
  }

  private def decodeHuff(r: BitReader, h: Huff): Int = {
    var code = 0; var l = 1
    while (l <= 16) {
      val x = r.bit(); if (x < 0) return -1
      code = (code << 1) | x
      if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
        return h.values(h.valPtr(l) + code - h.minCode(l))
      l += 1
    }
    -1
  }

  /** EXTEND (T.81 F.2.2.1): map t raw bits to a signed coefficient. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
                                var dcTbl: Int = 0, var acTbl: Int = 0)

  /** Entropy-decode one sequential block into NATURAL-order
    * dequantized `coefs` (q is zigzag-ordered as stored in its DQT
    * segment, so the zigzag POSITION selects the quantizer). Updates
    * the component's DC predictor in place; false on corrupt data. */
  private def decodeBlockInto(r: BitReader, dcT: Huff, acT: Huff,
      q: Array[Int], dcPred: Array[Int], ci: Int, coefs: Array[Int]): Boolean = {
    java.util.Arrays.fill(coefs, 0)
    val t = decodeHuff(r, dcT)
    if (t < 0) return false
    val diff = if (t == 0) 0 else {
      val raw = r.bits(t); if (raw < 0) return false; extend(raw, t)
    }
    dcPred(ci) += diff
    coefs(0) = dcPred(ci) * q(0)
    var k = 1
    var eob = false
    while (k < 64 && !eob) {
      val rs = decodeHuff(r, acT)
      if (rs < 0) return false
      val run = rs >> 4; val sz = rs & 0x0f
      if (sz == 0) {
        if (run == 15) k += 16 else eob = true // ZRL vs EOB
      } else {
        k += run
        if (k > 63) return false
        val raw = r.bits(sz); if (raw < 0) return false
        coefs(ZigZag(k)) = extend(raw, sz) * q(k)
        k += 1
      }
    }
    true
  }

  /** Position of the next non-RST, non-stuffing marker at/after p0 —
    * how a scan's entropy segment is skipped without decoding it. */
  private def nextMarkerPos(b: Array[Byte], p0: Int): Int = {
    var p = p0
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) == 0xff) {
        val m2 = b(p + 1) & 0xff
        if (m2 != 0x00 && !(m2 >= 0xd0 && m2 <= 0xd7)) return p
        p += 2
      } else p += 1
    }
    b.length
  }

  /** Full baseline decode of the luma plane: (width, height,
    * mean luma over the real image area). */
  def decodeBaseline(b: Array[Byte]): Option[(Int, Int, Double)] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def be16(o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4); val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var chromaSkipTo = -1 // set by a skipped non-luma scan
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      var mOff = pos + 1
      while (mOff < b.length - 1 && (b(mOff) & 0xff) == 0xff) mOff += 1
      val m = b(mOff) & 0xff
      if (m >= 0xd0 && m <= 0xd9) { pos = mOff + 1 }
      else {
        if (mOff + 3 > b.length) return None
        val segLen = be16(mOff + 1)
        if (segLen < 2 || mOff + 1 + segLen > b.length) return None
        val seg = mOff + 3 // segment payload start
        m match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < mOff + 1 + segLen) {
              val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f; p += 1
              val q = new Array[Int](64)
              for (i <- 0 until 64) {
                q(i) = if (pq == 0) b(p) & 0xff else be16(p)
                p += (if (pq == 0) 1 else 2)
              }
              quant(tq) = q
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < mOff + 1 + segLen) {
              val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f; p += 1
              val counts = (0 until 16).map(i => b(p + i) & 0xff).toArray
              p += 16
              val n = counts.sum
              val values = (0 until n).map(i => b(p + i) & 0xff).toArray
              p += n
              val t = new Huff(counts, values)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            }
          case 0xdd => restartInterval = be16(seg)
          case 0xc0 | 0xc1 => // SOF0/1: baseline / extended sequential
            h = be16(seg + 1); w = be16(seg + 3)
            val nc = b(seg + 5) & 0xff
            comps = (0 until nc).map { i =>
              val o = seg + 6 + i * 3
              Comp(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f, b(o + 2) & 0xff)
            }.toArray
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // progressive/hierarchical/arithmetic: not baseline
          case 0xde => return None // DHP: hierarchical pyramid
          case 0xda => // SOS: entropy-coded scan follows
            if (comps == null || w <= 0 || h <= 0) return None
            val ns = b(seg) & 0xff
            for (i <- 0 until ns) {
              val cid = b(seg + 1 + i * 2) & 0xff
              val tt = b(seg + 2 + i * 2) & 0xff
              comps.find(_.id == cid).foreach { c => c.dcTbl = tt >> 4; c.acTbl = tt & 0x0f }
            }
            if (ns == comps.length) // interleaved: one scan, all comps
              return decodeScan(b, mOff + 1 + segLen, w, h, comps, quant,
                dcTabs, acTabs, restartInterval)
            if (ns != 1) return None // partial interleave: not sequential-legal
            // non-interleaved (T.81 A.2.2): one scan per component,
            // the MCU is a single 8x8 block over the component's own
            // grid. Old encoders emit these; each component appears in
            // exactly one scan, so once the luma scan is decoded the
            // mean is final — chroma scans never need decoding at all.
            val cid = b(seg + 1) & 0xff
            val ci = comps.indexWhere(_.id == cid)
            if (ci < 0) return None
            if (ci == 0) {
              val c = comps(0)
              val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
              val cw = (w * c.h + hMax - 1) / hMax
              val ch = (h * c.v + vMax - 1) / vMax
              return decodeScanSingle(b, mOff + 1 + segLen, c, quant,
                dcTabs, acTabs, restartInterval, cw, ch).map {
                case (sum, cnt) => (w, h, sum / cnt)
              }
            }
            // skip a chroma scan's entropy data to the next real marker
            chromaSkipTo = nextMarkerPos(b, mOff + 1 + segLen)
          case _ => ()
        }
        pos = if (chromaSkipTo >= 0) chromaSkipTo else mOff + 1 + segLen
        chromaSkipTo = -1
      }
    }
    None
  } catch { case _: Exception => None }

  private def decodeScan(b: Array[Byte], scanStart: Int, w: Int, h: Int,
                         comps: Array[Comp], quant: Array[Array[Int]],
                         dcTabs: Array[Huff], acTabs: Array[Huff],
                         restartInterval: Int): Option[(Int, Int, Double)] = {
    val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // luma plane accumulation at the luma component's own resolution
    val c0 = comps(0)
    val lw = (w * c0.h + hMax - 1) / hMax
    val lh = (h * c0.v + vMax - 1) / vMax
    var lumaSum = 0.0; var lumaCnt = 0L
    val r = new BitReader(b, scanStart)
    val dcPred = new Array[Int](comps.length)
    val coefs = new Array[Int](64)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val dcT = dcTabs(c.dcTbl); val acT = acTabs(c.acTbl)
        val q = quant(c.tq)
        if (dcT == null || acT == null || q == null) return None
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            if (!decodeBlockInto(r, dcT, acT, q, dcPred, ci, coefs)) return None
            // ---- luma blocks: IDCT + accumulate cropped pixels
            if (ci == 0) {
              idctBlock(coefs, tmp, block)
              val px0 = (mx * c.h + bx) * 8; val py0 = (my * c.v + by) * 8
              var py = 0
              while (py < 8) {
                if (py0 + py < lh) {
                  var px = 0
                  while (px < 8) {
                    if (px0 + px < lw) {
                      val p = math.max(0.0, math.min(255.0, math.rint(block(py * 8 + px))))
                      lumaSum += p; lumaCnt += 1
                    }
                    px += 1
                  }
                }
                py += 1
              }
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    if (lumaCnt == 0) None else Some((w, h, lumaSum / lumaCnt))
  }

  /** One NON-INTERLEAVED sequential scan (T.81 A.2.2): the MCU is a
    * single 8x8 block traversing the component's own block grid
    * (ceil(cw/8) x ceil(ch/8)); restart intervals count these block
    * MCUs. Returns (pixelSum, pixelCount) over the component's real
    * (cropped) area. */
  private def decodeScanSingle(b: Array[Byte], scanStart: Int, c: Comp,
      quant: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInterval: Int, cw: Int, ch: Int): Option[(Double, Long)] = {
    val dcT = dcTabs(c.dcTbl); val acT = acTabs(c.acTbl)
    val q = quant(c.tq)
    if (dcT == null || acT == null || q == null || cw <= 0 || ch <= 0) return None
    val blocksX = (cw + 7) / 8; val blocksY = (ch + 7) / 8
    val r = new BitReader(b, scanStart)
    val dcPred = new Array[Int](1)
    val coefs = new Array[Int](64)
    val tmp = new Array[Double](64)
    val block = new Array[Double](64)
    var sum = 0.0; var cnt = 0L
    var i = 0
    val n = blocksX * blocksY
    while (i < n) {
      if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
        if (!r.restart()) return None
        dcPred(0) = 0
      }
      if (!decodeBlockInto(r, dcT, acT, q, dcPred, 0, coefs)) return None
      idctBlock(coefs, tmp, block)
      val px0 = (i % blocksX) * 8; val py0 = (i / blocksX) * 8
      var py = 0
      while (py < 8) {
        if (py0 + py < ch) {
          var px = 0
          while (px < 8) {
            if (px0 + px < cw) {
              val p = math.max(0.0, math.min(255.0, math.rint(block(py * 8 + px))))
              sum += p; cnt += 1
            }
            px += 1
          }
        }
        py += 1
      }
      i += 1
    }
    if (cnt == 0) None else Some((sum, cnt))
  }

  // ------------------------------------------------------- progressive decode

  /** Full pixel decode: baseline-sequential first, then progressive
    * (SOF2), then arithmetic (SOF9 sequential + SOF10 progressive,
    * [[JpegArith]]), then lossless (SOF3, Annex H predictive).
    *
    * HIERARCHICAL frames (SOF5-7/13-15, DHP/EXP pyramids) return None
    * by design — a formal close of the matrix, not an oversight: the
    * mode is vanishingly rare in the wild (no mainstream encoder
    * emits it; libjpeg only decodes it via its rarely-built
    * progressive-hierarchical path), the reference reads such files
    * only through PIL/libjpeg (packages/vaex-core/vaex/image.py), and
    * a pyramid decode would drag in differential-frame EXP upsampling
    * for zero observed corpus value. JpegHierarchicalSpec pins the
    * rejection. */
  def decodePixels(b: Array[Byte]): Option[(Int, Int, Double)] =
    decodeBaseline(b).orElse(decodeProgressive(b))
      .orElse(JpegArith.decodeSequential(b))
      .orElse(decodeLossless(b))

  // shared low-level pieces for the arithmetic path (same package)
  private[operators] def naturalOf(z: Int): Int = ZigZag(z)
  private[operators] def zigzagOf(n: Int): Int = ZigZagInv(n)
  private[operators] def idct8x8(coefs: Array[Int], tmp: Array[Double],
                                 out: Array[Double]): Unit =
    idctBlock(coefs, tmp, out)
  private[operators] def writeMarker(out: ByteArrayOutputStream, m: Int): Unit =
    emitMarker(out, m)
  private[operators] def writeSeg(out: ByteArrayOutputStream, m: Int,
                                  payload: Array[Int]): Unit =
    emitSeg(out, m, payload)

  /** Separable float IDCT of one natural-order coefficient block into
    * `out` (levels around 128). */
  private def idctBlock(coefs: Array[Int], tmp: Array[Double], out: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += cosT(x * 8 + u) * coefs(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += cosT(yy * 8 + v) * tmp(v * 8 + x); v += 1 }
        out(yy * 8 + x) = s / 2.0 + 128.0
        yy += 1
      }
      x += 1
    }
  }

  /** Progressive (SOF2) decode of ALL component planes: coefficients
    * accumulate across scans (DC first/refine, AC first/refine with
    * EOB runs — T.81 G.2), then one dequant+IDCT pass per component.
    * Capped at 2^24 pixels — beyond that the coefficient buffers
    * (4 B/sample) stop being a sane per-task allocation and the
    * caller falls back to metadata. */
  private def decodeProgressivePlanes(b: Array[Byte]): Option[ProgPlanes] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def be16(o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4); val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0; var restartInterval = 0
    var hMax = 0; var vMax = 0
    var mcusX = 0; var mcusY = 0
    // PADDED per-component block grids (MCU-aligned); coefficients in
    // natural order, unquantized, accumulated across scans
    var cgW: Array[Int] = null; var cgH: Array[Int] = null
    var coefPlanes: Array[Array[Int]] = null
    var eobrun = 0

    /** position of the next non-RST, non-stuffing marker at/after p. */
    def nextMarker(p0: Int): Int = {
      var p = p0
      while (p + 1 < b.length) {
        if ((b(p) & 0xff) == 0xff) {
          val m2 = b(p + 1) & 0xff
          if (m2 != 0x00 && !(m2 >= 0xd0 && m2 <= 0xd7)) return p
          p += 2
        } else p += 1
      }
      b.length
    }

    def refineBit(r: BitReader, coefs: Array[Int], idx: Int, p1: Int): Boolean = {
      val cb = r.bit(); if (cb < 0) return false
      if (cb != 0 && (coefs(idx) & p1) == 0)
        coefs(idx) += (if (coefs(idx) >= 0) p1 else -p1)
      true
    }

    /** AC first scan for one block (T.81 G.2.2; coefficients land
      * shifted left by al). */
    def acFirst(r: BitReader, acT: Huff, coefs: Array[Int],
                ss: Int, se: Int, al: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = decodeHuff(r, acT); if (rs < 0) return false
        val run = rs >> 4; val sz = rs & 0x0f
        if (sz == 0) {
          if (run == 15) k += 16 // ZRL
          else {
            eobrun = (1 << run) - 1
            if (run > 0) { val x = r.bits(run); if (x < 0) return false; eobrun += x }
            return true
          }
        } else {
          k += run
          if (k > se) return false
          val raw = r.bits(sz); if (raw < 0) return false
          coefs(ZigZag(k)) = extend(raw, sz) << al
          k += 1
        }
      }
      true
    }

    /** AC refinement scan for one block (T.81 G.2.2 / the classic
      * decode_mcu_AC_refine structure): newly-significant coefficients
      * arrive as ±1<<al over ZERO-HISTORY runs; every already-nonzero
      * coefficient passed on the way contributes a correction bit. */
    def acRefine(r: BitReader, acT: Huff, coefs: Array[Int],
                 ss: Int, se: Int, al: Int): Boolean = {
      val p1 = 1 << al
      var k = ss
      if (eobrun == 0) {
        var inEob = false
        while (k <= se && !inEob) {
          val rs = decodeHuff(r, acT); if (rs < 0) return false
          var run = rs >> 4
          val sz = rs & 0x0f
          var newVal = 0
          if (sz == 0) {
            if (run != 15) {
              eobrun = 1 << run
              if (run > 0) { val x = r.bits(run); if (x < 0) return false; eobrun += x }
              inEob = true
            } // run == 15: ZRL — skip 16 zero-history coefficients
          } else {
            if (sz != 1) return false // refinement sends only ±1
            val x = r.bit(); if (x < 0) return false
            newVal = if (x != 0) p1 else -p1
          }
          if (!inEob) {
            var placed = false
            while (!placed && k <= se) {
              val idx = ZigZag(k)
              if (coefs(idx) != 0) {
                if (!refineBit(r, coefs, idx, p1)) return false
              } else {
                if (run == 0) { if (newVal != 0) coefs(idx) = newVal; placed = true }
                else run -= 1
              }
              k += 1
            }
            if (!placed && newVal != 0) return false // run past the band
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) { // correction bits for the rest of the band
          val idx = ZigZag(k)
          if (coefs(idx) != 0 && !refineBit(r, coefs, idx, p1)) return false
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    var pos = 2
    var done = false
    while (!done && pos + 2 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      var mOff = pos + 1
      while (mOff < b.length - 1 && (b(mOff) & 0xff) == 0xff) mOff += 1
      val m = b(mOff) & 0xff
      if (m == 0xd9) done = true // EOI
      else if (m >= 0xd0 && m <= 0xd8) pos = mOff + 1
      else {
        if (mOff + 3 > b.length) return None
        val segLen = be16(mOff + 1)
        if (segLen < 2 || mOff + 1 + segLen > b.length) return None
        val seg = mOff + 3
        var nextPos = mOff + 1 + segLen
        m match {
          case 0xdb =>
            var p = seg
            while (p < mOff + 1 + segLen) {
              val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f; p += 1
              val q = new Array[Int](64)
              for (i <- 0 until 64) {
                q(i) = if (pq == 0) b(p) & 0xff else be16(p)
                p += (if (pq == 0) 1 else 2)
              }
              quant(tq) = q
            }
          case 0xc4 =>
            var p = seg
            while (p < mOff + 1 + segLen) {
              val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f; p += 1
              val counts = (0 until 16).map(i => b(p + i) & 0xff).toArray
              p += 16
              val n = counts.sum
              val values = (0 until n).map(i => b(p + i) & 0xff).toArray
              p += n
              val t = new Huff(counts, values)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            }
          case 0xdd => restartInterval = be16(seg)
          case 0xc2 => // SOF2: progressive DCT, Huffman
            h = be16(seg + 1); w = be16(seg + 3)
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
            val nc = b(seg + 5) & 0xff
            comps = (0 until nc).map { i =>
              val o = seg + 6 + i * 3
              Comp(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f, b(o + 2) & 0xff)
            }.toArray
            hMax = comps.map(_.h).max; vMax = comps.map(_.v).max
            if (hMax < 1 || vMax < 1) return None
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            if (comps.length > 4) return None
            cgW = comps.map(c => mcusX * c.h); cgH = comps.map(c => mcusY * c.v)
            coefPlanes = comps.indices
              .map(i => new Array[Int](cgW(i) * cgH(i) * 64)).toArray
          case mm if mm >= 0xc0 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 && mm != 0xcc =>
            return None // sequential (baseline path's job), hierarchical, arithmetic
          case 0xde => return None // DHP: hierarchical pyramid
          case 0xda =>
            if (comps == null || coefPlanes == null) return None
            val ns = b(seg) & 0xff
            val scanComps = (0 until ns).map { i =>
              val cid = b(seg + 1 + i * 2) & 0xff
              val tt = b(seg + 2 + i * 2) & 0xff
              val c = comps.find(_.id == cid).getOrElse(return None)
              (c, tt >> 4, tt & 0x0f)
            }
            val ss = b(seg + 1 + ns * 2) & 0xff
            val se = b(seg + 2 + ns * 2) & 0xff
            val ahal = b(seg + 3 + ns * 2) & 0xff
            val ah = ahal >> 4; val al = ahal & 0x0f
            val scanStart = mOff + 1 + segLen
            if (ss > se || se > 63 || al > 13) return None
            // every scan decodes (chroma AC scans used to be byte-
            // skipped — their coefficients are retained now for the
            // full-color decode path)
            locally {
              eobrun = 0
              val r = new BitReader(b, scanStart)
              val dcPred = new Array[Int](comps.length)
              def decodeOne(c: Comp, ci: Int, dcTbl: Int, acTbl: Int,
                            bxy: Int): Boolean = {
                val plane = coefPlanes(ci)
                val coefs = new Array[Int](64)
                System.arraycopy(plane, bxy * 64, coefs, 0, 64)
                val ok =
                  if (ss == 0) {
                    if (ah == 0) {
                      val dcT = dcTabs(dcTbl); if (dcT == null) return false
                      val t = decodeHuff(r, dcT); if (t < 0) return false
                      val diff = if (t == 0) 0 else {
                        val raw = r.bits(t); if (raw < 0) return false; extend(raw, t)
                      }
                      dcPred(ci) += diff
                      coefs(0) = dcPred(ci) << al
                      true
                    } else {
                      val x = r.bit(); if (x < 0) return false
                      if (x != 0) coefs(0) |= (1 << al)
                      true
                    }
                  } else {
                    val acT = acTabs(acTbl); if (acT == null) return false
                    if (ah == 0) acFirst(r, acT, coefs, ss, se, al)
                    else acRefine(r, acT, coefs, ss, se, al)
                  }
                if (ok) System.arraycopy(coefs, 0, plane, bxy * 64, 64)
                ok
              }
              if (ns == 1) {
                // non-interleaved: the component's own (unpadded) grid
                val (c, dcTbl, acTbl) = scanComps.head
                val ci = comps.indexWhere(_ eq c)
                val cw = (w * c.h + hMax - 1) / hMax
                val chh = (h * c.v + vMax - 1) / vMax
                val aw = (cw + 7) / 8; val aht = (chh + 7) / 8
                var bi = 0
                val total = aw * aht
                while (bi < total) {
                  if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
                    if (!r.restart()) return None
                    java.util.Arrays.fill(dcPred, 0); eobrun = 0
                  }
                  val bxy = (bi / aw) * cgW(ci) + (bi % aw) // this comp's grid stride
                  if (!decodeOne(c, ci, dcTbl, acTbl, bxy)) return None
                  bi += 1
                }
              } else {
                // interleaved (DC scans): MCU-major, h×v blocks per comp
                if (ss != 0) return None // interleaved AC scans are illegal
                var mcu = 0
                val nMcus = mcusX * mcusY
                while (mcu < nMcus) {
                  if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                    if (!r.restart()) return None
                    java.util.Arrays.fill(dcPred, 0); eobrun = 0
                  }
                  val mx = mcu % mcusX; val my = mcu / mcusX
                  var si = 0
                  while (si < scanComps.length) {
                    val (c, dcTbl, acTbl) = scanComps(si)
                    val ci = comps.indexWhere(_ eq c)
                    var by = 0
                    while (by < c.v) {
                      var bx = 0
                      while (bx < c.h) {
                        val bxy = (my * c.v + by) * cgW(ci) + (mx * c.h + bx)
                        if (!decodeOne(c, ci, dcTbl, acTbl, bxy)) return None
                        bx += 1
                      }
                      by += 1
                    }
                    si += 1
                  }
                  mcu += 1
                }
              }
              nextPos = nextMarker(r.pos)
            }
          case _ => ()
        }
        pos = nextPos
      }
    }
    if (coefPlanes == null || comps == null) return None
    // dequant + IDCT each component over its UNPADDED grid, cropped
    // to the component's own resolution
    val planeW = new Array[Int](comps.length)
    val planeH = new Array[Int](comps.length)
    val planes = new Array[Array[Int]](comps.length)
    val coefs = new Array[Int](64)
    val tmp = new Array[Double](64); val block = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = quant(c.tq)
      if (q == null) return None
      val cw = (w * c.h + hMax - 1) / hMax
      val chh = (h * c.v + vMax - 1) / vMax
      val aw = (cw + 7) / 8; val ah2 = (chh + 7) / 8
      val pix = new Array[Int](cw * chh)
      val src = coefPlanes(ci)
      var by = 0
      while (by < ah2) {
        var bx = 0
        while (bx < aw) {
          val base = (by * cgW(ci) + bx) * 64
          var i = 0
          while (i < 64) { coefs(i) = src(base + i) * q(ZigZagInv(i)); i += 1 }
          idctBlock(coefs, tmp, block)
          val px0 = bx * 8; val py0 = by * 8
          var py = 0
          while (py < 8) {
            if (py0 + py < chh) {
              var px = 0
              while (px < 8) {
                if (px0 + px < cw) {
                  pix((py0 + py) * cw + px0 + px) = math.max(0.0,
                    math.min(255.0, math.rint(block(py * 8 + px)))).toInt
                }
                px += 1
              }
            }
            py += 1
          }
          bx += 1
        }
        by += 1
      }
      planeW(ci) = cw; planeH(ci) = chh; planes(ci) = pix
      ci += 1
    }
    if (planes(0).isEmpty) None
    else Some(ProgPlanes(w, h, comps.map(_.h), comps.map(_.v), hMax, vMax,
      planeW, planeH, planes))
  } catch { case _: Exception => None }

  /** Decoded progressive component planes at their native (possibly
    * subsampled) resolutions. */
  private final case class ProgPlanes(w: Int, h: Int,
      hs: Array[Int], vs: Array[Int], hMax: Int, vMax: Int,
      planeW: Array[Int], planeH: Array[Int], planes: Array[Array[Int]])

  private def decodeProgressive(b: Array[Byte]): Option[(Int, Int, Double)] =
    decodeProgressivePlanes(b).map { p =>
      val y = p.planes(0)
      var s = 0.0; var i = 0
      while (i < y.length) { s += y(i); i += 1 }
      (p.w, p.h, s / y.length)
    }

  /** Full-color decode of a PROGRESSIVE (SOF2) JPEG: coefficients for
    * ALL components accumulate across scans (the brightness path only
    * needs luma), each plane gets its own dequant + IDCT, chroma is
    * upsampled nearest-neighbor to full resolution and converted
    * JFIF YCbCr -> RGB. Returns packed row-major RGB bytes (3 per
    * pixel); a grayscale progressive file replicates Y into all three
    * channels. None for component counts outside {1, 3}. */
  def decodeRgbProgressive(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeProgressivePlanes(b)
      .filter(p => p.planes.length == 1 || p.planes.length == 3)
      .map { p =>
        val out = new Array[Byte](p.w * p.h * 3)
        def clamp(d: Double): Byte =
          math.max(0, math.min(255, math.rint(d).toInt)).toByte
        var y = 0
        while (y < p.h) {
          var x = 0
          while (x < p.w) {
            def sampleOf(ci: Int): Int = {
              val sx = math.min(p.planeW(ci) - 1, x * p.hs(ci) / p.hMax)
              val sy = math.min(p.planeH(ci) - 1, y * p.vs(ci) / p.vMax)
              p.planes(ci)(sy * p.planeW(ci) + sx)
            }
            val o = (y * p.w + x) * 3
            if (p.planes.length == 1) {
              val v = sampleOf(0).toByte
              out(o) = v; out(o + 1) = v; out(o + 2) = v
            } else {
              val yy = sampleOf(0).toDouble
              val cb = sampleOf(1) - 128.0
              val cr = sampleOf(2) - 128.0
              out(o) = clamp(yy + 1.402 * cr)
              out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
              out(o + 2) = clamp(yy + 1.772 * cb)
            }
            x += 1
          }
          y += 1
        }
        (p.w, p.h, out)
      }

  // ---------------------------------------------------------------- encode

  /** Canonical codes for (counts, values) as (symbol -> (code, len)). */
  private def canonical(counts: Array[Int], values: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (l <- 1 to 16) {
      for (_ <- 0 until counts(l - 1)) { out(values(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    out.toMap
  }

  private final class BitWriter(val out: ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put((1 << (8 - n)) - 1, 8 - n) } // pad with 1s
  }

  private lazy val DcCodes = canonical(StdDcCounts, StdDcValues)
  private lazy val AcCodes = canonical(StdAcCounts, StdAcValues)

  private def emitMarker(out: ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }
  private def emitSeg(out: ByteArrayOutputStream, m: Int, payload: Array[Int]): Unit = {
    emitMarker(out, m)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xff); payload.foreach(out.write)
  }

  /** SOI + shared tables (all-ones DQT, Annex K Huffman) + the given
    * SOF0 component spec + optional DRI + SOS; returns the entropy
    * BitWriter positioned after the SOS header. `comps` is
    * (id, samplingByte) per component, all on quant/huffman table 0. */
  private def emitHeaders(out: ByteArrayOutputStream, width: Int, height: Int,
                          comps: Seq[(Int, Int)], restartInterval: Int): BitWriter = {
    emitMarker(out, 0xd8) // SOI
    emitSeg(out, 0xdb, 0x00 +: Array.fill(64)(1))           // DQT tq=0, all ones
    emitSeg(out, 0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      comps.size) ++ comps.flatMap { case (id, sampling) => Seq(id, sampling, 0) })
    emitSeg(out, 0xc4, 0x00 +: (StdDcCounts ++ StdDcValues)) // DHT DC 0
    emitSeg(out, 0xc4, 0x10 +: (StdAcCounts ++ StdAcValues)) // DHT AC 0
    if (restartInterval > 0)
      emitSeg(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff)) // DRI
    emitSeg(out, 0xda,
      Array(comps.size) ++ comps.flatMap { case (id, _) => Seq(id, 0x00) } ++
        Seq(0, 63, 0))                                       // SOS
    new BitWriter(out)
  }

  private def categoryOf(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** DC-difference + zigzag AC run-length Huffman encode of ONE block
    * (NATURAL-order coefficients, quant all ones); updates the per-
    * component DC predictor in place. Shared by every encoder. */
  private def emitBlock(bw: BitWriter, dcPred: Array[Int], ci: Int,
                        coefs: Array[Int]): Unit = {
    def putValue(v: Int, t: Int): Unit =
      if (t > 0) bw.put(if (v < 0) v + (1 << t) - 1 else v, t)
    val diff = coefs(0) - dcPred(ci)
    dcPred(ci) = coefs(0)
    val t = categoryOf(diff)
    val (dc, dl) = DcCodes(t); bw.put(dc, dl); putValue(diff, t)
    var k = 1; var run = 0
    while (k < 64) {
      val v = coefs(ZigZag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl); run -= 16 } // ZRL
        val sz = categoryOf(v)
        val (ac, al) = AcCodes((run << 4) | sz); bw.put(ac, al); putValue(v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = AcCodes(0x00); bw.put(ec, el) } // EOB
  }

  /** Grayscale baseline JPEG from per-block NATURAL-order DCT
    * coefficients (quant table all ones): full DC-difference +
    * AC run-length/Huffman encode. `blocks` are raster block order,
    * (ceil(w/8)*ceil(h/8)) entries of 64 coefficients.
    * `restartInterval` > 0 emits a DRI segment and RSTn markers every
    * that many MCUs (what wild JPEGs use for error resilience) —
    * mainly to exercise the decoder's restart path. */
  private[graft] def encodeCoefJpeg(width: Int, height: Int,
                                    blocks: Seq[Array[Int]],
                                    restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "bad jpeg size")
    require(blocks.size == ((width + 7) / 8) * ((height + 7) / 8), "block count mismatch")
    val out = new ByteArrayOutputStream()
    val bw = emitHeaders(out, width, height, Seq((1, 0x11)), restartInterval)
    val dcPred = new Array[Int](1)
    blocks.zipWithIndex.foreach { case (coefs, bi) =>
      if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
        bw.flush() // pad to byte boundary, then the restart marker
        emitMarker(out, 0xd0 + ((bi / restartInterval - 1) % 8))
        dcPred(0) = 0 // DC prediction resets at a restart
      }
      emitBlock(bw, dcPred, 0, coefs)
    }
    bw.flush()
    emitMarker(out, 0xd9) // EOI
    out.toByteArray
  }

  /** 3-component (YCbCr, all 1x1 sampling, shared tables) baseline
    * JPEG from per-component NATURAL-order coefficients — the
    * interleaved-MCU shape every color web JPEG has; exists to pin
    * the decoder's multi-component scan walk (chroma blocks advance
    * the bitstream, only luma accumulates). */
  private[graft] def encodeYCbCrJpeg(width: Int, height: Int,
      y: Seq[Array[Int]], cb: Seq[Array[Int]], cr: Seq[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0, "bad jpeg size")
    val nBlocks = ((width + 7) / 8) * ((height + 7) / 8)
    require(y.size == nBlocks && cb.size == nBlocks && cr.size == nBlocks,
      "block count mismatch")
    val out = new ByteArrayOutputStream()
    val bw = emitHeaders(out, width, height,
      Seq((1, 0x11), (2, 0x11), (3, 0x11)), restartInterval = 0)
    val comps = Array(y, cb, cr)
    val dcPred = new Array[Int](3)
    var mcu = 0
    while (mcu < nBlocks) { // interleaved: one block per component per MCU
      var ci = 0
      while (ci < 3) { emitBlock(bw, dcPred, ci, comps(ci)(mcu)); ci += 1 }
      mcu += 1
    }
    bw.flush()
    emitMarker(out, 0xd9)
    out.toByteArray
  }

  /** 4:2:0-subsampled YCbCr baseline JPEG (Y 2x2, chroma 1x1 — THE
    * dominant web-photo layout): per MCU, four Y blocks in raster
    * order then one Cb and one Cr. Pins the decoder's
    * multi-block-per-MCU luma placement math. `y` is raster order
    * over the full-resolution block grid (ceil(w/8) x ceil(h/8),
    * which must be even multiples of 2 blocks here for simplicity:
    * w, h multiples of 16). */
  private[graft] def encodeSubsampledJpeg(width: Int, height: Int,
      y: Seq[Array[Int]], cb: Seq[Array[Int]], cr: Seq[Array[Int]]): Array[Byte] = {
    require(width % 16 == 0 && height % 16 == 0, "use multiples of 16")
    val blocksX = width / 8; val blocksY = height / 8
    val mcusX = blocksX / 2; val mcusY = blocksY / 2
    require(y.size == blocksX * blocksY && cb.size == mcusX * mcusY &&
      cr.size == mcusX * mcusY, "block count mismatch")
    val out = new ByteArrayOutputStream()
    val bw = emitHeaders(out, width, height,
      Seq((1, 0x22), (2, 0x11), (3, 0x11)), restartInterval = 0)
    val dcPred = new Array[Int](3)
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      for (by <- 0 until 2; bx <- 0 until 2)
        emitBlock(bw, dcPred, 0, y((my * 2 + by) * blocksX + mx * 2 + bx))
      emitBlock(bw, dcPred, 1, cb(my * mcusX + mx))
      emitBlock(bw, dcPred, 2, cr(my * mcusX + mx))
    }
    bw.flush()
    emitMarker(out, 0xd9)
    out.toByteArray
  }

  /** 3-component NON-INTERLEAVED baseline JPEG (one scan per
    * component, all 1x1 sampling, shared tables) from per-component
    * NATURAL-order coefficients — the multi-scan sequential layout old
    * encoders emit. Same pixels as [[encodeYCbCrJpeg]] of the same
    * blocks (the two layouts differ only in scan order), which is what
    * the spec asserts. `restartInterval` > 0 emits DRI + RSTn every
    * that many block-MCUs of each scan (T.81: restart counts MCUs =
    * single blocks in a non-interleaved scan). */
  private[graft] def encodeNonInterleavedJpeg(width: Int, height: Int,
      y: Seq[Array[Int]], cb: Seq[Array[Int]], cr: Seq[Array[Int]],
      restartInterval: Int = 0,
      scanOrder: Seq[Int] = Seq(0, 1, 2)): Array[Byte] = {
    require(width > 0 && height > 0, "bad jpeg size")
    require(scanOrder.sorted == Seq(0, 1, 2), "scanOrder must permute 0..2")
    val nBlocks = ((width + 7) / 8) * ((height + 7) / 8)
    require(y.size == nBlocks && cb.size == nBlocks && cr.size == nBlocks,
      "block count mismatch")
    val out = new ByteArrayOutputStream()
    emitMarker(out, 0xd8) // SOI
    emitSeg(out, 0xdb, 0x00 +: Array.fill(64)(1))
    emitSeg(out, 0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    emitSeg(out, 0xc4, 0x00 +: (StdDcCounts ++ StdDcValues))
    emitSeg(out, 0xc4, 0x10 +: (StdAcCounts ++ StdAcValues))
    if (restartInterval > 0)
      emitSeg(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    val planes = IndexedSeq((y, 1), (cb, 2), (cr, 3))
    for ((blocks, cid) <- scanOrder.map(planes)) {
      emitSeg(out, 0xda, Array(1, cid, 0x00, 0, 63, 0)) // SOS, one component
      val bw = new BitWriter(out)
      val dcPred = new Array[Int](1)
      blocks.zipWithIndex.foreach { case (coefs, bi) =>
        if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
          bw.flush()
          emitMarker(out, 0xd0 + ((bi / restartInterval - 1) % 8))
          dcPred(0) = 0
        }
        emitBlock(bw, dcPred, 0, coefs)
      }
      bw.flush()
    }
    emitMarker(out, 0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale PROGRESSIVE (SOF2) JPEG from per-block NATURAL-order
    * coefficients, quant table all ones — the fixture generator for
    * the progressive decode path. Scan script exercises both
    * progressive mechanisms:
    *
    *   1. DC first        Ss=0 Se=0  Ah=0 Al=1
    *   2. AC first        Ss=1 Se=5  Ah=0 Al=1   (spectral selection)
    *   3. AC first        Ss=6 Se=63 Ah=0 Al=1
    *   4. DC refinement   Ss=0 Se=0  Ah=1 Al=0   (successive approx.)
    *   5. AC refinement   Ss=1 Se=63 Ah=1 Al=0
    *
    * EOB runs are flushed per block (EOBRUN=1 — valid, simplest); the
    * refinement scan buffers correction bits exactly like the T.81
    * G.1.2.3 flow so the decoder's zero-history run walk is really
    * exercised. Decodes (by ours or any compliant decoder) to the same
    * pixels as `encodeCoefJpeg` of the same blocks. */
  private[graft] def encodeProgressiveJpeg(width: Int, height: Int,
                                           blocks: Seq[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0, "bad jpeg size")
    require(blocks.size == ((width + 7) / 8) * ((height + 7) / 8), "block count mismatch")
    val out = new ByteArrayOutputStream()
    emitMarker(out, 0xd8) // SOI
    emitSeg(out, 0xdb, 0x00 +: Array.fill(64)(1))
    emitSeg(out, 0xc2, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0)) // SOF2, one component id=1, 1x1, quant 0
    emitSeg(out, 0xc4, 0x00 +: (StdDcCounts ++ StdDcValues))
    emitSeg(out, 0xc4, 0x10 +: (StdAcCounts ++ StdAcValues))
    def sos(ss: Int, se: Int, ah: Int, al: Int): BitWriter = {
      emitSeg(out, 0xda, Array(1, 1, 0x00, ss, se, (ah << 4) | al))
      new BitWriter(out)
    }
    // ---- scan 1: DC first, Al=1 (sends diffs of dc >> 1)
    locally {
      val bw = sos(0, 0, 0, 1)
      val pred = new Array[Int](1)
      blocks.foreach(coefs => emitDcFirst(bw, pred, 0, coefs, 1))
      bw.flush()
    }
    // ---- scans 2+3: AC first over two spectral bands, Al=1
    for ((ss, se) <- Seq((1, 5), (6, 63))) {
      val bw = sos(ss, se, 0, 1)
      blocks.foreach(coefs => emitAcFirstBlock(bw, coefs, ss, se, 1))
      bw.flush()
    }
    // ---- scan 4: DC refinement (bit 0 of each DC)
    locally {
      val bw = sos(0, 0, 1, 0)
      blocks.foreach(coefs => bw.put(coefs(0) & 1, 1))
      bw.flush()
    }
    // ---- scan 5: AC refinement, Ah=1 Al=0
    locally {
      val bw = sos(1, 63, 1, 0)
      blocks.foreach(coefs => emitAcRefineBlock(bw, coefs, 1, 63, 0))
      bw.flush()
    }
    emitMarker(out, 0xd9)
    out.toByteArray
  }

  /** DC-first progressive value for one block: Huffman-coded diff of
    * `dc >> al` against the per-component predictor. */
  private def emitDcFirst(bw: BitWriter, dcPred: Array[Int], ci: Int,
                          coefs: Array[Int], al: Int): Unit = {
    val v = coefs(0) >> al
    val diff = v - dcPred(ci); dcPred(ci) = v
    val t = categoryOf(diff)
    val (dc, dl) = DcCodes(t); bw.put(dc, dl)
    if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
  }

  /** AC-first progressive band for one block (magnitudes truncated
    * toward zero by al; per-block EOB flush = EOBRUN of 1). */
  private def emitAcFirstBlock(bw: BitWriter, coefs: Array[Int],
                               ss: Int, se: Int, al: Int): Unit = {
    var r = 0
    var k = ss
    while (k <= se) {
      val v = coefs(ZigZag(k))
      val mag = math.abs(v) >> al
      if (mag == 0) r += 1
      else {
        while (r > 15) { val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl); r -= 16 }
        val sz = categoryOf(mag)
        val signed = if (v < 0) -mag else mag
        val (ac, al2) = AcCodes((r << 4) | sz); bw.put(ac, al2)
        bw.put(if (signed < 0) signed + (1 << sz) - 1 else signed, sz)
        r = 0
      }
      k += 1
    }
    if (r > 0) { val (ec, el) = AcCodes(0x00); bw.put(ec, el) } // EOB (run 1)
  }

  /** AC refinement band for one block (T.81 G.1.2.3 flow:
    * newly-significant coefficients (|v>>al| == 1) end zero-history
    * runs; already-significant ones contribute buffered correction
    * bits; the ZRL flush runs at EVERY nonzero position so every
    * buffered bit lies within 15 zero-history slots of the next
    * emitted symbol — the invariant the decoder's run walk relies
    * on). Per-block EOB flush. */
  private def emitAcRefineBlock(bw: BitWriter, coefs: Array[Int],
                                ss: Int, se: Int, al: Int): Unit = {
    val corr = scala.collection.mutable.ArrayBuffer[Int]()
    var eobPos = 0 // last zigzag position holding a newly-significant coef
    for (k <- ss to se) if (math.abs(coefs(ZigZag(k))) >> al == 1) eobPos = k
    var r = 0
    var k = ss
    while (k <= se) {
      val v = coefs(ZigZag(k))
      val mag = math.abs(v) >> al
      if (mag == 0) r += 1
      else {
        while (r > 15 && k <= eobPos) {
          val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl); r -= 16
          corr.foreach(bit => bw.put(bit, 1)); corr.clear()
        }
        if (mag > 1) corr += (mag & 1) // already significant at Ah
        else {
          val (ac, al2) = AcCodes((r << 4) | 1); bw.put(ac, al2)
          bw.put(if (v < 0) 0 else 1, 1) // sign of the new ±1
          corr.foreach(bit => bw.put(bit, 1)); corr.clear()
          r = 0
        }
      }
      k += 1
    }
    if (r > 0 || corr.nonEmpty) {
      val (ec, el) = AcCodes(0x00); bw.put(ec, el) // EOB, run of 1
      corr.foreach(bit => bw.put(bit, 1)); corr.clear()
    }
  }

  /** 3-component (YCbCr 1x1) PROGRESSIVE JPEG: the INTERLEAVED DC
    * scan shape every color progressive web JPEG has (per MCU, one DC
    * value per component with per-component prediction), followed by
    * per-component AC scans — the chroma AC scans exercise the
    * decoder's skip-non-luma path. */
  private[graft] def encodeProgressiveColorJpeg(width: Int, height: Int,
      y: Seq[Array[Int]], cb: Seq[Array[Int]], cr: Seq[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0, "bad jpeg size")
    val nBlocks = ((width + 7) / 8) * ((height + 7) / 8)
    require(y.size == nBlocks && cb.size == nBlocks && cr.size == nBlocks,
      "block count mismatch")
    val out = new ByteArrayOutputStream()
    emitMarker(out, 0xd8)
    emitSeg(out, 0xdb, 0x00 +: Array.fill(64)(1))
    emitSeg(out, 0xc2, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    emitSeg(out, 0xc4, 0x00 +: (StdDcCounts ++ StdDcValues))
    emitSeg(out, 0xc4, 0x10 +: (StdAcCounts ++ StdAcValues))
    val comps = Array(y, cb, cr)
    // ---- scan 1: interleaved DC first (ns=3), Al=1
    locally {
      emitSeg(out, 0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01))
      val bw = new BitWriter(out)
      val pred = new Array[Int](3)
      var mcu = 0
      while (mcu < nBlocks) {
        var ci = 0
        while (ci < 3) { emitDcFirst(bw, pred, ci, comps(ci)(mcu), 1); ci += 1 }
        mcu += 1
      }
      bw.flush()
    }
    // ---- scans 2-4: AC first per component (Al=1)
    for (ci <- 0 until 3) {
      emitSeg(out, 0xda, Array(1, ci + 1, 0x00, 1, 63, 0x01))
      val bw = new BitWriter(out)
      comps(ci).foreach(coefs => emitAcFirstBlock(bw, coefs, 1, 63, 1))
      bw.flush()
    }
    // ---- scan 5: interleaved DC refinement (1 bit per block per comp)
    locally {
      emitSeg(out, 0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10))
      val bw = new BitWriter(out)
      var mcu = 0
      while (mcu < nBlocks) {
        var ci = 0
        while (ci < 3) { bw.put(comps(ci)(mcu)(0) & 1, 1); ci += 1 }
        mcu += 1
      }
      bw.flush()
    }
    // ---- scans 6-8: AC refinement per component
    for (ci <- 0 until 3) {
      emitSeg(out, 0xda, Array(1, ci + 1, 0x00, 1, 63, 0x10))
      val bw = new BitWriter(out)
      comps(ci).foreach(coefs => emitAcRefineBlock(bw, coefs, 1, 63, 0))
      bw.flush()
    }
    emitMarker(out, 0xd9)
    out.toByteArray
  }

  /** Constant-gray baseline JPEG; decodes back to brightness == gray
    * exactly (all-ones quant table -> zero quantization error for a
    * constant block: DC = 8·(g−128), every AC zero). */
  def encodeGrayJpeg(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(gray >= 0 && gray <= 255, "gray out of range")
    val nBlocks = ((width + 7) / 8) * ((height + 7) / 8)
    val block = new Array[Int](64)
    block(0) = 8 * (gray - 128)
    encodeCoefJpeg(width, height, Seq.fill(nBlocks)(block))
  }

  // --------------------------------------------------- lossless (SOF3) decode

  /** Pt+1 of the T.81 H.1.2.1 prediction table: a = left, b = above,
    * c = above-left. Selector 0 (no prediction) is only legal in
    * hierarchical differential frames — rejected here. */
  private def predictLossless(sel: Int, a: Int, bb: Int, c: Int): Int =
    sel match {
      case 1 => a
      case 2 => bb
      case 3 => c
      case 4 => a + bb - c
      case 5 => a + ((bb - c) >> 1)
      case 6 => bb + ((a - c) >> 1)
      case 7 => (a + bb) >> 1
      case _ => Int.MinValue // caller rejects
    }

  /** LOSSLESS (SOF3) decode — T.81 Annex H: Huffman-coded prediction
    * differences over raw samples, no DCT. Each sample decodes as a
    * DC-style SSSS category (16 = +32768, no extra bits) + EXTENDed
    * bits added to the neighbor prediction, mod 2^16; the scan-header
    * Ss field selects the predictor (1-7), Al the point transform.
    * Components must be 1x1-sampled (the only layout wild lossless
    * files — DICOM, raw-camera — use); the scan interleaves one
    * sample per component per MCU. Restart markers reset the
    * entropy coder and default-predict the following sample
    * (H.2.2.1). Returns (width, height, mean of component-0 samples
    * scaled by 2^Pt). Precision 2-16 supported. */
  def decodeLossless(b: Array[Byte]): Option[(Int, Int, Double)] =
    decodeLosslessFull(b, wantPixels = false).map { case (w, h, mean, _, _) => (w, h, mean) }

  /** Lossless decode exposing the component-0 sample plane (row-major,
    * `pt`-shifted back to full precision) — the pixel source for
    * perceptual hashing ([[Multimodal.dhashImages]]; for a color
    * frame this is the FIRST component only — a deterministic proxy,
    * fine for hashing, wrong for pixel-exact transforms: those use
    * [[decodeLosslessGrayPixels]]). */
  def decodeLosslessPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeLosslessFull(b, wantPixels = true).map { case (w, h, _, px, _) => (w, h, px) }

  /** As [[decodeLosslessPixels]] but ONLY for single-component
    * (grayscale) frames — None for color lossless JPEGs, so callers
    * that re-encode (resize) cannot silently drop channels. */
  def decodeLosslessGrayPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeLosslessFull(b, wantPixels = true).collect {
      case (w, h, _, px, 1) => (w, h, px)
    }

  private def decodeLosslessFull(b: Array[Byte],
      wantPixels: Boolean): Option[(Int, Int, Double, Array[Int], Int)] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def be16(o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    val dcTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0; var precision = 0
    var restartInterval = 0
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      var mOff = pos + 1
      while (mOff < b.length - 1 && (b(mOff) & 0xff) == 0xff) mOff += 1
      val m = b(mOff) & 0xff
      if (m >= 0xd0 && m <= 0xd9) { pos = mOff + 1 }
      else {
        if (mOff + 3 > b.length) return None
        val segLen = be16(mOff + 1)
        if (segLen < 2 || mOff + 1 + segLen > b.length) return None
        val seg = mOff + 3
        m match {
          case 0xc4 => // DHT — lossless uses DC-class tables only
            var p = seg
            while (p < mOff + 1 + segLen) {
              val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f; p += 1
              val counts = (0 until 16).map(i => b(p + i) & 0xff).toArray
              p += 16
              val n = counts.sum
              val values = (0 until n).map(i => b(p + i) & 0xff).toArray
              p += n
              if (tc == 0) dcTabs(th) = new Huff(counts, values)
            }
          case 0xdd => restartInterval = be16(seg)
          case 0xc3 => // SOF3: lossless sequential, Huffman
            precision = b(seg) & 0xff
            if (precision < 2 || precision > 16) return None
            h = be16(seg + 1); w = be16(seg + 3)
            val nc = b(seg + 5) & 0xff
            comps = (0 until nc).map { i =>
              val o = seg + 6 + i * 3
              Comp(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f, b(o + 2) & 0xff)
            }.toArray
            if (comps.exists(c => c.h != 1 || c.v != 1)) return None
          case 0xc0 | 0xc1 | 0xc2 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb
               | 0xcd | 0xce | 0xcf =>
            return None // other frame types: not this decoder's job
          case 0xde =>
            // DHP: a hierarchical pyramid whose first frame is SOF3
            // must NOT decode as a standalone image — the first frame
            // is downsampled; the true geometry lives in the DHP
            return None
          case 0xda =>
            if (comps == null || w <= 0 || h <= 0) return None
            val ns = b(seg) & 0xff
            if (ns != comps.length) return None // lossless: one interleaved scan
            val scanComps = (0 until ns).map { i =>
              val cid = b(seg + 1 + i * 2) & 0xff
              val td = (b(seg + 2 + i * 2) & 0xff) >> 4
              val c = comps.find(_.id == cid).getOrElse(return None)
              (c, dcTabs(td))
            }.toArray
            if (scanComps.exists(_._2 == null)) return None
            val predictor = b(seg + 1 + ns * 2) & 0xff     // Ss
            val pt = b(seg + 3 + ns * 2) & 0x0f            // Al
            if (predictor < 1 || predictor > 7) return None
            if (pt >= precision) return None
            return decodeLosslessScan(b, mOff + 1 + segLen,
              scanComps.map(_._2), w, h, predictor, pt, precision,
              restartInterval, wantPixels)
              .map { case (mean, px) => (w, h, mean, px, ns) }
          case _ => ()
        }
        pos = mOff + 1 + segLen
      }
    }
    None
  } catch { case _: Exception => None }

  private def decodeLosslessScan(b: Array[Byte], scanStart: Int,
      tabs: Array[Huff], w: Int, h: Int, predictor: Int, pt: Int,
      precision: Int, restartInterval: Int,
      wantPixels: Boolean): Option[(Double, Array[Int])] = {
    if (w.toLong * h > (1 << 24)) return None // same cap as progressive
    val nc = tabs.length
    val r = new BitReader(b, scanStart)
    // mean-only callers skip the w*h plane (up to 64 MB at the cap)
    val plane0 = if (wantPixels) new Array[Int](w * h) else null
    val defaultPred = 1 << (precision - pt - 1)
    var prev = Array.fill(nc)(new Array[Int](w))
    var cur = Array.fill(nc)(new Array[Int](w))
    var sum0 = 0.0
    var mcu = 0L
    var atRestart = false
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!r.restart()) return None
          atRestart = true
        }
        var ci = 0
        while (ci < nc) {
          val t = decodeHuff(r, tabs(ci))
          if (t < 0 || t > 16) return None
          val diff =
            if (t == 0) 0
            else if (t == 16) 32768 // SSSS 16: no appended bits (H.2)
            else { val raw = r.bits(t); if (raw < 0) return None; extend(raw, t) }
          val px =
            if (atRestart || (x == 0 && y == 0)) defaultPred
            else if (y == 0) cur(ci)(x - 1)  // first line: predictor a
            else if (x == 0) prev(ci)(x)     // first column: predictor b
            else predictLossless(predictor, cur(ci)(x - 1), prev(ci)(x),
              prev(ci)(x - 1))
          val v = (px + diff) & 0xffff       // mod 2^16 (H.2.1)
          cur(ci)(x) = v
          if (ci == 0) {
            sum0 += (v << pt).toDouble
            if (plane0 != null) plane0(y * w + x) = v << pt
          }
          ci += 1
        }
        atRestart = false
        mcu += 1
        x += 1
      }
      val t = prev; prev = cur; cur = t
      y += 1
    }
    Some((sum0 / (w.toLong * h), plane0))
  }

  /** Grayscale LOSSLESS (SOF3) fixture encoder — 8-bit samples, the
    * standard Annex K DC table, selectable predictor, optional
    * restart intervals; exact inverse of [[decodeLossless]]'s sample
    * reconstruction (round-trips bit-exactly: lossless means the
    * decoded samples ARE the input). */
  private[graft] def encodeLosslessJpeg(width: Int, height: Int,
      samples: Array[Int], predictor: Int = 1,
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && samples.length == width * height,
      "bad lossless geometry")
    require(samples.forall(v => v >= 0 && v <= 255), "8-bit samples only")
    require(predictor >= 1 && predictor <= 7, "predictor 1-7")
    val out = new ByteArrayOutputStream()
    emitMarker(out, 0xd8)
    emitSeg(out, 0xc3, Array(8, height >> 8, height & 0xff,
      width >> 8, width & 0xff, 1, 1, 0x11, 0))
    emitSeg(out, 0xc4, 0x00 +: (StdDcCounts ++ StdDcValues))
    if (restartInterval > 0)
      emitSeg(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    emitSeg(out, 0xda, Array(1, 1, 0x00, predictor, 0, 0)) // Ss=pred, Al=0
    val bw = new BitWriter(out)
    def putValue(v: Int, t: Int): Unit =
      if (t > 0) bw.put(if (v < 0) v + (1 << t) - 1 else v, t)
    var mcu = 0
    var atRestart = false
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          emitMarker(out, 0xd0 + ((mcu / restartInterval - 1) % 8))
          atRestart = true
        }
        val px =
          if (atRestart || (x == 0 && y == 0)) 128
          else if (y == 0) samples(y * width + x - 1)
          else if (x == 0) samples((y - 1) * width)
          else predictLossless(predictor, samples(y * width + x - 1),
            samples((y - 1) * width + x), samples((y - 1) * width + x - 1))
        val diff = samples(y * width + x) - px
        val t = categoryOf(diff)
        val (dc, dl) = DcCodes(t); bw.put(dc, dl); putValue(diff, t)
        atRestart = false
        mcu += 1
        x += 1
      }
      y += 1
    }
    bw.flush()
    emitMarker(out, 0xd9)
    out.toByteArray
  }
}
