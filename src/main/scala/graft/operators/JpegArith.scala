package graft.operators

import java.io.ByteArrayOutputStream

/** Arithmetic-coded sequential JPEG (ITU-T T.81 Annexes D, E, F):
  * the QM binary arithmetic coder with the Table D.3 probability
  * state machine, and the Annex F.1.4/F.2 DC/AC conditioning models,
  * decode AND encode. Completes the JPEG matrix next to
  * [[JpegCodec]]'s Huffman baseline/progressive paths — arithmetic
  * files (SOF9) come from old medical/scanner encoders and from
  * `cjpeg -arithmetic`; the reference reads them via PIL/libjpeg
  * (packages/vaex-core/vaex/image.py).
  *
  * Structure of the coder follows the T.81 flowcharts (DECODE /
  * MPS_EXCHANGE / LPS_EXCHANGE / RENORMD; CODELPS / CODEMPS /
  * BYTEOUT / FLUSH) in the byte-aligned software realization that
  * libjpeg standardized; the probability table is the standard's
  * Table D.3 (113 adaptive states + the non-adapting ~0.5 state the
  * AC sign decision uses). Statistics bins and context layout are
  * Annex F Tables F.4/F.5: per DC table 64 bins (diff-classification
  * tree 0..19, magnitude-category tree X1.. at 20, magnitude bits at
  * +14), per AC table 256 bins (3 per coefficient index k for
  * EOB/nonzero, low/high magnitude trees at 189/217 split by the Kx
  * conditioning bound). Restart markers reinitialize both the coder
  * registers and every statistics bin.
  *
  * DECODE handles sequential SOF9, interleaved or single-component
  * scans, any sampling, DNL-free; progressive-arithmetic (SOF10) and
  * hierarchical stay metadata-only. Correctness is pinned by
  * libjpeg-generated fixtures (src/test/resources/jpeg): quantized
  * coefficient planes must match `jpeg_read_coefficients` output
  * bit-for-bit. ENCODE emits single-component sequential SOF9 files
  * (gray) that libjpeg decodes back to the same coefficients.
  */
object JpegArith {

  /** Table D.3, packed (qe << 16) | (nmps << 8) | (sw << 7) | nlps;
    * index 113 is the fixed equiprobable state (self-transitioning,
    * no MPS switch) used for AC sign decisions. */
  private val QeTab: Array[Int] = Array(
    0x5a1d0181, 0x2586020e, 0x11140310, 0x080b0412, 0x03d80514, 0x01da0617,
    0x00e50719, 0x006f081c, 0x0036091e, 0x001a0a21, 0x000d0b23, 0x00060c09,
    0x00030d0a, 0x00010d0c, 0x5a7f0f8f, 0x3f251024, 0x2cf21126, 0x207c1227,
    0x17b91328, 0x1182142a, 0x0cef152b, 0x09a1162d, 0x072f172e, 0x055c1830,
    0x04061931, 0x03031a33, 0x02401b34, 0x01b11c36, 0x01441d38, 0x00f51e39,
    0x00b71f3b, 0x008a203c, 0x0068213e, 0x004e223f, 0x003b2320, 0x002c0921,
    0x5ae125a5, 0x484c2640, 0x3a0d2741, 0x2ef12843, 0x261f2944, 0x1f332a45,
    0x19a82b46, 0x15182c48, 0x11772d49, 0x0e742e4a, 0x0bfb2f4b, 0x09f8304d,
    0x0861314e, 0x0706324f, 0x05cd3330, 0x04de3432, 0x040f3532, 0x03633633,
    0x02d43734, 0x025c3835, 0x01f83936, 0x01a43a37, 0x01603b38, 0x01253c39,
    0x00f63d3a, 0x00cb3e3b, 0x00ab3f3d, 0x008f203d, 0x5b1241c1, 0x4d044250,
    0x412c4351, 0x37d84452, 0x2fe84553, 0x293c4654, 0x23794756, 0x1edf4857,
    0x1aa94957, 0x174e4a48, 0x14244b48, 0x119c4c4a, 0x0f6b4d4a, 0x0d514e4b,
    0x0bb64f4d, 0x0a40304d, 0x583251d0, 0x4d1c5258, 0x438e5359, 0x3bdd545a,
    0x34ee555b, 0x2eae565c, 0x299a575d, 0x25164756, 0x557059d8, 0x4ca95a5f,
    0x44d95b60, 0x3e225c61, 0x38245d63, 0x32b45e63, 0x2e17565d, 0x56a860df,
    0x4f466165, 0x47e56266, 0x41cf6367, 0x3c3d6468, 0x375e5d63, 0x52316669,
    0x4c0f676a, 0x4639686b, 0x415e6367, 0x56276ae9, 0x50e76b6c, 0x4b85676d,
    0x55976d6e, 0x504f6b6f, 0x5a106fee, 0x55226d70, 0x59eb6ff0, 0x5a1d7171)

  @inline private def qeOf(i: Int): Int = QeTab(i) >>> 16
  @inline private def nmpsOf(i: Int): Int = (QeTab(i) >>> 8) & 0x7f
  @inline private def nlpsOf(i: Int): Int = QeTab(i) & 0x7f
  @inline private def swOf(i: Int): Int = (QeTab(i) >>> 7) & 1

  // ------------------------------------------------------------ decoder core

  /** QM decoder over one entropy-coded segment. Bytes feed with the
    * JPEG FF-stuffing convention (FF 00 = data byte FF, FF FF... fill
    * collapses); at a real marker the register pads with zero bytes —
    * legal in arithmetic coding, the scan just ends (T.81 D.2.6). */
  private final class ArithDecoder(b: Array[Byte]) {
    var pos = 0
    private var c: Long = 0L
    private var a: Long = 0L
    private var ct: Int = -16
    var markerSeen = false
    var markerAt: Int = -1 // position of the 0xFF that starts the marker

    def reinit(p: Int): Unit = {
      pos = p; c = 0L; a = 0L; ct = -16; markerSeen = false; markerAt = -1
    }

    private def nextByte(): Int = {
      if (markerSeen) return 0
      if (pos >= b.length) { markerSeen = true; markerAt = b.length; return 0 }
      val d = b(pos) & 0xff
      if (d != 0xff) { pos += 1; d }
      else {
        val ff = pos
        var p = pos + 1
        while (p < b.length && (b(p) & 0xff) == 0xff) p += 1
        if (p < b.length && b(p) == 0) { pos = p + 1; 0xff }
        else { markerSeen = true; markerAt = math.max(p - 1, ff); 0 }
      }
    }

    /** One binary decision against the adaptive state `stats(si)`
      * (bit 7 = current MPS, bits 0-6 = Table D.3 index). */
    def decode(stats: Array[Byte], si: Int): Int = {
      // renormalize + byte feeding (D.2.6); the ct<0 bootstrap pulls
      // the two initial bytes before the first decision
      while (a < 0x8000L) {
        ct -= 1
        if (ct < 0) {
          c = ((c << 8) | nextByte()) & 0xffffffffL
          ct += 8
          if (ct < 0) { ct += 1; if (ct == 0) a = 0x8000L }
        }
        a <<= 1
      }
      var sv = stats(si) & 0xff
      val idx = sv & 0x7f
      val qe = qeOf(idx)
      a -= qe
      val aligned = a << ct
      if (c >= aligned) {
        // decision lies in the upper subinterval: LPS, unless the
        // conditional exchange (D.2.3) flips it because qe > a
        c -= aligned
        if (a < qe) { // MPS after exchange
          a = qe
          stats(si) = ((sv & 0x80) ^ nmpsOf(idx)).toByte
        } else {
          a = qe
          stats(si) = (((sv & 0x80) ^ (nlpsOf(idx) | (swOf(idx) << 7)))).toByte
          sv ^= 0x80
        }
      } else if (a < 0x8000L) {
        // renormalization due: MPS, unless exchange flips it
        if (a < qe) {
          stats(si) = (((sv & 0x80) ^ (nlpsOf(idx) | (swOf(idx) << 7)))).toByte
          sv ^= 0x80
        } else {
          stats(si) = ((sv & 0x80) ^ nmpsOf(idx)).toByte
        }
      }
      sv >>> 7
    }
  }

  // ------------------------------------------------------------ encoder core

  /** QM encoder (T.81 D.1): carry-propagating byte emitter with
    * stacked-FF accounting and FF->FF00 stuffing on output. */
  private final class ArithEncoder(out: ByteArrayOutputStream) {
    private var c: Long = 0L
    private var a: Long = 0x10000L
    private var ct: Int = 11
    private var buffer: Int = -1 // pending byte; -1 = none yet
    private var sc: Long = 0L    // stacked 0xFF bytes (may carry)
    private var zc: Long = 0L    // deferred zero bytes (dropped if trailing)

    private def emitByte(v: Int): Unit = out.write(v & 0xff)
    private def flushZeros(): Unit = { while (zc > 0) { emitByte(0); zc -= 1 } }

    def encode(stats: Array[Byte], si: Int, bit: Int): Unit = {
      val sv = stats(si) & 0xff
      val idx = sv & 0x7f
      val qe = qeOf(idx)
      a -= qe
      if (bit != (sv >>> 7)) {
        // LPS (with conditional exchange when qe became the bigger part)
        if (a >= qe) { c += a; a = qe }
        stats(si) = (((sv & 0x80) ^ (nlpsOf(idx) | (swOf(idx) << 7)))).toByte
      } else {
        // probability adaptation happens ONLY on renormalization —
        // an MPS that leaves a >= 0x8000 changes no state at all
        if (a >= 0x8000L) return
        if (a < qe) { c += a; a = qe }
        stats(si) = ((sv & 0x80) ^ nmpsOf(idx)).toByte
      }
      // renormalize + byte output (D.1.6)
      while ({
        a <<= 1; c <<= 1
        ct -= 1
        if (ct == 0) {
          val temp = c >>> 19
          if (temp > 0xffL) {
            // carry ripples into the pending byte; stacked FFs become 00s
            if (buffer >= 0) {
              flushZeros()
              emitByte(buffer + 1)
              if (buffer + 1 == 0xff) emitByte(0x00)
            }
            zc += sc; sc = 0
            buffer = (temp & 0xff).toInt
          } else if (temp == 0xffL) {
            sc += 1 // may still be hit by a carry — stack it
          } else {
            // carry can no longer reach the stacked FFs: flush them
            if (buffer == 0) zc += 1
            else if (buffer >= 0) { flushZeros(); emitByte(buffer) }
            if (sc > 0) {
              flushZeros()
              while (sc > 0) { emitByte(0xff); emitByte(0x00); sc -= 1 }
            }
            buffer = temp.toInt
          }
          c &= 0x7ffffL
          ct = 8
        }
        a < 0x8000L
      }) ()
    }

    /** D.1.8 termination: pick the in-interval code point with the
      * most trailing zeros, flush pending bytes, drop trailing zeros. */
    def finish(): Unit = {
      val t = (a - 1 + c) & 0xffff0000L
      c = if (t < c) t + 0x8000L else t
      c <<= ct
      if ((c & 0xf8000000L) != 0) {
        if (buffer >= 0) {
          flushZeros()
          emitByte(buffer + 1)
          if (buffer + 1 == 0xff) emitByte(0x00)
        }
        zc += sc; sc = 0
      } else {
        if (buffer == 0) zc += 1
        else if (buffer >= 0) { flushZeros(); emitByte(buffer) }
        if (sc > 0) {
          flushZeros()
          while (sc > 0) { emitByte(0xff); emitByte(0x00); sc -= 1 }
        }
      }
      if ((c & 0x7fff800L) != 0) {
        flushZeros()
        val b1 = ((c >>> 19) & 0xff).toInt
        emitByte(b1); if (b1 == 0xff) emitByte(0x00)
        if ((c & 0x7f800L) != 0) {
          val b2 = ((c >>> 11) & 0xff).toInt
          emitByte(b2); if (b2 == 0xff) emitByte(0x00)
        }
      }
    }
  }

  // ------------------------------------------------------- statistical model

  /** Decode one block's coefficients (QUANTIZED, natural order) per
    * Annex F.2.2: DC diff tree conditioned on the previous diff's
    * classification, then the AC EOB/run/magnitude tree per k.
    * Returns false on a corrupt stream (magnitude/spectral overflow). */
  private def decodeBlock(dec: ArithDecoder, dcSt: Array[Byte], acSt: Array[Byte],
                          fixedBin: Array[Byte], lastDc: Array[Int],
                          dcCtx: Array[Int], ci: Int, dcL: Int, dcU: Int,
                          acKx: Int, coefs: Array[Int]): Boolean = {
    java.util.Arrays.fill(coefs, 0)
    // ---- DC (F.2.2.1)
    val ctx = dcCtx(ci)
    if (dec.decode(dcSt, ctx) != 0) {
      val sign = dec.decode(dcSt, ctx + 1)
      var st = ctx + 2 + sign
      var m = dec.decode(dcSt, st)
      if (m != 0) {
        st = 20 // X1 (Table F.4)
        m = 1
        while (dec.decode(dcSt, st) != 0) {
          m <<= 1
          if (m == 0x8000) return false
          st += 1
        }
      }
      // conditioning category of THIS diff for the next block (F.1.4.4.1.2)
      dcCtx(ci) =
        if (m < ((1 << dcL) >> 1)) 0
        else if (m > ((1 << dcU) >> 1)) 12 + sign * 4
        else 4 + sign * 4
      var v = m
      st += 14
      var mm = m
      while ({ mm >>= 1; mm != 0 }) if (dec.decode(dcSt, st) != 0) v |= mm
      v += 1
      if (sign != 0) v = -v
      lastDc(ci) += v
    } else dcCtx(ci) = 0
    coefs(0) = lastDc(ci)
    // ---- AC (F.2.2.2)
    var k = 1
    var done = false
    while (!done && k <= 63) {
      var st = 3 * (k - 1)
      if (dec.decode(acSt, st) != 0) done = true // EOB
      else {
        while (dec.decode(acSt, st + 1) == 0) {
          st += 3; k += 1
          if (k > 63) return false
        }
        val sign = dec.decode(fixedBin, 0)
        st += 2
        var m = dec.decode(acSt, st)
        if (m != 0 && dec.decode(acSt, st) != 0) {
          m = 2
          st = if (k <= acKx) 189 else 217
          while (dec.decode(acSt, st) != 0) {
            m <<= 1
            if (m == 0x8000) return false
            st += 1
          }
        }
        var v = m
        st += 14
        var mm = m
        while ({ mm >>= 1; mm != 0 }) if (dec.decode(acSt, st) != 0) v |= mm
        v += 1
        if (sign != 0) v = -v
        coefs(JpegCodec.naturalOf(k)) = v
        k += 1
      }
    }
    true
  }

  // ---- progressive scan kinds (F.2.4 via the same QM core). Each
  // progressive scan is independently coded: fresh statistics, fresh
  // DC predictors, its own arithmetic-decoder initialization.

  /** DC first scan (Ss=0, Ah=0): the sequential DC model operating in
    * the Al-shifted domain; block(0) = accumulated predictor << Al. */
  private def decodeDcFirstBlock(dec: ArithDecoder, dcSt: Array[Byte],
                                 lastDc: Array[Int], dcCtx: Array[Int], ci: Int,
                                 dcL: Int, dcU: Int, al: Int,
                                 coefs: Array[Int]): Boolean = {
    val ctx = dcCtx(ci)
    if (dec.decode(dcSt, ctx) != 0) {
      val sign = dec.decode(dcSt, ctx + 1)
      var st = ctx + 2 + sign
      var m = dec.decode(dcSt, st)
      if (m != 0) {
        st = 20
        m = 1
        while (dec.decode(dcSt, st) != 0) {
          m <<= 1
          if (m == 0x8000) return false
          st += 1
        }
      }
      dcCtx(ci) =
        if (m < ((1 << dcL) >> 1)) 0
        else if (m > ((1 << dcU) >> 1)) 12 + sign * 4
        else 4 + sign * 4
      var v = m
      st += 14
      var mm = m
      while ({ mm >>= 1; mm != 0 }) if (dec.decode(dcSt, st) != 0) v |= mm
      v += 1
      if (sign != 0) v = -v
      lastDc(ci) += v
    } else dcCtx(ci) = 0
    coefs(0) = lastDc(ci) << al
    true
  }

  /** DC refinement scan (Ss=0, Ah>0): one fixed-probability bit per
    * block adds the next lower bit of the DC coefficient. */
  private def decodeDcRefineBlock(dec: ArithDecoder, fixedBin: Array[Byte],
                                  al: Int, coefs: Array[Int]): Unit =
    if (dec.decode(fixedBin, 0) != 0) coefs(0) |= (1 << al)

  /** AC first scan (Ss>0, Ah=0): the sequential AC model restricted to
    * the [Ss, Se] band, values entering at << Al. */
  private def decodeAcFirstBlock(dec: ArithDecoder, acSt: Array[Byte],
                                 fixedBin: Array[Byte], acKx: Int,
                                 ss: Int, se: Int, al: Int,
                                 coefs: Array[Int]): Boolean = {
    var k = ss
    var done = false
    while (!done && k <= se) {
      var st = 3 * (k - 1)
      if (dec.decode(acSt, st) != 0) done = true // EOB
      else {
        while (dec.decode(acSt, st + 1) == 0) {
          st += 3; k += 1
          if (k > se) return false
        }
        val sign = dec.decode(fixedBin, 0)
        st += 2
        var m = dec.decode(acSt, st)
        if (m != 0 && dec.decode(acSt, st) != 0) {
          m = 2
          st = if (k <= acKx) 189 else 217
          while (dec.decode(acSt, st) != 0) {
            m <<= 1
            if (m == 0x8000) return false
            st += 1
          }
        }
        var v = m
        st += 14
        var mm = m
        while ({ mm >>= 1; mm != 0 }) if (dec.decode(acSt, st) != 0) v |= mm
        v += 1
        if (sign != 0) v = -v
        coefs(JpegCodec.naturalOf(k)) = v << al
        k += 1
      }
    }
    true
  }

  /** AC refinement scan (Ss>0, Ah>0): correction bits for known
    * coefficients, newly-significant insertions past the previous
    * stage's end-of-block, EOB decisions only beyond it. */
  private def decodeAcRefineBlock(dec: ArithDecoder, acSt: Array[Byte],
                                  fixedBin: Array[Byte],
                                  ss: Int, se: Int, al: Int,
                                  coefs: Array[Int]): Boolean = {
    val p1 = 1 << al
    val m1 = -(1 << al)
    var kex = se
    while (kex > 0 && coefs(JpegCodec.naturalOf(kex)) == 0) kex -= 1
    var k = ss
    var done = false
    while (!done && k <= se) {
      var st = 3 * (k - 1)
      if (k > kex && dec.decode(acSt, st) != 0) done = true // EOB
      else {
        var inBlock = true
        while (inBlock) {
          val ni = JpegCodec.naturalOf(k)
          if (coefs(ni) != 0) {
            if (dec.decode(acSt, st + 2) != 0) {
              if (coefs(ni) < 0) coefs(ni) += m1 else coefs(ni) += p1
            }
            inBlock = false
          } else if (dec.decode(acSt, st + 1) != 0) {
            coefs(ni) = if (dec.decode(fixedBin, 0) != 0) m1 else p1
            inBlock = false
          } else {
            st += 3; k += 1
            if (k > se) return false
          }
        }
        k += 1
      }
    }
    true
  }

  /** Encode one block (QUANTIZED coefficients, natural order) —
    * the exact mirror of [[decodeBlock]]. */
  private def encodeBlock(enc: ArithEncoder, dcSt: Array[Byte], acSt: Array[Byte],
                          fixedBin: Array[Byte], lastDc: Array[Int],
                          dcCtx: Array[Int], ci: Int, dcL: Int, dcU: Int,
                          acKx: Int, coefs: Array[Int]): Unit = {
    // ---- DC
    val ctx = dcCtx(ci)
    val diff = coefs(0) - lastDc(ci)
    if (diff == 0) { enc.encode(dcSt, ctx, 0); dcCtx(ci) = 0 }
    else {
      lastDc(ci) = coefs(0)
      enc.encode(dcSt, ctx, 1)
      var v = diff
      var sign = 0
      if (v > 0) enc.encode(dcSt, ctx + 1, 0)
      else { v = -v; sign = 1; enc.encode(dcSt, ctx + 1, 1) }
      var st = ctx + 2 + sign
      var m = 0
      v -= 1
      if (v != 0) {
        enc.encode(dcSt, st, 1)
        m = 1
        var v2 = v
        st = 20
        while ({ v2 >>= 1; v2 != 0 }) { enc.encode(dcSt, st, 1); m <<= 1; st += 1 }
      }
      enc.encode(dcSt, st, 0)
      dcCtx(ci) =
        if (m < ((1 << dcL) >> 1)) 0
        else if (m > ((1 << dcU) >> 1)) 12 + sign * 4
        else 4 + sign * 4
      st += 14
      var mm = m
      while ({ mm >>= 1; mm != 0 }) enc.encode(dcSt, st, if ((mm & v) != 0) 1 else 0)
    }
    // ---- AC
    var ke = 63
    while (ke > 0 && coefs(JpegCodec.naturalOf(ke)) == 0) ke -= 1
    var k = 1
    while (k <= ke) {
      var st = 3 * (k - 1)
      enc.encode(acSt, st, 0) // not EOB yet
      var v = coefs(JpegCodec.naturalOf(k))
      while (v == 0) {
        enc.encode(acSt, st + 1, 0); st += 3; k += 1
        v = coefs(JpegCodec.naturalOf(k))
      }
      enc.encode(acSt, st + 1, 1)
      var sign = 0
      if (v > 0) enc.encode(fixedBin, 0, 0)
      else { v = -v; sign = 1; enc.encode(fixedBin, 0, 1) }
      st += 2
      var m = 0
      v -= 1
      if (v != 0) {
        enc.encode(acSt, st, 1)
        m = 1
        var v2 = v
        if ({ v2 >>= 1; v2 != 0 }) {
          enc.encode(acSt, st, 1)
          m <<= 1
          st = if (k <= acKx) 189 else 217
          while ({ v2 >>= 1; v2 != 0 }) { enc.encode(acSt, st, 1); m <<= 1; st += 1 }
        }
      }
      enc.encode(acSt, st, 0)
      st += 14
      var mm = m
      while ({ mm >>= 1; mm != 0 }) enc.encode(acSt, st, if ((mm & v) != 0) 1 else 0)
      k += 1
    }
    if (ke < 63) { // EOB decision
      enc.encode(acSt, 3 * (k - 1), 1)
    }
  }

  // ------------------------------------------------------------ scan decode

  final case class ArithComp(id: Int, h: Int, v: Int, tq: Int,
                             wBlocks: Int, hBlocks: Int,
                             blocks: Array[Array[Int]]) // natural order, quantized
  final case class ArithImage(width: Int, height: Int,
                              quant: Array[Array[Int]], // by tq slot
                              comps: Seq[ArithComp])

  /** Parse + fully decode a sequential (SOF9) or progressive (SOF10)
    * arithmetic JPEG to quantized coefficient planes. None for
    * anything else (baseline/progressive Huffman have their own
    * paths; hierarchical stays metadata-only). */
  def decodeCoefficients(b: Array[Byte]): Option[ArithImage] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    def be16(o: Int) = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    val quant = new Array[Array[Int]](4)
    val dcL = Array.fill(4)(0); val dcU = Array.fill(4)(1) // conditioning defaults
    val acKx = Array.fill(4)(5)
    var w = 0; var h = 0
    var restartInterval = 0
    var sofSeen = false
    var progressive = false
    final case class C(id: Int, hs: Int, vs: Int, tq: Int,
                       var dcTbl: Int = 0, var acTbl: Int = 0)
    var comps: Array[C] = null
    // progressive state: coefficient planes accumulate across scans
    var planes: Array[ArithComp] = null
    var scansDecoded = 0
    var mcusX = 0; var mcusY = 0
    var nextPos = -1 // set by a progressive SOS to jump past its data
    var pos = 2
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      var mOff = pos + 1
      while (mOff < b.length - 1 && (b(mOff) & 0xff) == 0xff) mOff += 1
      val m = b(mOff) & 0xff
      if (m == 0xd9) { // EOI: a finished progressive image returns here
        return if (progressive && planes != null && scansDecoded > 0)
          Some(ArithImage(w, h, quant, planes.toSeq))
        else None
      } else if (m >= 0xd0 && m <= 0xd8) { pos = mOff + 1 }
      else {
        if (mOff + 3 > b.length) return None
        val segLen = be16(mOff + 1)
        if (segLen < 2 || mOff + 1 + segLen > b.length) return None
        val seg = mOff + 3
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
          case 0xcc => // DAC: arithmetic conditioning
            var p = seg
            while (p + 1 < mOff + 1 + segLen) {
              val tc = (b(p) & 0xff) >> 4; val tb = b(p) & 0x0f
              val cs = b(p + 1) & 0xff; p += 2
              if (tc == 0) { dcL(tb) = cs & 0x0f; dcU(tb) = cs >> 4 }
              else acKx(tb) = cs
            }
          case 0xdd => restartInterval = be16(seg)
          case 0xc9 | 0xca => // SOF9 sequential / SOF10 progressive, arithmetic
            sofSeen = true
            progressive = m == 0xca
            h = be16(seg + 1); w = be16(seg + 3)
            val nc = b(seg + 5) & 0xff
            comps = (0 until nc).map { i =>
              val o = seg + 6 + i * 3
              C(b(o) & 0xff, (b(o + 1) & 0xff) >> 4, b(o + 1) & 0x0f, b(o + 2) & 0xff)
            }.toArray
          case 0xc0 | 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // not an arithmetic DCT frame
          case 0xde => return None // DHP: hierarchical pyramid
          case 0xda =>
            if (!sofSeen || comps == null || w <= 0 || h <= 0) return None
            val ns = b(seg) & 0xff
            val scanIdx = new Array[Int](ns)
            for (i <- 0 until ns) {
              val cid = b(seg + 1 + i * 2) & 0xff
              val tt = b(seg + 2 + i * 2) & 0xff
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              comps(ci).dcTbl = tt >> 4; comps(ci).acTbl = tt & 0x0f
              scanIdx(i) = ci
            }
            val hMax = comps.map(_.hs).max; val vMax = comps.map(_.vs).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            if (planes == null) planes = comps.map { c =>
              val wb = mcusX * c.hs; val hb = mcusY * c.vs
              ArithComp(c.id, c.hs, c.vs, c.tq, wb, hb,
                Array.fill(wb * hb)(new Array[Int](64)))
            }
            // per-scan coding state: every scan (sequential's single
            // one included) starts with fresh statistics + predictors
            val dcStats = Array.fill(4)(new Array[Byte](64))
            val acStats = Array.fill(4)(new Array[Byte](256))
            val fixedBin = Array[Byte](113)
            val lastDc = new Array[Int](comps.length)
            val dcCtx = new Array[Int](comps.length)
            val dec = new ArithDecoder(b)
            def resetStats(): Unit = {
              dcStats.foreach(java.util.Arrays.fill(_, 0.toByte))
              acStats.foreach(java.util.Arrays.fill(_, 0.toByte))
              fixedBin(0) = 113
              java.util.Arrays.fill(lastDc, 0)
              java.util.Arrays.fill(dcCtx, 0)
            }
            var nextRst = 0
            /** restart-marker boundary: verify RSTn sequence, reinit
              * coder + statistics. False on a broken marker chain. */
            def restartBoundary(): Boolean = {
              val mp = if (dec.markerSeen) dec.markerAt
                       else nextScanMarker(b, dec.pos)
              if (mp + 1 >= b.length) return false
              if ((b(mp + 1) & 0xff) != 0xd0 + nextRst) return false
              nextRst = (nextRst + 1) & 7
              dec.reinit(mp + 2)
              resetStats()
              true
            }
            dec.reinit(mOff + 1 + segLen)
            resetStats()

            if (!progressive) {
              if (ns != comps.length) return None // non-interleaved seq: punt
              val nMcus = mcusX * mcusY
              var mcu = 0
              while (mcu < nMcus) {
                if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0
                    && !restartBoundary()) return None
                val mx = mcu % mcusX; val my = mcu / mcusX
                var ci = 0
                while (ci < comps.length) {
                  val c = comps(ci); val pl = planes(ci)
                  var by = 0
                  while (by < c.vs) {
                    var bx = 0
                    while (bx < c.hs) {
                      val bi = (my * c.vs + by) * pl.wBlocks + (mx * c.hs + bx)
                      if (!decodeBlock(dec, dcStats(c.dcTbl), acStats(c.acTbl),
                          fixedBin, lastDc, dcCtx, ci, dcL(c.dcTbl), dcU(c.dcTbl),
                          acKx(c.acTbl), pl.blocks(bi))) return None
                      bx += 1
                    }
                    by += 1
                  }
                  ci += 1
                }
                mcu += 1
              }
              return Some(ArithImage(w, h, quant, planes.toSeq))
            }

            // ---- progressive scan (F.2.4): spectral selection +
            // successive approximation over the shared planes
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            val ah = ahal >> 4; val al = ahal & 0x0f
            if (ss > se || se > 63) return None
            if (ss == 0 && ns >= 1) {
              // DC scan, interleaved (MCU grid) or single-component
              if (se != 0) return None // progressive DC scans carry DC only
              val single = ns == 1
              val c0 = comps(scanIdx(0))
              val sw = if (single)
                ((w * c0.hs + hMax - 1) / hMax + 7) / 8 else mcusX
              val sh = if (single)
                ((h * c0.vs + vMax - 1) / vMax + 7) / 8 else mcusY
              val nMcus = sw * sh
              var mcu = 0
              while (mcu < nMcus) {
                if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0
                    && !restartBoundary()) return None
                val mx = mcu % sw; val my = mcu / sw
                var si = 0
                while (si < ns) {
                  val ci = scanIdx(si)
                  val c = comps(ci); val pl = planes(ci)
                  val (nbx, nby) = if (single) (1, 1) else (c.hs, c.vs)
                  var by = 0
                  while (by < nby) {
                    var bx = 0
                    while (bx < nbx) {
                      val bi = if (single) my * pl.wBlocks + mx
                        else (my * c.vs + by) * pl.wBlocks + (mx * c.hs + bx)
                      val blk = pl.blocks(bi)
                      if (ah == 0) {
                        if (!decodeDcFirstBlock(dec, dcStats(c.dcTbl), lastDc,
                            dcCtx, ci, dcL(c.dcTbl), dcU(c.dcTbl), al, blk))
                          return None
                      } else decodeDcRefineBlock(dec, fixedBin, al, blk)
                      bx += 1
                    }
                    by += 1
                  }
                  si += 1
                }
                mcu += 1
              }
            } else {
              // AC scan: always single-component, the component's own
              // block grid (non-interleaved MCU = one block)
              if (ns != 1 || ss == 0) return None
              val ci = scanIdx(0)
              val c = comps(ci); val pl = planes(ci)
              val cw = (w * c.hs + hMax - 1) / hMax
              val ch = (h * c.vs + vMax - 1) / vMax
              val sw = (cw + 7) / 8; val sh = (ch + 7) / 8
              val nMcus = sw * sh
              var mcu = 0
              while (mcu < nMcus) {
                if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0
                    && !restartBoundary()) return None
                val blk = pl.blocks((mcu / sw) * pl.wBlocks + (mcu % sw))
                val ok =
                  if (ah == 0) decodeAcFirstBlock(dec, acStats(c.acTbl), fixedBin,
                    acKx(c.acTbl), ss, se, al, blk)
                  else decodeAcRefineBlock(dec, acStats(c.acTbl), fixedBin,
                    ss, se, al, blk)
                if (!ok) return None
                mcu += 1
              }
            }
            scansDecoded += 1
            nextPos = if (dec.markerSeen) dec.markerAt
                      else nextScanMarker(b, dec.pos)
          case _ => ()
        }
        pos = if (nextPos >= 0) nextPos else mOff + 1 + segLen
        nextPos = -1
      }
    }
    // the EOI marker is the file's last two bytes, below the loop
    // guard's 4-byte window — a progressive image with all scans
    // decoded is complete here
    if (progressive && planes != null && scansDecoded > 0)
      Some(ArithImage(w, h, quant, planes.toSeq))
    else None
  } catch { case _: Exception => None }

  /** Next non-stuffing, non-fill marker position at/after p0 —
    * INCLUDING restart markers (unlike the baseline skipper). */
  private def nextScanMarker(b: Array[Byte], p0: Int): Int = {
    var p = p0
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) == 0xff) {
        val m2 = b(p + 1) & 0xff
        if (m2 == 0x00) p += 2
        else if (m2 == 0xff) p += 1
        else return p
      } else p += 1
    }
    b.length
  }

  /** Arithmetic decode (sequential SOF9 or progressive SOF10) to
    * (width, height, luma mean) — the same contract as
    * [[JpegCodec.decodeBaseline]]. */
  def decodeSequential(b: Array[Byte]): Option[(Int, Int, Double)] =
    decodeCoefficients(b).filter(i => i.quant(i.comps.head.tq) != null).flatMap { img =>
      val c0 = img.comps.head
      val q = img.quant(c0.tq)
      val hMax = img.comps.map(_.h).max; val vMax = img.comps.map(_.v).max
      val lw = (img.width * c0.h + hMax - 1) / hMax
      val lh = (img.height * c0.v + vMax - 1) / vMax
      val deq = new Array[Int](64)
      val tmp = new Array[Double](64)
      val out = new Array[Double](64)
      var sum = 0.0; var cnt = 0L
      var bi = 0
      while (bi < c0.blocks.length) {
        val blk = c0.blocks(bi)
        var i = 0
        while (i < 64) { deq(i) = blk(i) * q(JpegCodec.zigzagOf(i)); i += 1 }
        JpegCodec.idct8x8(deq, tmp, out)
        val bx = bi % c0.wBlocks; val by = bi / c0.wBlocks
        val px0 = bx * 8; val py0 = by * 8
        var py = 0
        while (py < 8) {
          if (py0 + py < lh) {
            var px = 0
            while (px < 8) {
              if (px0 + px < lw) {
                sum += math.max(0.0, math.min(255.0, math.rint(out(py * 8 + px))))
                cnt += 1
              }
              px += 1
            }
          }
          py += 1
        }
        bi += 1
      }
      if (cnt == 0) None else Some((img.width, img.height, sum / cnt))
    }

  // ------------------------------------------------------------ encode

  /** Encode a single-component sequential ARITHMETIC JPEG (SOF9) from
    * quantized natural-order coefficient blocks (row-major grid) and
    * a natural-order quant table. Default conditioning (L=0, U=1,
    * Kx=5), DAC emitted explicitly. */
  private[graft] def encodeArithCoef(width: Int, height: Int,
                                     quantNat: Array[Int],
                                     blocks: Array[Array[Int]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    JpegCodec.writeMarker(out, 0xd8)
    // DQT in zigzag order (B.2.4.1)
    JpegCodec.writeSeg(out, 0xdb,
      Array(0x00) ++ (0 until 64).map(z => quantNat(JpegCodec.naturalOf(z))))
    // SOF9
    JpegCodec.writeSeg(out, 0xc9, Array(
      8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0))
    // DAC: DC table 0 (U=1,L=0), AC table 0 (Kx=5)
    JpegCodec.writeSeg(out, 0xcc, Array(0x00, 0x10, 0x10, 5))
    // SOS
    JpegCodec.writeSeg(out, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dcSt = new Array[Byte](64)
    val acSt = new Array[Byte](256)
    val fixedBin = Array[Byte](113)
    val lastDc = Array(0)
    val dcCtx = Array(0)
    val enc = new ArithEncoder(out)
    blocks.foreach(blk =>
      encodeBlock(enc, dcSt, acSt, fixedBin, lastDc, dcCtx, 0, 0, 1, 5, blk))
    enc.finish()
    JpegCodec.writeMarker(out, 0xd9)
    out.toByteArray
  }

  /** Constant-gray arithmetic JPEG: q=1 quantizes exactly, so
    * decode(encode(g)).brightness == g bit-exactly — the arithmetic
    * twin of [[JpegCodec.encodeGrayJpeg]]. */
  def encodeArithGrayJpeg(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width > 0 && height > 0 && gray >= 0 && gray <= 255, "bad gray args")
    val wb = (width + 7) / 8; val hb = (height + 7) / 8
    val dc = 8 * (gray - 128)
    val blocks = Array.fill(wb * hb) {
      val c = new Array[Int](64); c(0) = dc; c
    }
    encodeArithCoef(width, height, Array.fill(64)(1), blocks)
  }
}
