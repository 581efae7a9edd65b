package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free blosc1 chunk codec — the container zarr-python's
  * default compressor (numcodecs Blosc) actually writes. Implemented
  * from the public c-blosc chunk format (README_CHUNK_FORMAT.rst):
  *
  *   16-byte header: version, versionlz, flags, typesize,
  *   nbytes (LE32), blocksize (LE32), cbytes (LE32);
  *   then (unless the memcpy flag is set) one LE32 offset per block,
  *   each block = LE32 compressed-size + payload (payload stored RAW
  *   when it equals the block's uncompressed size), each block
  *   independently byte-SHUFFLED before compression when flag bit 0
  *   is set (byte j of every element grouped, leftover bytes verbatim
  *   — shuffle_generic_inline's layout).
  *
  * Codecs: lz4 (format code 1, via lz4-java on Spark's classpath),
  * zlib (3, JDK Deflater), zstd (4, zstd-jni). Both filter layouts
  * decode: byte-shuffle (flag 0x1) and BITshuffle (flag 0x4 — the
  * bitshuffle library's bshuf_trans_bit_elem, see [[bitShuffle]]).
  * blosclz/snappy reject loudly. Decode trusts the HEADER (not
  * .zarray config) for codec/shuffle — that is what c-blosc itself
  * does, so foreign chunks with per-chunk settings read correctly.
  *
  * Scale: chunks decode one-per-task in the zarr read path; this
  * codec is pure per-chunk CPU work with no allocation beyond the
  * output + one block buffer.
  */
private[graft] object Blosc {

  private val FlagByteShuffle = 0x1
  private val FlagMemCpy = 0x2
  private val FlagBitShuffle = 0x4
  // compressor FORMAT codes (header flags >> 5) per blosc.h
  private val FmtBloscLz = 0
  private val FmtLz4 = 1
  private val FmtSnappy = 2
  private val FmtZlib = 3
  private val FmtZstd = 4

  private def le32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  // ------------------------------------------------------------ read

  /** Decompress one blosc chunk to exactly `expected` bytes. */
  def decompress(chunk: Array[Byte], expected: Int, ctx: String): Array[Byte] = {
    require(chunk.length >= 16, s"$ctx: blosc chunk under 16 header bytes")
    val flags = chunk(2) & 0xff
    val typesize = chunk(3) & 0xff
    val nbytes = le32(chunk, 4)
    val blocksize = le32(chunk, 8)
    val cbytes = le32(chunk, 12)
    require(nbytes == expected,
      s"$ctx: blosc nbytes $nbytes != expected $expected")
    require(cbytes == chunk.length,
      s"$ctx: blosc cbytes $cbytes != chunk length ${chunk.length}")
    require((flags & FlagByteShuffle) == 0 || (flags & FlagBitShuffle) == 0,
      s"$ctx: blosc chunk sets BOTH shuffle flags")
    val out = new Array[Byte](nbytes)
    if ((flags & FlagMemCpy) != 0) {
      require(chunk.length == 16 + nbytes, s"$ctx: bad memcpy blosc chunk")
      System.arraycopy(chunk, 16, out, 0, nbytes)
      return out
    }
    require(blocksize > 0, s"$ctx: blosc blocksize $blocksize")
    val fmt = (flags >>> 5) & 0x7
    val shuffle = (flags & FlagByteShuffle) != 0 && typesize > 1
    val bitshuffle = (flags & FlagBitShuffle) != 0
    require(!bitshuffle || typesize >= 1,
      s"$ctx: BITshuffled chunk with typesize 0") // no bare / by zero
    val nblocks = ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    require(16 + 4L * nblocks <= chunk.length, s"$ctx: truncated blosc offsets")
    var j = 0
    while (j < nblocks) {
      val neblock = math.min(blocksize, nbytes - j * blocksize)
      val boff = le32(chunk, 16 + 4 * j)
      require(boff >= 0 && boff + 4L <= chunk.length,
        s"$ctx: blosc block $j offset $boff out of range")
      val csize = le32(chunk, boff)
      require(csize > 0 && boff + 4L + csize <= chunk.length,
        s"$ctx: blosc block $j size $csize out of range")
      val block =
        if (csize == neblock) { // stored raw (incompressible block)
          val b = new Array[Byte](neblock)
          System.arraycopy(chunk, boff + 4, b, 0, neblock)
          b
        } else codecDecompress(fmt, chunk, boff + 4, csize, neblock, ctx)
      if (shuffle) unshuffle(typesize, block, out, j * blocksize)
      else if (bitshuffle) bitUnshuffle(typesize, block, out, j * blocksize)
      else System.arraycopy(block, 0, out, j * blocksize, neblock)
      j += 1
    }
    out
  }

  private def codecDecompress(fmt: Int, src: Array[Byte], off: Int,
      len: Int, outLen: Int, ctx: String): Array[Byte] = fmt match {
    case FmtLz4 =>
      val out = new Array[Byte](outLen)
      val dec = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
        .fastDecompressor()
      val read = dec.decompress(src, off, out, 0, outLen)
      require(read == len,
        s"$ctx: lz4 block consumed $read of $len compressed bytes")
      out
    case FmtZlib =>
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(src, off, len)
        val out = new Array[Byte](outLen)
        var done = 0
        while (done < outLen && !inf.finished()) {
          val k = inf.inflate(out, done, outLen - done)
          if (k == 0) { // round-4 lesson: never spin on k==0
            require(!inf.needsDictionary,
              s"$ctx: preset-dictionary zlib block unsupported")
            throw new IllegalArgumentException(s"$ctx: truncated zlib block")
          }
          done += k
        }
        require(done == outLen, s"$ctx: zlib block inflated $done of $outLen")
        out
      } finally inf.end()
    case FmtZstd =>
      val out = com.github.luben.zstd.Zstd.decompress(
        java.util.Arrays.copyOfRange(src, off, off + len), outLen)
      require(out.length == outLen,
        s"$ctx: zstd block inflated ${out.length} of $outLen")
      out
    case FmtBloscLz => throw new IllegalArgumentException(
      s"$ctx: blosclz-compressed chunk is unsupported (lz4/zlib/zstd only)")
    case FmtSnappy => throw new IllegalArgumentException(
      s"$ctx: snappy-compressed chunk is unsupported (lz4/zlib/zstd only)")
    case other => throw new IllegalArgumentException(
      s"$ctx: unknown blosc compressor format code $other")
  }

  /** shuffle_generic_inline's inverse: shuffled block has byte j of
    * every element grouped; leftover (len % typesize) bytes verbatim. */
  private def unshuffle(typesize: Int, src: Array[Byte],
      dst: Array[Byte], dstOff: Int): Unit = {
    val len = src.length
    val nelem = len / typesize
    var j = 0
    while (j < typesize) {
      var i = 0
      val base = j * nelem
      while (i < nelem) {
        dst(dstOff + i * typesize + j) = src(base + i)
        i += 1
      }
      j += 1
    }
    val done = nelem * typesize
    System.arraycopy(src, done, dst, dstOff + done, len - done)
  }

  /** BITshuffle forward (the bitshuffle library's scalar reference,
    * bshuf_trans_bit_elem = trans_byte_elem -> trans_bit_byte ->
    * trans_bitrow_eight, as c-blosc's bitshuffle-generic.c embeds it):
    * for n = the block's element count truncated to a multiple of 8,
    * output row (t*8 + jj) of n/8 bytes packs bit jj of byte-plane t
    * of every element — element (q*8 + kk)'s bit lands at bit kk of
    * byte q. Leftover bytes (n..end, incl. partial elements) verbatim,
    * exactly c-blosc's per-block leftover rule. */
  private def bitShuffle(typesize: Int, src: Array[Byte], off: Int,
      len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    val n = (len / typesize) & ~7
    val nrow = n / 8
    var t = 0
    while (t < typesize) {
      var jj = 0
      while (jj < 8) {
        val base = (t * 8 + jj) * nrow
        var q = 0
        while (q < nrow) {
          var b = 0
          var kk = 0
          while (kk < 8) {
            b |= ((src(off + (q * 8 + kk) * typesize + t) >>> jj) & 1) << kk
            kk += 1
          }
          out(base + q) = b.toByte
          q += 1
        }
        jj += 1
      }
      t += 1
    }
    val done = n * typesize
    System.arraycopy(src, off + done, out, done, len - done)
    out
  }

  /** [[bitShuffle]]'s inverse; `dst` is zero-initialized per block
    * region (fresh output array), so set-bits OR in. */
  private def bitUnshuffle(typesize: Int, src: Array[Byte],
      dst: Array[Byte], dstOff: Int): Unit = {
    val len = src.length
    val n = (len / typesize) & ~7
    val nrow = n / 8
    var t = 0
    while (t < typesize) {
      var jj = 0
      while (jj < 8) {
        val base = (t * 8 + jj) * nrow
        val bit = 1 << jj
        var q = 0
        while (q < nrow) {
          val b = src(base + q) & 0xff
          var kk = 0
          while (kk < 8) {
            if (((b >>> kk) & 1) != 0) {
              val at = dstOff + (q * 8 + kk) * typesize + t
              dst(at) = (dst(at) | bit).toByte
            }
            kk += 1
          }
          q += 1
        }
        jj += 1
      }
      t += 1
    }
    val done = n * typesize
    System.arraycopy(src, done, dst, dstOff + done, len - done)
  }

  private def shuffle(typesize: Int, src: Array[Byte], off: Int,
      len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    val nelem = len / typesize
    var j = 0
    while (j < typesize) {
      var i = 0
      val base = j * nelem
      while (i < nelem) {
        out(base + i) = src(off + i * typesize + j)
        i += 1
      }
      j += 1
    }
    val done = nelem * typesize
    System.arraycopy(src, off + done, out, done, len - done)
    out
  }

  // ----------------------------------------------------------- write

  /** Compress `n` bytes of `raw` as one blosc chunk. `cname`:
    * lz4 | zlib | zstd. Byte-shuffles per block when `shuf` and
    * typesize > 1; BIT-shuffles instead when `bit` (c-blosc's
    * BITshuffle flag — the common science-data layout). Falls back to
    * a memcpy chunk when compression does not pay. */
  def compress(raw: Array[Byte], n: Int, typesize: Int, cname: String,
      shuf: Boolean = true, bit: Boolean = false): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"blosc typesize $typesize")
    val fmt = cname match {
      case "lz4" => FmtLz4
      case "zlib" => FmtZlib
      case "zstd" => FmtZstd
      case other => throw new IllegalArgumentException(
        s"blosc writer: unsupported cname '$other' (lz4/zlib/zstd)")
    }
    // block size: bounded, multiple of typesize (8*typesize for
    // bitshuffle so only the final block carries leftovers), like
    // c-blosc's compute_blocksize
    val unit = if (bit) 8 * typesize else typesize
    val blocksize0 = math.min(n max unit, 256 * 1024)
    val blocksize = math.max(unit, blocksize0 - blocksize0 % unit)
    val doShuffle = !bit && shuf && typesize > 1
    val nblocks = (n + blocksize - 1) / blocksize
    val blocks = new Array[Array[Byte]](math.max(nblocks, 0))
    var j = 0
    while (j < nblocks) {
      val neblock = math.min(blocksize, n - j * blocksize)
      val plain =
        if (bit) bitShuffle(typesize, raw, j * blocksize, neblock)
        else if (doShuffle) shuffle(typesize, raw, j * blocksize, neblock)
        else java.util.Arrays.copyOfRange(raw, j * blocksize,
          j * blocksize + neblock)
      val packed = codecCompress(fmt, plain)
      blocks(j) = if (packed.length >= neblock) plain else packed
      j += 1
    }
    val bodyLen = blocks.map(b => 4L + b.length).sum
    val total = 16L + 4L * nblocks + bodyLen
    val header = new Array[Byte](16)
    header(0) = 2 // blosc1 format version
    header(1) = 1
    header(3) = typesize.toByte
    if (total >= 16L + n) {
      // incompressible chunk: memcpy form (raw, unshuffled)
      val out = new Array[Byte](16 + n)
      System.arraycopy(header, 0, out, 0, 16)
      out(2) = FlagMemCpy.toByte
      putLe32(out, 4, n)
      putLe32(out, 8, blocksize)
      putLe32(out, 12, 16 + n)
      System.arraycopy(raw, 0, out, 16, n)
      return out
    }
    val out = new Array[Byte](total.toInt)
    System.arraycopy(header, 0, out, 0, 16)
    out(2) = ((fmt << 5) | (if (bit) FlagBitShuffle
      else if (doShuffle) FlagByteShuffle else 0)).toByte
    putLe32(out, 4, n)
    putLe32(out, 8, blocksize)
    putLe32(out, 12, total.toInt)
    var pos = 16 + 4 * nblocks
    j = 0
    while (j < nblocks) {
      putLe32(out, 16 + 4 * j, pos)
      val neblock = math.min(blocksize, n - j * blocksize)
      val raw2 = blocks(j)
      putLe32(out, pos, if (raw2.length >= neblock) neblock else raw2.length)
      System.arraycopy(raw2, 0, out, pos + 4, raw2.length)
      pos += 4 + raw2.length
      j += 1
    }
    out
  }

  private def codecCompress(fmt: Int, plain: Array[Byte]): Array[Byte] =
    fmt match {
      case FmtLz4 =>
        val c = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
          .fastCompressor()
        val max = c.maxCompressedLength(plain.length)
        val buf = new Array[Byte](max)
        val len = c.compress(plain, 0, plain.length, buf, 0, max)
        java.util.Arrays.copyOf(buf, len)
      case FmtZlib =>
        val d = new java.util.zip.Deflater(5)
        try {
          d.setInput(plain); d.finish()
          val out = new java.io.ByteArrayOutputStream(plain.length / 4 + 64)
          val tmp = new Array[Byte](8192)
          while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
          out.toByteArray
        } finally d.end()
      case FmtZstd =>
        com.github.luben.zstd.Zstd.compress(plain, 3)
      case other => throw new IllegalStateException(s"codec $other")
    }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }
}
