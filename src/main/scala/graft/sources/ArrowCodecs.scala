package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.{ArrowBuf, BufferAllocator}
import org.apache.arrow.vector.compression.{AbstractCompressionCodec, CompressionCodec, CompressionUtil}

/** Arrow IPC buffer codecs.
  *
  * The stock `CommonsCompressionFactory` implements LZ4_FRAME through
  * commons-compress's pure-Java LZ4 — measured ~45x slower than the
  * uncompressed write on the sharded export (ArrowShProbe r18:
  * writeSharded lz4 43-47 s vs 0.9-1.0 s uncompressed on 600k rows;
  * q_arrow_sharded was the full battery's slowest lane at 46 s warm).
  * lz4-java (on Spark's classpath — Spark's own shuffle lz4) emits the
  * same standard LZ4 frame format through its JNI/unsafe fast path,
  * so the fix is a drop-in codec, not a format change: files stay
  * readable by pyarrow/commons-compress and the existing pyarrow
  * fixtures stay readable by us (LZ4FrameInputStream reads any
  * independent-block frame, which is what arrow writers emit).
  * ZSTD stays on CommonsCompressionFactory (zstd-jni underneath —
  * already native speed).
  */
object ArrowCodecs {
  private val Prefix = CompressionUtil.SIZE_OF_UNCOMPRESSED_LENGTH

  final class FastLz4Codec extends AbstractCompressionCodec {
    override def getCodecType: CompressionUtil.CodecType =
      CompressionUtil.CodecType.LZ4_FRAME

    override protected def doCompress(allocator: BufferAllocator,
                                      uncompressed: ArrowBuf): ArrowBuf = {
      val n = uncompressed.writerIndex()
      require(n <= Int.MaxValue, s"lz4 frame: buffer too large ($n)")
      val in = new Array[Byte](n.toInt)
      uncompressed.getBytes(0, in)
      val baos = new ByteArrayOutputStream(in.length / 2 + 64)
      val out = new net.jpountz.lz4.LZ4FrameOutputStream(baos)
      out.write(in)
      out.close()
      val bytes = baos.toByteArray
      val buf = allocator.buffer(Prefix + bytes.length)
      buf.setBytes(Prefix, bytes)
      buf.writerIndex(Prefix + bytes.length)
      buf
    }

    override protected def doDecompress(allocator: BufferAllocator,
                                        compressed: ArrowBuf): ArrowBuf = {
      val declared = readUncompressedLength(compressed)
      require(declared >= 0 && declared <= Int.MaxValue,
        s"lz4 frame: bad declared length $declared")
      val n = (compressed.writerIndex() - Prefix).toInt
      val in = new Array[Byte](n)
      compressed.getBytes(Prefix, in)
      val is = new net.jpountz.lz4.LZ4FrameInputStream(new ByteArrayInputStream(in))
      try {
        val outBytes = new Array[Byte](declared.toInt)
        var off = 0
        var read = 0
        while (off < outBytes.length &&
            { read = is.read(outBytes, off, outBytes.length - off); read >= 0 })
          off += read
        require(off == outBytes.length && is.read() == -1,
          s"lz4 frame: decoded $off bytes, declared $declared")
        val buf = allocator.buffer(declared)
        buf.setBytes(0, outBytes)
        buf.writerIndex(declared)
        buf
      } finally is.close()
    }
  }

  /** LZ4_FRAME on lz4-java; every other codec delegated to the stock
    * factory. */
  object Factory extends CompressionCodec.Factory {
    override def createCodec(t: CompressionUtil.CodecType): CompressionCodec =
      if (t == CompressionUtil.CodecType.LZ4_FRAME) new FastLz4Codec
      else CommonsCompressionFactory.INSTANCE.createCodec(t)
    override def createCodec(t: CompressionUtil.CodecType, level: Int): CompressionCodec =
      if (t == CompressionUtil.CodecType.LZ4_FRAME) new FastLz4Codec
      else CommonsCompressionFactory.INSTANCE.createCodec(t, level)
  }
}
