package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Executor-local row spill for the sharded interchange exporters.
  *
  * HDF5 needs the row count (columnar layout is planned up front) and
  * FITS needs string widths / array lengths before the first data byte
  * — both previously buffered the whole partition with `it.toArray`,
  * an executor OOM on a skewed multi-GB partition. Instead: stream the
  * iterator ONCE into a compact typed spill file on executor-local
  * disk (where shuffle spills live too — deliberately java.io, not the
  * target FileSystem), then re-read it for the write pass. Heap cost
  * is one row at a time; disk cost is one partition, deleted in
  * `finally`.
  *
  * Codec: per row, per field — a presence byte, then the value;
  * strings length-prefixed UTF-8 (no 64 KB writeUTF cap), arrays
  * length-prefixed elements. Only the types the HDF5/FITS writers
  * accept are supported; anything else fails fast here, before bytes
  * hit disk.
  */
private[graft] object RowSpill {

  private def codecFor(dt: DataType): (DataOutputStream, Any) => Unit = dt match {
    case BooleanType => (o, v) => o.writeBoolean(v.asInstanceOf[Boolean])
    case ByteType    => (o, v) => o.writeByte(v.asInstanceOf[Byte].toInt)
    case ShortType   => (o, v) => o.writeShort(v.asInstanceOf[Short].toInt)
    case IntegerType => (o, v) => o.writeInt(v.asInstanceOf[Int])
    case LongType    => (o, v) => o.writeLong(v.asInstanceOf[Long])
    case FloatType   => (o, v) => o.writeFloat(v.asInstanceOf[Float])
    case DoubleType  => (o, v) => o.writeDouble(v.asInstanceOf[Double])
    case StringType  => (o, v) => {
      val b = v.asInstanceOf[String].getBytes("UTF-8")
      o.writeInt(b.length); o.write(b)
    }
    case ArrayType(et, _) =>
      val elem = codecFor(et)
      (o, v) => {
        val s = v.asInstanceOf[scala.collection.Seq[Any]]
        o.writeInt(s.length); s.foreach(elem(o, _))
      }
    case t => throw new IllegalArgumentException(s"row spill: unsupported type $t")
  }

  private def decodeFor(dt: DataType): DataInputStream => Any = dt match {
    case BooleanType => _.readBoolean()
    case ByteType    => _.readByte()
    case ShortType   => _.readShort()
    case IntegerType => _.readInt()
    case LongType    => _.readLong()
    case FloatType   => _.readFloat()
    case DoubleType  => _.readDouble()
    case StringType  => in => {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b); new String(b, "UTF-8")
    }
    case ArrayType(et, _) =>
      val elem = decodeFor(et)
      in => {
        val len = in.readInt()
        Seq.tabulate[Any](len)(_ => elem(in))
      }
    case t => throw new IllegalArgumentException(s"row spill: unsupported type $t")
  }

  /** Stream `it` to a fresh spill file; returns (file, rowCount).
    * The caller owns the file and must delete it when done. */
  def spill(schema: StructType, it: Iterator[Row]): (File, Long) = {
    val codecs = schema.fields.map(f => codecFor(f.dataType))
    val f = File.createTempFile("graft-spill-", ".rows")
    f.deleteOnExit()
    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(f), 1 << 16))
    var n = 0L
    try {
      while (it.hasNext) {
        val r = it.next()
        var j = 0
        while (j < codecs.length) {
          if (r.isNullAt(j)) out.writeByte(0)
          else { out.writeByte(1); codecs(j)(out, r.get(j)) }
          j += 1
        }
        n += 1L
      }
    } finally out.close()
    (f, n)
  }

  /** Re-read a spill file as a Row iterator (single pass; re-call for
    * another pass). */
  def iterate(schema: StructType, file: File): Iterator[Row] =
    new Iterator[Row] with AutoCloseable {
      private val decoders = schema.fields.map(f => decodeFor(f.dataType))
      private val in = new DataInputStream(new BufferedInputStream(
        new FileInputStream(file), 1 << 16))
      private var nextRow: Row = advance()
      private def advance(): Row = {
        val first = in.read() // -1 at clean EOF
        if (first < 0) { in.close(); return null }
        val vals = new Array[Any](decoders.length)
        var j = 0
        while (j < decoders.length) {
          val marker = if (j == 0) first else in.readByte().toInt
          vals(j) = if (marker == 0) null else decoders(j)(in)
          j += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
      def hasNext: Boolean = nextRow != null
      def next(): Row = {
        if (nextRow == null) throw new NoSuchElementException
        val r = nextRow
        nextRow =
          try advance()
          catch { case e: EOFException =>
            in.close()
            throw new IllegalStateException(s"truncated spill file $file", e)
          }
        r
      }
      def close(): Unit = in.close()
    }
}
