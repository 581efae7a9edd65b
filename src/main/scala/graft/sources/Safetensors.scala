package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dependency-free safetensors source/sink (the Hugging Face tensor
  * interchange format — github.com/huggingface/safetensors): an
  * 8-byte little-endian header length, a JSON header mapping tensor
  * names to `{dtype, shape, data_offsets}`, then one raw
  * little-endian C-order byte buffer. Embedding dumps and model
  * artifacts in training pipelines increasingly ship in this format.
  *
  * Mapping (the npz convention): every tensor is a COLUMN — rank-1 a
  * scalar column, rank-2 `(n, d)` an array column; tensors must agree
  * on the leading dimension and rows stay aligned. The format has no
  * nulls, so read columns are non-nullable and writes reject null
  * values loudly.
  *
  * Scale design: tensor data is fixed-width and row-major, so reads
  * are DISTRIBUTED positioned range reads (executors read disjoint
  * row spans of every tensor — the npy/FITS contract, Hadoop-FS
  * native via [[FsIO]]); nothing inflates or buffers whole tensors.
  * `toSafetensorsSharded` writes one file per partition (executor
  * spill, no `it.toArray`) for the glob read-back path.
  *
  * Read dtypes: F64 F32 F16 BF16 I64 I32 I16 I8 U8 U16 U32 U64 BOOL
  * (F16/BF16 widen exactly to float; unsigned widen per the repo's
  * parquet convention, U64 -> DECIMAL(20,0)). Write dtypes: F64 F32
  * I64 I32 I16 I8 BOOL.
  */
object Safetensors {

  /** Parsed header entry. `begin`/`end` are offsets into the byte
    * buffer (i.e. relative to 8 + headerLen). */
  final case class TensorMeta(name: String, dtype: String,
                              shape: Seq[Long], begin: Long, end: Long) {
    def nRows: Long = if (shape.isEmpty) 1L else shape.head
    def rowElems: Long = if (shape.size < 2) 1L else shape.drop(1).product
    def rowBytes: Long = rowElems * itemBytes(dtype)
  }

  private val MaxHeader = 100L << 20 // 100 MiB JSON header cap

  private[sources] def itemBytes(dt: String): Long = dt match {
    case "F64" | "I64" | "U64" => 8L
    case "F32" | "I32" | "U32" => 4L
    case "F16" | "BF16" | "I16" | "U16" => 2L
    case "I8" | "U8" | "BOOL" => 1L
    case other => throw new IllegalArgumentException(
      s"safetensors: unsupported dtype $other")
  }

  private def sparkTypeOf(dt: String): DataType = dt match {
    case "F64" => DoubleType
    case "F32" | "F16" | "BF16" => FloatType
    case "I64" => LongType
    case "I32" => IntegerType
    case "I16" => ShortType
    case "I8" => ByteType
    case "U8" => ShortType
    case "U16" => IntegerType
    case "U32" => LongType
    case "U64" => DecimalType(20, 0)
    case "BOOL" => BooleanType
    case other => throw new IllegalArgumentException(
      s"safetensors: unsupported dtype $other")
  }

  /** IEEE 754 half -> float, exact (all halves are representable). */
  private[graft] def f16ToFloat(bits: Int): Float = {
    val sign = (bits >>> 15) & 1
    val exp = (bits >>> 10) & 0x1f
    val frac = bits & 0x3ff
    val f =
      if (exp == 0) {
        if (frac == 0) 0.0f
        else frac.toFloat * math.pow(2, -24).toFloat // subnormal
      } else if (exp == 0x1f) {
        if (frac == 0) Float.PositiveInfinity
        else java.lang.Float.intBitsToFloat(0x7fc00000 | (frac << 13))
      } else {
        java.lang.Float.intBitsToFloat(((exp + 112) << 23) | (frac << 13))
      }
    if (sign == 1 && !(exp == 0x1f && frac != 0)) -f else f
  }

  /** bfloat16 -> float: the upper 16 bits of the float32 pattern. */
  private[graft] def bf16ToFloat(bits: Int): Float =
    java.lang.Float.intBitsToFloat(bits << 16)

  /** float -> IEEE half, round-to-nearest-even (the inverse of
    * [[f16ToFloat]]): overflow saturates to +/-Inf, subnormal halves
    * produced below 2^-14, NaN keeps a quiet payload. */
  private[graft] def floatToF16(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val absBits = bits & 0x7fffffff
    if (absBits >= 0x7f800000) { // Inf / NaN
      val frac = if (absBits > 0x7f800000) 0x200 | ((absBits >> 13) & 0x3ff)
                 else 0
      return (sign | 0x7c00 | frac).toShort
    }
    // scale the unbiased exponent into half's range
    val e = (absBits >>> 23) - 127 + 15 // biased half exponent
    if (e >= 0x1f) return (sign | 0x7c00).toShort // overflow -> Inf
    if (e <= 0) { // subnormal half (or zero)
      if (e < -10) return sign.toShort // underflow -> signed zero
      // implicit leading 1 becomes explicit, shift into 10-bit frac
      val m = (absBits & 0x7fffff) | 0x800000
      val shift = 14 - e // 14..24
      val frac = m >>> shift
      val rem = m & ((1 << shift) - 1)
      val half = 1 << (shift - 1)
      val rounded =
        if (rem > half || (rem == half && (frac & 1) == 1)) frac + 1 else frac
      return (sign | rounded).toShort
    }
    val frac = (absBits >>> 13) & 0x3ff
    val rem = absBits & 0x1fff
    val rounded =
      if (rem > 0x1000 || (rem == 0x1000 && (frac & 1) == 1)) 1 else 0
    // frac overflow carries into the exponent correctly (monotone bits)
    (sign | ((e << 10) + frac + rounded)).toShort
  }

  /** float -> bfloat16, round-to-nearest-even on the dropped 16 bits
    * (NaN forced quiet so truncation cannot make an Inf). */
  private[graft] def floatToBf16(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    if ((bits & 0x7fffffff) > 0x7f800000) // NaN: keep quiet, drop low bits
      return (((bits >>> 16) & 0xffff) | 0x0040).toShort
    val lsb = (bits >>> 16) & 1
    ((bits + 0x7fff + lsb) >>> 16).toShort
  }

  // ------------------------------------------------------------ header

  /** Parse and validate the header. Returns (metas in header order,
    * data section start offset, file length). */
  private[sources] def readHeader(path: String): (Seq[TensorMeta], Long, Long) = {
    val in = new FsIO.In(path)
    try {
      require(in.length >= 8, s"$path: not a safetensors file (too short)")
      val lenB = new Array[Byte](8)
      in.seek(0L); in.readFully(lenB)
      val hlen = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getLong
      require(hlen > 0 && hlen <= MaxHeader && 8 + hlen <= in.length,
        s"$path: implausible safetensors header length $hlen")
      val hb = new Array[Byte](hlen.toInt)
      in.readFully(hb)
      val dataStart = 8 + hlen
      val bufLen = in.length - dataStart
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(new String(hb, java.nio.charset.StandardCharsets.UTF_8))
      require(root != null && root.isObject, s"$path: safetensors header is not a JSON object")
      val metas = scala.collection.mutable.ArrayBuffer[TensorMeta]()
      val it = root.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        val name = e.getKey
        if (name != "__metadata__") {
          val o = e.getValue
          require(o.isObject && o.has("dtype") && o.has("shape") && o.has("data_offsets"),
            s"$path: malformed tensor entry $name")
          val dtype = o.get("dtype").asText()
          val shape = {
            val sh = o.get("shape")
            require(sh.isArray, s"$path: $name shape must be an array")
            (0 until sh.size).map(i => sh.get(i).asLong())
          }
          require(shape.forall(_ >= 0), s"$path: $name has a negative dimension")
          val off = o.get("data_offsets")
          require(off.isArray && off.size == 2, s"$path: $name data_offsets must be [begin, end]")
          val (b, en) = (off.get(0).asLong(), off.get(1).asLong())
          require(b >= 0 && en >= b && en <= bufLen,
            s"$path: $name data_offsets [$b, $en) outside the byte buffer (len $bufLen)")
          val expect = shape.product * itemBytes(dtype)
          require(en - b == expect,
            s"$path: $name declares ${en - b} bytes, shape x dtype needs $expect")
          metas += TensorMeta(name, dtype, shape, b, en)
        }
      }
      require(metas.nonEmpty, s"$path: no tensors in safetensors header")
      // non-overlapping data regions (ascending by begin)
      metas.sortBy(_.begin).sliding(2).foreach {
        case scala.collection.mutable.ArrayBuffer(a, b) =>
          require(a.end <= b.begin,
            s"$path: tensors ${a.name} and ${b.name} overlap in the byte buffer")
        case _ => ()
      }
      (metas.toSeq, dataStart, in.length)
    } finally in.close()
  }

  // ------------------------------------------------------------ read

  private def decodeAt(buf: Array[Byte], le: ByteBuffer, off: Int, dt: String): Any =
    dt match {
      case "F64" => le.getDouble(off)
      case "F32" => le.getFloat(off)
      case "F16" => f16ToFloat(le.getShort(off) & 0xffff)
      case "BF16" => bf16ToFloat(le.getShort(off) & 0xffff)
      case "I64" => le.getLong(off)
      case "I32" => le.getInt(off)
      case "I16" => le.getShort(off)
      case "I8" => buf(off)
      case "U8" => (buf(off) & 0xff).toShort
      case "U16" => le.getShort(off) & 0xffff
      case "U32" => le.getInt(off) & 0xffffffffL
      case "U64" =>
        val l = le.getLong(off)
        if (l >= 0) new java.math.BigDecimal(l)
        else new java.math.BigDecimal(
          java.math.BigInteger.valueOf(l).add(java.math.BigInteger.ONE.shiftLeft(64)))
      case "BOOL" => buf(off) != 0
    }

  /** Distributed read: each tensor is a column; executors read
    * disjoint row spans of every selected tensor with positioned
    * reads. Tensors above rank 2 are rejected (no Spark analog). */
  def fromSafetensors(spark: SparkSession, path: String,
                      columns: Seq[String] = Nil,
                      numPartitions: Int = 0): DataFrame = {
    val (all, dataStart, _) = readHeader(path)
    all.foreach(m => require(m.shape.size <= 2,
      s"$path: tensor ${m.name} has rank ${m.shape.size} — only rank 1/2 " +
        "tensors map to columns (reshape upstream)"))
    val metas =
      if (columns.isEmpty) all
      else {
        val byName = all.map(m => m.name -> m).toMap
        columns.map(c => byName.getOrElse(c,
          throw new IllegalArgumentException(s"$path: no such tensor: $c")))
      }
    val ns = metas.map(_.nRows).distinct
    require(ns.size == 1,
      s"$path: tensors disagree on the leading dimension ($ns)")
    val n = ns.head
    val schema = StructType(metas.map { m =>
      val base = sparkTypeOf(m.dtype)
      StructField(m.name,
        if (m.shape.size == 2) ArrayType(base, containsNull = false) else base,
        nullable = false)
    })
    val maxRow = metas.map(_.rowBytes).max
    val p = path
    val ds = dataStart
    val ms = metas
    val rows = rangeRdd(spark, n, math.max(1L, maxRow) * ms.size, numPartitions)
      .mapPartitions { it =>
        val in = new FsIO.In(p)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        it.flatMap { case (s, e) =>
          val count = (e - s).toInt
          val cols: Seq[Array[Any]] = ms.map { m =>
            val item = itemBytes(m.dtype).toInt
            val rowB = m.rowBytes.toInt
            val buf = new Array[Byte](count * math.max(rowB, 1))
            if (rowB > 0) {
              in.seek(ds + m.begin + s * m.rowBytes)
              in.readFully(buf)
            }
            val le = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            val d = m.rowElems.toInt
            val out = new Array[Any](count)
            var r = 0
            while (r < count) {
              out(r) =
                if (m.shape.size == 2)
                  Seq.tabulate(d)(j => decodeAt(buf, le, r * rowB + j * item, m.dtype))
                else decodeAt(buf, le, r * rowB, m.dtype)
              r += 1
            }
            out
          }
          (0 until count).iterator.map(r => Row.fromSeq(cols.map(c => c(r))))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Row spans sized by parallelism, byte-capped like the npy reader. */
  private def rangeRdd(spark: SparkSession, n: Long, rowBytes: Long,
                       numPartitions: Int) = {
    val byteCap = math.max(1L, (1L << 28) / math.max(1L, rowBytes))
    val parts = if (numPartitions > 0) numPartitions
    else math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (n / 65536 + 1).toInt))
    val step = math.min(byteCap, math.max(1L, (n + parts - 1) / math.max(parts, 1)))
    val ranges = (0L until n by step).map(s => (s, math.min(s + step, n)))
    spark.sparkContext.parallelize(ranges, math.max(ranges.size, 1))
  }

  // ------------------------------------------------------------ write

  private def outDtype(name: String, t: DataType): String = t match {
    case DoubleType => "F64"
    case FloatType => "F32"
    case LongType => "I64"
    case IntegerType => "I32"
    case ShortType => "I16"
    case ByteType => "I8"
    case BooleanType => "BOOL"
    case other => throw new IllegalArgumentException(
      s"safetensors export: unsupported type ${other.catalogString} for column $name")
  }

  private def encodeTo(bb: ByteBuffer, dt: String, v: Any, ctx: String): Unit = {
    require(v != null, s"safetensors export: null value in column $ctx " +
      "(the format has no nulls — fillna upstream)")
    dt match {
      case "F64" => bb.putDouble(v.asInstanceOf[Double])
      case "F32" => bb.putFloat(v.asInstanceOf[Float])
      case "I64" => bb.putLong(v.asInstanceOf[Long])
      case "I32" => bb.putInt(v.asInstanceOf[Int])
      case "I16" => bb.putShort(v.asInstanceOf[Short])
      case "I8" => bb.put(v.asInstanceOf[Byte])
      case "BOOL" => bb.put(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case "F16" => bb.putShort(floatToF16(v.asInstanceOf[Float]))
      case "BF16" => bb.putShort(floatToBf16(v.asInstanceOf[Float]))
    }
    ()
  }

  /** Per-column plan derived on the DRIVER before any data pass:
    * (name, dtype, d) where d = 0 for scalars, else the constant
    * array width (a varying width fails here, not mid-write — the
    * SHARED one-pass stats helper, Npy.geometry). */
  private def plan(df: DataFrame,
      half: Map[String, String]): Seq[(String, String, Int)] = {
    half.foreach { case (c, dt) =>
      require(dt == "F16" || dt == "BF16",
        s"safetensors export: half override for $c must be F16|BF16, got $dt")
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"safetensors export: half override for unknown column $c"))
      val et = f.dataType match {
        case ArrayType(e, _) => e
        case t => t
      }
      require(et == FloatType,
        s"safetensors export: half override needs a float column, " +
          s"$c is ${f.dataType.catalogString}")
    }
    val widths: Map[String, Int] =
      if (df.schema.fields.exists(_.dataType.isInstanceOf[ArrayType]))
        Npy.geometry(df, "safetensors export")._3
      else Map.empty
    df.schema.fields.map { f =>
      def dt(t: DataType) = half.getOrElse(f.name, outDtype(f.name, t))
      f.dataType match {
        case ArrayType(et, _) => (f.name, dt(et), widths(f.name))
        case t => (f.name, dt(t), 0)
      }
    }.toSeq
  }

  private def headerJson(cols: Seq[(String, String, Int)], n: Long): Array[Byte] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    var off = 0L
    cols.foreach { case (name, dt, d) =>
      val o = root.putObject(name)
      o.put("dtype", dt)
      val sh = o.putArray("shape")
      sh.add(n)
      if (d > 0) sh.add(d.toLong)
      val bytes = n * math.max(d, 1) * itemBytes(dt)
      val offs = o.putArray("data_offsets")
      offs.add(off); offs.add(off + bytes)
      off += bytes
    }
    val raw = om.writeValueAsBytes(root)
    // space-pad to 8-byte alignment of the data section (the
    // convention safetensors' own writer follows)
    val pad = (8 - ((raw.length) % 8)) % 8
    raw ++ Array.fill(pad)(' '.toByte)
  }

  /** Core writer: `passes` must yield the SAME rows each time it is
    * called (once per column — tensors are column-major regions). */
  private def writeFile(out: java.io.OutputStream,
                        cols: Seq[(String, String, Int)], n: Long,
                        passes: () => Iterator[Row]): Unit = {
    try {
      val hj = headerJson(cols, n)
      val lenB = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(hj.length.toLong).array()
      out.write(lenB)
      out.write(hj)
      cols.zipWithIndex.foreach { case ((name, dt, d), ci) =>
        val item = itemBytes(dt).toInt
        val rowB = math.max(d, 1) * item
        val chunk = math.max(1, (1 << 20) / rowB)
        val bb = ByteBuffer.allocate(chunk * rowB).order(ByteOrder.LITTLE_ENDIAN)
        var written = 0L
        val it = passes()
        while (it.hasNext) {
          val row = it.next()
          if (d == 0) encodeTo(bb, dt, row.get(ci), name)
          else {
            val arr = row.getSeq[Any](ci)
            require(arr != null && arr.length == d,
              s"safetensors export: column $name row width ${if (arr == null) "null" else arr.length} != $d")
            arr.foreach(v => encodeTo(bb, dt, v, name))
          }
          written += 1
          if (bb.remaining() < rowB) {
            out.write(bb.array(), 0, bb.position()); bb.clear(); ()
          }
        }
        out.write(bb.array(), 0, bb.position())
        require(written == n,
          s"safetensors export: pass for $name saw $written rows, expected $n")
      }
    } finally out.close()
  }

  /** Null checks BEFORE the spill: RowSpill's array codec has no
    * per-ELEMENT null marker (a null element would silently unbox to
    * 0.0/0 on re-read), so the loud rejection must see the original
    * rows, not the spilled ones. Scalar nulls survive the spill and
    * are also caught here for a consistent error point. */
  private def validated(it: Iterator[Row],
                        cols: Seq[(String, String, Int)]): Iterator[Row] =
    it.map { row =>
      cols.zipWithIndex.foreach { case ((name, _, d), i) =>
        require(!row.isNullAt(i),
          s"safetensors export: null value in column $name " +
            "(the format has no nulls — fillna upstream)")
        if (d > 0) {
          val arr = row.getSeq[Any](i)
          require(arr.length == d,
            s"safetensors export: column $name row width ${arr.length} != $d")
          require(!arr.contains(null),
            s"safetensors export: null element in array column $name " +
              "(the format has no nulls — fillna upstream)")
        }
      }
      row
    }

  /** Single-file export, driver-streamed. Tensors are column-major
    * regions but Spark row order is only stable WITHIN one job —
    * streaming the frame once per column (one job each) misaligns
    * rows across tensors (caught by the q_safetensors_embed oracle).
    * So: ONE `toLocalIterator` pass spills rows to driver-local disk
    * (RowSpill — never the whole frame in memory), then the column
    * passes re-read the spill. */
  def toSafetensors(df: DataFrame, path: String,
      halfDtypes: Map[String, String] = Map.empty): Unit = {
    val cols = plan(df, halfDtypes)
    val schema = df.schema
    import scala.jdk.CollectionConverters._
    val (file, n) = RowSpill.spill(schema,
      validated(df.toLocalIterator().asScala, cols))
    try writeFile(FsIO.create(path), cols, n, () => RowSpill.iterate(schema, file))
    finally { file.delete(); () }
  }

  /** Distributed sharded export: every partition spills its rows to
    * executor-local disk once (RowSpill — no `it.toArray`), then
    * streams its own `part-NNNNN.safetensors`, re-reading the spill
    * once per column. Read back with a glob. Returns shard count. */
  def toSafetensorsSharded(df: DataFrame, dir: String,
      halfDtypes: Map[String, String] = Map.empty): Int = {
    val cols = plan(df, halfDtypes)
    val schema = df.schema
    FsIO.mkdirs(dir)
    FsIO.deleteShards(dir, ".safetensors")
    val written = df.rdd.mapPartitionsWithIndex { (pi, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val (file, count) = RowSpill.spill(schema, validated(it, cols))
        try {
          writeFile(FsIO.create(f"$dir/part-$pi%05d.safetensors"), cols, count,
            () => RowSpill.iterate(schema, file))
          Iterator.single(1)
        } finally { file.delete(); () }
      }
    }.count()
    written.toInt
  }
}
