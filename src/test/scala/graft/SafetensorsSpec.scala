package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Export, Readers, Safetensors}

/** Dependency-free safetensors source/sink. Independence check: the
  * read fixtures are HAND-CONSTRUCTED byte images of the public
  * format (8-byte LE header length + JSON + raw LE C-order buffer)
  * with independently computed expected values (e.g. half 0x3C00 =
  * 1.0, bfloat 0x3F80 = 1.0); the writer is pinned by byte-level
  * layout asserts plus an in-test hand parser that never touches the
  * reader code path. */
class SafetensorsSpec extends SparkSpec {

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_st").toString
    s"$d/$leaf"
  }

  private def build(headerJson: String, data: Array[Byte]): String = {
    val path = tmp("hand.safetensors")
    val hb = headerJson.getBytes("UTF-8")
    val out = new java.io.FileOutputStream(path)
    out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(hb.length.toLong).array())
    out.write(hb); out.write(data); out.close()
    path
  }

  test("hand-built file: F64 scalar + F32 matrix decode bit-exactly, distributed") {
    val n = 10
    val d = 3
    val bb = ByteBuffer.allocate(n * 8 + n * d * 4).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => bb.putDouble(i * 1.25 - 2.0))
    (0 until n * d).foreach(i => bb.putFloat(i * 0.5f))
    val hdr = s"""{"x":{"dtype":"F64","shape":[$n],"data_offsets":[0,${n * 8}]},""" +
      s""""m":{"dtype":"F32","shape":[$n,$d],"data_offsets":[${n * 8},${n * 8 + n * d * 4}]}}"""
    val df = Safetensors.fromSafetensors(spark, build(hdr, bb.array()),
      numPartitions = 3)
    assert(df.schema.map(f => (f.name, f.dataType, f.nullable)) ==
      Seq(("x", DoubleType, false), ("m", ArrayType(FloatType, false), false)))
    val rows = df.orderBy("x").collect()
    assert(rows.length == n)
    assert(rows(4).getDouble(0) == 4 * 1.25 - 2.0)
    assert(rows(4).getSeq[Float](1) == Seq(12 * 0.5f, 13 * 0.5f, 14 * 0.5f))
    // tensor pruning
    val one = Safetensors.fromSafetensors(spark, build(hdr, bb.array()),
      columns = Seq("m"))
    assert(one.schema.fieldNames.toSeq == Seq("m") && one.count() == n)
  }

  test("hand-built file: F16, BF16, U8, U64, BOOL decode with exact widenings") {
    // half: 0x3C00=1.0, 0xC000=-2.0, 0x7C00=+inf, 0x0001=min subnormal
    // bfloat: 0x3F80=1.0, 0xC040=-3.0
    val bb = ByteBuffer.allocate(4 * 2 + 4 * 2 + 4 + 4 * 8 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    Seq(0x3C00, 0xC000, 0x7C00, 0x0001).foreach(v => bb.putShort(v.toShort))
    Seq(0x3F80, 0xC040, 0x0000, 0x7F80).foreach(v => bb.putShort(v.toShort))
    Seq(0, 127, 128, 255).foreach(v => bb.put(v.toByte))
    Seq(0L, 1L, Long.MaxValue, -1L).foreach(bb.putLong) // -1 = 2^64-1 unsigned
    Seq(0, 1, 2, 0).foreach(v => bb.put(v.toByte))
    val hdr =
      """{"h":{"dtype":"F16","shape":[4],"data_offsets":[0,8]},""" +
      """"b":{"dtype":"BF16","shape":[4],"data_offsets":[8,16]},""" +
      """"u":{"dtype":"U8","shape":[4],"data_offsets":[16,20]},""" +
      """"w":{"dtype":"U64","shape":[4],"data_offsets":[20,52]},""" +
      """"f":{"dtype":"BOOL","shape":[4],"data_offsets":[52,56]}}"""
    val rows = Safetensors.fromSafetensors(spark, build(hdr, bb.array()))
      .orderBy("w").collect() // w ascending: 0, 1, MaxValue, 2^64-1
    val byW = rows.map(r => r.getDecimal(3).toBigInteger.toString ->
      (r.getFloat(0), r.getFloat(1), r.getShort(2), r.getBoolean(4))).toMap
    assert(byW("0") == ((1.0f, 1.0f, 0.toShort, false)))
    assert(byW("1") == ((-2.0f, -3.0f, 127.toShort, true)))
    assert(byW("9223372036854775807")._1 == Float.PositiveInfinity)
    assert(byW("9223372036854775807")._3 == 128.toShort)
    assert(byW("18446744073709551615")._1 == java.lang.Math.pow(2, -24).toFloat)
    assert(byW("18446744073709551615")._2 == java.lang.Float.intBitsToFloat(0x7F800000))
  }

  test("writer: byte-level layout + independent hand parse + round trip") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("v", ArrayType(FloatType, false), false),
      StructField("flag", BooleanType, false),
      StructField("b", ByteType, false)))
    val rows = (0 until 50).map(i => Row(i.toLong,
      Seq(i * 1.5f, -i * 0.25f), i % 3 == 0, (i - 25).toByte))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val path = tmp("w.safetensors")
    Safetensors.toSafetensors(df, path)

    // independent parse: no reader code
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val hlen = ByteBuffer.wrap(bytes, 0, 8).order(ByteOrder.LITTLE_ENDIAN)
      .getLong.toInt
    assert((8 + hlen) % 8 == 0, "data section must be 8-aligned")
    val json = new String(bytes, 8, hlen, "UTF-8")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    assert(root.get("id").get("dtype").asText() == "I64")
    assert(root.get("v").get("dtype").asText() == "F32")
    assert(root.get("v").get("shape").get(1).asInt() == 2)
    assert(root.get("flag").get("dtype").asText() == "BOOL")
    val vOff = root.get("v").get("data_offsets").get(0).asLong().toInt
    // row 7 of v starts at buffer + vOff + 7*2*4
    val le = ByteBuffer.wrap(bytes, 8 + hlen + vOff + 7 * 8, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    assert(le.getFloat() == 10.5f && le.getFloat() == -1.75f)
    assert(root.get("id").get("data_offsets").get(1).asLong() == 400L)
    // contiguous regions, file length exact
    val ends = Seq("id", "v", "flag", "b").map(c =>
      root.get(c).get("data_offsets").get(1).asLong())
    assert(bytes.length == 8 + hlen + ends.max)

    // round trip through our reader
    val back = Readers.open(spark, path).orderBy("id").collect()
    assert(back.length == 50)
    assert(back(7).getSeq[Float](1) == Seq(10.5f, -1.75f))
    assert(back(24).getBoolean(2) == (24 % 3 == 0))
    assert(back(3).getByte(3) == -22)
  }

  test("F16/BF16 write: numpy-conformant bits, exact round trips, validation") {
    // 1. bit-level conformance of the float->half converters against
    //    numpy (an independent IEEE 754 implementation): a sweep of
    //    normals, subnormals, boundaries, Inf and NaN
    val sweep: Seq[Float] = Seq(
      0.0f, -0.0f, 1.0f, -1.0f, 0.5f, 1.5f, 65504f /*max half*/,
      65520f /*rounds to Inf*/, 65519.996f, 6.1035156e-5f /*min normal*/,
      6.0975552e-5f /*subnormal*/, 5.9604645e-8f /*min subnormal*/,
      2.9e-8f /*underflow*/, 1.0009765f /*RNE tie*/, 1.0009766f,
      3.14159265f, -2.71828f, 1e-3f, 123.456f,
      Float.PositiveInfinity, Float.NegativeInfinity) ++
      (0 until 200).map(i => java.lang.Float.intBitsToFloat(
        new scala.util.Random(i).nextInt()))
    val finite = sweep.filter(f => !f.isNaN)
    val f16bits = finite.map(f =>
      (Safetensors.floatToF16(f) & 0xffff).toString).mkString(",")
    val bf16bits = finite.map(f =>
      (Safetensors.floatToBf16(f) & 0xffff).toString).mkString(",")
    val fvals = finite.map(f =>
      java.lang.Float.floatToRawIntBits(f).toString).mkString(",")
    import scala.sys.process._
    val py =
      s"""import numpy as np
         |f = np.array([$fvals], dtype=np.int32).view(np.float32)
         |ours16 = np.array([$f16bits], dtype=np.uint16)
         |np16 = f.astype(np.float16).view(np.uint16)
         |assert (ours16 == np16).all(), (ours16 != np16).nonzero()
         |# bf16: numpy has no bfloat16 — emulate round-to-nearest-even
         |b = f.view(np.uint32)
         |bf = ((b.astype(np.uint64) + 0x7fff + ((b >> 16) & 1)) >> 16).astype(np.uint16)
         |ours = np.array([$bf16bits], dtype=np.uint16)
         |assert (ours == bf).all(), (ours != bf).nonzero()
         |print('PY_OK')""".stripMargin
    val res = Seq("python3", "-c", py).!!
    assert(res.contains("PY_OK"), res)
    // NaN stays NaN both ways
    assert(Safetensors.f16ToFloat(
      Safetensors.floatToF16(Float.NaN) & 0xffff).isNaN)
    assert(Safetensors.bf16ToFloat(
      Safetensors.floatToBf16(Float.NaN) & 0xffff).isNaN)

    // 2. typed round trip through the write->read path: half-exact
    //    values survive bit-identically; a non-representable value
    //    lands on its nearest half (the documented contract)
    val n = 64
    val rows = (0 until n).map { i =>
      Row(i.toLong, (i - 32) * 0.25f, Seq((i * 0.5f) - 8f, i * 2.0f))
    }
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("x", FloatType, false),
      StructField("v", ArrayType(FloatType, false), false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val p = tmp("half.safetensors")
    Safetensors.toSafetensors(df, p,
      halfDtypes = Map("x" -> "F16", "v" -> "BF16"))
    val back = Safetensors.fromSafetensors(spark, p).orderBy("id").collect()
    assert(back.length == n)
    (0 until n).foreach { i =>
      assert(back(i).getAs[Float]("x") == (i - 32) * 0.25f) // F16-exact
      assert(back(i).getSeq[Float](back(i).fieldIndex("v")) ==
        Seq((i * 0.5f) - 8f, i * 2.0f)) // BF16-exact
    }
    // nearest-half rounding for a non-representable value
    val one = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(0L, 1.0001f, Seq(0f, 0f))), 1),
      schema)
    val p2 = tmp("round.safetensors")
    Safetensors.toSafetensors(one, p2, halfDtypes = Map("x" -> "F16"))
    val got = Safetensors.fromSafetensors(spark, p2).head.getAs[Float]("x")
    assert(got == Safetensors.f16ToFloat(
      Safetensors.floatToF16(1.0001f) & 0xffff))
    assert(got == 1.0f && got != 1.0001f) // rounded to the nearest half
    // sharded path carries the override too
    val d = tmp("halfsh")
    Safetensors.toSafetensorsSharded(df, d, halfDtypes = Map("x" -> "F16"))
    assert(Readers.open(spark, s"$d/part-*.safetensors").count() == n)
    // validation: unknown column / non-float column reject
    intercept[IllegalArgumentException] {
      Safetensors.toSafetensors(df, tmp("bad1"), Map("nope" -> "F16"))
    }
    intercept[IllegalArgumentException] {
      Safetensors.toSafetensors(df, tmp("bad2"), Map("id" -> "F16"))
    }
    intercept[IllegalArgumentException] {
      Safetensors.toSafetensors(df, tmp("bad3"), Map("x" -> "F8"))
    }
  }

  test("sharded export + glob read-back") {
    val df = spark.range(0, 200).select(col("id"),
      (col("id") % 7).cast("double").as("x"),
      array((col("id") % 5).cast("float"), lit(2.5f)).as("e"))
      .repartition(4)
    val dir = tmp("shards")
    val n = Safetensors.toSafetensorsSharded(df, dir)
    assert(n == 4)
    val back = Readers.open(spark, s"$dir/part-*.safetensors")
    assert(back.count() == 200)
    assert(back.agg(sum("id")).collect().head.getLong(0) == 199L * 200 / 2)
    // stale shards from a previous wider write are cleared
    val n2 = Safetensors.toSafetensorsSharded(df.repartition(2), dir)
    assert(n2 == 2)
    assert(Readers.open(spark, s"$dir/part-*.safetensors").count() == 200)
  }

  test("validation: overlaps, size mismatch, rank 3, nulls and ragged widths at write") {
    // overlapping regions
    val bb = new Array[Byte](16)
    val bad1 = build(
      """{"a":{"dtype":"I64","shape":[1],"data_offsets":[0,8]},""" +
      """"b":{"dtype":"I64","shape":[1],"data_offsets":[4,12]}}""", bb)
    val e1 = intercept[IllegalArgumentException] {
      Safetensors.fromSafetensors(spark, bad1)
    }
    assert(e1.getMessage.contains("overlap"))
    // declared size != shape * itemsize
    val bad2 = build(
      """{"a":{"dtype":"I64","shape":[3],"data_offsets":[0,16]}}""", bb)
    assert(intercept[IllegalArgumentException] {
      Safetensors.fromSafetensors(spark, bad2)
    }.getMessage.contains("needs 24"))
    // rank 3 rejected with guidance
    val bad3 = build(
      """{"a":{"dtype":"I8","shape":[2,2,2],"data_offsets":[0,8]}}""", bb)
    assert(intercept[IllegalArgumentException] {
      Safetensors.fromSafetensors(spark, bad3)
    }.getMessage.contains("rank 3"))
    // nulls at write
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(null)), 1),
      StructType(Seq(StructField("x", LongType, true))))
    assert(intercept[Exception] {
      Safetensors.toSafetensors(withNull, tmp("null.safetensors"))
    }.getMessage.contains("no nulls"))
    // null array ELEMENTS must fail loudly too — RowSpill's array
    // codec has no per-element marker, so an unchecked null would
    // silently spill as 0.0 (review finding)
    val withNullElem = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(Seq(1.0f, 2.0f)), Row(Seq(3.0f, null))), 1),
      StructType(Seq(StructField("v", ArrayType(FloatType, true), false))))
    assert(intercept[Exception] {
      Safetensors.toSafetensors(withNullElem, tmp("nullelem.safetensors"))
    }.getMessage.contains("null element"))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val eSh = intercept[Exception] {
      Safetensors.toSafetensorsSharded(withNullElem, tmp("nullelem_sh"))
    }
    assert(messages(eSh).exists(_.contains("null element")), s"got: $eSh")
    // ragged array widths fail on the DRIVER plan, before any write
    val ragged = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(Seq(1.0f, 2.0f)), Row(Seq(3.0f))), 1),
      StructType(Seq(StructField("v", ArrayType(FloatType, false), false))))
    assert(intercept[IllegalArgumentException] {
      Safetensors.toSafetensors(ragged, tmp("ragged.safetensors"))
    }.getMessage.contains("one fixed length"))
    // string columns rejected up front
    val s = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a")), 1),
      StructType(Seq(StructField("s", StringType, false))))
    assert(intercept[IllegalArgumentException] {
      Safetensors.toSafetensors(s, tmp("s.safetensors"))
    }.getMessage.contains("unsupported type"))
  }

  test("__metadata__ entries are ignored on read; Export dispatch routes the extension") {
    val n = 4
    val bb = ByteBuffer.allocate(n * 4).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(bb.putInt)
    val hdr = s"""{"__metadata__":{"format":"pt"},""" +
      s""""a":{"dtype":"I32","shape":[$n],"data_offsets":[0,${n * 4}]}}"""
    val df = Safetensors.fromSafetensors(spark, build(hdr, bb.array()))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == (0 until n))
    val out = tmp("exp.safetensors")
    Export.export(spark.range(5).select(col("id")), out)
    assert(Readers.open(spark, out).count() == 5)
  }
}
