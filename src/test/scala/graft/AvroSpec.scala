package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Avro, Readers}
import scala.jdk.CollectionConverters._

/** Dependency-free Avro source/sink: typed round trips, the
  * distributed sync-split reader, sharded export + glob read, and the
  * fail-fast surface. */
class AvroSpec extends SparkSpec {

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_avro").toString
    s"$d/$leaf"
  }

  private val typedSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("b", BooleanType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("af", ArrayType(FloatType)),
    StructField("al", ArrayType(LongType)),
    StructField("as", ArrayType(StringType))))

  private lazy val typedDf = {
    val rows = (0 until 200).map { i =>
      Row(
        i.toLong,
        if (i % 7 == 0) null else Int.box(i * 3),
        if (i % 11 == 0) null else Double.box(i * 1.25 - 3.5),
        if (i % 13 == 0) null else Float.box(i * 0.5f),
        if (i % 5 == 0) null else Boolean.box(i % 2 == 0),
        if (i % 17 == 0) null else s"str-$i-é",
        if (i % 19 == 0) null else Array.tabulate(i % 8)(j => (i + j).toByte),
        if (i % 23 == 0) null else (0 until i % 5).map(j => i * 0.25f + j),
        // null ELEMENTS inside arrays: Spark arrays default to
        // containsNull=true, so the writer must emit ["null", T]
        // element unions instead of NPEing mid-write
        (0 until i % 3).map(j => if ((i + j) % 5 == 0) null
          else Long.box(i.toLong * 100 + j)),
        (0 until i % 4).map(j => if (j == 2) null else s"e$j"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), typedSchema)
  }

  private def canon(r: Row): Seq[Any] = r.toSeq.map {
    case b: Array[Byte] => b.toSeq
    case v => v
  }

  test("typed round trip: every supported type + nulls survives bit-exactly") {
    val path = tmp("typed.avro")
    Avro.toAvro(typedDf, path)
    val back = Avro.fromAvro(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      typedSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = typedDf.collect().map(canon).sortBy(_.head.asInstanceOf[Long].toString)
    val b = back.collect().map(canon).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq === b.toSeq)
  }

  test("struct paths whose record names sanitize identically get unique names") {
    // the nested struct at path 'a.b' and the top-level struct column
    // 'a_b' BOTH sanitize to record name r_a_b — without a per-schema
    // uniquifier Avro rejects the redefinition at schema build time
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", StructType(Seq(
        StructField("b", StructType(Seq(StructField("x", LongType))))))),
      StructField("a_b", StructType(Seq(StructField("y", StringType))))))
    val rows = (0 until 20).map(i => Row(i.toLong, Row(Row(i * 2L)), Row(s"v$i")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp("collide.avro")
    Avro.toAvro(df, path)
    val back = Avro.fromAvro(spark, path).orderBy("id").collect()
    assert(back.length == 20)
    assert(back(3).getStruct(1).getStruct(0).getLong(0) == 6L)
    assert(back(3).getStruct(2).getString(0) == "v3")
  }

  test("enum and fixed WRITE: declared columns round-trip and the schema is genuinely named") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("color", StringType),
      StructField("digest", BinaryType)))
    val colors = Seq("RED", "GREEN", "BLUE")
    val rows = (0 until 60).map { i =>
      Row(i.toLong,
        if (i % 7 == 0) null else colors(i % 3),
        if (i % 11 == 0) null else Array.tabulate(4)(j => (i + j).toByte))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val path = tmp("enumfixed.avro")
    Avro.toAvro(df, path, enums = Map("color" -> colors), fixed = Map("digest" -> 4))

    // the written schema must DECLARE enum/fixed (not string/bytes)
    val reader = new org.apache.avro.file.DataFileReader(
      new java.io.File(path),
      new org.apache.avro.generic.GenericDatumReader[AnyRef]())
    val written = try reader.getSchema finally reader.close()
    def branch(f: String) = written.getField(f).schema().getTypes.asScala
      .find(_.getType != org.apache.avro.Schema.Type.NULL).get
    assert(branch("color").getType == org.apache.avro.Schema.Type.ENUM)
    assert(branch("color").getEnumSymbols.asScala.toSeq == colors)
    assert(branch("digest").getType == org.apache.avro.Schema.Type.FIXED)
    assert(branch("digest").getFixedSize == 4)

    // and our own reader round-trips them as string/binary
    val back = Avro.fromAvro(spark, path)
    assert(back.schema("color").dataType == StringType)
    assert(back.schema("digest").dataType == BinaryType)
    val a = df.collect().map(canon).sortBy(_.head.asInstanceOf[Long])
    val b = back.collect().map(canon).sortBy(_.head.asInstanceOf[Long])
    assert(a.toSeq === b.toSeq)

    // sharded export takes the same declarations
    val dir = tmp("enumfixed_shards")
    Avro.toAvroSharded(df, dir, enums = Map("color" -> colors),
      fixed = Map("digest" -> 4))
    val backSharded = Readers.open(spark, s"$dir/part-*.avro")
    assert(backSharded.count() == 60)
    assert(backSharded.schema("color").dataType == StringType)

    // violations fail loudly: off-symbol value, wrong fixed width,
    // wrong Spark type, unknown column
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val bad1 = intercept[Exception] {
      Avro.toAvro(df, tmp("bad1.avro"), enums = Map("color" -> Seq("RED")))
    }
    assert(messages(bad1).exists(_.contains("enum symbol")), s"got: $bad1")
    val bad2 = intercept[Exception] {
      Avro.toAvro(df, tmp("bad2.avro"), fixed = Map("digest" -> 3))
    }
    assert(messages(bad2).exists(_.contains("fixed(3)")), s"got: $bad2")
    val bad3 = intercept[IllegalArgumentException] {
      Avro.toAvro(df, tmp("bad3.avro"), enums = Map("id" -> colors))
    }
    assert(bad3.getMessage.contains("must be string"))
    val bad4 = intercept[IllegalArgumentException] {
      Avro.toAvro(df, tmp("bad4.avro"), fixed = Map("nope" -> 4))
    }
    assert(bad4.getMessage.contains("unknown column"))
  }

  test("temporal logical types round-trip: timestamp-micros, local-timestamp-micros, date") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("ntz", TimestampNTZType),
      StructField("d", DateType)))
    val rows = (0 until 100).map { i =>
      Row(i.toLong,
        if (i % 9 == 0) null else {
          // sub-millisecond micros included: a bare Timestamp(millis)
          // only ever carries whole-millisecond nanos, which would
          // leave the getNanos/1000 micro-remainder path untested
          val us = (i.toLong - 50) * 86400000000L + i.toLong * 1234567L
          val ts = new java.sql.Timestamp(java.lang.Math.floorDiv(us, 1000L))
          ts.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt)
          ts
        },
        if (i % 7 == 0) null else java.time.LocalDateTime
          .of(1960 + i, 1 + i % 12, 1 + i % 28, i % 24, i % 60, i % 60, (i % 1000) * 123000),
        if (i % 5 == 0) null else java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(i.toLong * 97 - 2000)))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val path = tmp("temporal.avro")
    Avro.toAvro(df, path)
    val back = Avro.fromAvro(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val a = df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq === b.toSeq)
  }

  test("timestamp-millis logical types (external writers) scale to micros on read") {
    // hand-build a file whose ts fields use the -millis variants (what
    // spark-avro / Kafka Connect commonly emit) — our writer always
    // emits micros, so construct the schema manually
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val tsMs = LogicalTypes.timestampMillis().addToSchema(ASchema.create(ASchema.Type.LONG))
    val ntzMs = LogicalTypes.localTimestampMillis().addToSchema(ASchema.create(ASchema.Type.LONG))
    val rec = ASchema.createRecord("row", null, "t", false)
    rec.setFields(java.util.Arrays.asList(
      new ASchema.Field("id", ASchema.create(ASchema.Type.LONG), null, null),
      new ASchema.Field("ts", tsMs, null, null),
      new ASchema.Field("ntz", ntzMs, null, null)))
    val path = tmp("millis.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](rec))
    w.create(rec, new java.io.File(path))
    (0 until 20).foreach { i =>
      val r = new GenericData.Record(rec)
      r.put(0, i.toLong); r.put(1, i.toLong * 1000L + 123L); r.put(2, i.toLong * 777L)
      w.append(r)
    }
    w.close()
    val back = Avro.fromAvro(spark, path).orderBy("id").collect()
    assert(back.head.schema("ts").dataType === TimestampType)
    assert(back.head.schema("ntz").dataType === TimestampNTZType)
    // millis value 1123 -> 1123000 micros -> 1.123 s
    assert(back(1).getTimestamp(1).getTime === 1123L)
    assert(back(1).getAs[java.time.LocalDateTime](2) ===
      java.time.LocalDateTime.ofEpochSecond(0, 777000000, java.time.ZoneOffset.UTC))
  }

  test("java8API datetime externals round-trip (Instant/LocalDate)") {
    val prev = spark.conf.get("spark.sql.datetime.java8API.enabled", "false")
    spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
    try {
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("ts", TimestampType),
        StructField("d", DateType)))
      val rows = (0 until 50).map { i =>
        Row(i.toLong,
          java.time.Instant.ofEpochSecond(i.toLong * 3607L - 1000L, i * 123000L),
          java.time.LocalDate.ofEpochDay(i.toLong * 31 - 400))
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      val path = tmp("java8.avro")
      Avro.toAvro(df, path)
      val back = Avro.fromAvro(spark, path)
      val a = df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(a.toSeq === b.toSeq)
      assert(b.head(1).isInstanceOf[java.time.Instant])
      assert(b.head(2).isInstanceOf[java.time.LocalDate])
    } finally spark.conf.set("spark.sql.datetime.java8API.enabled", prev)
  }

  test("distributed sync-split read covers every row exactly once") {
    // small sync interval -> many blocks; a file > 1 MiB would also
    // split, but the split logic itself is what matters: emulate by
    // reading with the production path and comparing multiplicities
    val path = tmp("blocks.avro")
    // ~240-byte rows x 20k = ~5 MB uncompressed -> >= 5 one-MiB-floored
    // splits, so several tasks genuinely sync-seek into the middle
    val df = spark.range(20000).select(col("id"),
      concat(lit("text-"), col("id"), repeat(lit("x"), 220)).as("s"))
    Avro.toAvro(df, path, codec = None, syncInterval = 512)
    assert(new java.io.File(path).length() > 3L * (1L << 20),
      "file must span multiple 1 MiB splits for this test to mean anything")
    val back = Avro.fromAvro(spark, path)
    assert(back.count() === 20000L)
    assert(back.select(sum("id")).head().getLong(0) === (19999L * 20000L) / 2)
    assert(back.select(countDistinct("id")).head().getLong(0) === 20000L)
  }

  test("sharded export + glob read; stale shards cleared; open() dispatch") {
    val dir = tmp("shards")
    val n1 = Avro.toAvroSharded(typedDf.repartition(6), dir)
    assert(n1 === 6)
    // re-export with fewer partitions must clear the higher shards
    val n2 = Avro.toAvroSharded(typedDf.repartition(3), dir)
    assert(n2 === 3)
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".avro"))
    assert(files.length === 3, files.toSeq)
    val back = Readers.open(spark, s"$dir/part-*.avro")
    assert(back.count() === 200L)
    val a = typedDf.collect().map(canon).sortBy(_.head.asInstanceOf[Long].toString)
    val b = back.collect().map(canon).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq === b.toSeq)
  }

  test("export dispatch by extension + deflate codec actually compresses") {
    val plain = tmp("plain.avro")
    val packed = tmp("packed.avro")
    val df = spark.range(5000).select(col("id"),
      lit("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa").as("s"))
    Avro.toAvro(df, plain, codec = None)
    graft.sources.Export.export(df, packed) // dispatch: default deflate
    val lp = new java.io.File(plain).length()
    val lc = new java.io.File(packed).length()
    assert(lc < lp / 2, s"deflate $lc vs plain $lp")
    assert(Readers.open(spark, packed).count() === 5000L)
  }

  test("corrupt-byte fuzzing: reader throws promptly, never hangs") {
    // the HDF5/FITS/Arrow fuzz protocol: mutate a real container's
    // bytes — biased to the head (magic + schema json) and tail — and
    // require every read to either succeed or raise promptly
    val path = tmp("fuzzbase.avro")
    val df = spark.range(2000).select(col("id"),
      concat(lit("text-"), col("id")).as("s"))
    Avro.toAvro(df, path, codec = None, syncInterval = 1024)
    val base = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val mut = java.nio.file.Paths.get(tmp("mut.avro"))
    val rnd = new scala.util.Random(11)
    var parsed = 0
    val t0 = System.nanoTime()
    for (_ <- 1 to 60) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(3)) {
        val pos = rnd.nextInt(3) match {
          case 0 => rnd.nextInt(math.min(512, m.length))
          case 1 => m.length - 1 - rnd.nextInt(math.min(512, m.length))
          case _ => rnd.nextInt(m.length)
        }
        m(pos) = rnd.nextInt(256).toByte
      }
      java.nio.file.Files.write(mut, m)
      try { Avro.fromAvro(spark, mut.toString).collect(); parsed += 1 }
      catch {
        // string/bytes/collection lengths are capped by the avro limit
        // properties Avro's object init sets, so corrupt lengths raise
        // SystemLimitException (an Exception) — a genuine heap OOM (a
        // reader leak) still fails the spec. The one OOM form allowed
        // is the always-prompt VM array-size limit.
        case _: Exception => ()
        case e: OutOfMemoryError if e.getMessage != null &&
            e.getMessage.contains("Requested array size") => ()
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 300.0, s"avro fuzz took ${secs}s")
    assert(parsed > 0) // data-region mutations decode fine
  }

  test("decode-allocation caps are actually in force in this JVM") {
    // the fuzz above swallows all exceptions, so it cannot tell capped
    // from uncapped — assert the limits positively: Avro's object init
    // (already run by every test here) must have landed the 256 MB /
    // 2^26 caps in SystemLimitException's static fields, including
    // through resetLimits() when avro classes loaded first
    val cls = Class.forName("org.apache.avro.SystemLimitException")
    def limit(name: String): Int = {
      val f = cls.getDeclaredField(name)
      f.setAccessible(true)
      f.getInt(null)
    }
    assert(limit("maxBytesLength") === (256 << 20))
    assert(limit("maxStringLength") === (256 << 20))
    assert(limit("maxCollectionLength") === (1 << 26))
  }

  test("unsupported types and malformed unions fail fast") {
    // intervals have no avro encoding in this surface
    val badDf = spark.range(1).select(expr("make_ym_interval(1, 2)").as("iv"))
    val e = intercept[IllegalArgumentException] {
      Avro.toAvro(badDf, tmp("bad.avro"))
    }
    assert(e.getMessage.contains("unsupported type"), e.getMessage)
    // avro maps only have string keys
    val badMap = spark.range(1).select(map(col("id"), col("id")).as("m"))
    val e2 = intercept[IllegalArgumentException] {
      Avro.toAvro(badMap, tmp("bad2.avro"))
    }
    assert(e2.getMessage.contains("map keys must be strings"), e2.getMessage)
  }

  test("nested records, maps, decimals, arrays-of-struct round-trip") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("st", StructType(Seq(
        StructField("a", LongType),
        StructField("inner", StructType(Seq(
          StructField("s", StringType),
          StructField("d", DoubleType)))),
        StructField("ts", TimestampNTZType)))),
      StructField("m", MapType(StringType, DoubleType)),
      StructField("dec", DecimalType(12, 2)),
      StructField("ast", ArrayType(StructType(Seq(
        StructField("k", StringType),
        StructField("v", LongType)))))))
    val rows = (0 until 100).map { i =>
      Row(
        i.toLong,
        if (i % 13 == 0) null else Row(
          Long.box(i * 2L),
          if (i % 7 == 0) null else Row(s"n$i", i * 0.5),
          java.time.LocalDateTime.ofEpochSecond(i * 1000L, i * 1000, java.time.ZoneOffset.UTC)),
        if (i % 11 == 0) null
        else Map("x" -> i * 1.5, "y" -> (if (i % 5 == 0) null else Double.box(i * 2.5))),
        if (i % 17 == 0) null else new java.math.BigDecimal(s"$i.25"),
        (0 until i % 4).map(j => if (j == 2) null else Row(s"k$j", Long.box(i * 10L + j))))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val path = tmp("nested.avro")
    Avro.toAvro(df, path, syncInterval = 512)
    val back = Avro.fromAvro(spark, path)
    assert(back.schema("st").dataType.asInstanceOf[StructType]("inner").dataType
      .isInstanceOf[StructType])
    assert(back.schema("dec").dataType === DecimalType(12, 2))
    assert(back.schema("m").dataType === MapType(StringType, DoubleType))
    val a = df.orderBy("id").collect().map(canon)
    val b = back.orderBy("id").collect().map(canon)
    // BigDecimal compareTo-equality (scale-preserving) via toString of
    // the canonical rows; maps compare structurally
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("array-element and nested-record timestamp-millis scale to micros (foreign file)") {
    // the r12 ADVICE defect: an array<timestamp-millis> element used to
    // read 1000x too small because the unit scale was only computed for
    // top-level fields — the converter tree now derives it from the
    // avro schema at every depth
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val tsMs = LogicalTypes.timestampMillis().addToSchema(ASchema.create(ASchema.Type.LONG))
    val arr = ASchema.createArray(tsMs)
    val innerTs = LogicalTypes.timestampMillis().addToSchema(ASchema.create(ASchema.Type.LONG))
    val inner = ASchema.createRecord("inner", null, "t", false)
    inner.setFields(java.util.Arrays.asList(
      new ASchema.Field("when", innerTs, null, null)))
    val rec = ASchema.createRecord("row", null, "t", false)
    rec.setFields(java.util.Arrays.asList(
      new ASchema.Field("id", ASchema.create(ASchema.Type.LONG), null, null),
      new ASchema.Field("tsa", arr, null, null),
      new ASchema.Field("nest", inner, null, null)))
    val path = tmp("millis_nested.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](rec))
    w.create(rec, new java.io.File(path))
    (0 until 10).foreach { i =>
      val r = new GenericData.Record(rec)
      r.put(0, i.toLong)
      r.put(1, java.util.Arrays.asList(Long.box(i * 1000L + 123L)))
      val n = new GenericData.Record(inner)
      n.put(0, i * 1000L + 456L)
      r.put(2, n)
      w.append(r)
    }
    w.close()
    val back = Avro.fromAvro(spark, path).orderBy("id").collect()
    val tsa = back(1).getSeq[java.sql.Timestamp](1)
    assert(tsa.head.getTime === 1123L) // millis preserved, not /1000
    assert(back(1).getStruct(2).getTimestamp(0).getTime === 1456L)
  }

  test("enum, fixed, and fixed-decimal read as string/binary/decimal (foreign file)") {
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val en = ASchema.createEnum("color", null, "t", java.util.Arrays.asList("RED", "GREEN", "BLUE"))
    val fx = ASchema.createFixed("f8", null, "t", 8)
    val fxDec = LogicalTypes.decimal(10, 3)
      .addToSchema(ASchema.createFixed("d6", null, "t", 6))
    val rec = ASchema.createRecord("row", null, "t", false)
    rec.setFields(java.util.Arrays.asList(
      new ASchema.Field("id", ASchema.create(ASchema.Type.LONG), null, null),
      new ASchema.Field("c", en, null, null),
      new ASchema.Field("fx", fx, null, null),
      new ASchema.Field("fd", fxDec, null, null)))
    val path = tmp("enumfixed.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](rec))
    w.create(rec, new java.io.File(path))
    (0 until 9).foreach { i =>
      val r = new GenericData.Record(rec)
      r.put(0, i.toLong)
      r.put(1, new GenericData.EnumSymbol(en, Seq("RED", "GREEN", "BLUE")(i % 3)))
      r.put(2, new GenericData.Fixed(fx, Array.tabulate(8)(j => (i + j).toByte)))
      // decimal-over-fixed: big-endian two's complement, left-padded
      val unscaled = java.math.BigInteger.valueOf(i * 1000L + 125L)
      val raw = unscaled.toByteArray
      val padded = new Array[Byte](6)
      System.arraycopy(raw, 0, padded, 6 - raw.length, raw.length)
      r.put(3, new GenericData.Fixed(fxDec, padded))
      w.append(r)
    }
    w.close()
    val back = Avro.fromAvro(spark, path).orderBy("id").collect()
    val df = Avro.fromAvro(spark, path)
    assert(df.schema("c").dataType === StringType)
    assert(df.schema("fx").dataType === BinaryType)
    assert(df.schema("fd").dataType === DecimalType(10, 3))
    assert(back(4).getString(1) === "GREEN")
    assert(back(4).getAs[Array[Byte]](2).toSeq === Array.tabulate(8)(j => (4 + j).toByte).toSeq)
    assert(back(4).getDecimal(3) === new java.math.BigDecimal("4.125"))
  }

  test("decode caps probe reports the installed limits") {
    val caps = Avro.decodeCapsInForce
    assert(caps.get("maxBytesLength").contains((256L << 20)))
    assert(caps.get("maxStringLength").contains((256L << 20)))
    assert(caps.get("maxCollectionLength").contains((1L << 26)))
  }
}
