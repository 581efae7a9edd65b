package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Export, Readers, Zarr}

/** Dependency-free Zarr v2 source/sink. Independence: the committed
  * read fixtures under /zarr (src/test/fixtures/zarr) were produced by tools/zarrgen.py with
  * numpy + zlib + json only (an independent producer written straight
  * from the public v2 spec), and the WRITER's output is re-read by
  * the same python module's verify() (numpy frombuffer + zlib — no
  * graft code on that path). */
class ZarrSpec extends SparkSpec {

  // fixtures live OUTSIDE src/test/resources: sbt's resource copy
  // excludes hidden files, and .zarray/.zgroup ARE the format
  private def res(name: String): String = s"src/test/fixtures/zarr/$name"

  private def tmp(leaf: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_zarr").toString
    s"$d/$leaf"
  }

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
      ()
    }
  }

  test("group store: mixed compressors, endianness, 2-D j-chunks, edge padding") {
    val df = Zarr.fromZarr(spark, res("table.zarr"), numPartitions = 3)
    // columns sorted by array name
    assert(df.schema.fieldNames.toSeq == Seq("big", "emb", "flag", "u", "vec_id"))
    assert(df.schema("emb").dataType == ArrayType(FloatType, containsNull = false))
    assert(df.schema("u").dataType == IntegerType) // <u2 widens
    val rows = df.orderBy("vec_id").collect()
    assert(rows.length == 40)
    (0 until 40).foreach { i =>
      val r = rows(i)
      assert(r.getAs[Long]("vec_id") == i * 3L + 1)
      assert(r.getAs[Double]("big") == i * 1.5 - 3.0) // big-endian f8, raw chunks
      assert(r.getAs[Boolean]("flag") == (i % 3 == 0))
      assert(r.getAs[Int]("u") == (i * 1000) % 60000) // '/' separator store
      val e = r.getSeq[Float](r.fieldIndex("emb"))
      assert(e == (0 until 6).map(j => ((i * 6 + j) % 17) * 0.25f - 1.0f), s"row $i")
    }
    // column pruning
    val one = Zarr.fromZarr(spark, res("table.zarr"), columns = Seq("vec_id"))
    assert(one.schema.fieldNames.toSeq == Seq("vec_id") && one.count() == 40)
  }

  test("missing chunks read as fill_value; null fill_value errors") {
    val df = Zarr.fromZarr(spark, res("sparse.zarr"))
    val got = df.collect().map(_.getInt(0)).sorted
    val expect = ((0 until 10) ++ Seq.fill(10)(9) ++ (20 until 30)).sorted
    assert(got.toSeq == expect)
  }

  test("blosclz/both-shuffle-flags chunks and Fortran-order stores are rejected loudly") {
    val e1 = intercept[Exception] {
      Zarr.fromZarr(spark, res("blosclz.zarr")).collect()
    }
    assert(e1.getMessage.contains("blosclz"))
    // a chunk claiming byte-shuffle AND BITshuffle is malformed
    val e3 = intercept[Exception] {
      Zarr.fromZarr(spark, res("bothshuf.zarr")).collect()
    }
    assert(e3.getMessage.contains("BOTH shuffle flags"))
    val e2 = intercept[IllegalArgumentException] {
      Zarr.fromZarr(spark, res("fortran.zarr"))
    }
    assert(e2.getMessage.contains("Fortran"))
  }

  test("zarr v3 store reads: codec chains, big-endian, v2 key encoding, fill, guards") {
    // fixtures from the INDEPENDENT v3 producer (zarrgen.write_array_v3:
    // own crc32c table, gzip via stdlib) — gzip+crc32c i8 under c/
    // keys, gzip 2-D f4, RAW big-endian f8, uint16 with the v2 key
    // encoding (bare chunk names)
    val df = Zarr.fromZarr(spark, res("table_v3.zarr"), numPartitions = 2)
    assert(df.schema.fieldNames.toSeq == Seq("big", "emb", "u", "vec_id"))
    assert(df.schema("u").dataType == IntegerType) // uint16 widens
    val rows = df.orderBy("vec_id").collect()
    assert(rows.length == 37)
    (0 until 37).foreach { i =>
      val r = rows(i)
      assert(r.getAs[Long]("vec_id") == i * 13L - 7)
      assert(r.getAs[Double]("big") == i * 0.75 - 1.0)
      assert(r.getAs[Int]("u") == (i * 997) % 60000)
      val e = r.getSeq[Float](r.fieldIndex("emb"))
      assert(e == (0 until 4).map(j => ((i * 4 + j) % 11) * 0.5f - 2.5f),
        s"row $i")
    }
    // column pruning through the v3 group
    val one = Zarr.fromZarr(spark, res("table_v3.zarr"), columns = Seq("vec_id"))
    assert(one.schema.fieldNames.toSeq == Seq("vec_id") && one.count() == 37)
    // missing chunk reads as the v3 fill_value
    val sparse = Zarr.fromZarr(spark, res("sparse_v3.zarr"))
    assert(sparse.collect().map(_.getInt(0)).sorted.toSeq ==
      ((0 until 10) ++ Seq.fill(10)(9) ++ (20 until 30)).sorted)
    // NESTED sharding stays a loud rejection
    val e1 = intercept[IllegalArgumentException] {
      Zarr.fromZarr(spark, res("shardbad_v3.zarr"))
    }
    assert(e1.getMessage.contains("sharding"))
    // crc32c corruption is LOUD, never silent wrong values
    val tmp3 = tmp("v3corrupt.zarr")
    copyDir(res("table_v3.zarr"), tmp3)
    val chunk = s"$tmp3/vec_id/c/0"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      chunk.stripPrefix("file:")))
    bytes(3) = (bytes(3) ^ 0x40).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(
      chunk.stripPrefix("file:")), bytes)
    val e2 = intercept[Exception] {
      Zarr.fromZarr(spark, tmp3).collect()
    }
    assert(e2.getMessage.contains("crc32c") ||
      Option(e2.getCause).exists(_.getMessage.contains("crc32c")))
  }

  test("sharding_indexed reads: index end/start, missing inner chunk + shard, writer round trip") {
    // fixtures from the INDEPENDENT producer (zarrgen
    // .write_array_v3_sharded: own crc32c, gzip via stdlib): 1-D i8,
    // shards of 40 with 10-element inner chunks (gzip+crc32c inner
    // chain, trailing index), inner chunk 3 missing AND shard 2
    // missing — both read as fill_value 5
    val df = Zarr.fromZarr(spark, res("shard_v3.zarr"), numPartitions = 3)
    val vals = df.collect().map(_.getLong(0)).sorted
    val expect = (0 until 100).map { i =>
      if (i >= 30 && i < 40) 5L          // missing inner chunk
      else if (i >= 80) 5L               // missing whole shard
      else i * 7L - 3
    }.sorted
    assert(vals.toSeq == expect)
    // 2-D f4 with the index at the START of the shard
    val df2 = Zarr.fromZarr(spark, res("shard2d_v3.zarr"))
    val rows2 = df2.collect()
    assert(rows2.length == 33)
    val all = rows2.flatMap(_.getSeq[Float](0)).sorted
    val expect2 = (0 until 33 * 4).map(k => (k % 13) * 0.25f - 1.5f)
      .sorted
    assert(all.toSeq == expect2.toSeq)
    // our writer round-trips a sharded store and python cross-reads it
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("v", ArrayType(FloatType, false), false)))
    val n = 150
    val rows = (0 until n).map(i =>
      Row(i.toLong, Seq(i * 1.0f, -i * 0.25f)))
    val dfw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val store = tmp("v3shardw.zarr")
    Zarr.toZarrDistributed(dfw, store, chunkRows = 40, codec = "gzip",
      zarrVersion = 3, shardInnerRows = 8)
    val back = Readers.open(spark, store).orderBy("id").collect()
    assert(back.length == n)
    assert(back(9).getSeq[Float](back(9).fieldIndex("v")) == Seq(9.0f, -2.25f))
    import scala.sys.process._
    val py =
      s"""import sys; sys.path.insert(0, 'tools')
         |import zarrgen
         |out = zarrgen.verify_v3('$store')
         |assert out['id'].sum() == ${n.toLong * (n - 1) / 2}, out['id'].sum()
         |assert out['v'].shape == ($n, 2) and float(out['v'][9][1]) == -2.25
         |print('PY_OK')""".stripMargin
    assert(Seq("python3", "-c", py).!!.contains("PY_OK"))
    // shard geometry guards: non-divisor inner rows, v2 store
    intercept[IllegalArgumentException](Zarr.toZarr(dfw, tmp("sbad.zarr"),
      chunkRows = 40, zarrVersion = 3, shardInnerRows = 7))
    intercept[IllegalArgumentException](Zarr.toZarr(dfw, tmp("sbad2.zarr"),
      chunkRows = 40, zarrVersion = 2, shardInnerRows = 8))
  }

  test("zarr v3 writer: gzip/zstd/blosc round trips; python cross-reads the gzip store") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("x", DoubleType, false),
      StructField("v", ArrayType(FloatType, false), false)))
    val n = 150
    val rows = (0 until n).map(i =>
      Row(i.toLong, i * 0.5 - 3.0, Seq(i * 1.0f, -i * 0.25f)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    for (codec <- Seq("gzip", "zstd", "blosc-zstd-bit")) {
      val store = tmp(s"v3-$codec.zarr")
      Zarr.toZarr(df, store, chunkRows = 37, codec = codec, zarrVersion = 3)
      val back = Readers.open(spark, store).orderBy("id").collect()
      assert(back.length == n, codec)
      assert(back(7).getAs[Double]("x") == 7 * 0.5 - 3.0, codec)
      assert(back(9).getSeq[Float](back(9).fieldIndex("v")) ==
        Seq(9.0f, -2.25f), codec)
    }
    // zstd is v3-only in the writer; zlib v2-only
    intercept[IllegalArgumentException](
      Zarr.toZarr(df, tmp("bad1.zarr"), codec = "zstd"))
    intercept[IllegalArgumentException](
      Zarr.toZarr(df, tmp("bad2.zarr"), codec = "zlib", zarrVersion = 3))
    // distributed v3 write, re-read by the INDEPENDENT python decoder
    val store = tmp("v3dist.zarr")
    Zarr.toZarrDistributed(df, store, chunkRows = 37, codec = "gzip",
      zarrVersion = 3)
    assert(Readers.open(spark, store).agg(sum("id")).head.getLong(0) ==
      n.toLong * (n - 1) / 2)
    import scala.sys.process._
    val py =
      s"""import sys; sys.path.insert(0, 'tools')
         |import zarrgen
         |out = zarrgen.verify_v3('$store')
         |assert out['id'].sum() == ${n.toLong * (n - 1) / 2}, out['id'].sum()
         |assert abs(float(out['x'][7]) - ${7 * 0.5 - 3.0}) < 1e-12
         |assert out['v'].shape == ($n, 2) and float(out['v'][9][1]) == -2.25
         |print('PY_OK')""".stripMargin
    val res2 = Seq("python3", "-c", py).!!
    assert(res2.contains("PY_OK"), res2)
  }

  test("BITshuffle chunks decode: i8, 2-D f4, non-multiple-of-8 leftovers") {
    // fixtures from the INDEPENDENT numpy unpackbits/packbits producer
    // (tools/zarrgen.py bitshuffle_block) — 43 elements per array so
    // every chunk tail exercises the leftover-bytes-verbatim rule
    val df = Zarr.fromZarr(spark, res("bitshuf.zarr"), numPartitions = 2)
    val rows = df.orderBy("vec_id").collect()
    assert(rows.length == 43)
    (0 until 43).foreach { i =>
      val r = rows(i)
      assert(r.getAs[Long]("vec_id") == i * 11L - 5)
      val e = r.getSeq[Float](r.fieldIndex("emb"))
      assert(e == (0 until 3).map(j => ((i * 3 + j) % 7) * 0.25f - 1.0f),
        s"row $i")
    }
  }

  test("BITshuffle writer: -bit codecs round trip; blosc-zlib-bit verified by python") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("x", DoubleType, false),
      StructField("v", ArrayType(FloatType, false), false)))
    val n = 200
    val rows = (0 until n).map(i =>
      Row(i.toLong, i * 0.5 - 3.0, Seq(i * 1.0f, -i * 0.25f)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    for (codec <- Seq("blosc-lz4-bit", "blosc-zstd-bit")) {
      val store = tmp(s"$codec.zarr")
      Zarr.toZarr(df, store, chunkRows = 37, codec = codec)
      val back = Readers.open(spark, store).orderBy("id").collect()
      assert(back.length == n, codec)
      assert(back(7).getAs[Double]("x") == 7 * 0.5 - 3.0, codec)
      assert(back(9).getSeq[Float](back(9).fieldIndex("v")) ==
        Seq(9.0f, -2.25f), codec)
    }
    // blosc-zlib-bit re-read by the INDEPENDENT python decoder
    // (zarrgen.bitunshuffle_block inside blosc_zlib_decode) — pins the
    // Scala FORWARD kernel against a separately-written inverse
    val store = tmp("bzlibbit.zarr")
    Zarr.toZarrDistributed(df, store, chunkRows = 37, codec = "blosc-zlib-bit")
    assert(Readers.open(spark, store).agg(sum("id")).head.getLong(0) ==
      n.toLong * (n - 1) / 2)
    import scala.sys.process._
    val py =
      s"""import sys; sys.path.insert(0, 'tools')
         |import zarrgen
         |out = zarrgen.verify('$store')
         |assert out['id'].sum() == ${n.toLong * (n - 1) / 2}, out['id'].sum()
         |assert abs(float(out['x'][7]) - ${7 * 0.5 - 3.0}) < 1e-12
         |assert out['v'].shape == ($n, 2) and float(out['v'][9][1]) == -2.25
         |print('PY_OK')""".stripMargin
    val res2 = Seq("python3", "-c", py).!!
    assert(res2.contains("PY_OK"), res2)
  }

  test("blosc chunks decode: shuffle, no-shuffle, 2-D, multi-block, memcpy form") {
    // fixtures from the INDEPENDENT stdlib producer (tools/zarrgen.py
    // blosc_zlib_chunk — hand-built header/offsets/shuffle, zlib codec)
    val df = Zarr.fromZarr(spark, res("bloscz.zarr"), numPartitions = 3)
    assert(df.schema.fieldNames.toSeq == Seq("emb", "mc", "plain", "vec_id"))
    val rows = df.orderBy("vec_id").collect()
    assert(rows.length == 50)
    (0 until 50).foreach { i =>
      val r = rows(i)
      assert(r.getAs[Long]("vec_id") == i * 7L - 3) // shuffled i8
      assert(r.getAs[Double]("plain") == i * 0.125) // no-shuffle f8
      assert(r.getAs[Int]("mc") == i) // memcpy-form chunk, row-aligned
      val e = r.getSeq[Float](r.fieldIndex("emb")) // shuffled 2-D f4
      assert(e == (0 until 5).map(j => ((i * 5 + j) % 13) * 0.5f - 2.0f), s"row $i")
    }
    // forced-memcpy chunk (incompressible form): raw unshuffled bytes
    val mc = Zarr.fromZarr(spark, res("bloscz.zarr/mc"))
    assert(mc.collect().map(_.getInt(0)).sorted.toSeq == (0 until 50))
  }

  test("blosc writer: lz4/zstd round trips; blosc-zlib verified by independent python") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("x", DoubleType, false),
      StructField("v", ArrayType(FloatType, false), false)))
    val n = 200
    val rows = (0 until n).map(i =>
      Row(i.toLong, i * 0.5 - 3.0, Seq(i * 1.0f, -i * 0.25f)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    for (codec <- Seq("blosc-lz4", "blosc-zstd")) {
      val store = tmp(s"$codec.zarr")
      Zarr.toZarr(df, store, chunkRows = 37, codec = codec)
      val back = Readers.open(spark, store).orderBy("id").collect()
      assert(back.length == n, codec)
      assert(back(7).getAs[Double]("x") == 7 * 0.5 - 3.0, codec)
      assert(back(9).getSeq[Float](back(9).fieldIndex("v")) ==
        Seq(9.0f, -2.25f), codec)
    }
    // blosc-zlib through the DISTRIBUTED writer, re-read by the
    // independent stdlib decoder (zarrgen.blosc_zlib_decode)
    val store = tmp("bzlib.zarr")
    Zarr.toZarrDistributed(df, store, chunkRows = 37, codec = "blosc-zlib")
    assert(Readers.open(spark, store).agg(sum("id")).head.getLong(0) ==
      n.toLong * (n - 1) / 2)
    import scala.sys.process._
    val py =
      s"""import sys; sys.path.insert(0, 'tools')
         |import zarrgen
         |out = zarrgen.verify('$store')
         |assert out['id'].sum() == ${n.toLong * (n - 1) / 2}, out['id'].sum()
         |assert abs(float(out['x'][7]) - ${7 * 0.5 - 3.0}) < 1e-12
         |assert out['v'].shape == ($n, 2) and float(out['v'][9][1]) == -2.25
         |print('PY_OK')""".stripMargin
    val res2 = Seq("python3", "-c", py).!!
    assert(res2.contains("PY_OK"), res2)
  }

  test("writer round trip + independent python (numpy+zlib) re-read") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("x", DoubleType, false),
      StructField("v", ArrayType(FloatType, false), false),
      StructField("b", BooleanType, false),
      StructField("s", ShortType, false)))
    val n = 100
    val rows = (0 until n).map(i => Row(i.toLong, i * 0.5 - 3.0,
      Seq(i * 1.0f, -i * 0.25f, 2.5f), i % 4 == 0, (i - 50).toShort))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val store = tmp("out.zarr")
    Zarr.toZarr(df, store, chunkRows = 33) // non-divisible: edge padding
    // our own reader round-trips
    val back = Readers.open(spark, store).orderBy("id").collect()
    assert(back.length == n)
    assert(back(7).getAs[Double]("x") == 7 * 0.5 - 3.0)
    assert(back(7).getSeq[Float](back(7).fieldIndex("v")) == Seq(7.0f, -1.75f, 2.5f))
    assert(back(8).getAs[Boolean]("b") && back(3).getAs[Short]("s") == -47)
    // independent python re-read (no graft code): sums + spot values
    import scala.sys.process._
    val py =
      s"""import sys, json; sys.path.insert(0, 'tools')
         |import zarrgen
         |out = zarrgen.verify('$store')
         |assert sorted(out) == ['b', 'id', 's', 'v', 'x'], sorted(out)
         |assert out['id'].sum() == ${n.toLong * (n - 1) / 2}, out['id'].sum()
         |assert abs(float(out['x'][7]) - ${7 * 0.5 - 3.0}) < 1e-12
         |assert out['v'].shape == ($n, 3) and float(out['v'][7][1]) == -1.75
         |assert bool(out['b'][8]) and int(out['s'][3]) == -47
         |assert int(out['b'].sum()) == ${(0 until n).count(_ % 4 == 0)}
         |print('PY_OK')""".stripMargin
    val res2 = Seq("python3", "-c", py).!!
    assert(res2.contains("PY_OK"), res2)
    // raw (uncompressed) chunks round-trip too
    val store2 = tmp("raw.zarr")
    Zarr.toZarr(df.select("id"), store2, chunkRows = 64, compress = false)
    assert(Readers.open(spark, store2)
      .agg(sum("id")).collect().head.getLong(0) == n.toLong * (n - 1) / 2)
  }

  test("distributed write: executors own disjoint chunks; values == driver write") {
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") % 13).cast("double").as("x"),
      array((col("id") % 7).cast("float"), lit(1.5f)).as("v"))
      .repartition(5)
    val d1 = tmp("drv.zarr")
    val d2 = tmp("dist.zarr")
    // same logical rows either way (zipWithIndex fixes an order; the
    // CONTENT equality below is order-insensitive)
    Zarr.toZarr(df, d1, chunkRows = 128)
    val nChunks = Zarr.toZarrDistributed(df, d2, chunkRows = 128)
    assert(nChunks == 8) // ceil(1000/128)
    // group columns come back sorted by array name (id, v, x)
    def slurp(p: String) = Readers.open(spark, p)
      .select("id", "x", "v").collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2))).toSet
    val (a, b) = (slurp(d1), slurp(d2))
    assert(a == b && a.size == 1000)
    // the independent python re-reader accepts the distributed store
    import scala.sys.process._
    val py =
      s"""import sys; sys.path.insert(0, 'tools')
         |import zarrgen
         |out = zarrgen.verify('$d2')
         |assert out['id'].sum() == ${999L * 1000 / 2}
         |assert out['v'].shape == (1000, 2)
         |print('PY_OK')""".stripMargin
    assert(Seq("python3", "-c", py).!!.contains("PY_OK"))
    // chunk files: full grid, no stragglers
    assert((0 until 8).forall(i =>
      new java.io.File(s"$d2/id/$i").exists() &&
        new java.io.File(s"$d2/v/$i.0").exists()))
    assert(!new java.io.File(s"$d2/id/8").exists())
  }

  test("consolidated .zmetadata: one metadata read serves the whole group") {
    val df = spark.range(0, 50).select(col("id"),
      (col("id") % 3).cast("double").as("x"))
    val store = tmp("cons.zarr")
    Zarr.toZarr(df, store, chunkRows = 16)
    assert(new java.io.File(s"$store/.zmetadata").exists())
    // PROVE the consolidated path serves reads: remove every
    // per-array .zarray — only .zmetadata can describe the store now
    Seq("id", "x").foreach { c =>
      assert(new java.io.File(s"$store/$c/.zarray").delete())
    }
    val back = Readers.open(spark, store)
    assert(back.schema.fieldNames.toSeq == Seq("id", "x"))
    assert(back.agg(sum("id")).collect().head.getLong(0) == 49L * 50 / 2)
    // column selection through the consolidated map
    assert(Zarr.fromZarr(spark, store, columns = Seq("x")).count() == 50)
  }

  test("v2 filter pipelines: delta + fixedscaleoffset decode (python-pinned)") {
    // fixtures from the INDEPENDENT producer (zarrgen
    // write_array_v2_filtered: numpy diff/around + zlib) — 37
    // elements / chunk 10 exercises per-chunk filter state restarts
    // (each chunk's delta chain starts over) and edge padding
    val df = Zarr.fromZarr(spark, res("filters.zarr"))
    assert(df.schema.fieldNames.toSeq == Seq("fd", "fso", "key"))
    assert(df.schema("key").dataType == LongType)   // <i8, deltas <i4
    assert(df.schema("fso").dataType == DoubleType)
    assert(df.schema("fd").dataType == FloatType)
    val rows = df.orderBy("key").collect()
    assert(rows.length == 37)
    (0 until 37).foreach { i =>
      val r = rows(i)
      assert(r.getAs[Long]("key") == i * 5L - 40)
      // fso stored as round((x-1000)*10) in u1; x on a 0.5 grid is exact
      assert(r.getAs[Double]("fso") == i * 0.5 + 1000.0, s"row $i")
      // f4 delta: cumsum of (j*0.25 - 2) accumulated in float32
      var acc = 0.0f
      (0 to i).foreach(j => acc += j * 0.25f - 2.0f)
      assert(r.getAs[Float]("fd") == acc, s"row $i")
    }
    // an unsupported filter id stays loud, never a silent misread
    val e = intercept[IllegalArgumentException](
      Zarr.fromZarr(spark, res("filterbad.zarr")).collect())
    assert(e.getMessage.contains("quantize"))
  }

  test("Export dispatch by the x.zarr naming convention; validation") {
    val out = tmp("disp.zarr")
    Export.export(spark.range(10).select(col("id")), out)
    assert(Readers.open(spark, out).count() == 10)
    // nulls rejected
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(null)), 1),
      StructType(Seq(StructField("x", LongType, true))))
    assert(intercept[Exception] {
      Zarr.toZarr(withNull, tmp("null.zarr"))
    }.getMessage.contains("null"))
    // strings rejected up front
    val s = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a")), 1),
      StructType(Seq(StructField("t", StringType, false))))
    assert(intercept[IllegalArgumentException] {
      Zarr.toZarr(s, tmp("s.zarr"))
    }.getMessage.contains("unsupported type"))
    // not-a-store
    val e = intercept[IllegalArgumentException] {
      Zarr.fromZarr(spark, tmp("missing.zarr"))
    }
    assert(e.getMessage.contains("not a zarr store"))
  }
}
