package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{ArrowIpc, Export, Fits, FsIO, Hdf5, Readers, RowSpill}

/** The Hadoop-FileSystem interchange layer: readers, writers and the
  * sharded exporters all route through [[FsIO]], so the same code
  * paths serve `file:`, `hdfs:` and `s3a:`. These specs drive every
  * format end-to-end through EXPLICIT `file:` Hadoop URIs (scheme
  * resolution, qualification, globbing), plus the bounded-memory
  * spill path the sharded exporters use on skewed partitions. */
class FsIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  private def mkDf(n: Int) = spark.range(n).repartition(4).select(
    col("id"),
    when(col("id") % 13 === 0, lit(null)).otherwise(col("id") * 0.5).as("x"),
    concat(lit("v"), col("id") % 50).as("s"))

  test("hdf5 sharded write + glob read through file: Hadoop URIs") {
    val dir = tmpDir("fsio_h5")
    val df = mkDf(20000)
    val n = Hdf5.toHdf5Sharded(df, s"file:$dir")
    assert(n == 4)
    val back = Readers.open(spark, s"file:$dir/part-*.hdf5")
    assert(back.count() == 20000)
    assert(back.agg(sum("x")).head.getDouble(0) == df.agg(sum("x")).head.getDouble(0))
  }

  test("fits sharded write + glob read through file: Hadoop URIs") {
    val dir = tmpDir("fsio_fits")
    val df = mkDf(10000)
    val n = Fits.toFitsSharded(df, s"file:$dir")
    assert(n == 4)
    val back = Readers.open(spark, s"file:$dir/part-*.fits")
    assert(back.count() == 10000)
    assert(back.agg(sum("x")).head.getDouble(0) == df.agg(sum("x")).head.getDouble(0))
  }

  test("arrow sharded write + glob read through file: Hadoop URIs") {
    val dir = tmpDir("fsio_arrow")
    val df = mkDf(10000)
    val n = ArrowIpc.writeSharded(df, s"file:$dir")
    assert(n == 4)
    val back = Readers.open(spark, s"file:$dir/part-*.arrow")
    assert(back.count() == 10000)
    assert(back.agg(sum("x")).head.getDouble(0) == df.agg(sum("x")).head.getDouble(0))
  }

  test("single-file hdf5/fits/arrow round-trip through file: URIs") {
    val base = Files.createTempDirectory("fsio_single").toString
    val df = mkDf(2000).coalesce(1)
    Hdf5.toHdf5(df, s"file:$base/t.hdf5")
    Fits.toFits(df, s"file:$base/t.fits")
    ArrowIpc.write(df, s"file:$base/t.arrow")
    for (f <- Seq("t.hdf5", "t.fits", "t.arrow")) {
      val back = Readers.open(spark, s"file:$base/$f")
      assert(back.count() == 2000, f)
      assert(back.agg(sum("x")).head.getDouble(0) ==
        df.agg(sum("x")).head.getDouble(0), f)
    }
    // no .crc sidecars: the raw local filesystem writes bytes only
    val names = new java.io.File(base).listFiles().map(_.getName).toSet
    assert(!names.exists(_.endsWith(".crc")), names.toString)
  }

  test("skewed partition streams through the executor-local spill (hdf5 + fits)") {
    // partition 0 carries ~everything — the shape that OOMed an
    // it.toArray buffer; the spill keeps heap at one row
    val df = spark.range(120000)
      .repartitionByRange(3, (col("id") > 118000).cast("int"))
      .select(col("id"), (col("id") % 1000).cast("double").as("x"),
        concat(lit("str"), col("id") % 7).as("s"),
        array((col("id") % 97).cast("double"), lit(0.25)).as("a"))
    val d1 = tmpDir("fsio_skew_h5")
    val d2 = tmpDir("fsio_skew_fits")
    Hdf5.toHdf5Sharded(df, d1)
    Fits.toFitsSharded(df, d2)
    for (g <- Seq(s"$d1/part-*.hdf5", s"$d2/part-*.fits")) {
      val back = Readers.open(spark, g)
      assert(back.count() == 120000, g)
      assert(back.agg(sum("x")).head.getDouble(0) ==
        df.agg(sum("x")).head.getDouble(0), g)
      assert(back.select(sum(element_at(col("a"), 1))).head.getDouble(0) ==
        df.select(sum(element_at(col("a"), 1))).head.getDouble(0), g)
    }
  }

  test("RowSpill round-trips every supported type, nulls and >64KB strings") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("y", ByteType),
      StructField("h", ShortType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("ai", ArrayType(IntegerType)),
      StructField("ad", ArrayType(DoubleType))))
    val big = "x" * 100000 // past the 64 KB writeUTF cap
    val rows = Seq(
      Row(true, 1.toByte, 2.toShort, 3, 4L, 5.5f, 6.5, "hi", Seq(1, 2), Seq(0.5)),
      Row(null, null, null, null, null, null, null, null, null, null),
      Row(false, Byte.MinValue, Short.MaxValue, Int.MinValue, Long.MaxValue,
        Float.NaN, Double.NegativeInfinity, big, Seq.empty[Int], Seq(1.25, 2.5)))
    val (f, n) = RowSpill.spill(schema, rows.iterator)
    try {
      assert(n == 3)
      val back = RowSpill.iterate(schema, f).toSeq
      assert(back.length == 3)
      assert(back(0) == rows(0))
      assert((0 until 10).forall(back(1).isNullAt))
      assert(back(2).getString(7) == big)
      assert(back(2).getLong(4) == Long.MaxValue)
      assert(back(2).getFloat(5).isNaN)
      assert(back(2).getSeq[Double](9) == Seq(1.25, 2.5))
      // second pass re-reads cleanly
      assert(RowSpill.iterate(schema, f).length == 3)
    } finally f.delete()
  }

  test("arrow export rejects unwritable list element types up front") {
    val df = spark.range(4).select(array(col("id") % 2 === 0).as("flags"))
    val path = tmpDir("fsio_badlist") + "/bad.arrow"
    val e = intercept[IllegalArgumentException](ArrowIpc.write(df, path))
    assert(e.getMessage.contains("list element"), e.getMessage)
    assert(!FsIO.exists(path), "partial file left on disk")
  }

  test("fits sharded export validates scales on the driver, before tasks") {
    val df = spark.range(4).select(col("id").cast("int").as("i"))
    val e = intercept[IllegalArgumentException](
      Fits.toFitsSharded(df, tmpDir("fsio_badscale"), scales = Map("i" -> (2.0, 0.0))))
    assert(e.getMessage.contains("unsupported on"), e.getMessage)
    // and the long convention check too
    val df2 = spark.range(4).select(col("id").as("l"))
    val e2 = intercept[IllegalArgumentException](
      Fits.toFitsSharded(df2, tmpDir("fsio_badscale2"), scales = Map("l" -> (2.0, 0.0))))
    assert(e2.getMessage.contains("uint32"), e2.getMessage)
  }

  test("toCsvFile writes on-the-minute timestamps a schema-given re-read parses") {
    val df = Seq(
      (1L, java.time.LocalDateTime.of(2026, 1, 1, 10, 0, 0)),
      (2L, java.time.LocalDateTime.of(2026, 1, 1, 10, 30, 15)),
      (3L, java.time.LocalDateTime.of(2026, 1, 1, 10, 30, 15, 123456000)))
      .toDF("id", "ts")
    val path = tmpDir("fsio_csvts") + "/t.csv"
    Export.toCsvFile(df, path)
    val back = spark.read.schema(df.schema).option("header", "true").csv(path)
    assert(back.where(col("ts").isNull).count() == 0,
      "timestamp failed to re-parse (PERMISSIVE null)")
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }
}
