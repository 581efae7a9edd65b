package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.Fits

/** FITS BINTABLE reader/writer: round-trips, byte-level conformance
  * against the public FITS 4.0 standard, null sentinels, and the
  * distributed fixed-width range read. */
class FitsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("fitsspec").resolve(name).toString

  test("numeric + string + boolean round-trip preserves values and schema") {
    val path = tmp("basic.fits")
    val df = spark.range(5000).select(
      col("id").as("k"),
      col("id").cast("int").as("i"),
      (col("id") * 1.5).as("x"),
      (col("id") % 100).cast("float").as("f"),
      concat(lit("nm_"), col("id")).as("s"),
      (col("id") % 2 === 0).as("b"))
    Fits.toFits(df, path)
    val back = Fits.fromFits(spark, path)
    assert(back.schema.fieldNames.toSeq == Seq("k", "i", "x", "f", "s", "b"))
    assert(back.count() == 5000)
    val got = back.orderBy("k").collect()
    assert(got(7) == Row(7L, 7, 10.5, 7.0f, "nm_7", false))
    assert(got(4999) == Row(4999L, 4999, 7498.5, 99.0f, "nm_4999", false))
    assert(back.agg(sum("x")).head.getDouble(0) == df.agg(sum("x")).head.getDouble(0))
  }

  test("nulls round-trip via TNULL sentinels, NaN floats and NUL strings") {
    val path = tmp("nulls.fits")
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 1.5, "a"), (null, 2.5, null), (3L, null, ""), (4L, 4.5, "dd"))
      .toDF("k", "v", "s")
    Fits.toFits(df, path)
    val back = Fits.fromFits(spark, path).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(back == Set(
      (Some(1L), Some(1.5), Some("a")),
      (None, Some(2.5), None),
      (Some(3L), None, Some("")),   // empty string distinct from null
      (Some(4L), Some(4.5), Some("dd"))))
  }

  test("file conforms to the FITS byte layout (independent check)") {
    val path = tmp("fmt.fits")
    Fits.toFits(spark.range(10).select(col("id").as("a")), path)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(bytes.length % 2880 == 0)                       // block aligned
    val s = new String(bytes.take(2880), "US-ASCII")
    assert(s.startsWith("SIMPLE  ="))                      // primary HDU first card
    val ext = new String(bytes.slice(2880, 5760), "US-ASCII")
    assert(ext.startsWith("XTENSION="))
    assert(ext.contains("BINTABLE") && ext.contains("TFORM1"))
    // NAXIS1 = 8 bytes (one K column), NAXIS2 = 10 rows
    assert(ext.contains("NAXIS1") && ext.contains("NAXIS2"))
  }

  test("partitioned read agrees with single-partition; open() dispatches") {
    val path = tmp("part.fits")
    val df = spark.range(60000).select(col("id").as("k"), (col("id") * 2.0).as("x"))
    Fits.toFits(df, path)
    val p1 = Fits.fromFits(spark, path, Nil, numPartitions = 1)
    val p8 = Fits.fromFits(spark, path, Nil, numPartitions = 8)
    assert(p8.rdd.getNumPartitions == 8)
    assert(p8.agg(sum("x"), sum("k")).head == p1.agg(sum("x"), sum("k")).head)
    // column pruning arg + open() extension dispatch
    val pruned = Fits.fromFits(spark, path, columns = Seq("x"))
    assert(pruned.schema.fieldNames.toSeq == Seq("x"))
    assert(graft.sources.Readers.open(spark, path).count() == 60000)
  }

  test("extension with PCOUNT heap before the BINTABLE is skipped correctly") {
    // FITS 4.0 §7.1: extension data size = |BITPIX|/8 * GCOUNT *
    // (PCOUNT + prod NAXISi). Splice an IMAGE HDU whose heap (PCOUNT)
    // dominates its size between the primary HDU and the table — a
    // walk that ignores PCOUNT lands one block short and never finds
    // the BINTABLE.
    val base = tmp("pcount.fits")
    val df = spark.range(100).select(col("id").as("k"), (col("id") * 2.0).as("x"))
    Fits.toFits(df, base)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(base))
    def card80(k: String, v: String) = (k.padTo(8, ' ') + "= " + v).padTo(80, ' ')
    val hdr = (card80("XTENSION", "'IMAGE   '") + card80("BITPIX", "8") +
      card80("NAXIS", "1") + card80("NAXIS1", "10") + card80("PCOUNT", "5750") +
      card80("GCOUNT", "1") + "END".padTo(80, ' ')).padTo(2880, ' ')
      .getBytes("US-ASCII")
    val heapData = new Array[Byte](5760) // 1*1*(5750+10), block aligned
    val spliced = bytes.take(2880) ++ hdr ++ heapData ++ bytes.drop(2880)
    val path2 = tmp("pcount2.fits")
    Files.write(java.nio.file.Paths.get(path2), spliced)
    val back = Fits.fromFits(spark, path2)
    assert(back.count() == 100)
    assert(back.agg(sum("x")).head.getDouble(0) ==
      df.agg(sum("x")).head.getDouble(0))
  }

  test("variable-length TFORM descriptor fails with a clear error") {
    val base = tmp("tform.fits")
    Fits.toFits(spark.range(10).select(col("id").as("a")), base)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(base))
    val s = new String(bytes, "US-ASCII")
    val at = s.indexOf("'1K      '", s.indexOf("TFORM1"))
    assert(at > 0)
    val repl = "'1PB(5)  '".getBytes("US-ASCII")
    System.arraycopy(repl, 0, bytes, at, repl.length)
    val path2 = tmp("tform2.fits")
    Files.write(java.nio.file.Paths.get(path2), bytes)
    val e = intercept[IllegalArgumentException](Fits.readTable(path2))
    assert(e.getMessage.contains("unsupported TFORM"), e.getMessage)
  }

  test("non-FITS input fails with a clear error") {
    val e = intercept[IllegalArgumentException](
      Fits.readTable("/root/testdata/sf0.001/nation.parquet"))
    assert(e.getMessage.contains("not a FITS file"))
  }

  test("vector columns (TFORM repeat counts) round-trip as array columns") {
    // astropy's vector-column shape: rE / rK next to scalars
    val spark2 = spark
    import spark2.implicits._
    val df = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(j => i * 0.5f + j), Array.tabulate(3)(j => i * 100L + j))
    }.toDF("id", "emb", "ticks")
    val path = tmp("vector.fits")
    Fits.toFits(df, path)
    val meta = Fits.readTable(path)
    assert(meta.columns.map(c => (c.name, c.form, c.width)) ==
      Seq(("id", 'K', 1), ("emb", 'E', 8), ("ticks", 'K', 3)))
    val back = Fits.fromFits(spark, path).orderBy("id").collect()
    assert(back.length == 50)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i.toLong)
      assert(r.getSeq[Float](1).toSeq == Seq.tabulate(8)(j => i * 0.5f + j), s"emb $i")
      assert(r.getSeq[Long](2).toSeq == Seq.tabulate(3)(j => i * 100L + j), s"ticks $i")
    }
    // ragged input must fail loudly, not write a corrupt table
    val ragged = Seq((1L, Array(1.0f)), (2L, Array(1.0f, 2.0f))).toDF("id", "v")
    val e = intercept[Exception](Fits.toFits(ragged, tmp("ragged.fits")))
    assert(e.getMessage.contains("fixed length"), e.getMessage)
  }

  test("sharded export: executor-parallel part files, glob read-back") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fitsshard").resolve("out").toString
    val df = spark.range(20000).repartition(5).select(col("id"),
      when(col("id") % 23 === 0, lit(null)).otherwise(col("id") * 0.5).as("x"),
      concat(lit("nm"), col("id") % 100).as("s"),
      array(col("id").cast("float"), lit(1.5f), lit(-2.0f)).as("v"))
    val n = Fits.toFitsSharded(df, dir)
    assert(n == 5)
    val back = sources.Readers.open(spark, s"$dir/part-*.fits")
    assert(back.count() == 20000)
    assert(back.select("id").distinct().count() == 20000)
    assert(back.agg(sum("x")).head.getDouble(0) == df.agg(sum("x")).head.getDouble(0))
    assert(back.where(col("x").isNull).count() == df.where(col("x").isNull).count())
    assert(back.where(col("id") === 777L).head.getAs[String]("s") == "nm77")
    // stale shards cleared on a narrower re-export
    Fits.toFitsSharded(df.limit(300).repartition(2), dir)
    assert(sources.Readers.open(spark, s"$dir/part-*.fits").count() == 300)
  }

  test("corrupt-byte fuzzing: parser throws promptly, never hangs") {
    // same protocol as the HDF5 fuzz: mutate a real file's bytes,
    // header region biased; every parse must either succeed or raise
    // a prompt exception — no hangs, no unbounded allocation
    val url = getClass.getResource("/fits/scaled.fits")
    val base = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(url.getPath))
    val dir = java.nio.file.Files.createTempDirectory("fitsfuzz")
    val mut = dir.resolve("mut.fits")
    val rnd = new scala.util.Random(42)
    var parsed = 0
    val t0 = System.nanoTime()
    for (_ <- 1 to 200) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val pos = if (rnd.nextBoolean()) rnd.nextInt(math.min(5760, m.length))
          else rnd.nextInt(m.length)
        m(pos) = rnd.nextInt(256).toByte
      }
      java.nio.file.Files.write(mut, m)
      try { Fits.readTable(mut.toString); parsed += 1 }
      catch { case _: Exception => () }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"fits fuzz took ${secs}s")
    assert(parsed > 0) // data-region mutations parse fine
  }

  test("TSCAL/TZERO scaled columns: unsigned conventions + calibration") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // independent fixture (tools/fits_scaled_fixture.py, built from
    // the FITS 4.0 spec - astropy's uint32/uint64 conventions +
    // a float calibration)
    val url = getClass.getResource("/fits/scaled.fits")
    assert(url != null, "missing fixture scaled.fits")
    val df = Fits.fromFits(spark, url.getPath)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("u32") == LongType)
    assert(types("u64") == DecimalType(20, 0))
    assert(types("calib") == DoubleType && types("plain") == DoubleType)
    val rows = df.collect()
    val byPlain = rows.map(r => r.getDouble(3) -> r).toMap
    assert(byPlain(1.5).getLong(0) == 0L)
    assert(byPlain(-2.5).getLong(0) == 3000000000L) // > Int.MaxValue
    assert(byPlain(0.0).getLong(0) == 4294967295L)  // uint32 max
    assert(byPlain(1.5).getDecimal(1).longValueExact == 0L)
    assert(byPlain(-2.5).getDecimal(1) ==
      new java.math.BigDecimal("18446744073709551615")) // uint64 max
    assert(byPlain(0.0).getDecimal(1).longValueExact == 42L)
    assert(byPlain(1.5).getDouble(2) == 100.0)   // raw 0    * 0.25 + 100
    assert(byPlain(-2.5).getDouble(2) == 125.25) // raw 101  * 0.25 + 100
    assert(byPlain(0.0).getDouble(2) == 74.75)   // raw -101 * 0.25 + 100
    // K with TZERO 2^31 is a LEGAL signed calibration -> double (the
    // uint32 convention is J-only; a form-blind dispatch would box a
    // Long here and crash the encoder)
    assert(types("kcal") == DoubleType)
    assert(byPlain(1.5).getDouble(4) == 2147483648.0)      // raw 0
    assert(byPlain(-2.5).getDouble(4) == 2147483646.0)     // raw -2
    assert(byPlain(0.0).getDouble(4) == 2147484648.0)      // raw 1000
    // Fortran D-exponent TSCAL/TZERO cards parse (1.0D-2, 5.0D0)
    assert(types("dexp") == DoubleType)
    assert(byPlain(1.5).getDouble(5) == 5.0)     // raw 0    * 0.01 + 5
    assert(byPlain(-2.5).getDouble(5) == 7.5)    // raw 250  * 0.01 + 5
    assert(byPlain(0.0).getDouble(5) == 2.5)     // raw -250 * 0.01 + 5

    // write direction: uint32 + binary-exact calibrated doubles
    // round-trip through our writer and reader
    val out = tmp("scaled_out.fits")
    val src = spark.range(1000).select(
      (col("id") * 4294967L).as("u"),             // spans past Int.MaxValue
      (col("id").cast("double") * 0.25 + 7.5).as("x"),
      col("id").as("k"))
    Fits.toFits(src, out, scales = Map(
      "u" -> ((1.0, 2147483648.0)), "x" -> ((0.25, 7.5))))
    val back = Fits.fromFits(spark, out)
    assert(back.schema("u").dataType == LongType)
    assert(back.schema("x").dataType == DoubleType)
    assert(back.orderBy("k").collect().toSeq == src.orderBy("k").collect().toSeq)
    // nulls in a scaled integer column fail loudly
    val withNull = spark.range(3).select(
      when(col("id") === 1, lit(null)).otherwise(col("id")).as("u"))
    val err = intercept[Exception](Fits.toFits(withNull, tmp("nullu.fits"),
      scales = Map("u" -> ((1.0, 2147483648.0)))))
    assert(err.getMessage.contains("no TNULL escape"), err.getMessage)
  }
}
