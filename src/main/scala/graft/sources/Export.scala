package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Export surface (reference: core/dataframe.py:6731 export dispatch).
  *
  * Formats: parquet (native store), csv, json — each a distributed
  * `df.write`, no driver materialization — plus the single-file
  * interchange writers: hdf5 (the reference's native format, incl.
  * the distributed sharded variant), arrow/feather (+ stream
  * framing), fits, and whitespace ascii.
  */
object Export {

  /** `export(path)` by extension, mirroring vaex.open's dispatch-by-
    * extension idiom (reference: core/__init__.py:111). */
  def export(df: DataFrame, path: String): Unit = path match {
    case p if p.endsWith(".parquet") => parquet(df, p)
    case p if p.endsWith(".orc") => orc(df, p)
    case p if p.endsWith(".csv") => csv(df, p)
    case p if p.endsWith(".json") => json(df, p)
    case p if p.endsWith(".arrow") || p.endsWith(".feather") => ArrowIpc.write(df, p)
    case p if p.endsWith(".arrows") => ArrowIpc.writeStream(df, p)
    case p if p.endsWith(".hdf5") || p.endsWith(".h5") => Hdf5.toHdf5(df, p)
    case p if p.endsWith(".fits") => Fits.toFits(df, p)
    case p if p.endsWith(".avro") => Avro.toAvro(df, p)
    case p if p.endsWith(".warc.gz") => Warc.toWarc(df, p, gzip = true)
    case p if p.endsWith(".warc") => Warc.toWarc(df, p, gzip = false)
    case p if p.endsWith(".npy") => Npy.toNpy(df, p)
    case p if p.endsWith(".npz") => Npy.toNpz(df, p)
    case p if p.endsWith(".safetensors") => Safetensors.toSafetensors(df, p)
    case p if p.endsWith(".tfrecord") || p.endsWith(".tfrecords") =>
      Tfrecord.toTfRecord(df, p)
    case p if p.endsWith(".tar") => WebDataset.toWebDataset(df, p)
    case p if p.stripSuffix("/").endsWith(".zarr") =>
      Zarr.toZarr(df, p.stripSuffix("/"))
    case p if p.stripSuffix("/").endsWith(".delta") =>
      DeltaLake.toDelta(df, p) // logical overwrite; old versions travelable
    case p if p.endsWith(".jsonl.zst") || p.endsWith(".json.zst") =>
      ZstdLines.toZstJsonl(df, p)
    case p if p.stripSuffix("/").endsWith(".iceberg") =>
      Iceberg.toIceberg(df, p)
    case p if p.endsWith(".txt") || p.endsWith(".asc") => toAscii(df, p)
    case p => throw new IllegalArgumentException(s"unsupported export format: $p")
  }

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** ORC (beyond the reference — Spark-native columnar alternative;
    * footer stats give the same file-skipping story as parquet). */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Single-FILE csv (the reference's `export_csv`,
    * core/dataframe.py:6789 — one file, not a Spark directory):
    * driver-streamed rows with RFC 4180 quoting (fields containing
    * the separator, quotes or newlines are quoted; embedded quotes
    * double). Nulls write as empty fields; doubles use shortest
    * round-trip formatting so a schema-given re-read is lossless. */
  def toCsvFile(df: DataFrame, path: String, header: Boolean = true,
                sep: String = ","): Unit = {
    require(sep.length == 1, "sep must be one character")
    df.schema.fields.foreach { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType
             | _: org.apache.spark.sql.types.StructType
             | _: org.apache.spark.sql.types.MapType
             | org.apache.spark.sql.types.BinaryType =>
          throw new IllegalArgumentException(
            s"toCsvFile: non-atomic column ${f.name} (${f.dataType}) has no " +
              "CSV representation — to_json it first or use parquet/arrow")
        case _ => ()
      }
    }
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      FsIO.create(path), "UTF-8"))
    try {
      // temporal values format explicitly with forced seconds:
      // LocalDateTime.toString omits ":00" seconds ("2026-01-01T10:00"),
      // which Spark's default timestamp_ntz CSV parser rejects — the
      // "schema-given re-read is lossless" contract would break for
      // any on-the-minute timestamp
      def fmtTs(t: java.time.LocalDateTime): String = {
        val base = f"${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d" +
          f"T${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
        val micros = t.getNano / 1000
        if (micros == 0) base else base + f".$micros%06d"
      }
      // only LocalDateTime (timestamp_ntz) needs help: its toString
      // drops ":00" seconds. Instant.toString is full ISO-8601 with
      // the Z marker and java.sql.Timestamp.toString always carries
      // seconds — both already re-parse exactly; reformatting the
      // Instant as zone-less wall time would SHIFT values by the
      // session offset on re-read.
      def render(v: Any): String = v match {
        case t: java.time.LocalDateTime => fmtTs(t)
        case other => String.valueOf(other)
      }
      def quote(s: String): String =
        if (s.exists(c => c == sep.head || c == '"' || c == '\n' || c == '\r'))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
      if (header) { w.write(df.columns.map(quote).mkString(sep)); w.newLine() }
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        w.write((0 until r.length).map { i =>
          if (r.isNullAt(i)) "" else quote(render(r.get(i)))
        }.mkString(sep))
        w.newLine()
      }
    } finally w.close()
  }

  /** Single-FILE JSON lines (the reference's `export_json`): Spark's
    * own row-to-JSON encoder (`df.toJSON`) streamed to one file —
    * nested structs/arrays serialize correctly for free. */
  def toJsonFile(df: DataFrame, path: String): Unit = {
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      FsIO.create(path), "UTF-8"))
    try {
      val it = df.toJSON.toLocalIterator()
      while (it.hasNext) { w.write(it.next()); w.newLine() }
    } finally w.close()
  }

  /** Hive-layout partitioned export `key=value/` (reference:
    * core/dataframe.py:6843 export_partitioned with
    * directory_format='{key}={value}' — exactly Spark's partitionBy). */
  def exportPartitioned(df: DataFrame, path: String, by: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(by: _*).parquet(path)

  /** Bucketed export — the 100 TB co-location story (SURVEY §4.2):
    * pre-shuffle a table ONCE at write time so every later equi-join or
    * aggregation on the bucket keys plans with zero Exchange. Spark
    * persists bucketing metadata only through the catalog, so this
    * writes an EXTERNAL table: files at `path`, metadata registered as
    * `table` in the session catalog (no Hive required; re-register
    * after a session restart by calling this again or via CREATE TABLE
    * ... USING parquet CLUSTERED BY). `sortCols` additionally sorts
    * within each bucket file, letting sort-merge joins skip the sort.
    * The reference has no analog — its single-node mmap model never
    * shuffles; on a cluster this is the difference between moving
    * 100 TB per join and moving it once. */
  def exportBucketed(df: DataFrame, table: String, path: String,
                     bucketCols: Seq[String], nBuckets: Int,
                     sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(nBuckets > 0, "nBuckets must be positive")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Sharded multi-file export (reference: core/dataframe.py:6894
    * export_many with a %03d-template — in Spark, file count =
    * partition count; names are part-<i> rather than a template). */
  def exportMany(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards).write.mode(SaveMode.Overwrite).parquet(path)

  /** ASCII (whitespace-separated, headered) export — the write half of
    * [[fromAscii]]'s round trip. Data rows stream from executors via
    * the text sink; the header goes into a tiny driver-side file named
    * to sort lexically BEFORE Spark's part-* files, because
    * `spark.read.text` concatenates files in name order and
    * [[fromAscii]] types columns off the first line.
    *
    * Nulls are written as the token `NaN` (numeric columns read back
    * as NaN; string columns read back as the literal) — `concat_ws`
    * SKIPS nulls, which would emit ragged lines that [[fromAscii]]
    * silently drops. String cells containing whitespace are not
    * representable in this format and raise inline (no extra pass)
    * rather than splitting into extra tokens. */
  def toAscii(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    val tokens = df.schema.fields.map { f =>
      val s = col(f.name).cast("string")
      val safe = f.dataType match {
        case org.apache.spark.sql.types.StringType =>
          when(s.rlike("\\s"), raise_error(concat(
            lit(s"toAscii: column ${f.name} contains whitespace, not " +
              "representable in a whitespace-separated file: '"),
            s, lit("'"))).cast("string")).otherwise(s)
        case _ => s
      }
      coalesce(safe, lit("NaN"))
    }
    df.select(concat_ws(" ", tokens.toSeq: _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    // header through the Hadoop FileSystem API so it lands on the SAME
    // filesystem the text sink just wrote to (a driver-local
    // java.nio write would silently miss when `path` resolves to a
    // non-local scheme)
    val hp = new org.apache.hadoop.fs.Path(path, "00000_header.txt")
    val fs = hp.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(hp, true)
    try out.write((df.columns.mkString(" ") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** from_ascii (reference: core/__init__.py:460, dataset_misc.py:203):
    * whitespace-separated text with a header line -> typed frame.
    * spark.read.text streams per-partition; the header is read once on
    * the driver. Columns are inferred double-or-string from the first
    * data row. */
  /** First `n` non-empty lines of an ascii path IN FILE-NAME ORDER,
    * read driver-side. `spark.read.text` plans splits by SIZE, so for
    * a directory the tiny header file can land anywhere in the row
    * order — header discovery must walk files lexically instead. */
  private def asciiHeadLines(spark: SparkSession, path: String, n: Int): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && {
          val nm = s.getPath.getName
          !nm.startsWith("_") && !nm.startsWith(".")
        }).sortBy(_.getPath.getName).toSeq.map(_.getPath)
      else Seq(p)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val it = files.iterator
    while (out.size < n && it.hasNext) {
      val src = scala.io.Source.fromInputStream(fs.open(it.next()), "UTF-8")
      try out ++= src.getLines().filter(_.trim.nonEmpty).take(n - out.size)
      finally src.close()
    }
    out.toSeq
  }

  def fromAscii(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val lines = spark.read.text(path)
    val head = asciiHeadLines(spark, path, 2)
    require(head.nonEmpty, s"empty ascii file: $path")
    val header = head(0).trim.split("\\s+")
    if (head.length < 2) // header-only file -> empty frame, all-string schema
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(header.map(
          org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.StringType, nullable = true))))
    val firstData = head(1).trim.split("\\s+")
    // token-array comparison drops the header under ANY whitespace
    // (string equality broke on irregular spacing); ragged lines are
    // dropped too rather than silently mis-aligned
    val parsed = lines
      .withColumn("__f", split(trim(col("value")), "\\s+"))
      .where(size(col("__f")) === header.length &&
        !(col("__f") === typedLit(header.toSeq)))
    val typed = header.zipWithIndex.map { case (name, i) =>
      val raw = element_at(col("__f"), i + 1)
      if (scala.util.Try(firstData(i).toDouble).isSuccess) raw.cast("double").as(name)
      else raw.as(name)
    }
    parsed.select(typed.toSeq: _*)
  }

  // ------------------------------------------------------ constructors

  /** from_arrays / from_items (reference: core/__init__.py:349/:326). */
  def fromColumns(spark: SparkSession, cols: (String, Seq[Any])*): DataFrame = {
    require(cols.nonEmpty && cols.map(_._2.length).distinct.size == 1,
      "columns must be non-empty and equal length")
    val names = cols.map(_._1)
    val rows = (0 until cols.head._2.length).map { i =>
      org.apache.spark.sql.Row.fromSeq(cols.map(_._2(i)))
    }
    val fields = cols.map { case (n, vs) =>
      val dt = vs.find(_ != null).getOrElse(null) match {
        case _: java.lang.Long | _: java.lang.Integer => org.apache.spark.sql.types.LongType
        case _: java.lang.Double | _: java.lang.Float => org.apache.spark.sql.types.DoubleType
        case _: String => org.apache.spark.sql.types.StringType
        case _: java.lang.Boolean => org.apache.spark.sql.types.BooleanType
        case _: java.sql.Timestamp => org.apache.spark.sql.types.TimestampType
        case other => throw new IllegalArgumentException(s"unsupported value: $other")
      }
      org.apache.spark.sql.types.StructField(n, dt, nullable = true)
    }
    val coerced = rows.map(r => org.apache.spark.sql.Row.fromSeq(
      r.toSeq.zip(fields).map {
        case (null, _) => null
        case (v: java.lang.Integer, f) if f.dataType == org.apache.spark.sql.types.LongType => v.toLong
        case (v: java.lang.Float, f) if f.dataType == org.apache.spark.sql.types.DoubleType => v.toDouble
        case (v, _) => v
      }))
    spark.createDataFrame(
      spark.sparkContext.parallelize(coerced),
      org.apache.spark.sql.types.StructType(fields))
  }

  /** vaex.example() analog (reference: core/__init__.py:659 — a subset
    * of the Helmi & de Zeeuw 2000 simulation: positions, velocities,
    * energy, angular momentum, metallicity). Fully GENERATED source:
    * deterministic seeded pseudo-randoms from xxhash64(id, k) drive a
    * Box-Muller transform — same schema, same statistical shape, zero
    * I/O, any size. */
  def example(spark: SparkSession, n: Long = 330000L): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    // uniform (0,1]: bucket the 64-bit hash into [1, 1e6] then scale
    def u(k: Int): Column =
      (pmod(xxhash64(col("id"), lit(k)), lit(1000000L)) + 1L).cast("double") / 1000000.0
    def gauss(k: Int): Column =
      sqrt(lit(-2.0) * log(u(2 * k))) * cos(lit(2.0 * math.Pi) * u(2 * k + 1))
    val base = spark.range(n).select(
      col("id"),
      (gauss(1) * 10.0).as("x"), (gauss(2) * 10.0).as("y"), (gauss(3) * 5.0).as("z"),
      (gauss(4) * 120.0).as("vx"), (gauss(5) * 120.0).as("vy"), (gauss(6) * 80.0).as("vz"),
      (u(100) * lit(2.5) - 3.0).as("FeH"))
    base.select(
      col("id"), col("x"), col("y"), col("z"), col("vx"), col("vy"), col("vz"),
      (lit(0.5) * (col("vx") * col("vx") + col("vy") * col("vy") + col("vz") * col("vz")) -
        lit(100000.0) / sqrt(col("x") * col("x") + col("y") * col("y") + col("z") * col("z") + 0.1))
        .as("E"),
      (col("x") * col("vy") - col("y") * col("vx")).as("Lz"),
      sqrt(
        pow(col("y") * col("vz") - col("z") * col("vy"), 2) +
        pow(col("z") * col("vx") - col("x") * col("vz"), 2) +
        pow(col("x") * col("vy") - col("y") * col("vx"), 2)).as("L"),
      col("FeH"))
  }

  /** vrange (reference: core/__init__.py:827): virtual arange — maps to
    * spark.range, a generated (not materialized) source. */
  def vrange(spark: SparkSession, start: Long, end: Long, step: Long = 1L): DataFrame =
    spark.range(start, end, step).toDF("x")

  /** vconstant (reference: core/__init__.py:838). */
  def vconstant(spark: SparkSession, value: Double, length: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    spark.range(length).select(lit(value).as("x"))
  }
}
