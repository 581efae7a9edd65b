package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Reader surface — the input half of `vaex.open`
  * (reference: packages/vaex-core/vaex/__init__.py:111 extension
  * dispatch; from_csv :571, csv.py:134 lazy chunked CSV; from_json
  * :493). Spark's readers already stream per-partition (the lazy
  * chunked-CSV machinery maps to `spark.read.csv` splits), so the only
  * vaex idiom to reproduce is `convert=`: a write-through Parquet cache
  * so later opens hit the columnar store.
  */
object Readers {

  /** Extension-dispatched open with optional convert-to-parquet cache.
    * `convert=Some(cachePath)`: first call converts source -> parquet
    * (distributed write, storage-agnostic via the Hadoop FS API);
    * subsequent calls read the cache only. */
  def open(spark: SparkSession, path: String, convert: Option[String] = None): DataFrame = {
    def source: DataFrame = path match {
      // Spark-native readers glob internally; the custom single-file
      // formats (hdf5/fits/arrow) need explicit expansion + concat
      // (reference: core/__init__.py:111 open handles 'data_*.hdf5')
      case p if hasGlob(p) && (p.endsWith(".hdf5") || p.endsWith(".h5")
          || p.endsWith(".fits") || p.endsWith(".arrow") || p.endsWith(".feather")
          || p.endsWith(".avro") || p.endsWith(".warc") || p.endsWith(".warc.gz")
          || p.endsWith(".npy") || p.endsWith(".safetensors")) =>
        val files = expandGlob(spark, p)
        require(files.nonEmpty, s"open: glob matched no files: $p")
        openMany(spark, files)
      case p if p.endsWith(".parquet") => spark.read.parquet(p)
      case p if p.endsWith(".orc") => spark.read.orc(p)
      case p if p.endsWith(".csv") => fromCsv(spark, p)
      case p if p.endsWith(".json") || p.endsWith(".jsonl") => fromJson(spark, p)
      case p if p.endsWith(".txt") || p.endsWith(".asc") => Export.fromAscii(spark, p)
      case p if p.endsWith(".arrow") || p.endsWith(".feather") => ArrowIpc.read(spark, p)
      case p if p.endsWith(".arrows") => ArrowIpc.readStream(spark, p) // stream framing
      case p if p.endsWith(".hdf5") || p.endsWith(".h5") =>
        // DataSource V2 path: Catalyst pushes column pruning into the
        // scan (a later .select touches only those columns' byte ranges)
        spark.read.format("graft.sources.Hdf5DataSource").load(p)
      case p if p.endsWith(".fits") => Fits.fromFits(spark, p)
      case p if p.endsWith(".avro") => Avro.fromAvro(spark, p)
      case p if p.endsWith(".warc") || p.endsWith(".warc.gz") => Warc.fromWarc(spark, p)
      case p if p.endsWith(".npy") => Npy.fromNpy(spark, p)
      case p if p.endsWith(".npz") => Npy.fromNpz(spark, p)
      case p if p.endsWith(".safetensors") => Safetensors.fromSafetensors(spark, p)
      // glob or single file: these readers expand globs themselves
      // (one index/scan task per file — the file SET is the
      // parallelism unit for non-splittable containers)
      case p if p.endsWith(".tfrecord") || p.endsWith(".tfrecords") ||
          p.endsWith(".tfrecord.gz") || p.endsWith(".tfrecords.gz") =>
        Tfrecord.fromTfRecord(spark, p)
      case p if p.endsWith(".jsonl.zst") || p.endsWith(".json.zst") =>
        ZstdLines.fromZstJsonl(spark, p)
      case p if p.endsWith(".csv.zst") => ZstdLines.fromZstCsv(spark, p)
      case p if p.endsWith(".tar") => WebDataset.fromWebDataset(spark, p)
      // zarr stores are DIRECTORIES; the x.zarr naming convention
      // carries the dispatch extension
      case p if p.stripSuffix("/").endsWith(".zarr") =>
        Zarr.fromZarr(spark, p.stripSuffix("/"))
      // Delta tables are directories too: dispatch on the .delta
      // naming convention, or on the presence of a transaction log
      case p if p.stripSuffix("/").endsWith(".delta") =>
        DeltaLake.fromDelta(spark, p)
      case p if p.stripSuffix("/").endsWith(".iceberg") =>
        Iceberg.fromIceberg(spark, p)
      case p if FsIO.exists(s"${p.stripSuffix("/")}/_delta_log") =>
        DeltaLake.fromDelta(spark, p)
      case p if FsIO.exists(s"${p.stripSuffix("/")}/metadata/version-hint.text") =>
        Iceberg.fromIceberg(spark, p)
      case p => throw new IllegalArgumentException(s"unsupported source format: $p")
    }
    convert match {
      case Some(cache) =>
        val hp = new org.apache.hadoop.fs.Path(cache)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(hp)) source.write.parquet(cache)
        spark.read.parquet(cache)
      case None => source
    }
  }

  private def hasGlob(p: String): Boolean = p.exists("*?[{".contains(_))

  /** Glob-expand through the Hadoop FS API (storage-agnostic), sorted
    * for a deterministic concat order. */
  private def expandGlob(spark: SparkSession, pattern: String): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(pattern)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // keep the scheme+authority for remote filesystems; strip only
    // the local file: prefix (the single-file readers open local
    // paths with positioned java.io reads)
    Option(fs.globStatus(hp)).map(_.toSeq.map { st =>
      val u = st.getPath.toUri
      if (u.getScheme == null || u.getScheme == "file") u.getPath
      else st.getPath.toString
    }.sorted).getOrElse(Nil)
  }

  /** vaex.open_many (reference: core/__init__.py:214): open every path
    * and concatenate by column NAME with the flexible resolver —
    * columns missing from some shards read as null there, matching
    * the concat semantics of VxFrame.concat. Each shard's scan stays
    * distributed; union adds no shuffle. */
  def openMany(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "openMany: no paths")
    paths.map(p => open(spark, p))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** from_csv (reference: core/__init__.py:571; DatasetCsvLazy
    * core/csv.py:134 — newline-aligned byte-range chunking = Spark's
    * CSV splits). Pass `schema` to skip the inference pass on big
    * inputs; `samplingRatio` bounds inference cost otherwise. */
  def fromCsv(spark: SparkSession, path: String, header: Boolean = true,
              sep: String = ",", schema: Option[StructType] = None,
              samplingRatio: Double = 1.0): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("sep", sep)
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None => r.option("inferSchema", "true")
        .option("samplingRatio", samplingRatio.toString).csv(path)
    }
  }

  /** from_json, JSON-lines orientation (reference: core/__init__.py:493
    * from_json) — `spark.read.json` streams and infers per-split. */
  def fromJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None => spark.read.json(path)
    }
}
