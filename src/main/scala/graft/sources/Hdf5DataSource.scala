package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 front-end for [[Hdf5]] — `spark.read.format(
  * "graft.sources.Hdf5DataSource").load(path)` (what `Readers.open`
  * dispatches for `.hdf5`/`.h5`). The point of going through V2 rather
  * than the RDD constructor: COLUMN PRUNING flows from Catalyst into
  * the scan automatically (`SupportsPushDownRequiredColumns`), so
  * `open(path).select("x").agg(...)` touches only column x's byte
  * ranges without the caller passing a column list — the behavior a
  * parquet user expects, on a 100 TB file the difference between
  * reading one column and reading all of them.
  *
  * Execution shape matches [[Hdf5.fromHdf5]]: the driver parses only
  * metadata (including the chunk index); each input partition is a row
  * range; readers do positioned/per-chunk reads executor-side. */
final class Hdf5DataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Hdf5DataSource.schemaOf(Hdf5DataSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new Hdf5Table(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("hdf5 source requires a path")))
}

private object Hdf5DataSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "hdf5 source requires a path")
    p
  }
  def schemaOf(path: String): StructType =
    StructType(Hdf5.readTable(path).map(m =>
      org.apache.spark.sql.types.StructField(m.name, m.sparkType, m.nullable)))
}

private final class Hdf5Table(path: String) extends Table with SupportsRead {
  override def name(): String = s"hdf5:`$path`"
  override def schema(): StructType = Hdf5DataSource.schemaOf(path)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Hdf5ScanBuilder(path)
}

private final class Hdf5ScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: Option[Seq[String]] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema.fieldNames.toSeq)
  override def build(): Scan = new Hdf5Scan(path, required)
}

private final case class Hdf5RangePartition(start: Long, end: Long,
    metas: Array[Hdf5.ColumnMeta]) extends InputPartition

private final class Hdf5Scan(path: String, columns: Option[Seq[String]])
    extends Scan with Batch {
  private val metas: Seq[Hdf5.ColumnMeta] = {
    val all = Hdf5.readTable(path)
    columns match {
      case None => all
      case Some(names) =>
        val byName = all.map(m => m.name -> m).toMap
        names.map(n => byName.getOrElse(n,
          throw new IllegalArgumentException(s"no such hdf5 column: $n")))
    }
  }

  override def readSchema(): StructType =
    StructType(metas.map(m =>
      org.apache.spark.sql.types.StructField(m.name, m.sparkType, m.nullable)))

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // empty projection (count(*)): still need the row count — use the
    // full table's first column for ranges but read no columns
    val n =
      if (metas.nonEmpty) metas.head.n
      else Hdf5.readTable(path).headOption.map(_.n).getOrElse(0L)
    require(metas.forall(_.n == n), "ragged column lengths")
    // partition count scales with the data (readers buffer their whole
    // range columnar — a fixed cap would grow per-task memory without
    // bound); floor at the session's parallelism for small files
    val targetRows = 1L << 17
    val parallelism = org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism.toLong
    val parts = math.max(1L, math.min(math.max(parallelism, n / targetRows + 1L),
      math.max(1L, n)))
    val step = math.max(1L, (n + parts - 1) / parts)
    (0L until n by step)
      .map(s => Hdf5RangePartition(s, math.min(s + step, n), metas.toArray))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new Hdf5ReaderFactory(path)
}

/** Serializable factory: captures only the file path. */
private final class Hdf5ReaderFactory(path: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Hdf5PartitionReader(path, partition.asInstanceOf[Hdf5RangePartition])
}

/** Executor-side reader over one row range: delegates to the same
  * columnar range reads as [[Hdf5.fromHdf5]], then serves rows. */
private final class Hdf5PartitionReader(path: String, p: Hdf5RangePartition)
    extends PartitionReader[InternalRow] {
  private var cols: Array[Array[Any]] = _
  private var i = -1
  private val n = (p.end - p.start).toInt

  override def next(): Boolean = {
    if (cols == null) cols = Hdf5.readColumnRanges(path, p.metas, p.start, p.end)
    i += 1
    i < n
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](p.metas.length)
    var j = 0
    while (j < vals.length) {
      vals(j) = cols(j)(i) match {
        case s: String => UTF8String.fromString(s)
        // array columns (matrices, vlen sequences): InternalRow fields
        // must be ArrayData, not Scala Seq — Catalyst's getArray casts
        case seq: scala.collection.Seq[_] =>
          new GenericArrayData(seq.map {
            case s: String => UTF8String.fromString(s)
            case v => v
          }.toArray[Any])
        case v => v
      }
      j += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}
