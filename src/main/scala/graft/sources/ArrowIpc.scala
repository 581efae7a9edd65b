package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}

/** Arrow IPC file / feather-v2 source and sink (reference:
  * packages/vaex-core/vaex/arrow/dataset.py:296 open_arrow, :351/:362
  * feather — feather v2 IS the Arrow IPC file format).
  *
  * Interop path, deliberately driver-side: Arrow IPC files are the
  * exchange format for handing tables to/from pandas/polars/R — they
  * are bounded artifacts, not the 100 TB store (that is Parquet, where
  * Spark's reader is distributed). Supported types: long/int/double/
  * float/string/boolean, nullable.
  */
object ArrowIpc {

  private def toArrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType => new ArrowType.Utf8()
      case BooleanType => new ArrowType.Bool()
      case other => throw new IllegalArgumentException(s"unsupported arrow export type: $other")
    }
    new Field(f.name, FieldType.nullable(t), java.util.Collections.emptyList())
  }

  /** Export a frame as one Arrow IPC file (single batch, driver-side
    * collect — interop artifact, not a bulk store). */
  def write(df: DataFrame, path: String): Unit = {
    val rows = df.collect()
    val schema = df.schema
    val allocator = new RootAllocator()
    try {
      val aschema = new ASchema(schema.fields.map(toArrowField).toList.asJava)
      val root = VectorSchemaRoot.create(aschema, allocator)
      try {
        root.allocateNew()
        schema.fields.zipWithIndex.foreach { case (f, ci) =>
          val vec = root.getVector(ci)
          rows.zipWithIndex.foreach { case (row, ri) =>
            if (row.isNullAt(ci)) () // leave unset -> null
            else (f.dataType, vec) match {
              case (LongType, v: BigIntVector) => v.setSafe(ri, row.getLong(ci))
              case (IntegerType, v: IntVector) => v.setSafe(ri, row.getInt(ci))
              case (DoubleType, v: Float8Vector) => v.setSafe(ri, row.getDouble(ci))
              case (FloatType, v: Float4Vector) => v.setSafe(ri, row.getFloat(ci))
              case (StringType, v: VarCharVector) =>
                v.setSafe(ri, row.getString(ci).getBytes("UTF-8"))
              case (BooleanType, v: BitVector) => v.setSafe(ri, if (row.getBoolean(ci)) 1 else 0)
              case (dt, _) => throw new IllegalArgumentException(s"unsupported type: $dt")
            }
          }
          vec.setValueCount(rows.length)
        }
        root.setRowCount(rows.length)
        val out = new java.io.FileOutputStream(path)
        val writer = new ArrowFileWriter(root, null, out.getChannel)
        try { writer.start(); writer.writeBatch(); writer.end() }
        finally { writer.close(); out.close() }
      } finally root.close()
    } finally allocator.close()
  }

  /** Read an Arrow IPC file (all batches) into a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val allocator = new RootAllocator()
    val in = new java.io.FileInputStream(path)
    try {
      val reader = new ArrowFileReader(in.getChannel, allocator)
      try {
        val root = reader.getVectorSchemaRoot
        val sparkFields = root.getSchema.getFields.asScala.map { f =>
          val dt = f.getType match {
            case i: ArrowType.Int if i.getBitWidth == 64 => LongType
            case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
            case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
            case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
            case _: ArrowType.Utf8 => StringType
            case _: ArrowType.Bool => BooleanType
            case other => throw new IllegalArgumentException(s"unsupported arrow type: $other")
          }
          StructField(f.getName, dt, nullable = true)
        }.toSeq
        val buf = scala.collection.mutable.ArrayBuffer[Row]()
        while (reader.loadNextBatch()) {
          val n = root.getRowCount
          for (ri <- 0 until n) {
            buf += Row.fromSeq(sparkFields.indices.map { ci =>
              val vec = root.getVector(ci)
              if (vec.isNull(ri)) null
              else vec match {
                case v: BigIntVector => v.get(ri)
                case v: IntVector => v.get(ri)
                case v: Float8Vector => v.get(ri)
                case v: Float4Vector => v.get(ri)
                case v: VarCharVector => new String(v.get(ri), "UTF-8")
                case v: BitVector => v.get(ri) == 1
                case other => throw new IllegalArgumentException(s"unsupported vector: ${other.getClass}")
              }
            })
          }
        }
        spark.createDataFrame(buf.asJava, StructType(sparkFields))
      } finally reader.close()
    } finally { in.close(); allocator.close() }
  }
}
