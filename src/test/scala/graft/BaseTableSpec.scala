package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** The FIXTURES.md §A base semantic table — port of the reference's
  * `create_base_ds` (tests/common.py:313-383): 21 deterministic rows
  * exercising every type/null edge (missing vs NaN vs both, masked
  * ints, extreme int64s, patterned strings, bools, timestamps, a
  * numeric-string column name, virtual z = x + t*y), pushed through
  * six representations (tests/common.py:228-260 parametrization). */
class BaseTableSpec extends SparkSpec {

  private val N = 21

  private lazy val base: DataFrame = {
    val schema = StructType(Seq(
      StructField("row_index", LongType, nullable = false),
      StructField("x", DoubleType),
      StructField("y", DoubleType),
      StructField("m", DoubleType),      // missing at 2 indices
      StructField("n", DoubleType),      // NaN at 2 indices
      StructField("nm", DoubleType),     // NaN at 1, missing at 1
      StructField("mi", LongType),       // masked int
      StructField("ints", LongType),     // extreme values
      StructField("name", StringType),
      StructField("bool", BooleanType),
      StructField("datetime", TimestampType),
      StructField("123456", DoubleType)))
    val rows = (0 until N).map { i =>
      val x = i.toDouble - 2.0
      Row(
        i.toLong, x, x * x,
        if (i == 3 || i == 7) null else x,
        if (i == 4 || i == 8) Double.NaN else x,
        if (i == 5) Double.NaN else if (i == 9) null else x,
        if (i == 6 || i == 10) null else i.toLong,
        if (i == 0) (1L << 62) - 1L else if (i == 1) -(1L << 62) + 1L else i.toLong,
        s"${i}bla___",
        i % 3 != 0,
        Timestamp.valueOf(f"${1991 + i}%04d-05-17 16:45:00.${i * 41}%03d"),
        x / 2.0)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  private lazy val representations: Seq[(String, DataFrame)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_base").toString
    base.write.parquet(s"$dir/base")
    val parquet = spark.read.parquet(s"$dir/base")
    val concat4 = base.where("row_index < 2")
      .union(base.where("row_index = 2"))
      .union(base.where("row_index > 2 AND row_index < 7"))
      .union(base.where("row_index >= 7"))
    val refiltered = VxFrame(base).filter("x > -100").extract().dropFilter().df
    val tinyParts = base.repartition(7)
    Seq("memory" -> base, "parquet" -> parquet, "concat4" -> concat4,
      "refiltered" -> refiltered, "tiny7" -> tinyParts)
  }

  private def forAll(f: DataFrame => Any): Unit = {
    val results = representations.map { case (name, df) => name -> f(df) }
    val baseline = results.head._2
    results.tail.foreach { case (name, r) => assert(r == baseline, s"$name diverges") }
  }

  test("NaN/missing/NA trichotomy counts match vaex semantics") {
    forAll { df =>
      import graft.functions.VxFunctions._
      df.select(
        sum(ismissing(col("m")).cast("long")),
        sum(isnan_(col("n")).cast("long")),
        sum(isna(col("nm")).cast("long")),
        count(col("mi"))).head.toSeq
    }
    val r = base.select(
      sum(graft.functions.VxFunctions.ismissing(col("m")).cast("long")),
      sum(graft.functions.VxFunctions.isnan_(col("n")).cast("long")),
      sum(graft.functions.VxFunctions.isna(col("nm")).cast("long"))).head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getLong(2) == 2)
  }

  test("virtual z = x + t*y with variable t, identical across representations") {
    forAll { df =>
      VxFrame(df).withVariable("t", 1.0)
        .withVirtualColumn("z", "x + t * y")
        .df.agg(sum("z")).head.getDouble(0)
    }
    val withT2 = VxFrame(base).withVariable("t", 2.0).withVirtualColumn("z", "x + t * y")
    val z2 = withT2.df.agg(sum("z")).head.getDouble(0)
    val z1 = VxFrame(base).withVariable("t", 1.0).withVirtualColumn("z", "x + t * y")
      .df.agg(sum("z")).head.getDouble(0)
    assert(z2 > z1) // variable actually participates
  }

  test("numeric-string column name quotes through expressions") {
    forAll { df =>
      VxFrame(df).withVirtualColumn("dbl", "`123456` * 2")
        .df.agg(sum("dbl")).head.getDouble(0)
    }
  }

  test("extreme int64s survive aggregation exactly") {
    forAll { df =>
      df.agg(max("ints"), min("ints")).head.toSeq
    }
    val r = base.agg(max("ints"), min("ints")).head
    assert(r.getLong(0) == (1L << 62) - 1 && r.getLong(1) == -(1L << 62) + 1)
  }

  test("datetime functions agree across representations") {
    forAll { df =>
      df.select(sum(graft.functions.VxFunctions.dt.dayofweek(col("datetime"))),
        sum(graft.functions.VxFunctions.dt.year(col("datetime")))).head.toSeq
    }
  }

  test("groupby on bool + string agrees across representations") {
    forAll { df =>
      df.groupBy("bool").agg(count(lit(1)), sum("x"))
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    }
  }

  test("sort with nulls-last over masked column, stable across representations") {
    forAll { df =>
      VxFrame(df).sort(Seq("m")).df.select("row_index")
        .collect().map(_.getLong(0)).takeRight(2).toSet
    }
    // the two missing rows (3, 7) sort last
    val lastTwo = VxFrame(base).sort(Seq("m")).df.select("row_index")
      .collect().map(_.getLong(0)).takeRight(2).toSet
    assert(lastTwo == Set(3L, 7L))
  }
}
