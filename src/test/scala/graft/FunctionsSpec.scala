package graft

import org.apache.spark.sql.functions._
import graft.functions.VxFunctions
import graft.functions.VxFunctions.{str, dt, td}

/** Unit tests for the scalar-function inventory (SURVEY.md §2.8),
  * checking the deliberately non-trivial semantics: Python/numpy
  * conventions the reference follows that differ from Spark built-ins.
  */
class FunctionsSpec extends SparkSpec {

  test("sinc: sinc(0)=1, sinc(1)=0") {
    assert(evalCol(VxFunctions.sinc(lit(0.0))) == 1.0)
    assert(math.abs(evalCol(VxFunctions.sinc(lit(1.0))).asInstanceOf[Double]) < 1e-15)
  }

  test("clip bounds both sides") {
    assert(evalCol(VxFunctions.clip(lit(5.0), lit(0.0), lit(3.0))) == 3.0)
    assert(evalCol(VxFunctions.clip(lit(-5.0), lit(0.0), lit(3.0))) == 0.0)
    assert(evalCol(VxFunctions.clip(lit(1.5), lit(0.0), lit(3.0))) == 1.5)
  }

  test("digitize matches numpy right=False") {
    // numpy.digitize(x, [1,2,3]): x<1 -> 0, 1<=x<2 -> 1, ..., x>=3 -> 3
    val edges = Seq(1.0, 2.0, 3.0)
    assert(evalCol(VxFunctions.digitize(lit(0.5), edges)) == 0)
    assert(evalCol(VxFunctions.digitize(lit(1.0), edges)) == 1)
    assert(evalCol(VxFunctions.digitize(lit(2.5), edges)) == 2)
    assert(evalCol(VxFunctions.digitize(lit(9.0), edges)) == 3)
  }

  test("isna trichotomy: null vs NaN vs value") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(Double.NaN)).toDF("x")
    val got = df.select(
      VxFunctions.ismissing(col("x")).as("miss"),
      VxFunctions.isnan_(col("x")).as("nan"),
      VxFunctions.isna(col("x")).as("na")).collect()
    assert(got.map(_.getBoolean(0)).toSeq == Seq(false, true, false))
    assert(got.map(_.getBoolean(1)).toSeq == Seq(false, false, true))
    assert(got.map(_.getBoolean(2)).toSeq == Seq(false, true, true))
  }

  test("fillna fills both NaN and null; fillnan/fillmissing only theirs") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(Double.NaN)).toDF("x")
    val got = df.select(
      VxFunctions.fillna(col("x"), lit(9.0)).as("na"),
      VxFunctions.fillnan(col("x"), lit(9.0)).as("nan"),
      VxFunctions.fillmissing(col("x"), lit(9.0)).as("miss")).collect()
    assert(got.map(_.getDouble(0)).toSeq == Seq(1.0, 9.0, 9.0))
    // fillnan: null stays null, NaN -> 9.0
    assert(got(1).isNullAt(1))
    assert(got(2).getDouble(1) == 9.0)
    // fillmissing: null -> 9.0, NaN stays NaN
    assert(got(1).getDouble(2) == 9.0)
    assert(got(2).getDouble(2).isNaN)
  }

  test("str.zfill handles sign like Python") {
    assert(evalCol(str.zfill(lit("-12"), 5)) == "-0012")
    assert(evalCol(str.zfill(lit("+3"), 4)) == "+003")
    assert(evalCol(str.zfill(lit("7"), 3)) == "007")
    assert(evalCol(str.zfill(lit("123456"), 3)) == "123456")
  }

  test("str.center matches Python str.center") {
    assert(evalCol(str.center(lit("ab"), 5)) == "  ab " || evalCol(str.center(lit("ab"), 5)) == " ab  ")
    // Python: "ab".center(5) == "  ab " -> extra on the right... actually ' ab  '
    assert(evalCol(str.center(lit("ab"), 5)) == " ab  ")
    assert(evalCol(str.center(lit("abc"), 2)) == "abc")
  }

  test("str.find is 0-based with -1 for absent") {
    assert(evalCol(str.find(lit("hello"), "ll")) == 2L)
    assert(evalCol(str.find(lit("hello"), "zz")) == -1L)
  }

  test("str.get supports negative index") {
    assert(evalCol(str.get(lit("abc"), 0)) == "a")
    assert(evalCol(str.get(lit("abc"), -1)) == "c")
  }

  test("str.count counts non-overlapping literal occurrences") {
    assert(evalCol(str.count(lit("aaaa"), "aa")) == 2L)
    assert(evalCol(str.count(lit("a.a.a"), ".")) == 2L)
  }

  test("str predicates: isalpha/isdigit/istitle") {
    assert(evalCol(str.isalpha(lit("abc"))) == true)
    assert(evalCol(str.isalpha(lit("ab1"))) == false)
    assert(evalCol(str.isdigit(lit("123"))) == true)
    assert(evalCol(str.istitle(lit("Hello World"))) == true)
    assert(evalCol(str.istitle(lit("Hello world"))) == false)
  }

  test("dt.dayofweek is Monday=0 (numpy convention)") {
    // 2024-01-01 was a Monday
    assert(evalCol(dt.dayofweek(lit("2024-01-01").cast("date"))) == 0L)
    // 2024-01-07 was a Sunday
    assert(evalCol(dt.dayofweek(lit("2024-01-07").cast("date"))) == 6L)
  }

  test("dt.isLeapYear gregorian rules") {
    assert(evalCol(dt.isLeapYear(lit("2024-06-01").cast("date"))) == true)
    assert(evalCol(dt.isLeapYear(lit("1900-06-01").cast("date"))) == false)
    assert(evalCol(dt.isLeapYear(lit("2000-06-01").cast("date"))) == true)
  }

  test("td decomposition: days/seconds/microseconds") {
    val us = lit(2L * 86400000000L + 3L * 1000000L + 42L) // 2d 3s 42us
    assert(evalCol(td.days(us)) == 2L)
    assert(evalCol(td.seconds(us)) == 3L)
    assert(evalCol(td.microseconds(us)) == 42L)
    assert(evalCol(td.totalSeconds(us)).asInstanceOf[Double] === 2 * 86400 + 3 + 42e-6)
  }

  test("dotProduct and cosineSimilarity") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val dp = df.select(VxFunctions.dotProduct(col("a"), col("b"))).head.getDouble(0)
    assert(dp == 32.0)
    val cs = df.select(VxFunctions.cosineSimilarity(col("a"), col("a"))).head.getDouble(0)
    assert(math.abs(cs - 1.0) < 1e-12)
  }

  test("int8 quantization: extremes hit ±127, zero vector safe, bounded error") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 2.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "e")
    val staged = df.select(col("id"), col("e"),
      VxFunctions.int8Scale(col("e")).as("s"))
      .select(col("id"), col("e"), col("s"),
        VxFunctions.quantizeInt8(col("e"), col("s")).as("q"))
    val r1 = staged.where(col("id") === 1).head
    val q1 = r1.getSeq[Int](3)
    assert(q1 == Seq(64, -127, 32, 127)) // 1.0*63.5+0.5=64; max|x|=2 -> ±127
    // reconstruction error bounded by half a quantization step
    val err = staged.where(col("id") === 1).select(
      array_max(zip_with(col("e"), VxFunctions.dequantizeInt8(col("q"), col("s")),
        (x, xq) => abs(x.cast("double") - xq)))).head.getDouble(0)
    assert(err <= 0.5 / 63.5 + 1e-12, s"err=$err")
    val r2 = staged.where(col("id") === 2).head
    assert(r2.getDouble(2) == 0.0 && r2.getSeq[Int](3) == Seq(0, 0, 0, 0))
  }

  test("mapValues CASE-chain with default") {
    import spark.implicits._
    val df = Seq("a", "b", "z").toDF("k")
    val got = df.select(VxFunctions.mapValues(col("k"), Map("a" -> 1, "b" -> 2), lit(-1)))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, -1))
  }
}
