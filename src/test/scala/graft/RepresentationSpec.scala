package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's core test trick, ported (reference:
  * tests/common.py:228-260 — one logical table exposed through every
  * dataset representation, every operator asserted identical across
  * them). Representations here: in-memory Seq, parquet round-trip,
  * partitioned parquet, a 3-way unioned split, and a filtered superset.
  */
class RepresentationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (0 until 200).map { i =>
    (i.toLong, (i % 7).toString, i * 1.5, if (i % 11 == 0) None else Some(i % 13))
  }

  private lazy val representations: Seq[(String, DataFrame)] = {
    val mem = rows.toDF("id", "k", "v", "m")
    val dir = Files.createTempDirectory("graft_repr").toString
    mem.write.parquet(s"$dir/plain")
    mem.write.partitionBy("k").parquet(s"$dir/part")
    val parquet = spark.read.parquet(s"$dir/plain")
    val partitioned = spark.read.parquet(s"$dir/part")
      .select("id", "k", "v", "m") // restore column order
    val unioned = mem.where("id < 70")
      .union(mem.where("id >= 70 AND id < 140"))
      .union(mem.where("id >= 140"))
    val filtered = rows.map(r => (r._1, r._2, r._3, r._4))
      .toDF("id", "k", "v", "m")
      .union(Seq((-1L, "x", -1.0, Some(0))).toDF("id", "k", "v", "m"))
      .where("id >= 0")
    Seq("memory" -> mem, "parquet" -> parquet, "partitioned" -> partitioned,
      "unioned" -> unioned, "filtered" -> filtered)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("groupBy aggregation identical across representations") {
    val results = representations.map { case (name, df) =>
      name -> canon(df.groupBy("k").agg(
        count(lit(1)).as("n"), sum("v").as("s"),
        count("m").as("nm"), min("id").as("mi")))
    }
    val base = results.head._2
    results.tail.foreach { case (name, r) => assert(r == base, s"$name diverges") }
  }

  test("filter + projection identical across representations") {
    val results = representations.map { case (name, df) =>
      name -> canon(df.where("v > 100 AND m IS NOT NULL").select("id", "k"))
    }
    val base = results.head._2
    results.tail.foreach { case (name, r) => assert(r == base, s"$name diverges") }
  }

  test("distinct and null accounting identical across representations") {
    val results = representations.map { case (name, df) =>
      name -> canon(df.select(
        count_distinct(col("k")).as("dk"),
        sum(when(col("m").isNull, 1).otherwise(0)).as("nulls")))
    }
    val base = results.head._2
    results.tail.foreach { case (name, r) => assert(r == base, s"$name diverges") }
  }

  test("facade selection aggregation identical across representations") {
    val results = representations.map { case (name, df) =>
      val f = VxFrame(df).select("v > 150")
      name -> (f.countExpr("*", Some("default")), f.sumExpr("id", Some("default")))
    }
    val base = results.head._2
    results.tail.foreach { case (name, r) => assert(r == base, s"$name diverges") }
  }
}
