package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM-wide session; sbt
  * forks a single test JVM so getOrCreate dedupes across suites). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf0001 = "/root/testdata/sf0.001"

  /** Evaluate a single Column over a one-row frame. */
  def evalCol(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head.get(0)

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession
      .builder(master = "local[4]", shufflePartitions = 4)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
