package graft

import org.apache.spark.sql.SparkSession

/** Bit-exact old-vs-new equality check for a restructured query: runs
  * a named query under a property toggle's "1" and "0" variants and
  * compares the collected rows EXACTLY (full precision, not the
  * oracle's rounded hash) — the restructure-equivalence proof the
  * optimization rules require.
  *
  * Usage: tools/run.sh graft.EquivProbe <prop> <sfDir> q1 q2 ...
  */
object EquivProbe {
  def main(args: Array[String]): Unit = {
    val prop = args(0)
    val sfDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      System.setProperty(prop, "1")
      val a = fn(spark, sfDir).collect()
      System.setProperty(prop, "0")
      val b = fn(spark, sfDir).collect()
      System.clearProperty(prop)
      val same = a.length == b.length &&
        a.zip(b).forall { case (x, y) => x == y }
      if (!same) {
        bad += 1
        println(s"$n DIFFER: ${a.length} vs ${b.length} rows")
        a.zip(b).zipWithIndex.filter { case ((x, y), _) => x != y }.take(5)
          .foreach { case ((x, y), i) => println(s"  row $i:\n    on=$x\n    off=$y") }
      } else println(s"$n OK (${a.length} rows bit-identical)")
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
