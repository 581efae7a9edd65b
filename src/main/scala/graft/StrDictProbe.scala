package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted A/B for STRING-key groupByKeys (the r16 verdict's #8:
  * does a UTF8String dictionary probe + fused dense kernel beat plain
  * HashAggregate on string keys, or does string hashing move the bill
  * back to the probe?). Three lanes, interleaved in one fresh JVM
  * with mem_bw brackets:
  *   - str_hash:      plain groupBy on the string key (HashAggregate)
  *   - str_dict:      DenseCatAgg.groupByKeys on the string key
  *                    (amortized form: dictionary built once outside
  *                    the timed region would be the categorize model;
  *                    here the build is INSIDE — the one-shot form)
  *   - long_dict:     the same data keyed by the equivalent long —
  *                    the r16 baseline, isolating the string tax
  *
  * Usage: SPARK_GRAFT_CPUS=32 tools/run.sh graft.StrDictProbe [reps] [nKeys]
  */
object StrDictProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val nKeys = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = 100_000_000L
    // realistic short category strings ("source-<k>"), derived per row
    // so the generator cost matches across lanes (gen control below)
    def base = spark.range(n).select(
      (col("id") % nKeys).as("kl"),
      concat(lit("source-"), col("id") % nKeys).as("ks"),
      (col("id") % 1000).cast("double").as("x"))
    import graft.operators.DenseCatAgg
    import graft.operators.DenseCatAgg.Agg
    val lanes: Seq[(String, () => Long)] = Seq(
      "gen_only" -> (() => base.select(sum(length(col("ks")) + col("kl")))
        .head().getLong(0)),
      "str_hash" -> (() => base.groupBy("ks")
        .agg(sum("x").as("s"), count(lit(1)).as("n")).count()),
      "str_dict" -> (() => DenseCatAgg.groupByKeys(base, col("ks"),
        Seq(Agg(col("x"), "sum", "s")), countAs = Some("n"),
        keyAs = "ks").count()),
      "long_hash" -> (() => base.groupBy("kl")
        .agg(sum("x").as("s"), count(lit(1)).as("n")).count()),
      "long_dict" -> (() => DenseCatAgg.groupByKeys(base, col("kl"),
        Seq(Agg(col("x"), "sum", "s")), countAs = Some("n"),
        keyAs = "kl").count()),
      // AMORTIZED forms (the categorize steady state): the dictionary
      // is pre-built once; the timed region is probe + fused kernel
      "str_dict_amort" -> {
        import org.apache.spark.sql.graftbridge.Bridge
        import org.apache.spark.unsafe.types.UTF8String
        val dict = graft.operators.Utf8Dict.build(
          (0 until nKeys).map(k => UTF8String.fromString(s"source-$k"))
            .sortBy(identity)(Ordering.comparatorToOrdering(
              java.util.Comparator.naturalOrder[UTF8String]())).toArray, -1)
        () => DenseCatAgg.groupByOrdinal(base,
          Bridge.column(graft.operators.Utf8DictOrdinal(
            Bridge.expression(col("ks")), dict)), dict.cardinality,
          Seq(Agg(col("x"), "sum", "s")), countAs = Some("n")).count()
      },
      "long_dict_amort" -> {
        import org.apache.spark.sql.graftbridge.Bridge
        val dict = graft.operators.LongDict.build(
          (0L until nKeys.toLong).toArray, -1)
        () => DenseCatAgg.groupByOrdinal(base,
          Bridge.column(graft.operators.LongDictOrdinal(
            Bridge.expression(col("kl")), dict)), dict.cardinality,
          Seq(Agg(col("x"), "sum", "s")), countAs = Some("n")).count()
      })

    lanes.foreach { case (_, mk) => mk() } // warm
    val all = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val bwPre = BenchProbe.memBandwidthGbps(cpus.toInt)
    (1 to reps).foreach { _ =>
      lanes.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        mk()
        all(name) = (System.nanoTime() - t0) / 1e9 :: all(name)
      }
    }
    val bwPost = BenchProbe.memBandwidthGbps(cpus.toInt)
    def med(xs: List[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    println("{" +
      s""""probe":"str_dict","cpus":$cpus,"n":$n,"nKeys":$nKeys,""" +
      s""""mem_bw_pre":${f"$bwPre%.1f"},"mem_bw_post":${f"$bwPost%.1f"},""" +
      lanes.map { case (nm, _) =>
        s""""$nm":{"median_sec":${f"${med(all(nm))}%.3f"},""" +
          s""""rows_per_sec":${(n / med(all(nm))).toLong},""" +
          s""""reps":[${all(nm).reverse.map(t => f"$t%.3f").mkString(",")}]}"""
      }.mkString(",") + "}")
    spark.stop()
  }
}
