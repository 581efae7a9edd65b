package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exact interpolated (type-7) percentiles per group WITHOUT buffering
  * any group's values in memory (reference: core/dataframe.py:1632
  * percentile_approx is grid-interpolated; Spark's exact `percentile`
  * is an ObjectHashAggregate that collects a value->count map PER
  * GROUP — a driver-class memory bound living inside an executor, OOM
  * territory on a 100 TB fact table).
  *
  * Strategy — distributed selection over sampled value buckets, the
  * same fixed-literal-boundary trick as `Tables.withRowIndexBy`:
  *
  *   1. one partial-agg pass counts rows per value column;
  *   2. one stratified-sample pass picks ~200*buckets values per
  *      column -> bucket boundaries, fixed as literals so every later
  *      job sees identical bucketing;
  *   3. one partial-agg pass counts rows per (group, column, bucket);
  *      the driver folds these (G x C x B longs, limit-guarded) into
  *      cumulative offsets and locates, for each requested quantile,
  *      the bucket holding ranks floor(k)/ceil(k) and the local rank
  *      inside it;
  *   4. one selection pass semi-joins the target buckets (broadcast),
  *      ranks ONLY those buckets with a per-bucket window, and returns
  *      exactly the needed values (a handful of rows).
  *
  * Four scans, each memory-bounded: the heaviest task sorts one
  * bucket (~n/buckets rows, external/spillable sort, parallel across
  * groups x columns x buckets). Skewed value distributions stay
  * balanced because boundaries come from an order-statistics sample,
  * not min/max widths. Nulls are excluded from ranks (bucket -1);
  * NaN sorts greatest (last bucket), matching Spark's double ordering
  * so results equal the builtin `percentile` bit-for-bit, including
  * its interpolation formula.
  */
object GroupedPercentile {

  /** Per-statistic request: value expression, quantile in [0,1],
    * output column name. */
  final case class Spec(expr: String, q: Double, name: String)

  /** Driver-side footprint guard: (groups x columns x buckets) count
    * entries collected in pass 3. */
  val MaxDriverEntries: Long = 1L << 22

  /** @param df        input frame
    * @param groupCols grouping column names (empty = global)
    * @param specs     requested quantiles (names must be unique)
    * @param buckets   value buckets per column (0 = max(parallelism, 16))
    * @return one row per group: groupCols ++ one double column per spec
    */
  def exact(df: DataFrame, groupCols: Seq[String], specs: Seq[Spec],
            buckets: Int = 0): DataFrame = {
    require(specs.nonEmpty, "percentile: no specs")
    require(specs.map(_.name).distinct.size == specs.size,
      "percentile: duplicate output names")
    specs.foreach(s => require(s.q >= 0.0 && s.q <= 1.0,
      s"percentile: quantile ${s.q} outside [0,1]"))
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else math.max(spark.sparkContext.defaultParallelism, 16)

    val valueExprs = specs.map(_.expr).distinct
    val cidOf = valueExprs.zipWithIndex.toMap
    val gCols = groupCols.map(col)
    // Deliberately NOT parallelized on under-split scans (r18 opt
    // session 2, three interleaved A/Bs): repartitioning df 0.54x
    // (pass 1's metadata count became a real shuffled job), persisting
    // the repartitioned long form 0.58x (materialization barrier), and
    // repartitioning ONLY the explode input — count untouched — ALSO
    // 0.58x: each pass re-pays a round-robin exchange (plus its
    // sort-before-repartition) that dwarfs the light explode+bucket
    // work it parallelizes. The serial passes are the measured floor.
    val longForm = df.select(gCols :+ posexplode(
      array(valueExprs.map(e => expr(e).cast("double")): _*))
      .as(Seq("__cid", "__v")): _*)

    // pass 1: input row count -> sampling fractions. r18: the old
    // per-cid non-null count was a full pass over the exploded
    // longForm; fractions only size the boundary sample, and ANY
    // boundary set yields identical results (bucketing is pure
    // decomposition), so the plain input count — answered from parquet
    // row-group metadata, no data read — is enough. A mostly-null
    // column just samples under ~200/bucket; boundaries get coarser,
    // results unchanged.
    val nTotal = df.count()
    if (nTotal == 0 && groupCols.nonEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(groupCols.map(c => df.schema(df.schema.fieldIndex(c))) ++
          specs.map(s => StructField(s.name, DoubleType, nullable = true))))
    val fractions: Map[Int, Double] = valueExprs.indices.map { c =>
      c -> (if (nTotal == 0) 0.0 else math.min(1.0, nb * 200.0 / nTotal))
    }.toMap

    // pass 2: sampled boundaries per column (fixed literals)
    val sampled: Map[Int, Array[Double]] = longForm
      .where(col("__v").isNotNull && !isnan(col("__v")))
      .stat.sampleBy("__cid", fractions, 42L)
      .select("__cid", "__v").collect()
      .groupBy(_.getInt(0))
      .map { case (c, rs) => c -> rs.map(_.getDouble(1)).sorted }
    val boundaries: Map[Int, Array[Double]] = sampled.map { case (c, s) =>
      c -> (1 until nb).map(i => s(i * s.length / nb)).distinct.toArray
    }

    // bucket ordinal: null -> -1 (excluded from ranks), NaN -> last
    // (sorts greatest), else searchsorted over the fixed boundaries
    def bucketFor(c: Int): org.apache.spark.sql.Column = {
      val bs = boundaries.getOrElse(c, Array.empty[Double])
      when(col("__v").isNull, lit(-1))
        .when(isnan(col("__v")), lit(bs.length + 1))
        .otherwise(bs.foldLeft(lit(0)) { (acc, b) =>
          acc + when(col("__v") > lit(b), 1).otherwise(0)
        })
    }
    val bucketExpr = valueExprs.indices.tail.foldLeft(bucketFor(0)) {
      (acc, c) => when(col("__cid") === c, bucketFor(c)).otherwise(acc)
    }
    val bucketed = longForm.withColumn("__b", bucketExpr)

    // pass 3: counts per (group, column, bucket) -> offsets on driver.
    // The guard collects at most MaxDriverEntries+1 rows, so the
    // driver allocation it protects against never happens.
    val countRows = bucketed
      .groupBy(gCols ++ Seq(col("__cid"), col("__b")): _*).count()
      .limit((MaxDriverEntries + 1).toInt)
      .collect()
    require(countRows.length.toLong <= MaxDriverEntries,
      s"percentile: over $MaxDriverEntries (group,column,bucket) entries " +
        "— too many groups for a driver-assembled result")
    val g = groupCols.size
    // (groupKey, cid) -> sorted (bucket, count), nulls (-1) excluded
    val hist: Map[(Seq[Any], Int), Array[(Int, Long)]] = countRows
      .map(r => ((Seq.range(0, g).map(r.get), r.getInt(g)),
        (r.getInt(g + 1), r.getLong(g + 2))))
      .groupBy(_._1)
      .map { case (k, rs) =>
        k -> rs.map(_._2).filter(_._1 >= 0).sortBy(_._1)
      }
    val groupKeys: Seq[Seq[Any]] = countRows.map(r => Seq.range(0, g).map(r.get))
      .distinct.toSeq

    // locate rank k in a group/column histogram -> (bucket, local rank)
    def locate(h: Array[(Int, Long)], k: Long): (Int, Long) = {
      var acc = 0L; var i = 0
      while (i < h.length) {
        if (k < acc + h(i)._2) return (h(i)._1, k - acc)
        acc += h(i)._2; i += 1
      }
      throw new IllegalStateException(s"percentile: rank $k beyond histogram")
    }

    // per spec x group: the global ranks needed (floor/ceil of the
    // interpolation position)
    final case class Target(gKey: Seq[Any], cid: Int, bucket: Int,
                            localRank: Long, tid: Int)
    val targets = scala.collection.mutable.ArrayBuffer.empty[Target]
    val tidOf = scala.collection.mutable.Map.empty[(Seq[Any], Int, Long), Int]
    for (gKey <- groupKeys; s <- specs) {
      val cid = cidOf(s.expr)
      hist.get((gKey, cid)).filter(_.nonEmpty).foreach { h =>
        val n = h.map(_._2).sum
        val pos = (n - 1) * s.q
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong).distinct.foreach { k =>
          tidOf.getOrElseUpdate((gKey, cid, k), {
            val (b, lr) = locate(h, k)
            val tid = targets.length
            targets += Target(gKey, cid, b, lr, tid)
            tid
          })
        }
      }
    }

    // pass 4: rank only the target buckets, pull the needed values
    val values: Map[Int, Double] =
      if (targets.isEmpty) Map.empty
      else {
        val gFields = groupCols.map(c => df.schema(df.schema.fieldIndex(c)))
        val tSchema = StructType(gFields ++ Seq(
          StructField("__cid", org.apache.spark.sql.types.IntegerType, nullable = false),
          StructField("__b", org.apache.spark.sql.types.IntegerType, nullable = false),
          StructField("__lr", org.apache.spark.sql.types.LongType, nullable = false),
          StructField("__tid", org.apache.spark.sql.types.IntegerType, nullable = false)))
        // Seq[Any] — a plain Seq(Int, Int, Long, Int) would widen every
        // element to Long and break the Row encoder's Int fields
        val tRows = targets.map(t =>
          Row.fromSeq(t.gKey ++ Seq[Any](t.cid, t.bucket, t.localRank, t.tid)))
        val tDf = spark.createDataFrame(
          spark.sparkContext.parallelize(tRows.toSeq, 1), tSchema)
        val keyCols = groupCols ++ Seq("__cid", "__b")
        // null-safe equality throughout: group values may be null.
        // `sel` is built from literal rows (NOT derived from tDf) so
        // the later ranked-vs-tDf join has disjoint lineages — deriving
        // it from tDf trips Spark's DetectAmbiguousSelfJoin.
        val selSchema = StructType(gFields ++ Seq(
          StructField("__cid", org.apache.spark.sql.types.IntegerType, nullable = false),
          StructField("__b", org.apache.spark.sql.types.IntegerType, nullable = false)))
        val selRows = targets.map(t => Row.fromSeq(t.gKey ++ Seq(t.cid, t.bucket)))
          .distinct
        val sel = spark.createDataFrame(
          spark.sparkContext.parallelize(selRows.toSeq, 1), selSchema)
        val pruned = bucketed.join(broadcast(sel),
          keyCols.map(c => bucketed(c) <=> sel(c)).reduce(_ && _), "left_semi")
        val w = Window.partitionBy(keyCols.map(pruned(_)): _*).orderBy(pruned("__v"))
        val ranked = pruned.withColumn("__lr", row_number().over(w).cast("long") - 1L)
        ranked.join(broadcast(tDf),
          (keyCols :+ "__lr").map(c => ranked(c) <=> tDf(c)).reduce(_ && _))
          .select(tDf("__tid"), ranked("__v"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      }

    // assemble: Spark Percentile's own interpolation formula, so the
    // result is bit-identical to the builtin. A global (no-group)
    // aggregate over an empty frame still yields one all-null row,
    // matching groupBy().agg semantics.
    val finalKeys =
      if (groupCols.isEmpty && groupKeys.isEmpty) Seq(Seq.empty[Any])
      else groupKeys
    val outRows = finalKeys.map { gKey =>
      val stats = specs.map { s =>
        val cid = cidOf(s.expr)
        hist.get((gKey, cid)).filter(_.nonEmpty) match {
          case None => null
          case Some(h) =>
            val n = h.map(_._2).sum
            val pos = (n - 1) * s.q
            val lo = math.floor(pos).toLong
            val hi = math.ceil(pos).toLong
            val vLo = values(tidOf((gKey, cid, lo)))
            if (hi == lo) java.lang.Double.valueOf(vLo)
            else java.lang.Double.valueOf(
              (hi - pos) * vLo + (pos - lo) * values(tidOf((gKey, cid, hi))))
        }
      }
      Row.fromSeq(gKey ++ stats)
    }
    val outSchema = StructType(
      groupCols.map(c => df.schema(df.schema.fieldIndex(c))) ++
        specs.map(s => StructField(s.name, DoubleType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, 1), outSchema)
  }
}
