package graft

import org.apache.spark.sql.functions._
import graft.ml.Transformers

/** ML transformer semantics + the "pipelines are just state" property:
  * a fitted pipeline survives stateGet/stateSet and applies to fresh
  * data. */
class TransformersSpec extends SparkSpec {
  import spark.implicits._

  private def vf = VxFrame(Seq(
    (1.0, "a", 0.0), (2.0, "b", 6.0), (3.0, "a", 12.0),
    (4.0, "c", 18.0), (5.0, "b", 23.0)).toDF("x", "k", "h"))

  test("standardScaler: mean 0, pop-std 1") {
    val f = Transformers.standardScaler(vf, "x")
    val r = f.df.agg(
      round(avg(col("standard_scaled_x")), 10),
      round(stddev_pop(col("standard_scaled_x")), 10)).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }

  test("minMaxScaler: onto [0,1] by default, custom range works") {
    val f = Transformers.minMaxScaler(vf, "x")
    val r = f.df.agg(min(col("minmax_scaled_x")), max(col("minmax_scaled_x"))).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
    val g = Transformers.minMaxScaler(vf, "x", -1, 1)
    val r2 = g.df.agg(min(col("minmax_scaled_x")), max(col("minmax_scaled_x"))).head()
    assert(r2.getDouble(0) == -1.0 && r2.getDouble(1) == 1.0)
  }

  test("labelEncoder: sorted ordinal codes") {
    val f = Transformers.labelEncoder(vf, "k")
    val got = f.df.select("k", "label_encoded_k").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("oneHotEncoder: one 0/1 column per value") {
    val f = Transformers.oneHotEncoder(vf, "k")
    assert(f.df.columns.toSet.intersect(Set("k_a", "k_b", "k_c")).size == 3)
    assert(f.df.agg(sum("k_a"), sum("k_b"), sum("k_c")).head().toSeq == Seq(2, 2, 1))
  }

  test("frequencyEncoder: relative frequencies") {
    val f = Transformers.frequencyEncoder(vf, "k")
    val got = f.df.select("k", "frequency_encoded_k").distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2))
  }

  test("kBinsDiscretizer: uniform bins, max value in last bin") {
    val f = Transformers.kBinsDiscretizer(vf, "x", 4)
    val got = f.df.select("x", "binned_x").collect().map(r => (r.getDouble(0), r.getInt(1))).toMap
    assert(got == Map(1.0 -> 0, 2.0 -> 1, 3.0 -> 2, 4.0 -> 3, 5.0 -> 3))
  }

  test("cycleTransformer: sin/cos encoding on unit circle") {
    val f = Transformers.cycleTransformer(vf, "h", 24.0)
    val r = f.df.where("h = 6.0")
      .select(round(col("h_sin"), 10), round(col("h_cos"), 10)).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("fitted pipeline round-trips through state JSON onto fresh data") {
    val fitted = Transformers.standardScaler(
      Transformers.labelEncoder(vf, "k"), "x")
    val state = fitted.stateGet()
    val fresh = VxFrame(Seq((10.0, "b", 1.0)).toDF("x", "k", "h")).stateSet(state)
    val r = fresh.df.select("standard_scaled_x", "label_encoded_k").head()
    // scaled with the ORIGINAL fit (mean=3, std=sqrt(2)), not refit
    assert(math.abs(r.getDouble(0) - (10.0 - 3.0) / math.sqrt(2.0)) < 1e-12)
    assert(r.getInt(1) == 1)
  }

  test("robustScaler and maxAbsScaler basic properties") {
    val f = Transformers.robustScaler(vf, "x")
    assert(f.df.where("x = 3.0").select("robust_scaled_x").head().getDouble(0) == 0.0)
    val g = Transformers.maxAbsScaler(vf, "x")
    assert(g.df.agg(max(abs(col("absmax_scaled_x")))).head().getDouble(0) == 1.0)
  }

  test("symEigen solves a closed-form symmetric matrix") {
    // [[2,1],[1,2]]: eigenvalues 3,1; eigenvectors (1,1)/√2, (1,-1)/√2
    val (evals, evecs) = Transformers.symEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-9 && math.abs(evals(1) - 1.0) < 1e-9)
    val s = 1.0 / math.sqrt(2.0)
    assert(evecs(0).zip(Array(s, s)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(math.abs(math.abs(evecs(1)(0)) - s) < 1e-9)
  }

  test("pca: perfectly correlated 2-d data collapses to one component") {
    // y = 2x: first PC carries all variance, second is ~0 everywhere
    val data = VxFrame((1 to 10).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y"))
    val f = Transformers.pca(data, Seq("x", "y"))
    val r = f.df.agg(
      round(var_pop(col("PCA_0")), 6), round(var_pop(col("PCA_1")), 10)).head()
    val totalVar = (1 to 10).map(_.toDouble).map(v => v * v).sum / 10.0 - math.pow(5.5, 2)
    assert(math.abs(r.getDouble(0) - totalVar * 5.0) < 1e-6) // var(x)+var(2x)=5·var(x)
    assert(r.getDouble(1) == 0.0)
    // and it is state-serializable
    val fresh = VxFrame(Seq((100.0, 200.0)).toDF("x", "y")).stateSet(f.stateGet())
    assert(fresh.df.select("PCA_0").head().getDouble(0) > 0.0)
    // incremental alias fits identically
    val inc = Transformers.pcaIncremental(data, Seq("x", "y"))
    assert(inc.df.select("PCA_0").collect().map(_.getDouble(0)).toSeq ==
      f.df.select("PCA_0").collect().map(_.getDouble(0)).toSeq)
  }

  test("randomProjections: deterministic, approximately norm-preserving shape") {
    val f = Transformers.randomProjections(vf, Seq("x", "h"), 4)
    val g = Transformers.randomProjections(vf, Seq("x", "h"), 4)
    assert(f.df.select("random_projection_0").collect().map(_.getDouble(0)).toSeq ==
      g.df.select("random_projection_0").collect().map(_.getDouble(0)).toSeq)
    assert(f.df.columns.count(_.startsWith("random_projection_")) == 4)
  }

  test("multiHotEncoder matches the reference binary-code example") {
    // reference ml/transformations.py:444 docstring: red/green/blue
    val data = VxFrame(Seq("red", "green", "green", "blue", "red").map(Tuple1(_)).toDF("color"))
    val f = Transformers.multiHotEncoder(data, "color")
    val got = f.df.select("color", "color_0", "color_1", "color_2").distinct().collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(got == Map("red" -> (0, 1, 1), "green" -> (0, 1, 0), "blue" -> (0, 0, 1)))
  }

  test("bayesianTargetEncoder matches the reference smoothing example") {
    // reference ml/transformations.py:916 docstring: weight=4 -> 0.625/0.375
    val data = VxFrame(Seq(
      ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 0.0),
      ("b", 0.0), ("b", 0.0), ("b", 0.0), ("b", 1.0)).toDF("x", "y"))
    val f = Transformers.bayesianTargetEncoder(data, "x", "y", weight = 4)
    val got = f.df.select("x", "mean_encoded_x").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 0.625, "b" -> 0.375))
  }

  test("weightOfEvidenceEncoder matches the reference example") {
    // reference ml/transformations.py:988 docstring
    val data = VxFrame(Seq(
      ("a", 1.0), ("a", 1.0), ("b", 0.0), ("b", 0.0),
      ("b", 1.0), ("c", 1.0), ("c", 0.0)).toDF("x", "y"))
    val f = Transformers.weightOfEvidenceEncoder(data, "x", "y")
    val got = f.df.select("x", "woe_encoded_x").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 13.8155) < 1e-3)       // ln((1-eps)/eps)
    assert(math.abs(got("b") - (-0.693147)) < 1e-6)   // ln((1/3)/(2/3))
    assert(got("c") == 0.0)                           // ln(0.5/0.5)
  }

  test("Metrics: classification scores match hand-computed values") {
    import graft.ml.Metrics
    // yt:  1 1 1 1 0 0 0 0 ;  yp: 1 1 0 0 1 0 0 0  -> tp=2 fp=1 fn=2 tn=3
    val df = Seq((1, 1), (1, 1), (1, 0), (1, 0), (0, 1), (0, 0), (0, 0), (0, 0))
      .toDF("yt", "yp")
    assert(Metrics.accuracyScore(df, "yt", "yp") == 5.0 / 8)
    val (p, r, f1) = Metrics.precisionRecallF1(df, "yt", "yp")
    assert(p == 2.0 / 3 && r == 0.5)
    assert(math.abs(f1 - 2 * p * r / (p + r)) < 1e-12)
    val mcc = Metrics.matthewsCorrCoef(df, "yt", "yp")
    assert(math.abs(mcc - (2.0 * 3 - 1 * 2) / math.sqrt(3.0 * 4 * 4 * 5)) < 1e-12)
    val cm = Metrics.confusionMatrix(df, "yt", "yp").collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(cm == Map((1, 1) -> 2L, (1, 0) -> 2L, (0, 1) -> 1L, (0, 0) -> 3L))
    // macro average over both labels
    val (pm, rm, fm) = Metrics.precisionRecallF1Macro(df, "yt", "yp")
    val p0 = 3.0 / 5; val r0 = 3.0 / 4 // label 0: predicted 5, support 4, tp 3
    assert(math.abs(pm - (p + p0) / 2) < 1e-12)
    assert(math.abs(rm - (r + r0) / 2) < 1e-12)
    assert(fm > 0 && fm < 1)
  }

  test("Metrics: regression scores match closed forms") {
    import graft.ml.Metrics
    val df = Seq((1.0, 2.0), (2.0, 2.0), (3.0, 5.0), (4.0, 3.0)).toDF("y", "yhat")
    assert(Metrics.meanAbsoluteError(df, "y", "yhat") == (1 + 0 + 2 + 1) / 4.0)
    assert(Metrics.meanSquaredError(df, "y", "yhat") == (1 + 0 + 4 + 1) / 4.0)
    // r2 = 1 - ss_res/ss_tot; mean y = 2.5, ss_tot = 5, ss_res = 6
    assert(math.abs(Metrics.r2Score(df, "y", "yhat") - (1.0 - 6.0 / 5.0)) < 1e-12)
    // perfect prediction -> 1
    val perfect = Seq((1.0, 1.0), (2.0, 2.0)).toDF("y", "yhat")
    assert(Metrics.r2Score(perfect, "y", "yhat") == 1.0)
  }

  test("kmeans: recovers separated blobs, prediction survives state round-trip") {
    // three tight blobs around (0,0), (10,0), (0,10)
    val pts = (0 until 30).map { i =>
      val (cx, cy) = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))(i % 3)
      (cx + (i % 5) * 0.1, cy + (i % 7) * 0.1, i % 3)
    }.toDF("px", "py", "blob")
    val (fitted, centers, inertia) = Transformers.kmeans(
      VxFrame(pts), Seq("px", "py"), k = 3, maxIter = 20)
    assert(centers.length == 3)
    // every blob maps to exactly one cluster and clusters are distinct
    val mapping = fitted.df.select("blob", "prediction_kmeans").distinct().collect()
      .map(r => r.getInt(0) -> r.getInt(1))
    assert(mapping.length == 3 && mapping.map(_._2).distinct.length == 3)
    assert(inertia < 30 * (0.5 * 0.5 + 0.7 * 0.7)) // within-blob spread bound
    // fitted model is pure state: restore onto fresh data and predict
    val blob1 = fitted.df.where("blob = 1").select("prediction_kmeans").head.getInt(0)
    val fresh = VxFrame(Seq((10.05, 0.05)).toDF("px", "py")).stateSet(fitted.stateGet())
    assert(fresh.df.select("prediction_kmeans").head.getInt(0) == blob1)
  }

  test("kmeans fit persists the working set: iterations hit the cache, nothing leaks") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // the session is shared across parallel suites, so another suite's
    // persist/localCheckpoint can be live here — leak-check by DIFF
    // against a pre-fit snapshot, not by global emptiness
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val pts = (0 until 30).map(i => (i % 3 * 10.0 + i % 5 * 0.1, i % 3 * 5.0)).toDF("px", "py")
      Transformers.kmeans(VxFrame(pts), Seq("px", "py"), k = 3, maxIter = 5)
      // listener delivery is async — poll briefly
      val deadline = System.currentTimeMillis() + 10000
      def cacheHits = plans.synchronized { plans.count(_.contains("InMemoryTableScan")) }
      while (cacheHits < 2 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      // init pass + every Lloyd iteration read the persisted working
      // set (>= 2 proves iteration 2+ hit the cache, not the source)
      assert(cacheHits >= 2, plans.synchronized(plans.mkString("\n---\n")).take(3000))
    } finally spark.listenerManager.unregister(listener)
    // unpersist ran (fit completed): no NEW cached RDD left behind
    // (unpersist(blocking=false) is async — poll until the diff clears)
    def leakedNow = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline2 = System.currentTimeMillis() + 15000
    while (leakedNow.nonEmpty && System.currentTimeMillis() < deadline2) Thread.sleep(100)
    assert(leakedNow.isEmpty, s"leaked RDD ids: ${leakedNow.mkString(",")}")
  }

  test("groupByTransformer: group aggregates as serializable state") {
    val f = Transformers.groupByTransformer(vf, "k",
      Map("mean_h" -> ("mean", "h"), "n" -> ("count", "x")))
    val r = f.df.where("k = 'a'").select("k_mean_h", "k_n").head()
    assert(r.getDouble(0) == 6.0 && r.getLong(1) == 2L)
    // survives state round-trip on fresh data
    val fresh = VxFrame(Seq((9.0, "b", 0.0)).toDF("x", "k", "h")).stateSet(f.stateGet())
    assert(fresh.df.select("k_mean_h").head().getDouble(0) == 14.5)
  }
}
