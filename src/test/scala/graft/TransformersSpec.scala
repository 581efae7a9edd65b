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
}
