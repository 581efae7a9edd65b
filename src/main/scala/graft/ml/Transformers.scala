package graft.ml

import org.apache.spark.sql.functions._
import graft.VxFrame

/** ML preprocessing transformers (reference: packages/vaex-ml/vaex/ml/
  * transformations.py) re-expressed in the engine's own state model:
  * vaex pipelines are "just state" — virtual columns + variables
  * captured by state_get (reference: core/dataframe.py:2502,
  * ml/state.py) — so every transformer here is
  *
  *   fit:       one distributed aggregation pass -> a few scalars
  *   transform: a virtual column added to the VxFrame
  *
  * and the fitted pipeline serializes/restores through
  * `VxFrame.stateGet/stateSet` with no extra machinery. All transforms
  * are expression strings -> whole-stage codegen; fit passes are single
  * `agg` calls -> partial/final hash aggregation at any scale.
  */
object Transformers {

  /** StandardScaler (reference: ml/transformations.py:582): fit =
    * mean/std (ddof=0) pass; transform = (x - mean) / std. */
  def standardScaler(f: VxFrame, column: String, prefix: String = "standard_scaled_"): VxFrame = {
    val r = f.df.agg(
      avg(col(column)).as("mean"),
      stddev_pop(col(column)).as("std")).head()
    val (m, s) = (r.getDouble(0), r.getDouble(1))
    f.withVariable(s"__${column}_mean", m)
      .withVariable(s"__${column}_std", if (s == 0.0) 1.0 else s)
      .withVirtualColumn(s"$prefix$column",
        s"($column - __${column}_mean) / __${column}_std")
  }

  /** MinMaxScaler (reference: ml/transformations.py:653) onto
    * [lo, hi] (default [0,1]); single minmax pass. */
  def minMaxScaler(f: VxFrame, column: String, lo: Double = 0.0, hi: Double = 1.0,
                   prefix: String = "minmax_scaled_"): VxFrame = {
    val r = f.df.agg(min(col(column)).cast("double"), max(col(column)).cast("double")).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val span = if (mx == mn) 1.0 else mx - mn
    f.withVariable(s"__${column}_min", mn)
      .withVariable(s"__${column}_span", span)
      .withVirtualColumn(s"$prefix$column",
        s"(($column - __${column}_min) / __${column}_span) * ${hi - lo} + $lo")
  }

  /** MaxAbsScaler (reference: ml/transformations.py:726). */
  def maxAbsScaler(f: VxFrame, column: String, prefix: String = "absmax_scaled_"): VxFrame = {
    val m = f.df.agg(max(abs(col(column))).cast("double")).head().getDouble(0)
    f.withVariable(s"__${column}_absmax", if (m == 0.0) 1.0 else m)
      .withVirtualColumn(s"$prefix$column", s"$column / __${column}_absmax")
  }

  /** RobustScaler (reference: ml/transformations.py:784): center by
    * median, scale by IQR. Defaults to the sketch-based
    * `percentile_approx` (the exact percentile buffers all values per
    * group — an OOM hazard at 100 TB; the reference's own percentile
    * is grid-approximate anyway); `exact = true` opts in for
    * small-frame bit-parity. */
  def robustScaler(f: VxFrame, column: String, prefix: String = "robust_scaled_",
                   exact: Boolean = false): VxFrame = {
    val fn = if (exact) "percentile" else "percentile_approx"
    val r = f.df.agg(
      expr(s"CAST($fn($column, 0.5) AS DOUBLE)"),
      expr(s"CAST($fn($column, 0.75) - $fn($column, 0.25) AS DOUBLE)")).head()
    val iqr = if (r.getDouble(1) == 0.0) 1.0 else r.getDouble(1)
    f.withVariable(s"__${column}_median", r.getDouble(0))
      .withVariable(s"__${column}_iqr", iqr)
      .withVirtualColumn(s"$prefix$column",
        s"($column - __${column}_median) / __${column}_iqr")
  }

  /** LabelEncoder (reference: ml/transformations.py:302): fit =
    * sorted distinct values -> ordinal codes; transform = CASE chain
    * (dictionary is expression-encoded state, so it serializes).
    * Guard `maxCardinality` mirrors vaex's row_limit idiom. */
  def labelEncoder(f: VxFrame, column: String, prefix: String = "label_encoded_",
                   maxCardinality: Int = 10000): VxFrame = {
    val values = f.df.select(col(column).cast("string")).distinct()
      .orderBy(col(column)).limit(maxCardinality + 1)
      .collect().map(_.getString(0))
    require(values.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    val cases = values.zipWithIndex
      .map { case (v, i) => s"WHEN $column = '${v.replace("'", "''")}' THEN $i" }
      .mkString("CASE ", " ", " ELSE -1 END")
    f.withVirtualColumn(s"$prefix$column", cases)
  }

  /** OneHotEncoder (reference: ml/transformations.py:366): one 0/1
    * virtual column per distinct value. */
  def oneHotEncoder(f: VxFrame, column: String, maxCardinality: Int = 64): VxFrame = {
    val values = f.df.select(col(column).cast("string")).distinct()
      .orderBy(col(column)).limit(maxCardinality + 1)
      .collect().map(_.getString(0))
    require(values.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    values.foldLeft(f) { (acc, v) =>
      val safe = v.replaceAll("[^A-Za-z0-9_]", "_")
      acc.withVirtualColumn(s"${column}_$safe",
        s"CASE WHEN $column = '${v.replace("'", "''")}' THEN 1 ELSE 0 END")
    }
  }

  /** FrequencyEncoder (reference: ml/transformations.py:523): value ->
    * relative frequency. */
  def frequencyEncoder(f: VxFrame, column: String, prefix: String = "frequency_encoded_",
                       maxCardinality: Int = 10000): VxFrame = {
    val rows = f.df.groupBy(col(column).cast("string").as("v"))
      .agg(count(lit(1)).as("n")).limit(maxCardinality + 1).collect()
    require(rows.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    val total = rows.map(_.getLong(1)).sum.toDouble
    val cases = rows.sortBy(_.getString(0))
      .map(r => s"WHEN $column = '${r.getString(0).replace("'", "''")}' THEN ${r.getLong(1) / total}D")
      .mkString("CASE ", " ", " ELSE 0.0D END")
    f.withVirtualColumn(s"$prefix$column", cases)
  }

  /** KBinsDiscretizer (reference: ml/transformations.py:1067),
    * uniform strategy: fixed-width bins from one minmax pass. */
  def kBinsDiscretizer(f: VxFrame, column: String, nBins: Int,
                       prefix: String = "binned_"): VxFrame = {
    val r = f.df.agg(min(col(column)).cast("double"), max(col(column)).cast("double")).head()
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    val width = if (mx == mn) 1.0 else (mx - mn) / nBins
    f.withVariable(s"__${column}_binmin", mn)
      .withVariable(s"__${column}_binwidth", width)
      .withVirtualColumn(s"$prefix$column",
        s"LEAST(CAST(FLOOR(($column - __${column}_binmin) / __${column}_binwidth) AS INT), ${nBins - 1})")
  }

  /** CycleTransformer (reference: ml/transformations.py:859): encode a
    * cyclic feature (hour, weekday...) as sin/cos pair. */
  def cycleTransformer(f: VxFrame, column: String, period: Double): VxFrame =
    f.withVirtualColumn(s"${column}_sin", s"SIN(2 * pi * $column / $period)")
      .withVirtualColumn(s"${column}_cos", s"COS(2 * pi * $column / $period)")

  // ------------------------------------------------------------ PCA family

  /** Jacobi eigendecomposition of a symmetric matrix (driver-side; the
    * covariance matrix is k×k for k features — tiny at any data scale).
    * Returns (eigenvalues, eigenvectors-as-rows) sorted by eigenvalue
    * descending, each vector sign-normalized (largest-|component|
    * positive) for determinism. */
  private[graft] def symEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 100) {
      off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = if (theta == 0.0) 1.0
            else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val vec = Array.tabulate(n)(k => v(k)(i))
      val maxIdx = vec.indices.maxBy(j => math.abs(vec(j)))
      if (vec(maxIdx) < 0) vec.map(-_) else vec
    }.toArray
    (evals, evecs)
  }

  /** PCA (reference: ml/transformations.py:51): fit = ONE fused
    * aggregation pass (means + full covariance matrix via
    * VxFrame.covMatrix) + driver-side Jacobi eigendecomposition of the
    * k×k covariance; transform = `PCA_i` virtual columns
    * Σ_j evec_ij (x_j - mean_j). Pure expression state — serializes
    * through stateGet like every other transformer. */
  def pca(f: VxFrame, columns: Seq[String], nComponents: Int = -1,
          prefix: String = "PCA_"): VxFrame = {
    val k = columns.length
    val nc = if (nComponents <= 0 || nComponents > k) k else nComponents
    val meanRow = f.df.agg(
      avg(col(columns.head).cast("double")),
      columns.tail.map(c => avg(col(c).cast("double"))): _*).head()
    val means = columns.indices.map(meanRow.getDouble).toArray
    val cov = f.covMatrix(columns)
    val (_, evecs) = symEigen(cov)
    (0 until nc).foldLeft(f) { (acc, i) =>
      val terms = columns.indices
        .map(j => s"(${evecs(i)(j)}) * ((${columns(j)}) - (${means(j)}))")
      acc.withVirtualColumn(s"$prefix$i", terms.mkString(" + "))
    }
  }

  /** PCAIncremental (reference: ml/transformations.py:134): the
    * reference exists because single-node PCA can't hold all rows;
    * Spark's distributed partial/final aggregation IS the incremental
    * path (per-partition partial sums merged exactly), so this is the
    * same fit with the batch knob irrelevant. Kept as an explicit
    * alias so ported pipelines resolve. */
  def pcaIncremental(f: VxFrame, columns: Seq[String], nComponents: Int = -1,
                     batchSize: Int = 0): VxFrame =
    pca(f, columns, nComponents)

  /** RandomProjections (reference: ml/transformations.py:199):
    * Gaussian random projection matrix, seeded and deterministic
    * (same algorithm as the reference; RNG stream differs from numpy,
    * documented divergence). Transform only — no fit pass. */
  def randomProjections(f: VxFrame, columns: Seq[String], nComponents: Int,
                        seed: Long = 42L, prefix: String = "random_projection_"): VxFrame = {
    val rnd = new java.util.Random(seed)
    val scale = 1.0 / math.sqrt(nComponents.toDouble)
    (0 until nComponents).foldLeft(f) { (acc, i) =>
      val terms = columns.map(c => s"(${rnd.nextGaussian() * scale}) * ($c)")
      acc.withVirtualColumn(s"$prefix$i", terms.mkString(" + "))
    }
  }

  // ------------------------------------------------------- encoder tail

  /** MultiHotEncoder (reference: ml/transformations.py:444, "binary
    * encoder"): ordinal code (sorted labels -> 1..n, unseen -> 0),
    * then each binary digit of the code becomes a 0/1 column.
    * n_dims replicates the reference's floor(log2 n)+1+(n mod 2). */
  def multiHotEncoder(f: VxFrame, column: String, prefix: String = "",
                      maxCardinality: Int = 10000): VxFrame = {
    val labels = f.df.select(col(column).cast("string")).where(col(column).isNotNull)
      .distinct().orderBy(col(column)).limit(maxCardinality + 1)
      .collect().map(_.getString(0))
    require(labels.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    val n = labels.length
    val nDims = (math.floor(math.log(n) / math.log(2)).toInt + 1 + (n % 2))
    val codeCase = labels.zipWithIndex
      .map { case (v, i) => s"WHEN $column = '${v.replace("'", "''")}' THEN ${i + 1}" }
      .mkString("CASE ", " ", " ELSE 0 END")
    val withCode = f.withVirtualColumn(s"__${column}_mh_code", codeCase)
    (0 until nDims).foldLeft(withCode) { (acc, i) =>
      val j = nDims - 1 - i
      acc.withVirtualColumn(s"$prefix${column}_$i",
        s"CAST(SHIFTRIGHT(__${column}_mh_code, $j) & 1 AS INT)")
    }
  }

  /** BayesianTargetEncoder (reference: ml/transformations.py:916):
    * category -> (n·mean + weight·globalMean) / (n + weight);
    * unseen -> NaN (reference default). Fit = one groupBy pass. */
  def bayesianTargetEncoder(f: VxFrame, column: String, target: String,
                            weight: Double = 100.0,
                            prefix: String = "mean_encoded_",
                            maxCardinality: Int = 10000): VxFrame = {
    val globalMean = f.df.agg(avg(col(target).cast("double"))).head().getDouble(0)
    val rows = f.df.groupBy(col(column).cast("string").as("v"))
      .agg(count(col(target)).as("n"), avg(col(target).cast("double")).as("m"))
      .where(col("v").isNotNull).limit(maxCardinality + 1).collect()
    require(rows.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    val cases = rows.sortBy(_.getString(0)).map { r =>
      val enc = (r.getLong(1) * r.getDouble(2) + weight * globalMean) / (r.getLong(1) + weight)
      s"WHEN $column = '${r.getString(0).replace("'", "''")}' THEN ${enc}D"
    }.mkString("CASE ", " ", " ELSE CAST('NaN' AS DOUBLE) END")
    f.withVirtualColumn(s"$prefix$column", cases)
  }

  /** WeightOfEvidenceEncoder (reference: ml/transformations.py:988):
    * p = mean(target∈{0,1}) per category, clamped to [eps, 1-eps],
    * woe = ln(p / (1-p)); unseen -> NaN. */
  def weightOfEvidenceEncoder(f: VxFrame, column: String, target: String,
                              epsilon: Double = 0.000001,
                              prefix: String = "woe_encoded_",
                              maxCardinality: Int = 10000): VxFrame = {
    val rows = f.df.groupBy(col(column).cast("string").as("v"))
      .agg(avg(col(target).cast("double")).as("p"))
      .where(col("v").isNotNull).limit(maxCardinality + 1).collect()
    require(rows.length <= maxCardinality, s"cardinality of $column exceeds $maxCardinality")
    val cases = rows.sortBy(_.getString(0)).map { r =>
      val p0 = r.getDouble(1)
      val p = if (p0 == 0.0) epsilon else p0
      val neg0 = 1.0 - p
      val neg = if (neg0 == 0.0) epsilon else neg0
      s"WHEN $column = '${r.getString(0).replace("'", "''")}' THEN ${math.log(p / neg)}D"
    }.mkString("CASE ", " ", " ELSE CAST('NaN' AS DOUBLE) END")
    f.withVirtualColumn(s"$prefix$column", cases)
  }

  /** GroupByTransformer (reference: ml/transformations.py:1193): join
    * per-group aggregate features back onto each row. The fitted
    * group table is encoded as CASE-chain expression state (cardinality
    * guarded) so the pipeline stays serializable — the reference
    * stores the grouped dataframe in state and joins on transform;
    * for bounded-cardinality keys a literal mapping is the same thing
    * without a shuffle. `agg`: (outputName -> (aggHow, valueColumn)). */
  def groupByTransformer(f: VxFrame, by: String, agg: Map[String, (String, String)],
                         maxCardinality: Int = 10000): VxFrame = {
    val aggCols = agg.toSeq.map { case (out, (how, c)) =>
      val a = how match {
        case "count" => count(col(c))
        case "sum" => sum(col(c).cast("double"))
        case "mean" => avg(col(c).cast("double"))
        case "min" => min(col(c).cast("double"))
        case "max" => max(col(c).cast("double"))
        case other => throw new IllegalArgumentException(s"unknown agg: $other")
      }
      a.as(out)
    }
    val rows = f.df.groupBy(col(by).cast("string").as("v"))
      .agg(aggCols.head, aggCols.tail: _*)
      .where(col("v").isNotNull).limit(maxCardinality + 1).collect()
    require(rows.length <= maxCardinality, s"cardinality of $by exceeds $maxCardinality")
    agg.keys.toSeq.sorted.foldLeft(f) { (acc, out) =>
      val idx = rows.head.schema.fieldIndex(out)
      val cases = rows.sortBy(_.getString(0)).map { r =>
        val value = r.get(idx) match {
          case d: java.lang.Double => s"${d}D"
          case l: java.lang.Long => s"${l}L"
          case other => other.toString
        }
        s"WHEN $by = '${r.getString(0).replace("'", "''")}' THEN $value"
      }.mkString("CASE ", " ", " ELSE NULL END")
      acc.withVirtualColumn(s"${by}_$out", cases)
    }
  }

  /** KMeans clustering (reference: packages/vaex-ml/vaex/ml/cluster.py:66
    * — Lloyd's algorithm over scalar feature columns; distinct from the
    * IVF quantizer in operators.SimilaritySearch which clusters packed
    * float vectors).
    *
    * fit: deterministic init (first k distinct feature tuples in
    * xxhash64 order — reproducible, no RNG), then per iteration ONE
    * distributed job: argmin-assignment is pure column algebra
    * (array + array_min + array_position, codegen'd) and the new
    * centers come from a k-row groupBy-avg collect. Empty clusters
    * keep their previous center (the reference's behavior).
    *
    * transform: the fitted centers become per-cluster squared-distance
    * VIRTUAL COLUMNS plus an argmin prediction column — expression
    * strings, so the fitted model serializes through state_get/state_set
    * exactly like every other transformer (pipelines are "just state").
    *
    * Returns (frame+prediction, centers, inertia). */
  def kmeans(f: VxFrame, features: Seq[String], k: Int, maxIter: Int = 10,
             prediction: String = "prediction_kmeans"): (VxFrame, Seq[Seq[Double]], Double) = {
    require(features.nonEmpty && k > 0, "kmeans: need features and k > 0")
    val feats = features.map(c => col(c).cast("double"))
    // Lloyd's loop re-reads the working set every iteration (init scan +
    // maxIter assignment scans) — persist it once so iterations hit the
    // in-memory columnar cache instead of re-scanning the source (at
    // scale, 5 iterations would otherwise be 5 full input reads; same
    // idiom as DedupResolve's localCheckpoint lineage flattening).
    val pts = f.df.select(feats: _*).na.drop()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centers: Array[Array[Double]] = pts.distinct()
        .orderBy(xxhash64(features.map(col): _*))
        .limit(k).collect()
        .map(r => features.indices.map(r.getDouble).toArray)
      require(centers.length == k, s"kmeans: fewer than $k distinct points")
      def distArr(cs: Array[Array[Double]]) = array(cs.map { ct =>
        features.zip(ct).map { case (c, v) =>
          (col(c) - v) * (col(c) - v) }.reduce(_ + _)
      }: _*)
      var inertia = Double.MaxValue
      var it = 0
      var converged = false
      while (it < maxIter && !converged) {
        val arr = distArr(centers)
        val assignCols =
          (array_position(arr, array_min(arr)) - 1).cast("int").as("__c") +:
            array_min(arr).as("__d") +:
            features.map(col)
        val assigned = pts.select(assignCols: _*)
        // decimal-exact means: partition-order independent, so repeated
        // fits on the same data yield BITWISE-identical centers (the
        // oracle injection in ScaleOpsQueries depends on this)
        val stats = assigned.groupBy("__c")
          .agg(sum(col("__d")).as("__inertia"),
            features.map(c =>
              (sum(col(c).cast(graft.queries.Q.DEC)) / count(lit(1)))
                .cast("double").as(c)) :+ count(lit(1)).as("__n"): _*)
          .collect()
        val next = centers.clone()
        var newInertia = 0.0
        stats.foreach { r =>
          val ci = r.getInt(0)
          newInertia += r.getDouble(1)
          next(ci) = features.indices.map(i => r.getDouble(2 + i)).toArray
        }
        // convergence on (deterministic) center movement, not on the
        // partition-order-sensitive inertia sum
        val shift = centers.zip(next).map { case (a, b) =>
          a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum }.max
        converged = shift < 1e-18
        inertia = newInertia
        centers = next
        it += 1
      }
      // transform: per-cluster distance virtual columns + argmin prediction
      val withDists = centers.zipWithIndex.foldLeft(f) { case (acc, (ct, i)) =>
        acc.withVirtualColumn(s"__${prediction}_d$i",
          features.zip(ct).map { case (c, v) => s"(($c - $v) * ($c - $v))" }.mkString(" + "))
      }
      val dNames = centers.indices.map(i => s"__${prediction}_d$i").mkString(", ")
      val out = withDists.withVirtualColumn(prediction,
        s"CAST(array_position(array($dNames), array_min(array($dNames))) - 1 AS INT)")
      (out, centers.map(_.toSeq).toSeq, inertia)
    } finally pts.unpersist(blocking = false)
  }
}
