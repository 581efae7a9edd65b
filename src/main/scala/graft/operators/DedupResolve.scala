package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup group resolution: verified near-duplicate PAIRS -> connected
  * components -> canonical keep-list. The reference stops at pairwise
  * similarity (its dedup story is single-node hash sets); a production
  * pipeline needs the last mile — if A~B and B~C, exactly one of
  * {A,B,C} survives, even though (A,C) was never emitted as a pair.
  *
  * Algorithm: iterative hash-min label propagation. Every node starts
  * labelled with its own id; each round every node takes the min label
  * among itself and its neighbours; converges in O(component diameter)
  * rounds — near-dup clusters are shallow (chains of a few docs), so
  * this is 2-4 rounds in practice. Each round is one shuffle join of
  * the (small) edge list against the label table — no driver-side
  * graph, no GraphFrames dependency; `localCheckpoint` truncates the
  * iterative lineage so plans stay flat at scale.
  */
object DedupResolve {

  /** Connected components of an undirected pair list.
    * Input: columns `a`, `b` (node ids, one row per edge).
    * Output: (id, comp) for every node appearing in an edge, where
    * comp = the minimum node id in the component (deterministic). */
  def connectedComponents(pairs: DataFrame, a: String = "id_a", b: String = "id_b",
                          maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min("comp").as("nbr_comp"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old_comp"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .localCheckpoint()
      converged = updated.where(col("comp") =!= col("old_comp")).limit(1).count() == 0
      labels = updated.select("id", "comp")
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIter iterations — a " +
          "component's diameter exceeds maxIter and labels are only partially " +
          "propagated; raise maxIter (rounds needed = O(max component diameter))")
    labels
  }

  /** Canonical keep-list: every doc labelled with its component (itself
    * when unpaired) and a `keep` flag under the deterministic
    * min-id-survives rule. One row per input doc. */
  def keepList(docs: DataFrame, idCol: String, pairs: DataFrame,
               a: String = "id_a", b: String = "id_b"): DataFrame = {
    val comps = connectedComponents(pairs, a, b)
      .withColumnRenamed("id", idCol)
    docs.join(comps, Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
      .withColumn("keep", col(idCol) === col("comp"))
  }

  /** Quality-aware keep-list: within each component the doc with the
    * HIGHEST `scoreCol` survives (ties -> lowest id) — the production
    * rule (keep the longest/cleanest copy; RefinedWeb and Gopher both
    * resolve clusters by quality, not id). One lexicographic
    * max(struct) aggregation per component on top of keepList's
    * shuffles; no window. */
  def keepBestList(docs: DataFrame, idCol: String, scoreCol: String,
                   pairs: DataFrame, a: String = "id_a",
                   b: String = "id_b"): DataFrame = {
    val comps = connectedComponents(pairs, a, b)
      .withColumnRenamed("id", idCol)
    val labelled = docs.join(comps, Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
    val winners = labelled.groupBy("comp")
      .agg(max(struct(col(scoreCol).as("s"), (-col(idCol)).as("negid"))).as("m"))
      .select(col("comp"), (-col("m.negid")).as("__winner"))
    labelled.join(winners, Seq("comp"))
      .withColumn("keep", col(idCol) === col("__winner"))
      .drop("__winner")
  }
}
