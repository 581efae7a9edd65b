package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupResolve

/** Pairs -> connected components -> keep-list (min-id survivor). */
class DedupResolveSpec extends SparkSpec {
  import spark.implicits._

  test("components merge transitively across pairs") {
    // {1,2,3} via 1-2, 2-3; {5,6}; 4 isolated (absent from pairs)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val comps = DedupResolve.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("long chain converges (diameter > 1 iteration)") {
    val pairs = (10L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = DedupResolve.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.toSet === Set(10L))
    assert(comps.size == 11)
  }

  test("keepList: min id survives, unpaired docs survive as themselves") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kl = DedupResolve.keepList(docs, "doc_id", pairs)
      .select("doc_id", "comp", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(kl.toSeq === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
    // dedup invariant: kept docs = number of components
    assert(kl.count(_._3) == 3)
  }
}
