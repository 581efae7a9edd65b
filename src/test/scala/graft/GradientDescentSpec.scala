package graft

import org.apache.spark.sql.functions._
import graft.ml.GradientDescent

/** Declarative distributed GD vs an independent plain-Scala reference
  * implementing the same update rule (decimal-exact gradient sums,
  * 6 dp gradient rounding, power-of-two learning rate) — the kernel-
  * pinning discipline: the Spark plan must reproduce the reference
  * trajectory EXACTLY, not approximately. */
class GradientDescentSpec extends SparkSpec {

  private def referenceFit(rows: Seq[(Double, Double, Double)],
      iters: Int, lr: Double, hinge: Boolean = false): Seq[Double] = {
    var w = Array(0.0, 0.0, 0.0)
    (1 to iters).foreach { _ =>
      val grads = (0 to 2).map { j =>
        // exact-decimal accumulation mirrors Q.dsum
        var acc = java.math.BigDecimal.ZERO
        rows.foreach { case (x1, x2, y) =>
          val f = w(0) + w(1) * x1 + w(2) * x2
          val resid = if (hinge) -2.0 * y * math.max(0.0, 1.0 - y * f)
                      else f - y
          val term = if (j == 0) resid else if (j == 1) resid * x1 else resid * x2
          // Spark's double->decimal cast is toString-based
          // (BigDecimal.valueOf), not the exact binary expansion
          acc = acc.add(java.math.BigDecimal.valueOf(term)
            .setScale(10, java.math.RoundingMode.HALF_UP))
        }
        val g = acc.doubleValue() / rows.size
        BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      w = (0 to 2).map(j => w(j) - lr * grads(j)).toArray
    }
    w.toSeq.map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("distributed GD reproduces the reference trajectory exactly and converges") {
    import spark.implicits._
    // y = 2 + 3*x1 - 1.5*x2 + deterministic noise
    val rows = (0 until 600).map { i =>
      val x1 = (i % 37) / 37.0
      val x2 = (i % 11) / 11.0
      val noise = ((i * 2654435761L % 1000) / 1000.0 - 0.5) * 0.01
      (x1, x2, 2.0 + 3.0 * x1 - 1.5 * x2 + noise)
    }
    val df = rows.toDF("x1", "x2", "y").repartition(4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val got = GradientDescent.linearFit(df, Seq("x1", "x2"), "y",
        iters = 5, lr = 0.25).head
      val expect = referenceFit(rows, iters = 5, lr = 0.25)
      (0 to 2).foreach(j => assert(got.getDouble(j) == expect(j),
        s"w$j: ${got.getDouble(j)} != ${expect(j)}"))
      // loss actually decreases across iterations (it IS optimizing)
      def loss(w: Seq[Double]) = rows.map { case (x1, x2, y) =>
        val r = w(0) + w(1) * x1 + w(2) * x2 - y; r * r
      }.sum / rows.size
      val l0 = loss(Seq(0, 0, 0))
      val l2 = loss(referenceFit(rows, 2, 0.25))
      val l5 = loss(expect)
      assert(l5 < l2 && l2 < l0, s"loss not decreasing: $l0 -> $l2 -> $l5")
    } finally df.unpersist()
  }

  test("generated oracle SQL names every iteration exactly once (materialized)") {
    val sql = GradientDescent.oracleSql("SELECT 1 AS x1, 2 AS y FROM t",
      Seq("x1"), "y", iters = 3, lr = 0.125)
    (1 to 3).foreach { i =>
      assert(sql.contains(s"g$i AS MATERIALIZED"))
      assert(sql.contains(s"w$i AS MATERIALIZED"))
    }
    assert(sql.contains("FROM w3"))
  }
  test("squared-hinge classifier fit matches the reference trajectory exactly") {
    import spark.implicits._
    // two clouds around +-(0.7, 0.3), labels +-1
    val rows = (0 until 400).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      val x1 = sign * 0.7 + ((i % 13) / 13.0 - 0.5) * 0.4
      val x2 = sign * 0.3 + ((i % 7) / 7.0 - 0.5) * 0.4
      (x1, x2, sign)
    }
    val df = rows.toDF("x1", "x2", "y").repartition(3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val got = GradientDescent.squaredHingeFit(df, Seq("x1", "x2"), "y",
        iters = 5, lr = 0.25).head
      val expect = referenceFit(rows, iters = 5, lr = 0.25, hinge = true)
      (0 to 2).foreach(j => assert(got.getDouble(j) == expect(j),
        s"w$j: ${got.getDouble(j)} != ${expect(j)}"))
      // and it separates: the margin-weighted accuracy is high
      val acc = rows.count { case (x1, x2, y) =>
        math.signum(expect(0) + expect(1) * x1 + expect(2) * x2) == y
      }.toDouble / rows.size
      assert(acc > 0.95, s"accuracy $acc")
    } finally df.unpersist()
  }

  test("VxFrame facade fits share the module's algebra") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i / 100.0, 2.0 + 3.0 * (i / 100.0)))
      .toDF("x1", "y")
    val viaFacade = VxFrame(df).fitLinear(Seq("x1"), "y", iters = 3, lr = 0.25).head
    val viaModule = GradientDescent.linearFit(df, Seq("x1"), "y", 3, 0.25).head
    assert(viaFacade == viaModule)
  }

}
