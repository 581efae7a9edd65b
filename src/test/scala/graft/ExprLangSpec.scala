package graft

import org.apache.spark.sql.functions._
import graft.functions.ExprLang

/** The vaex Python-expression grammar (reference: core/expresso.py:33-41)
  * must translate to Spark SQL; plain Spark SQL must pass through. */
class ExprLangSpec extends SparkSpec {
  import spark.implicits._

  private def ev(e: String): Any =
    VxFrame(Seq((3.0, 2.0)).toDF("x", "y")).withVirtualColumn("z", e)
      .df.select("z").head.get(0)

  test("power, floordiv, mod translate") {
    assert(ExprLang.translate("x**2").get == "POWER(x, 2)")
    assert(ev("x**2") == 9.0)
    assert(ev("7 // 2") == 3L)
    assert(ev("x**2 // y") == 4L)       // floor(9/2)
    assert(ev("7 % 3") == 1)            // pmod
  }

  test("numpy function aliases: deg2rad/rad2deg/power/clip") {
    assert(math.abs(ev("deg2rad(180.0)").asInstanceOf[Double] - math.Pi) < 1e-12)
    assert(math.abs(ev("rad2deg(3.141592653589793)").asInstanceOf[Double] - 180.0) < 1e-9)
    assert(ev("power(x, 2)") == 9.0)
    assert(ev("clip(x, 0, 2)") == 2.0)  // composed as least(greatest(...))
    assert(ev("clip(x, 4, 9)") == 4.0)
  }

  test("python operator precedence and associativity") {
    assert(ev("2**3**2") == 512.0)      // right-assoc: 2**(3**2)
    assert(ev("-x**2") == -9.0)         // -(x**2), not (-x)**2
    assert(ev("2**-1") == 0.5)
    assert(ev("1 + 2 * 3") == 7.0 || ev("1 + 2 * 3") == 7)
  }

  test("mask algebra: & | ~ ^ and keywords") {
    assert(ev("(x > 2) & (y < 3)") == true)
    assert(ev("(x > 5) | (y < 3)") == true)
    assert(ev("~(x > 5)") == true)
    assert(ev("(x > 2) ^ (y > 1)") == false) // both true -> xor false
    assert(ev("(x > 2) and (y < 3)") == true)
    assert(ev("not (x > 5)") == true)
  }

  test("bitwise ^ & | ~ on integers, logical on booleans (numpy dual-use)") {
    // integer operands: Spark bitwise operators (round-2 bug: `a ^ b`
    // silently became boolean `!=` even for integer hashing exprs)
    assert(ev("5 ^ 3") == 6)
    assert(ev("5 & 3") == 1)
    assert(ev("5 | 3") == 7)
    assert(ev("~5") == -6)
    // boolean COLUMNS (not just comparisons) get logical ops
    def evb(e: String): Any =
      VxFrame(Seq((true, false)).toDF("p", "q")).withVirtualColumn("z", e)
        .df.select("z").head.get(0)
    assert(evb("p & q") == false)
    assert(evb("p | q") == true)
    assert(evb("p ^ q") == true)
    assert(evb("~p") == false)
    // predicate functions count as boolean operands
    assert(ev("isnan(x) | (y > 1)") == true)
  }

  test("columns shadow default variables pi/e") {
    val f = VxFrame(Seq((1.0, 2.0)).toDF("e", "pi"))
    assert(f.withVirtualColumn("z", "e + 1").df.select("z").head.getDouble(0) == 2.0)
    assert(f.withVirtualColumn("z", "pi * 2").df.select("z").head.getDouble(0) == 4.0)
    // and the constants still work when no column claims the name
    val g = VxFrame(Seq((1.0)).toDF("x"))
    assert(math.abs(g.withVirtualColumn("z", "pi * x")
      .df.select("z").head.getDouble(0) - math.Pi) < 1e-15)
  }

  test("shifts, equality, numpy function names") {
    assert(ev("1 << 3") == 8)
    assert(ev("16 >> 2") == 4)
    assert(ev("x == 3.0") == true)
    assert(ev("maximum(x, y)") == 3.0)
    assert(ev("arctan2(0, 1)") == 0.0)
    assert(ev("where(x > y, x, y)") == 3.0)
  }

  test("canonical vaex state shape: z = x + t*y with variable t") {
    // reference: tests/common.py:379-381
    val f = VxFrame(Seq((1.0, 10.0), (2.0, 20.0)).toDF("x", "y"))
      .withVariable("t", 1.0)
      .withVirtualColumn("z", "x + t*y")
    assert(f.df.select(sum("z")).head.getDouble(0) == 33.0)
    // and it round-trips through serialized state
    val restored = VxFrame(Seq((3.0, 30.0)).toDF("x", "y")).stateSet(f.stateGet())
    assert(restored.df.select("z").head.getDouble(0) == 33.0)
  }

  test("Spark SQL falls back untouched") {
    for (sql <- Seq(
      "CAST(l_quantity AS INT) % 4",
      "CASE WHEN a > 1 THEN 'x' ELSE 'y' END",
      "a IS NOT NULL",
      "o_orderstatus = 'F'",
      "a || b")) // SQL concat must NOT become boolean OR
      assert(ExprLang.translate(sql).isEmpty, sql)
    // valid in both grammars: translation must preserve semantics
    assert(ev("x + 1") == 4.0)
    assert(ev("(x > 1)") == true)
  }
}
