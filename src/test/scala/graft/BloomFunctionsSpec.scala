package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** [[BloomFunctions]] — the decontamination prefilter kernel.
  *
  * The load-bearing test is interpreted-vs-codegen parity:
  * [[BloomFunctions.BloomFilterHashes.doGenCode]] hand-mirrors the
  * Scala `testBits` loop in Java source, so a divergence (shift width,
  * null branch, double-hash mix) would silently corrupt candidate sets
  * in production while interpreted-path tests stay green. The DataFrame
  * path here runs over an RDD-backed frame (NOT a LocalRelation, which
  * Catalyst would constant-fold driver-side with interpreted eval), so
  * the projection goes through whole-stage codegen; the reference
  * output is `nullSafeEval` called directly on the same expression.
  */
class BloomFunctionsSpec extends SparkSpec {
  import BloomFunctions._

  private val keys = Seq(0L, 1L, -1L, 42L, Long.MinValue, Long.MaxValue,
    Phi64, 1L << 60, -962287236L)

  private def bloomOf(ks: Seq[Long], mBits: Int, k: Int): Array[Byte] = {
    import spark.implicits._
    buildBloom(ks.toDF("h"), col("h"), mBits, k)
  }

  /** Adversarial probe arrays: empty, null-only, nulls interleaved with
    * hits and misses, extremes. `null` marks a null ELEMENT. */
  private val probes: Seq[Seq[java.lang.Long]] = Seq(
    Seq.empty,
    Seq(null),
    Seq(null, null, null),
    keys.map(java.lang.Long.valueOf),
    Seq[java.lang.Long](7L, null, Long.MinValue, 999999999999L, null, 0L),
    (0L until 64L).map(java.lang.Long.valueOf),
    Seq[java.lang.Long](Long.MinValue, Long.MaxValue, null, -1L, 1L))

  private def interpretedProbe(bloom: Array[Byte], in: Seq[java.lang.Long]): Seq[Long] = {
    val (k, words) = deserializeBloom(bloom)
    val e = BloomFilterHashes(Literal(null, ArrayType(LongType)), k, words)
    e.nullSafeEval(new GenericArrayData(in.toArray[Any]))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
  }

  private def codegenProbe(bloom: Array[Byte], in: Seq[Seq[java.lang.Long]]): Seq[Seq[Long]] = {
    val schema = StructType(Seq(StructField("i", IntegerType, nullable = false),
      StructField("arr", ArrayType(LongType, containsNull = true), nullable = true)))
    val rows = in.zipWithIndex.map { case (a, i) => Row(i, a) }
    // RDD-backed -> survives the optimizer as a real scan + projected
    // whole-stage-codegen'd BloomFilterHashes (doGenCode executes)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    df.select(col("i"), bloomFilterCandidates(col("arr"), bloom).as("c"))
      .collect().sortBy(_.getInt(0)).toSeq
      .map(_.getSeq[Long](1))
  }

  for ((mBits, k) <- Seq((64, 1), (1024, 16), (1 << 16, 5))) {
    test(s"interpreted nullSafeEval == codegen doGenCode (mBits=$mBits k=$k)") {
      val bloom = bloomOf(keys, mBits, k)
      val viaCodegen = codegenProbe(bloom, probes)
      val viaInterp = probes.map(p => interpretedProbe(bloom, p))
      assert(viaCodegen == viaInterp)
      // and no false negatives on either path: every inserted key survives
      assert(viaInterp(3) == keys)
    }
  }

  test("null array probes to null; null elements are dropped") {
    val bloom = bloomOf(keys, 1024, 3)
    val out = codegenProbe(bloom, Seq(null, Seq(null, 42L, null)))
    assert(out.head == null)
    assert(out(1) == Seq(42L))
  }

  test("build merge is partition-count invariant (word-wise OR)") {
    import spark.implicits._
    val ks = (0L until 5000L).map(i => i * 2654435761L)
    val one = buildBloom(ks.toDF("h").coalesce(1), col("h"), 1 << 16, 7)
    val many = buildBloom(ks.toDF("h").repartition(8), col("h"), 1 << 16, 7)
    assert(java.util.Arrays.equals(one, many))
  }

  test("false-positive rate is sane at 16 bits/key") {
    val inserted = (0L until 4000L).map(i => i * 6364136223846793005L + 1L)
    val bloom = bloomOf(inserted, 1 << 16, 11)
    val misses = (1L to 10000L).map(i => i * 2862933555777941757L + 3L)
      .filterNot(inserted.toSet)
    val fp = misses.count(h =>
      interpretedProbe(bloom, Seq(java.lang.Long.valueOf(h))).nonEmpty)
    assert(fp < 50, s"fp=$fp of ${misses.size}")
  }

  test("bloomAgg casts non-bigint input instead of crashing executor-side") {
    import spark.implicits._
    val df = (0 until 100).toDF("v").select(col("v").cast("int").as("v"))
    val bloom = buildBloom(df, col("v"), 1024, 3)
    assert(interpretedProbe(bloom, Seq(java.lang.Long.valueOf(7L))).nonEmpty)
  }

  test("bloomContains: member true, absent-mostly false, null false") {
    import spark.implicits._
    val bloom = bloomOf(keys, 1 << 16, 11)
    val df = Seq[java.lang.Long](42L, 1234567L, null).toDF("v")
    val got = df.select(bloomContains(col("v"), bloom)).collect().map(_.getBoolean(0))
    assert(got(0)); assert(!got(1)); assert(!got(2))
  }

  test("content-based equality: identical probes are equal expressions") {
    val bloom = bloomOf(keys, 1024, 3)
    val (k, w1) = deserializeBloom(bloom)
    val (_, w2) = deserializeBloom(bloom.clone())
    val c = Literal.create(Seq(1L, 2L), ArrayType(LongType))
    assert(BloomFilterHashes(c, k, w1) == BloomFilterHashes(c, k, w2))
    assert(BloomFilterHashes(c, k, w1).hashCode == BloomFilterHashes(c, k, w2).hashCode)
    assert(BloomFilterHashes(c, k, w1).semanticEquals(BloomFilterHashes(c, k, w2)))
  }

  test("deserializeBloom rejects corrupt headers") {
    intercept[IllegalArgumentException] {
      deserializeBloom(Array.fill[Byte](20)(3))
    }
  }

  test("q_decontaminate_bloom is row-identical to q_decontaminate_fast") {
    val fast = graft.SparkEntry.queries("q_decontaminate_fast")(spark, sf0001).collect().toSeq
    val bl = graft.SparkEntry.queries("q_decontaminate_bloom")(spark, sf0001).collect().toSeq
    assert(bl == fast)
    assert(bl.nonEmpty)
  }
}
