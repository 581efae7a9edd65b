package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dense-array lookup join — the reference's join fast path.
  *
  * The reference's `df.join(other, on=...)` materializes an index
  * mapping left row -> right row and then reads the right columns
  * THROUGH that index as virtual columns (reference:
  * packages/vaex-core/vaex/join.py:36 `join` builds a `lookup` int
  * array; column access is `arr[lookup]`). That is what makes its
  * "join 1e9 rows in a second" number possible: after the one-time
  * index build, a probe is one bounds-checked array read — no hash,
  * no shuffle.
  *
  * Spark-first shape: for a dimension table whose join key is an
  * integer with a bounded domain [0, n) — the categorize'd /
  * surrogate-key shape every star schema has — the dim columns are
  * collected ONCE into flat primitive arrays (bounded by `MaxDomain`,
  * same budget discipline as a broadcast hash join, minus the hash
  * table's ~2-4x overhead), and each joined column becomes a custom
  * codegen'd [[DenseLookupValue]] projection over the fact scan.
  * The "join" therefore runs inside the fact side's whole-stage
  * codegen with ZERO shuffle and zero per-row hash probes: one
  * branch + one array read per column. The arrays ride the serialized
  * expression tree, which Spark broadcasts once per stage exactly
  * like an `InSet` literal set.
  *
  * Scale shape: identical to a broadcast hash join — the dim must fit
  * in memory (guarded by `MaxDomain` slots x column count), the fact
  * side streams. On a 1000-executor cluster each executor holds one
  * copy of the arrays; the probe stays a cache-friendly array read
  * where BHJ pays an UnsafeRow hash-probe + row copy. Sparse domains
  * waste slots (a 1M-slot double column is 8 MB — acceptable to ~16M
  * slots); genuinely sparse or unbounded keys belong on the
  * broadcast/shuffle hash join path.
  *
  * Semantics: inner or left-outer equi-join against a dim whose key
  * is UNIQUE (duplicate keys are rejected at build — the fast path
  * exists for key-addressed dimensions, not fan-out joins). Null or
  * out-of-domain fact keys match nothing: dropped on inner, padded
  * with nulls on left. Null dim values stay null. Bit-for-bit the
  * rows a hash equi-join would produce.
  */
object DenseLookupJoin {

  /** Slot budget: 16M slots x 8B = 128 MB per double column — the
    * outer edge of what a per-executor broadcast should hold. */
  val MaxDomain: Int = 1 << 24

  /** Driver-side invocation counter — a spec probe asserting the
    * dense path (not a hash join) served a given call. */
  val invocations = new java.util.concurrent.atomic.AtomicLong(0L)

  private def bitSet(bits: Array[Long], i: Int): Unit =
    bits(i >>> 6) |= (1L << (i & 63))
  private def bitGet(bits: Array[Long], i: Int): Boolean =
    ((bits(i >>> 6) >>> (i & 63)) & 1L) != 0L

  /** Join `fact` to `dim` on `factKey == dim(dimKey)`, appending every
    * other dim column. `domain` bounds the dim key: all dim keys must
    * lie in [0, domain). `joinType` is "inner" or "left".
    *
    * Supported dim value types: numeric, boolean, string, date,
    * timestamp (anything whose physical type is a fixed-width
    * primitive or UTF8String). Unsupported columns must be dropped by
    * the caller — failing fast beats silently falling back to a plan
    * the caller did not ask for.
    */
  /** Driver/executor memory budget for the lookup tables — the same
    * role autoBroadcastJoinThreshold plays for a hash join, sized for
    * the "dim that comfortably broadcasts" regime. Checked with a
    * distributed size pass BEFORE the collect, so an over-budget dim
    * fails fast instead of OOMing the driver. */
  val MaxTableBytes: Long = 512L << 20

  def lookupJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: String, domain: Int, joinType: String = "inner",
      maxTableBytes: Long = MaxTableBytes): DataFrame = {
    require(domain > 0 && domain <= MaxDomain,
      s"domain must be in [1, $MaxDomain], got $domain")
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner|left, got $joinType")
    val valueFields = dim.schema.fields.filter(_.name != dimKey)
    require(valueFields.length < dim.schema.length,
      s"dim has no column named $dimKey")
    val unsupported = valueFields.filterNot(f => physical(f.dataType).isDefined)
    require(unsupported.isEmpty,
      s"unsupported dim value types: ${unsupported.map(f => s"${f.name}:${f.dataType.catalogString}").mkString(",")}")
    // fail fast on name collisions: the facade renames before calling,
    // but a direct caller must not get a frame with duplicate column
    // names (ambiguous downstream references) out of this operator.
    // Honor the session's resolver — under the default
    // case-INsensitive analysis, "Val" vs "val" is just as ambiguous
    val caseSensitive = fact.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def canon(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val factNames = fact.columns.map(canon).toSet
    val colliding = valueFields.map(_.name).filter(n => factNames.contains(canon(n)))
    require(colliding.isEmpty,
      s"dim value columns collide with fact columns: ${colliding.sorted.mkString(",")} — rename before the join")
    // fact-key validation BEFORE any dim work: an auto-routed caller
    // with a non-integral left key must fall back without paying the
    // dim materialization
    val keyType = fact.select(factKey).schema.head.dataType
    keyType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"fact key must be integral, got ${t.catalogString}")
    }
    val keyIdx = dim.schema.fieldIndex(dimKey)
    dim.schema(keyIdx).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"dim key $dimKey must be integral, got ${t.catalogString}")
    }
    // ---- eligibility + size gating. Fixed-width slot bytes are
    // domain-sized no matter the row count, so for a dim with NO
    // string columns the budget check needs no Spark job at all, and
    // every key property the old distributed gate verified (null-free,
    // unique, in-domain) is re-verified row-by-row by the build loop
    // below anyway — the r11 gate charged one full extra job per call
    // for redundant checks, measurably halving the bench lane's
    // throughput (BENCH_AB_r13.md). Driver-memory safety without the
    // gate comes from `limit(domain + 1)` on the collect: a VALID dim
    // has at most `domain` rows (unique in-domain keys), so the limit
    // never drops anything; an invalid dim yields domain + 1 rows
    // among which the pigeonhole principle guarantees the build loop
    // finds a concrete duplicate/null/out-of-domain violation to
    // report. Only a dim WITH string columns still pays the
    // distributed gate — its payload bytes genuinely require a pass,
    // and unlike the key checks they must run BEFORE the collect.
    val fixedBytes = valueFields.map(f => physical(f.dataType).get match {
      case ByteType | BooleanType => 1L
      case ShortType => 2L
      case IntegerType | FloatType => 4L
      case StringType => 8L // the reference slot; payload measured below
      case _ => 8L
    }).map(_ * domain).sum
    val stringCols = valueFields.filter(f => physical(f.dataType).get == StringType)
    if (stringCols.isEmpty) {
      if (fixedBytes > maxTableBytes) throw new IllegalArgumentException(
        s"dim lookup tables estimated at $fixedBytes bytes exceed the " +
          s"$maxTableBytes budget — use a broadcast/shuffle hash join")
    } else {
      val k = col(dimKey).cast("bigint")
      val gateAggs =
        Seq(count(lit(1)).as("__n"), count(k).as("__nk"),
          count_distinct(k).as("__nd"),
          coalesce(min(k), lit(0L)).as("__min"),
          coalesce(max(k), lit(-1L)).as("__max")) ++
          stringCols.map(f =>
            coalesce(sum(octet_length(col(f.name)).cast("bigint")), lit(0L)).as(f.name))
      val gate = dim.select(gateAggs: _*).head()
      val (nAll, nKeys, nDistinct) = (gate.getLong(0), gate.getLong(1), gate.getLong(2))
      if (nKeys < nAll) throw new IllegalArgumentException(
        s"dim key $dimKey contains nulls")
      if (nDistinct < nKeys) throw new IllegalArgumentException(
        s"duplicate dim keys — dense lookup join requires a unique key")
      if (nAll > 0 && (gate.getLong(3) < 0L || gate.getLong(4) >= domain))
        throw new IllegalArgumentException(
          s"dim key range [${gate.getLong(3)}, ${gate.getLong(4)}] outside [0, $domain)")
      val stringBytes = (5 until gate.length).map(gate.getLong).sum
      val estBytes = fixedBytes + stringBytes * 2 // UTF8String object overhead
      if (estBytes > maxTableBytes) throw new IllegalArgumentException(
        s"dim lookup tables estimated at $estBytes bytes exceed the " +
          s"$maxTableBytes budget — use a broadcast/shuffle hash join")
    }

    // ---- build: one driver-side pass over the (bounded) dim.
    // Internal rows avoid per-value boxing round-trips for primitives.
    // Fallback-cost note: on the no-gate path an INVALID dim is only
    // detected after this bounded collect — but its transient driver
    // footprint (<= domain+1 narrow rows) is the same order as the
    // working set a VALID dense build holds anyway (rows + tables live
    // together during the loop below), so the auto-routed fallback
    // pays roughly one valid-build's memory and one job, no more.
    val ordered = dim.select(col(dimKey).cast("bigint").as(dimKey) +:
        valueFields.map(f => col(f.name)): _*)
      .limit(domain + 1) // driver-memory bound; see gating note above
    val rows = ordered.queryExecution.toRdd.map(_.copy()).collect()
    val words = (domain + 63) >>> 6
    val present = new Array[Long](words)
    val tables = valueFields.map(f => newTable(f.dataType, domain)).toArray
    val nullBits = Array.fill(valueFields.length)(new Array[Long](words))
    for (r <- rows) {
      if (r.isNullAt(0)) throw new IllegalArgumentException(
        s"dim key $dimKey contains nulls")
      val k = r.getLong(0)
      if (k < 0L || k >= domain) throw new IllegalArgumentException(
        s"dim key $k outside [0, $domain)")
      val ki = k.toInt
      if (bitGet(present, ki)) throw new IllegalArgumentException(
        s"duplicate dim key $k — dense lookup join requires a unique key")
      bitSet(present, ki)
      var j = 0
      while (j < valueFields.length) {
        if (r.isNullAt(1 + j)) bitSet(nullBits(j), ki)
        else writeSlot(tables(j), valueFields(j).dataType, ki, r, 1 + j)
        j += 1
      }
    }
    // value lookups return null for absent keys too: fold `present`
    // into each column's null bitmap (left-join padding for free)
    val absent = new Array[Long](words)
    var w = 0
    while (w < words) { absent(w) = ~present(w); w += 1 }
    val nulls = nullBits.map { nb =>
      val merged = new Array[Long](words)
      var i = 0
      while (i < words) { merged(i) = nb(i) | absent(i); i += 1 }
      merged
    }

    // ---- probe: pure projections over the fact side. The key cast
    // follows DenseCatAgg's integrality discipline: integral fact
    // keys widen exactly (validated up front); a fractional join key
    // is a modeling error, not a cast.
    // r15 complete-dim specialization (probe-path decomposition,
    // BENCH_AB_r15): a column whose merged null bitmap is all-zero
    // needs no per-row bitmap test, and a dim covering its WHOLE
    // domain makes the inner-join contains filter a tautology — both
    // shapes are the common production dims (dense surrogate keys).
    val keyExpr = Bridge.expression(factKey.cast("bigint"))
    def allZero(bits: Array[Long]): Boolean = {
      var i = 0
      while (i < bits.length) { if (bits(i) != 0L) return false; i += 1 }
      true
    }
    // bits above `domain` are never set, so popcount == domain <=>
    // every key in [0, domain) is present
    val allPresent = present.map(java.lang.Long.bitCount).sum == domain
    val valueCols = valueFields.zipWithIndex.map { case (f, j) =>
      Bridge.column(DenseLookupValue(keyExpr, tables(j), nulls(j),
        physical(f.dataType).get, f.dataType, domain,
        checkNulls = !allZero(nulls(j)))).as(f.name)
    }
    val projected = fact.select(
      fact.columns.map(col).toIndexedSeq ++ valueCols: _*)
    val out =
      if (joinType == "inner")
        projected.where(Bridge.column(
          DenseLookupContains(keyExpr, present, domain, assumeAll = allPresent)))
      else projected
    // counted only once the probe plan is fully constructed — a call
    // that threw (ineligible dim, over-budget tables) and fell back to
    // the hash join must NOT register as a dense-path invocation, so
    // spec probes asserting `invocations > before` prove the dense
    // path actually served the join
    invocations.incrementAndGet()
    out
  }

  /** The fixed-width physical representation a value type stores as,
    * or None if unsupported. DateType is days-as-int, timestamps are
    * micros-as-long — Catalyst's own internal encodings, so the typed
    * slot can be handed straight back as `dataType`. */
  private def physical(dt: DataType): Option[DataType] = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | BooleanType | StringType => Some(dt)
    case DateType => Some(IntegerType)
    case TimestampType | TimestampNTZType => Some(LongType)
    case _ => None
  }

  private def newTable(dt: DataType, n: Int): AnyRef = physical(dt).get match {
    case ByteType => new Array[Byte](n)
    case ShortType => new Array[Short](n)
    case IntegerType => new Array[Int](n)
    case LongType => new Array[Long](n)
    case FloatType => new Array[Float](n)
    case DoubleType => new Array[Double](n)
    case BooleanType => new Array[Boolean](n)
    case StringType => new Array[UTF8String](n)
    case t => throw new IllegalStateException(t.toString)
  }

  private def writeSlot(table: AnyRef, dt: DataType, i: Int,
      r: org.apache.spark.sql.catalyst.InternalRow, ord: Int): Unit =
    physical(dt).get match {
      case ByteType => table.asInstanceOf[Array[Byte]](i) = r.getByte(ord)
      case ShortType => table.asInstanceOf[Array[Short]](i) = r.getShort(ord)
      case IntegerType => table.asInstanceOf[Array[Int]](i) = r.getInt(ord)
      case LongType => table.asInstanceOf[Array[Long]](i) = r.getLong(ord)
      case FloatType => table.asInstanceOf[Array[Float]](i) = r.getFloat(ord)
      case DoubleType => table.asInstanceOf[Array[Double]](i) = r.getDouble(ord)
      case BooleanType => table.asInstanceOf[Array[Boolean]](i) = r.getBoolean(ord)
      case StringType =>
        // copy out of the scan's reused buffer — getUTF8String may
        // point into a page that the next row overwrites
        table.asInstanceOf[Array[UTF8String]](i) = r.getUTF8String(ord).copy()
      case t => throw new IllegalStateException(t.toString)
    }

  private def javaArrayType(physicalType: DataType): String = physicalType match {
    case ByteType => "byte[]"
    case ShortType => "short[]"
    case IntegerType => "int[]"
    case LongType => "long[]"
    case FloatType => "float[]"
    case DoubleType => "double[]"
    case BooleanType => "boolean[]"
    case StringType => "org.apache.spark.unsafe.types.UTF8String[]"
    case t => throw new IllegalStateException(t.toString)
  }

  /** table[key] as `resultType`, null when the key is null, outside
    * [0, domain), absent from the dim, or stored null (all folded
    * into the `nulls` bitmap at build). One branch + one array read
    * per row inside whole-stage codegen. */
  case class DenseLookupValue(child: Expression, table: AnyRef,
      nulls: Array[Long], physicalType: DataType, resultType: DataType,
      domain: Int, checkNulls: Boolean = true) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName key must be bigint, got ${t.catalogString}")
    }
    override def dataType: DataType = resultType
    override def nullable: Boolean = true
    override def prettyName: String = "dense_lookup_value"

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val k = child.eval(input)
      if (k == null) return null
      val kl = k.asInstanceOf[Long]
      if (kl < 0L || kl >= domain ||
        (checkNulls && bitGet(nulls, kl.toInt))) return null
      val i = kl.toInt
      physicalType match {
        case ByteType => table.asInstanceOf[Array[Byte]](i)
        case ShortType => table.asInstanceOf[Array[Short]](i)
        case IntegerType => table.asInstanceOf[Array[Int]](i)
        case LongType => table.asInstanceOf[Array[Long]](i)
        case FloatType => table.asInstanceOf[Array[Float]](i)
        case DoubleType => table.asInstanceOf[Array[Double]](i)
        case BooleanType => table.asInstanceOf[Array[Boolean]](i)
        case StringType => table.asInstanceOf[Array[UTF8String]](i)
        case t => throw new IllegalStateException(t.toString)
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("lookupTable", table,
        javaArrayType(physicalType))
      val k = ctx.freshName("k")
      // complete columns (no stored nulls, every key present) skip
      // the bitmap load+mask per row — the r15 probe specialization
      val nullClause =
        if (!checkNulls) ""
        else {
          val nullsRef = ctx.addReferenceObj("lookupNulls", nulls, "long[]")
          s""" &&
              (($nullsRef[(int) ($k >>> 6)] >>> (int) ($k & 63L)) & 1L) == 0L"""
        }
      val childGen = child.genCode(ctx)
      val jt = CodeGenerator.javaType(resultType)
      ev.copy(code = code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        $jt ${ev.value} = ${CodeGenerator.defaultValue(resultType)};
        if (!${childGen.isNull}) {
          final long $k = ${childGen.value};
          if ($k >= 0L && $k < ${domain}L$nullClause) {
            ${ev.isNull} = false;
            ${ev.value} = $tableRef[(int) $k];
          }
        }""")
    }

    override protected def withNewChildInternal(c: Expression): DenseLookupValue =
      copy(child = c)
  }

  /** key present in the dim (inner-join filter). Null key -> null
    * (filter semantics drop it — exactly an equi-join's behavior). */
  case class DenseLookupContains(child: Expression, present: Array[Long],
      domain: Int, assumeAll: Boolean = false) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName key must be bigint, got ${t.catalogString}")
    }
    override def dataType: DataType = BooleanType
    override def prettyName: String = "dense_lookup_contains"

    override def nullSafeEval(k: Any): Any = {
      val kl = k.asInstanceOf[Long]
      kl >= 0L && kl < domain && (assumeAll || bitGet(present, kl.toInt))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      if (assumeAll) {
        // complete dim (every key in [0, domain) present): the filter
        // reduces to the range check — null / out-of-range keys still
        // drop, the bitmap load does not run (r15 probe specialization)
        nullSafeCodeGen(ctx, ev, k => s"""
          ${ev.value} = $k >= 0L && $k < ${domain}L;""")
      } else {
        val presentRef = ctx.addReferenceObj("lookupPresent", present, "long[]")
        nullSafeCodeGen(ctx, ev, k => s"""
          ${ev.value} = $k >= 0L && $k < ${domain}L &&
            (($presentRef[(int) ($k >>> 6)] >>> (int) ($k & 63L)) & 1L) != 0L;""")
      }

    override protected def withNewChildInternal(c: Expression): DenseLookupContains =
      copy(child = c)
  }
}
