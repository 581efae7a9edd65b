package graft.sources

import java.nio.charset.StandardCharsets
import com.fasterxml.jackson.databind.JsonNode
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-file statistics for the Delta sink + stats-based FILE SKIPPING
  * for the source — the feature that makes a 100 TB Delta table
  * queryable without touching 100 TB: `add.stats` carries
  * numRecords / minValues / maxValues / nullCount per column (the
  * public Delta stats JSON shape), and a read predicate is evaluated
  * driver-side against those bounds so non-matching files never
  * become scan tasks (Spark's own parquet footer pruning only runs
  * INSIDE already-scheduled tasks).
  *
  * Collection is a distributed parquet FOOTER read (one metadata read
  * per new file, executor-side, collected as small JSON strings) —
  * the same per-file stats pass Delta's own writers make.
  *
  * Skipping is strictly conservative: a file survives unless its
  * bounds PROVE no row can match. Unknown columns, missing stats,
  * NaN literals and unsupported predicate shapes all keep the file,
  * and the caller re-applies the predicate as a real filter — stats
  * can only remove work, never change answers.
  */
private[graft] object DeltaStats {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  /** Longest string bound kept; longer values omit the column's entry
    * (omission = no skipping on it). Never truncate: a truncated max
    * is not an upper bound. */
  private val MaxStringBound = 64

  // ------------------------------------------------------------------
  // Collection (write side)
  // ------------------------------------------------------------------

  /** Distributed footer-read stats for `paths` -> path -> stats JSON.
    * `statCols`: the data columns eligible for min/max entries. */
  def collect(spark: SparkSession, statCols: Seq[String],
      paths: Seq[String]): Map[String, String] = {
    if (paths.isEmpty) return Map.empty
    val cols = statCols
    spark.sparkContext
      .parallelize(paths, math.min(paths.size, spark.sparkContext.defaultParallelism))
      .map(p => (p, statsJson(p, cols)))
      .collect().toMap
  }

  /** Typed per-file footer stats (the bound DOMAIN: BigDecimal /
    * String / Days / Micros / Boolean). `mins`/`maxs` only carry
    * columns whose EVERY block had usable stats. Shared by the Delta
    * stats JSON and the Iceberg bounds serializer. */
  private[sources] final case class FileColStats(
      numRecords: Long, mins: Map[String, Any], maxs: Map[String, Any],
      nullCounts: Map[String, Long])

  private[sources] def footerStats(path: String,
      statCols: Seq[String]): FileColStats = {
    val (fs, p) = FsIO.resolve(path)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromStatus(fs.getFileStatus(p), fs.getConf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      var numRecords = 0L
      // per column: (min, max, nullCount) accumulated across blocks;
      // a single stats-less block disqualifies the column's bounds
      val mins = collection.mutable.Map.empty[String, Any]
      val maxs = collection.mutable.Map.empty[String, Any]
      val nulls = collection.mutable.Map.empty[String, Long]
      val noBounds = collection.mutable.Set.empty[String]
      val noNulls = collection.mutable.Set.empty[String]
      val wanted = statCols.toSet
      blocks.forEach { b =>
        numRecords += b.getRowCount
        b.getColumns.forEach { c =>
          val pathArr = c.getPath.toArray
          if (pathArr.length == 1 && wanted(pathArr(0))) {
            val name = pathArr(0)
            val st = c.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue) noBounds += name
            else (convert(st.genericGetMin.asInstanceOf[AnyRef], c.getPrimitiveType, path),
                  convert(st.genericGetMax.asInstanceOf[AnyRef], c.getPrimitiveType, path)) match {
              case (Some(mn), Some(mx)) =>
                mins(name) = mins.get(name).map(m => if (cmpAny(mn, m) < 0) mn else m).getOrElse(mn)
                maxs(name) = maxs.get(name).map(m => if (cmpAny(mx, m) > 0) mx else m).getOrElse(mx)
              case _ => noBounds += name
            }
            if (st != null && st.isNumNullsSet)
              nulls(name) = nulls.getOrElse(name, 0L) + st.getNumNulls
            else noNulls += name
          }
        }
      }
      FileColStats(numRecords,
        (mins -- noBounds).toMap, (maxs -- noBounds).toMap,
        (nulls -- noNulls).toMap)
    } finally reader.close()
  }

  /** One file's Delta stats JSON from its parquet footer. */
  private[sources] def statsJson(path: String, statCols: Seq[String]): String = {
    val st = footerStats(path, statCols)
    val j = mapper.createObjectNode()
    j.put("numRecords", st.numRecords)
    val mnN = j.putObject("minValues")
    val mxN = j.putObject("maxValues")
    val ncN = j.putObject("nullCount")
    statCols.foreach { c =>
      (st.mins.get(c), st.maxs.get(c)) match {
        case (Some(mn), Some(mx)) if boundFits(mn) && boundFits(mx) =>
          putBound(mnN, c, mn); putBound(mxN, c, mx)
        case _ => ()
      }
      st.nullCounts.get(c).foreach(n => ncN.put(c, n))
    }
    mapper.writeValueAsString(j)
  }

  /** Comparable internal bound from a parquet footer value:
    * BigDecimal (numerics/decimals), String, Long-days (DATE as
    * java.time.LocalDate), Long-micros (timestamps as Micros),
    * Boolean. None = unusable (NaN, INT96, unknown). */
  private[graft] final case class Micros(us: Long)
  private[graft] final case class Days(d: Long)

  private def convert(v: AnyRef, t: PrimitiveType, ctx: String): Option[Any] = {
    val lta = t.getLogicalTypeAnnotation
    t.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => Some(v.asInstanceOf[java.lang.Boolean].booleanValue())
      case PrimitiveTypeName.INT32 => lta match {
        case d: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
          Some(Days(v.asInstanceOf[java.lang.Integer].longValue()))
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          Some(java.math.BigDecimal.valueOf(
            v.asInstanceOf[java.lang.Integer].longValue(), d.getScale))
        case _ => Some(new java.math.BigDecimal(v.toString))
      }
      case PrimitiveTypeName.INT64 => lta match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          val raw = v.asInstanceOf[java.lang.Long].longValue()
          val us = ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS => math.multiplyExact(raw, 1000L)
            case LogicalTypeAnnotation.TimeUnit.MICROS => raw
            case LogicalTypeAnnotation.TimeUnit.NANOS => Math.floorDiv(raw, 1000L)
          }
          Some(Micros(us))
        case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
          Some(java.math.BigDecimal.valueOf(
            v.asInstanceOf[java.lang.Long].longValue(), d.getScale))
        case _ => Some(new java.math.BigDecimal(v.toString))
      }
      case PrimitiveTypeName.FLOAT =>
        val f = v.asInstanceOf[java.lang.Float].floatValue()
        if (f.isNaN || f.isInfinite) None
        else Some(new java.math.BigDecimal(f.toString))
      case PrimitiveTypeName.DOUBLE =>
        val d = v.asInstanceOf[java.lang.Double].doubleValue()
        if (d.isNaN || d.isInfinite) None
        else Some(new java.math.BigDecimal(d.toString))
      case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
        val bin = v.asInstanceOf[org.apache.parquet.io.api.Binary]
        lta match {
          case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
            Some(bin.toStringUsingUTF8)
          case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            Some(new java.math.BigDecimal(
              new java.math.BigInteger(bin.getBytes), d.getScale))
          case _ => None // raw binary has no portable ordering
        }
      case _ => None // INT96 etc.
    }
  }

  private def boundFits(v: Any): Boolean = v match {
    case s: String => s.length <= MaxStringBound
    case _ => true
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  private[sources] def putBound(n: com.fasterxml.jackson.databind.node.ObjectNode,
      name: String, v: Any): Unit = v match {
    case b: java.math.BigDecimal => n.put(name, b)
    case s: String => n.put(name, s)
    case Days(d) => n.put(name, java.time.LocalDate.ofEpochDay(d).toString)
    case Micros(us) => n.put(name,
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC).format(TsFmt))
    case b: Boolean => n.put(name, b)
    case other => throw new IllegalStateException(s"unexpected bound $other")
  }

  /** Unsigned UTF-8 byte order — the ordering parquet footer string
    * stats are computed in. Java String.compareTo (UTF-16 units)
    * DISAGREES for supplementary-plane chars (surrogates 0xD800+
    * sort below 0xE000+ in UTF-16 but encode to F0-prefixed UTF-8
    * above any BMP bytes), and comparing bounds in the wrong order
    * can skip a file whose rows match. */
  private[graft] def cmpUtf8(x: String, y: String): Int =
    cmpBytes(x.getBytes(StandardCharsets.UTF_8),
      y.getBytes(StandardCharsets.UTF_8))

  private[graft] def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: String, y: String) => cmpUtf8(x, y)
    case (Days(x), Days(y)) => java.lang.Long.compare(x, y)
    case (Micros(x), Micros(y)) => java.lang.Long.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw new IllegalStateException(s"incomparable bounds $a / $b")
  }

  // ------------------------------------------------------------------
  // Skipping (read side)
  // ------------------------------------------------------------------

  /** Per-column knowledge about one file. */
  private final case class Bounds(
      min: Option[Any], max: Option[Any],
      nullCount: Option[Long], numRecords: Option[Long]) {
    def allNull: Boolean =
      (nullCount, numRecords) match {
        case (Some(n), Some(r)) => r > 0 && n == r
        case _ => false
      }
  }
  private val Unknown = Bounds(None, None, None, None)

  /** Could any row of the file match `pred`? Conservative — see class
    * doc. `schema` is the full table schema, `partCols` the partition
    * columns (their "bounds" are the exact log value). */
  def mightMatch(pred: Expression, schema: StructType, partCols: Seq[String],
      partitionValues: Map[String, String], statsJson: String,
      sessionTz: String = "UTC"): Boolean = {
    lazy val stats: JsonNode =
      if (statsJson == null || statsJson.isEmpty) null
      else try mapper.readTree(statsJson) catch { case _: Exception => null }

    def kindOf(dt: DataType): Option[String] = dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType => Some("num")
      case StringType => Some("str")
      case DateType => Some("date")
      case TimestampType => Some("ts")   // zone-adjusted (epoch micros)
      case TimestampNTZType => Some("tsn") // wall-clock micros
      case BooleanType => Some("bool")
      case _ => None
    }

    def parseBound(node: JsonNode, kind: String): Option[Any] =
      if (node == null || node.isNull) None
      else try kind match {
        case "num" => Some(new java.math.BigDecimal(node.asText()))
        case "str" => Some(node.asText())
        case "date" => Some(Days(java.time.LocalDate.parse(node.asText()).toEpochDay))
        case "ts" | "tsn" => // both flavors round-trip as micros
          Some(Micros(java.time.LocalDateTime
            .parse(node.asText(), TsFmt).toInstant(java.time.ZoneOffset.UTC)
            .let(i => i.getEpochSecond * 1000000L + i.getNano / 1000)))
        case "bool" => Some(node.asBoolean())
      } catch { case _: Exception => None }

    def parsePartition(v: String, kind: String): Option[Any] =
      if (v == null) None
      else try kind match {
        case "num" => Some(new java.math.BigDecimal(v))
        case "str" => Some(v)
        case "date" => Some(Days(java.time.LocalDate.parse(v).toEpochDay))
        case "ts" | "tsn" => // partition form: yyyy-MM-dd HH:mm:ss[.SSSSSS]
          val norm = if (v.contains('.')) v else v + ".000000"
          val wall = java.time.LocalDateTime.parse(norm.replace(' ', 'T'),
            java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd'T'HH:mm:ss.[SSSSSS][SSS]"))
          // TIMESTAMP (zone-adjusted) partition strings are wall time
          // in the SESSION zone — the same reading the injected
          // lit(v).cast(timestamp) applies; NTZ is zone-free
          val zone = if (kind == "ts") java.time.ZoneId.of(sessionTz)
                     else java.time.ZoneOffset.UTC
          val inst = wall.atZone(zone).toInstant
          Some(Micros(inst.getEpochSecond * 1000000L + inst.getNano / 1000))
        case "bool" => Some(v.toBoolean)
      } catch { case _: Exception => None }

    def bounds(name: String, kind: String): Bounds =
      if (partCols.contains(name)) {
        partitionValues.get(name) match {
          case Some(null) | None =>
            // null partition value: every row is null in this column
            Bounds(None, None, Some(1L), Some(1L))
          case Some(v) =>
            val p = parsePartition(v, kind)
            Bounds(p, p, Some(0L), None)
        }
      } else if (stats == null) Unknown
      else {
        val nr = Option(stats.get("numRecords")).filter(_.isNumber).map(_.asLong())
        val nc = Option(stats.get("nullCount")).flatMap(n => Option(n.get(name)))
          .filter(_.isNumber).map(_.asLong())
        Bounds(
          Option(stats.get("minValues")).flatMap(n =>
            parseBound(n.get(name), kind)),
          Option(stats.get("maxValues")).flatMap(n =>
            parseBound(n.get(name), kind)),
          nc, nr)
      }

    /** Single-part column reference, resolved (AttributeReference
      * after analysis) or not (direct unit-test calls). Unwraps ONLY
      * casts whose image is exact and order-preserving (identity, or
      * integral widening — the analyzer inserts `cast(x as bigint)`
      * around coerced comparisons): a LOSSY cast (long->double,
      * float->double string-rounding) could skip a file whose rows DO
      * match after rounding, so those stay conservative. */
    def intRank(dt: DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2
      case IntegerType => 3; case LongType => 4; case _ => 0
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute if u.nameParts.length == 1 =>
        Some(u.nameParts.head)
      case c: Cast if c.child.dataType == c.dataType => attrName(c.child)
      case c: Cast if intRank(c.child.dataType) > 0 &&
          intRank(c.dataType) >= intRank(c.child.dataType) =>
        attrName(c.child)
      case _ => None
    }

    /** (column, literal-as-bound) for a comparison, when resolvable. */
    def sides(a: Expression, b: Expression): Option[(Bounds, Any)] = (a, b) match {
      case (attr, l: Literal) =>
        attrName(attr).flatMap { name =>
          schema.find(_.name == name).flatMap { f =>
            kindOf(f.dataType).flatMap { kind =>
              rawBound(l.value, l.dataType, kind).map(v => (bounds(name, kind), v))
            }
          }
        }
      case _ => None
    }

    /** Catalyst-internal value -> comparison-domain bound. */
    def rawBound(value: Any, dt: DataType, kind: String): Option[Any] =
      if (value == null) None
      else try (kind, dt) match {
        case ("num", _: NumericType) => value match {
          case d: Double if d.isNaN || d.isInfinite => None
          case f: Float if f.isNaN || f.isInfinite => None
          case d: Decimal => Some(d.toJavaBigDecimal)
          case v => Some(new java.math.BigDecimal(v.toString))
        }
        case ("str", StringType) => Some(value.toString)
        case ("date", DateType) => Some(Days(value.asInstanceOf[Int].toLong))
        case ("date", StringType) =>
          Some(Days(java.time.LocalDate.parse(value.toString).toEpochDay))
        case ("ts" | "tsn", TimestampType | TimestampNTZType) =>
          Some(Micros(value.asInstanceOf[Long]))
        case ("bool", BooleanType) => Some(value)
        case _ => None
      } catch { case _: Exception => None }

    def le(a: Any, b: Any): Boolean = cmpAny(a, b) <= 0
    def lt(a: Any, b: Any): Boolean = cmpAny(a, b) < 0

    def eqMight(b: Bounds, v: Any): Boolean =
      !b.allNull &&
        b.min.forall(m => le(m, v)) && b.max.forall(m => le(v, m))

    def might(e: Expression): Boolean = e match {
      case And(l, r) => might(l) && might(r)
      case Or(l, r) => might(l) || might(r)
      case EqualTo(a, b) =>
        sides(a, b).orElse(sides(b, a)).forall { case (bd, v) => eqMight(bd, v) }
      case EqualNullSafe(a, b) =>
        sides(a, b).orElse(sides(b, a)).forall { case (bd, v) => eqMight(bd, v) }
      case GreaterThan(a, b) => sides(a, b) match {
        case Some((bd, v)) => !bd.allNull && bd.max.forall(m => lt(v, m))
        case None => sides(b, a) match { // v > attr  ==  attr < v
          case Some((bd, v)) => !bd.allNull && bd.min.forall(m => lt(m, v))
          case None => true
        }
      }
      case GreaterThanOrEqual(a, b) => sides(a, b) match {
        case Some((bd, v)) => !bd.allNull && bd.max.forall(m => le(v, m))
        case None => sides(b, a) match {
          case Some((bd, v)) => !bd.allNull && bd.min.forall(m => le(m, v))
          case None => true
        }
      }
      case LessThan(a, b) => sides(a, b) match {
        case Some((bd, v)) => !bd.allNull && bd.min.forall(m => lt(m, v))
        case None => sides(b, a) match {
          case Some((bd, v)) => !bd.allNull && bd.max.forall(m => lt(v, m))
          case None => true
        }
      }
      case LessThanOrEqual(a, b) => sides(a, b) match {
        case Some((bd, v)) => !bd.allNull && bd.min.forall(m => le(m, v))
        case None => sides(b, a) match {
          case Some((bd, v)) => !bd.allNull && bd.max.forall(m => le(v, m))
          case None => true
        }
      }
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => sides(a, v).forall { case (bd, lv) => eqMight(bd, lv) })
      case InSet(a, hset) => // the optimizer's large-list In form
        attrName(a).flatMap(n => schema.find(_.name == n)) match {
          case Some(f) => kindOf(f.dataType) match {
            case Some(kind) =>
              val bd = bounds(f.name, kind)
              hset.exists(v => rawBound(v, f.dataType, kind)
                .forall(lv => eqMight(bd, lv)))
            case None => true
          }
          case None => true
        }
      case IsNull(a) => attrName(a).flatMap(n =>
        schema.find(_.name == n).flatMap(f => kindOf(f.dataType))
          .map(kind => bounds(n, kind).nullCount.forall(_ > 0)))
        .getOrElse(true)
      case IsNotNull(a) => attrName(a).flatMap(n =>
        schema.find(_.name == n).flatMap(f => kindOf(f.dataType))
          .map(kind => !bounds(n, kind).allNull))
        .getOrElse(true)
      case StartsWith(a, Literal(p, StringType)) if p != null =>
        attrName(a).map { name =>
          schema.find(_.name == name).map(_.dataType) match {
            case Some(StringType) =>
              val bd = bounds(name, "str")
              // candidates live in [prefix, prefix||MAX): nonempty
              // intersection with [min,max] iff prefix <= max and
              // min's prefix-length cut <= prefix — BOTH compared in
              // unsigned UTF-8 byte order (the footer's order) and
              // the cut taken at UTF-8 BYTE length; UTF-16 compareTo
              // / take() disagree for supplementary-plane chars and
              // a wrong skip silently loses rows.
              val pb = p.toString.getBytes(StandardCharsets.UTF_8)
              !bd.allNull &&
                bd.max.forall(m => cmpBytes(pb,
                  m.asInstanceOf[String]
                    .getBytes(StandardCharsets.UTF_8)) <= 0) &&
                bd.min.forall { m =>
                  val mb = m.asInstanceOf[String]
                    .getBytes(StandardCharsets.UTF_8)
                  cmpBytes(java.util.Arrays.copyOf(
                    mb, math.min(mb.length, pb.length)), pb) <= 0
                }
            case _ => true
          }
        }.getOrElse(true)
      case _ => true // unsupported shapes keep the file
    }
    might(pred)
  }

  /** tiny let-pipe (java.time has no map). */
  private implicit final class Let[A](private val a: A) extends AnyVal {
    def let[B](f: A => B): B = f(a)
  }
}
