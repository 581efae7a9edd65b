package graft.sources

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** File-path identity across the THREE spellings a path travels
  * through in the lakehouse read paths:
  *
  *   1. the log/manifest spelling (relative, absolute, or URI),
  *   2. the driver-resolved form (`resolveDataPath` / `resolvePath`),
  *   3. `_metadata.file_path` as Spark renders it at scan time — the
  *      QUALIFIED URI string, percent-encoded (a dir `k=a b` scans as
  *      `file:/.../k=a%20b/...`).
  *
  * String normalization per ROW (the r15 first cut) is both slow (a
  * regex + two materializations per row) and unsound (it never
  * percent-decoded, so legal paths either crashed loudly — Delta DVs
  * — or silently resurrected deleted rows — Iceberg MoR). Instead:
  * enumerate every spelling DRIVER-side per file, map them all to one
  * canonical id, and probe raw `_metadata.file_path` with an
  * allocation-free UTF8String lookup ([[PathId]]). */
private[graft] object PathKeys {

  /** Candidate spellings of `p` (a driver-resolved path) as scan-time
    * metadata may render it, plus the resolved/normalized forms the
    * driver itself uses. */
  def spellings(p: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(p)
    val out = Seq.newBuilder[String]
    out += p
    out += path.toString
    try {
      val (fs, _) = FsIO.resolve(p)
      val q = fs.makeQualified(path)
      out += q.toString
      val uri = q.toUri
      out += uri.toString
      if (uri.getScheme != null) {
        // authority variants: Spark renders local files as
        // `file:/x` (null authority) while Path/URI round trips can
        // produce `file:///x`; the URI constructor re-encodes the
        // path (space -> %20), which IS the _metadata spelling
        out += new java.net.URI(uri.getScheme, null, uri.getPath, null)
          .toString
        out += new java.net.URI(uri.getScheme, "", uri.getPath, null)
          .toString
      }
      // scheme-LESS percent-encoded form: scans over unqualified
      // roots render _metadata.file_path as the encoded bare path
      out += new java.net.URI(null, null, uri.getPath, null).toString
    } catch { case _: Exception => () }
    try out += FsIO.normalize(p)
    catch { case _: Exception => () }
    out.result().distinct
  }
}

/** `string -> int`: map a file-path spelling to its canonical id via
  * a driver-built table ([[PathKeys.spellings]] keys). `strict`:
  * a miss THROWS (scan side — a miss means a spelling gap that would
  * otherwise silently mis-handle rows); lenient returns -1 (delete
  * side — an unknown path is a stale delete that must match nothing).
  * UTF8String-keyed: the per-row probe allocates nothing. */
private[graft] case class PathId(child: Expression,
    ids: java.util.HashMap[UTF8String, Integer], strict: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "path_id"
  override def nullSafeEval(p: Any): Any =
    PathId.probe(p.asInstanceOf[UTF8String], ids, strict)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pathIds", ids, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = graft.sources.PathId.probe($p, $ref, $strict);")
  }
  override protected def withNewChildInternal(c: Expression): PathId =
    copy(child = c)
}

private[graft] object PathId {
  def probe(p: UTF8String,
      ids: java.util.HashMap[UTF8String, Integer],
      strict: Boolean): Int = {
    val id = ids.get(p)
    if (id != null) id.intValue()
    else if (!strict) -1
    else throw new IllegalStateException(
      s"no canonical id for scanned file path $p — spelling gap " +
        "between the table log/manifests and _metadata.file_path")
  }
}
