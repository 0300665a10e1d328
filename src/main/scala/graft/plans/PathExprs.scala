package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}

/** Static relativization kernel, called from generated code (same
  * static-forwarder idiom as [[NfcNormalize]]).
  *
  * `_metadata.file_path` is a URL-ENCODED URI string (Spark renders the
  * scan file's `SparkPath`), while the transaction log records data files
  * by their DECODED on-disk relative path (Hadoop `Path.getName` segments
  * — Hive-escaped partition dir names with spaces kept literal). A naive
  * regex over the raw `file_path` therefore breaks on any partition value
  * the two encodings render differently: `p=NORTH AMERICA` is
  * `p=NORTH%20AMERICA` in the URI, and a Hive-escaped `%` (`%25` on disk)
  * becomes `%2525`. Keying deletion vectors by the encoded form silently
  * un-links them from the log's live-file set — deletes would vanish at
  * the next checkpoint fold. So: decode ONCE through `java.net.URI`
  * (pure %XX decoding — unlike `url_decode`, it never turns a literal
  * `+` into a space), then anchor on the LAST `/data/txn-` occurrence
  * (a table ROOT containing such a segment must not hijack the match;
  * partition values cannot reintroduce one — Hive escapes `/`, and one
  * URI decode maps `%252F` back to the literal `%2F` text, never to a
  * slash). Returns "" when no anchor exists (non-txlog callers). */
object TxRelPath {
  private val Anchor = "/data/txn-"

  /** `_metadata.file_path` is CONSTANT across a file's rows and rows
    * arrive file-contiguous, so a 1-entry thread-local memo turns the
    * per-row URI parse + substring into a per-FILE one — the hit path is
    * a byte-equality check on the ~100-byte path. Inputs are cloned into
    * the memo (the scanner may hand the expression a reused buffer). */
  private val memo =
    new ThreadLocal[Array[org.apache.spark.unsafe.types.UTF8String]]()

  def relData(fp: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val m = memo.get()
    if (m != null && m(0).equals(fp)) return m(1)
    val s = fp.toString
    val decoded =
      try {
        val p = new java.net.URI(s).getPath
        if (p == null) s else p
      } catch { case _: java.net.URISyntaxException => s }
    val i = decoded.lastIndexOf(Anchor)
    val out =
      if (i < 0) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      else org.apache.spark.unsafe.types.UTF8String
        .fromString(decoded.substring(i + 1))
    memo.set(Array(fp.clone(), out))
    out
  }
}

/** Codegen'd `_metadata.file_path` → log-relative data path (the
  * deletion-vector join key): see [[TxRelPath.relData]]. On the scan's
  * hot path for every dv'd read, so a native expression, not a UDF. */
case class TxRelPathExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tx_rel_path requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "tx_rel_path"
  override def nullSafeEval(input: Any): Any =
    TxRelPath.relData(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TxRelPath.relData($c)")
  override protected def withNewChildInternal(newChild: Expression): TxRelPathExpr =
    copy(child = newChild)
}

object TxRelPathExpr {
  /** Column wrapper: decoded log-relative data path of a file-path URI. */
  def apply(c: Column): Column =
    ColumnBridge.column(TxRelPathExpr(ColumnBridge.expression(c)))
}
