package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Codegen'd DECODE expressions for the three custom sketches
  * ([[graft.operators.Hll]], [[graft.operators.Cms]],
  * [[graft.operators.Hist]]) — per-row arithmetic over a serialized
  * payload, the same shape as [[FloatArrayDot]].
  *
  * These replace the last three `udf()`s in the engine: a UDF forces an
  * object-path eval with boxed arguments and blocks whole-stage codegen
  * around the call site; these expressions keep the decode inside the
  * generated stage and delegate to the SAME decode routines the
  * aggregators' spec gates pin (SqlFunctionsSpec: merge == one-shot,
  * error bounds, partition-independence). Null payloads (e.g. the
  * unmatched side of an outer join) yield NULL via the default
  * null-intolerant expression contract — the behavior the r5 ADVICE
  * null-guards added to the UDF forms.
  */
case class HllEstimateExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_estimate"
  override def nullSafeEval(input: Any): Any =
    graft.operators.Hll.estimateOf(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.operators.Hll.estimateOf($s);")
  override protected def withNewChildInternal(newChild: Expression): HllEstimateExpr =
    copy(child = newChild)
}

case class CmsEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def nullSafeEval(sketch: Any, h: Any): Any =
    graft.operators.Cms.estimateOf(
      sketch.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, h) =>
      s"${ev.value} = graft.operators.Cms.estimateOf($s, $h);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}

/** Quantile lower bound over a counting-histogram bucket array; q/lo/width
  * are plan-time constants (they parameterize the expression, not a row
  * input — same as FeatureBucketsExpr's bucket count). */
case class HistQuantileExpr(child: Expression, q: Double, lo: Double, width: Double)
  extends UnaryExpression {
  // the params are string-interpolated into generated Java source: a
  // NaN/Infinity would emit illegal Java, fail Janino compilation, and
  // drop the whole stage to interpreted execution — reject at construction
  require(java.lang.Double.isFinite(q) && java.lang.Double.isFinite(lo) &&
      java.lang.Double.isFinite(width),
    s"hist_quantile_lb: q/lo/width must be finite, got ($q, $lo, $width)")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hist_quantile_lb"
  override def nullSafeEval(input: Any): Any =
    SketchExprs.histQuantile(input.asInstanceOf[ArrayData], q, lo, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.SketchExprs.histQuantile($arr, $q, $lo, $width);")
  override protected def withNewChildInternal(newChild: Expression): HistQuantileExpr =
    copy(child = newChild)
}

object SketchExprs {
  def hllEstimate(sketch: Column): Column =
    ColumnBridge.column(HllEstimateExpr(ColumnBridge.expression(sketch)))

  def cmsEstimate(sketch: Column, hashedItem: Column): Column =
    ColumnBridge.column(CmsEstimateExpr(
      ColumnBridge.expression(sketch), ColumnBridge.expression(hashedItem)))

  def histQuantileLb(sketch: Column, q: Double, lo: Double, width: Double): Column =
    ColumnBridge.column(HistQuantileExpr(ColumnBridge.expression(sketch), q, lo, width))

  /** Runtime bridge (called from both eval and generated code). */
  def histQuantile(counts: ArrayData, q: Double, lo: Double, width: Double): Double =
    graft.operators.Hist.quantileLowerBoundOf(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(counts.toLongArray()),
      q, lo, width)
}
