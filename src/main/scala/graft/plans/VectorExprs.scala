package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd float-array dot product: `Σ aᵢ·bᵢ` over two ARRAY<FLOAT>
  * columns, accumulated in double, as ONE tight primitive loop.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) stays inside whole-stage codegen but materializes the
  * zipped intermediate array and runs two lambda dispatches per element;
  * on the near-dup prefilter (millions of candidate pairs × 64 dims —
  * Similarity.nearDuplicatePairs) this expression is the hot inner loop,
  * so it is worth the drop to a custom Catalyst Expression (preference
  * order (b) of the build brief: native Expression with doGenCode over
  * any UDF).
  *
  * Semantics match the HOF form: NULL if either array is NULL, any
  * element of either array is NULL, or the lengths differ (zip_with
  * null-pads the shorter side, which nulls the sum — a truncated
  * embedding must surface as NULL, not as a plausible prefix dot).
  * Like the HOF form the result is evaluation-ORDER-DEPENDENT in the last
  * ULP; oracle-compared results must still confirm through the exact
  * decimal [[graft.functions.VectorFns.dot]].
  */
case class FloatArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      val nul = ctx.freshName("sawNull")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |boolean $nul = ($n != $b.numElements());
         |for (int $i = 0; !$nul && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $nul = true; break; }
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |if ($nul) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatArrayDot =
    copy(left = newLeft, right = newRight)
}

object FloatArrayDot {
  /** Column wrapper: double dot product of two ARRAY<FLOAT> columns. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
