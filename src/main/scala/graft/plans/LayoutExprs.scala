package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Codegen'd 2-D Z-order (Morton) key: interleave the low 16 bits of two
  * INT columns into one 32-bit key carried as LONG — the multi-dimensional
  * clustering primitive. Sorting a table by `z(x, y)` gives every written
  * file a narrow rectangle of (x, y) space, so min/max file statistics
  * prune BOX predicates on either or both dimensions — the layout trick
  * (Delta/Iceberg `ZORDER BY`) that single-column sorting cannot provide:
  * a table sorted by x alone never prunes a y-only filter.
  *
  * The spread uses the classic mask-shift doubling (public bit-twiddling
  * folklore; same constants as Morton-code references): each step doubles
  * the gap between occupied bits, 4 steps take 16 bits to 32. Integral
  * bit arithmetic — bit-equal across JVMs and re-expressible in any SQL
  * dialect with `& | <<`, which is what the q114 oracle does in DuckDB.
  * Inputs are masked to their low 16 bits; callers bucket/clamp wider
  * domains first (a 16+16-bit key already separates 4 G cells).
  */
case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two int inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "zorder2"

  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    spread(l.asInstanceOf[Int].toLong) | (spread(r.asInstanceOf[Int].toLong) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx")
      val y = ctx.freshName("zy")
      def spreadCode(src: String, v: String) =
        s"""long $v = ((long) $src) & 0xFFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |${spreadCode(a, x)}
         |${spreadCode(b, y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Column wrapper: 32-bit Morton key of two INT columns. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
