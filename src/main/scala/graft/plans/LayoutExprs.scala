package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

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

/** Codegen'd N-key quantile-bucketed Z-order key — the shuffle key
  * [[graft.sources.TxLog.compactZorderTx]] clusters rewrites by: each
  * DOUBLE child maps to a `bits`-bit rank bucket via binary search over
  * its (plan-embedded) quantile boundaries, and the bucket ids interleave
  * bit-by-bit into one LONG. Nulls take bucket 0 (NULLS FIRST order), so
  * the output is never null. A native expression, not a UDF: the z-value
  * is computed once per row inside whole-stage codegen on the write
  * path's hot loop — no boxing, no Scala-UDF serialization (the repo's
  * zero-UDF posture where an Expression fits).
  *
  * `bits * keys.length` must stay ≤ 63: a wider interleave would wrap
  * Scala's mod-64 Long shift and silently collide bit positions —
  * degrading the clustering the feature exists for (shuffle-key only, so
  * results would stay correct, but the skipping gate would quietly
  * weaken). Enforced here, loudly.
  */
case class ZBucketInterleave(children: Seq[Expression],
                             bounds: Array[Array[Double]], bits: Int)
  extends Expression {
  require(children.nonEmpty && children.length == bounds.length,
    "zbucket_interleave: one boundary array per key")
  require(bits * children.length <= 63,
    s"zbucket_interleave: $bits bits × ${children.length} keys exceeds " +
      "63 — the interleave would wrap Long shifts and collide bit " +
      "positions; reduce keys or bits")

  override def checkInputDataTypes(): TypeCheckResult =
    children.zipWithIndex.collectFirst {
      case (c, i) if c.dataType != DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName key $i must be double, got ${c.dataType.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zbucket_interleave"

  private def bucketOf(i: Int, v: Any): Int =
    if (v == null) 0
    else {
      val p = java.util.Arrays.binarySearch(bounds(i), v.asInstanceOf[Double])
      if (p < 0) -p - 1 else p
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.length
    var z = 0L
    var i = 0
    while (i < n) {
      val bucket = bucketOf(i, children(i).eval(input))
      var j = 0
      while (j < bits) {
        z |= ((bucket >> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val b = ctx.addReferenceObj("zbounds", bounds, "double[][]")
    val n = children.length
    val z = ctx.freshName("z")
    val init = code"long $z = 0L;"
    val full = children.map(_.genCode(ctx)).zipWithIndex
      .foldLeft(init) { case (acc, (c, i)) =>
        val bk = ctx.freshName("bk")
        val p = ctx.freshName("p")
        val j = ctx.freshName("j")
        acc +
          code"""
            ${c.code}
            int $bk = 0;
            if (!${c.isNull}) {
              int $p = java.util.Arrays.binarySearch($b[$i], ${c.value});
              $bk = $p < 0 ? -$p - 1 : $p;
            }
            for (int $j = 0; $j < $bits; $j++) {
              $z |= ((long) (($bk >> $j) & 1)) << ($j * $n + $i);
            }"""
      }
    ev.copy(code = full, isNull = FalseLiteral,
      value = JavaCode.variable(z, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZBucketInterleave =
    copy(children = newChildren)
}

object ZBucketInterleave {
  /** Column wrapper: interleaved z-key of DOUBLE columns with the given
    * per-key quantile boundaries. */
  def apply(keys: Seq[Column], bounds: Array[Array[Double]],
            bits: Int): Column =
    ColumnBridge.column(
      ZBucketInterleave(keys.map(ColumnBridge.expression), bounds, bits))
}
