package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.TreePattern.{GENERATOR, TreePattern}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst Generator for market-basket pair mining (SURVEY §2.3 U2,
  * §7.3 "optional custom Generator pairs(array) — one pass, no shuffle").
  *
  * Emits every unordered pair (a, b) with a < b of the DISTINCT elements of
  * a long-array column — the canonicalized (least, greatest) product pairs
  * of one order (reference product_analytics_dag.py:197-206). Compared to
  * the self-join formulation this removes the join shuffle entirely: the
  * plan is groupBy(order) -> collect_set -> Generate(pair_combinations),
  * i.e. ONE shuffle keyed on the order, and the pair explosion is local,
  * C(k,2) per basket with k bounded by basket size.
  */
case class PairCombinations(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_combinations requires array<bigint>, got ${other.catalogString}")
    }

  override def elementSchema: StructType = new StructType()
    .add("product_1", LongType, nullable = false)
    .add("product_2", LongType, nullable = false)

  final override val nodePatterns: Seq[TreePattern] = Seq(GENERATOR)

  override def supportCodegen: Boolean = false  // interpreted Generate path

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Iterator.empty
    val arr = data.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    // distinct + ascending order => canonical pairs in one local pass
    val distinct = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) distinct.add(arr.getLong(i))
      i += 1
    }
    val vals = new Array[Long](distinct.size)
    val it = distinct.iterator()
    var j = 0
    while (it.hasNext) { vals(j) = it.next(); j += 1 }
    for {
      a <- Iterator.range(0, vals.length - 1)
      b <- Iterator.range(a + 1, vals.length)
    } yield InternalRow(vals(a), vals(b))
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombinations =
    copy(child = newChild)
}

object PairCombinations {
  /** (product_1, product_2) canonical-pair row schema. */
  val pairSchema: StructType = new StructType()
    .add("product_1", LongType, nullable = false)
    .add("product_2", LongType, nullable = false)

  /** Column wrapper: `pairCombinations(col)` explodes to (product_1,
    * product_2) rows. */
  def pairCombinations(arr: Column): Column =
    ColumnBridge.column(PairCombinations(ColumnBridge.expression(arr)))
}

/** Codegen-friendly variant: a SCALAR expression producing the canonical
  * pair array, exploded by the built-in (fully codegen'd) `explode`. The
  * Generator form above keeps the whole-row iterator shape but forces the
  * Generate stage onto the interpreted CodegenFallback path; this form
  * keeps basket expansion inside whole-stage codegen at the cost of
  * materializing the C(k,2) array per row — fine for order baskets
  * (k is basket size; C(k,2) stays tiny). Same output, OperatorsSpec
  * asserts equality with the Generator path. */
case class PairArray(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_array requires array<bigint>, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(PairCombinations.pairSchema, containsNull = false)
  override def prettyName: String = "pair_array"

  override def nullSafeEval(input: Any): Any =
    PairArray.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.PairArray.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): PairArray =
    copy(child = newChild)
}

object PairArray {
  /** Shared kernel for eval and codegen: distinct ascending values →
    * canonical (a<b) pair structs. Static so generated code calls it
    * directly without captured state. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val buf = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { buf(m) = arr.getLong(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf, 0, m)
    // dedup in place (sorted)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    if (w < 2) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](w * (w - 1) / 2)
    var k = 0
    var a = 0
    while (a < w - 1) {
      var b = a + 1
      while (b < w) {
        out(k) = InternalRow(buf(a), buf(b))
        k += 1
        b += 1
      }
      a += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column wrapper. */
  def pairArray(arr: Column): Column =
    ColumnBridge.column(PairArray(ColumnBridge.expression(arr)))
}
