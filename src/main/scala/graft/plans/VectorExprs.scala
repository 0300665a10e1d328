package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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

/** Codegen'd PQ codeword-assignment kernels ([[graft.llm.Similarity]]
  * pqTrain/pqEncode). The declarative form — `greatest` over k
  * `struct(FloatArrayDot(subvec, array(lit…)) − half, c)` candidates —
  * is correct but allocates a literal ARRAY and a STRUCT per candidate
  * per row (m·k of each per vector): measured as the dominant cost of
  * the q91 chain at 32× data (~39 s wall, nearly all allocation). These
  * kernels run the identical arithmetic — per codeword, the sequential
  * float-pair dot minus the PRECOMPUTED ‖cw‖²/2, argmax with ties to the
  * highest codeword id, exactly `greatest`'s lexicographic struct max —
  * as one primitive loop with zero per-row allocation. Bit-identical
  * codes (SimilaritySpec asserts vs the declarative form; the q91 golden
  * replay pins it end-to-end). */
object PqKernel {
  /** Flattened codebooks + halves, shared by both kernels. `halves`
    * reproduces the driver-side `cw.map(v => v.toDouble * v).sum / 2.0`
    * exactly (same left-fold sum). */
  def flatten(books: Array[Array[Array[Float]]]): (Array[Float], Array[Double]) = {
    val flat = books.flatMap(_.flatten)
    val halves = books.flatMap(_.map(cw => cw.map(v => v.toDouble * v).sum / 2.0))
    (flat, halves)
  }

  /** argmax_c (subvec·book[sub][c] − halves[sub·k+c]); ties → highest c. */
  def nearest(subvec: ArrayData, sub: Int, flat: Array[Float],
              halves: Array[Double], k: Int, subDim: Int): Int = {
    // a ragged corpus must fail loudly: UnsafeArrayData.getFloat past the
    // element region reads GARBAGE without throwing, so a short subvec
    // would silently produce wrong codes (the declarative FloatArrayDot
    // form this kernel replaced surfaced the mismatch as NULL)
    if (subvec.numElements() != subDim)
      throw new IllegalArgumentException(
        s"pq_nearest_codeword: subvector has ${subvec.numElements()} " +
          s"elements, codebook expects $subDim — ragged embedding corpus")
    var best = -1
    var bestScore = 0.0
    var c = 0
    while (c < k) {
      val off = (sub * k + c) * subDim
      var s = 0.0
      var i = 0
      while (i < subDim) {
        s += subvec.getFloat(i).toDouble * flat(off + i)
        i += 1
      }
      s -= halves(sub * k + c)
      if (best < 0 || s >= bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  /** Whole-vector encode: codes[s] = nearest codeword of subspace s
    * (the embedding's s-th contiguous subDim slice). */
  def encode(emb: ArrayData, flat: Array[Float], halves: Array[Double],
             m: Int, k: Int, subDim: Int): GenericArrayData = {
    // same ragged-corpus guard as nearest(): silent garbage codes otherwise
    if (emb.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode_codes: embedding has ${emb.numElements()} elements, " +
          s"codebooks expect ${m * subDim} — ragged embedding corpus")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestScore = 0.0
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          d += emb.getFloat(s * subDim + i).toDouble * flat(off + i)
          i += 1
        }
        d -= halves(s * k + c)
        if (best < 0 || d >= bestScore) { bestScore = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `nearest codeword id` over a (subvec, sub-index) row pair. */
case class PqNearestCodewordExpr(left: Expression, right: Expression,
                                 books: Array[Array[Array[Float]]])
  extends BinaryExpression {
  @transient private lazy val (flat, halves) = PqKernel.flatten(books)
  private val k = books(0).length
  private val subDim = books(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, int), got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_nearest_codeword"
  override def nullSafeEval(sv: Any, sub: Any): Any =
    PqKernel.nearest(sv.asInstanceOf[ArrayData], sub.asInstanceOf[Int],
      flat, halves, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("flat", flat, "float[]")
    val h = ctx.addReferenceObj("halves", halves, "double[]")
    nullSafeCodeGen(ctx, ev, (sv, sub) =>
      s"${ev.value} = graft.plans.PqKernel.nearest($sv, $sub, $f, $h, $k, $subDim);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNearestCodewordExpr =
    copy(left = newLeft, right = newRight)
}

/** Whole-vector PQ code assignment: ARRAY<FLOAT> embedding → ARRAY<INT>. */
case class PqEncodeCodesExpr(child: Expression,
                             books: Array[Array[Array[Float]]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val (flat, halves) = PqKernel.flatten(books)
  private val m = books.length
  private val k = books(0).length
  private val subDim = books(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_codes"
  override def nullSafeEval(emb: Any): Any =
    PqKernel.encode(emb.asInstanceOf[ArrayData], flat, halves, m, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("flat", flat, "float[]")
    val h = ctx.addReferenceObj("halves", halves, "double[]")
    nullSafeCodeGen(ctx, ev, emb =>
      s"${ev.value} = graft.plans.PqKernel.encode($emb, $f, $h, $m, $k, $subDim);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodesExpr =
    copy(child = newChild)
}

object PqExprs {
  def nearestCodeword(subvec: Column, sub: Column,
                      books: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(PqNearestCodewordExpr(
      ColumnBridge.expression(subvec), ColumnBridge.expression(sub), books))
  def encodeCodes(emb: Column, books: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(PqEncodeCodesExpr(ColumnBridge.expression(emb), books))
}

/** Codegen'd SQ8 encode/score kernels ([[graft.llm.Similarity]]
  * sq8Encode/sq8Search, `VectorIndex` stored-index search). The
  * declarative forms — `zip_with(emb, sequence(1, dim), …)` for the
  * encode and `aggregate(sequence(1, dim), 0.0, …)` for the ADC score —
  * are higher-order functions over per-dimension `element_at`s into
  * literal arrays: correct, but the lambda dispatch plus array
  * materialization per element made the one-pass SQ8 chain the q137
  * profile's dominant job (2.1 s single-task at sf0.1, ~64 interpreted
  * steps × 3 literal lookups per row). These kernels run the IDENTICAL
  * arithmetic — same left-fold order, same double intermediates, same
  * null/NaN/ragged-length routing as the HOF forms (SimilaritySpec
  * asserts bit-identity; the q137/q144/q145 oracles pin it end-to-end)
  * — as one primitive loop with zero per-row allocation. Same
  * preference-order-(b) move as [[PqKernel]]. */
object Sq8Kernel {
  /** `zip_with(emb, sequence(1, dim), (v, i) => when(mx_i > mn_i,
    * least(255.0, greatest(0.0, floor((double(v) − mn_i) · 255.0 /
    * (mx_i − mn_i)))).cast(int)).otherwise(0))` exactly, including the
    * HOF's length semantics (output has max(|emb|, dim) elements — the
    * shorter side null-pads, and a null v or null i routes to 0 through
    * `greatest(0.0, null)` / `otherwise(0)`) and its NaN routing (a NaN
    * quotient survives `greatest` — NaN orders above every double — and
    * `least(255.0, NaN)` picks 255.0). */
  def encode(emb: ArrayData, mn: Array[Float], mx: Array[Float]): GenericArrayData = {
    val dim = mn.length
    val n = emb.numElements()
    val out = new Array[Int](math.max(n, dim))
    var i = 0
    while (i < out.length) {
      out(i) =
        if (i >= dim) 0                        // i padded null → otherwise(0)
        else if (!(mx(i) > mn(i))) 0           // constant (or NaN) dimension
        else if (i >= n || emb.isNullAt(i)) 0  // v null → greatest(0.0, null)
        else {
          val lo = mn(i).toDouble
          val x = math.floor((emb.getFloat(i).toDouble - lo) * 255.0 /
            (mx(i).toDouble - lo))
          if (java.lang.Double.isNaN(x)) 255   // least(255.0, NaN) = 255.0
          else math.min(255.0, math.max(0.0, x)).toInt
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `aggregate(sequence(1, dim), 0.0, (acc, i) => acc + q_i · (mn_i +
    * (element_at(codes, i) + 0.5) · step_i))` exactly — the same
    * dimension-order left fold in doubles; a codes array shorter than
    * `dim` or a null element nulls the whole score exactly as the
    * out-of-range / null `element_at` would. */
  def score(codes: ArrayData, q: Array[Double], mn: Array[Double],
            step: Array[Double]): java.lang.Double = {
    val dim = q.length
    if (codes.numElements() < dim) return null
    var acc = 0.0
    var i = 0
    while (i < dim) {
      if (codes.isNullAt(i)) return null
      acc += q(i) * (mn(i) + (codes.getInt(i) + 0.5) * step(i))
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Whole-vector SQ8 encode: ARRAY<FLOAT> embedding → ARRAY<INT> codes. */
case class Sq8EncodeExpr(child: Expression, mn: Array[Float], mx: Array[Float])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(mn.length == mx.length,
    s"sq8_encode: ${mn.length} mins vs ${mx.length} maxes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq8_encode"
  override def nullSafeEval(emb: Any): Any =
    Sq8Kernel.encode(emb.asInstanceOf[ArrayData], mn, mx)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("mn", mn, "float[]")
    val mxRef = ctx.addReferenceObj("mx", mx, "float[]")
    nullSafeCodeGen(ctx, ev, emb =>
      s"${ev.value} = graft.plans.Sq8Kernel.encode($emb, $mnRef, $mxRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): Sq8EncodeExpr =
    copy(child = newChild)
}

/** SQ8 ADC (midpoint-decode) score of one codes row against a frozen
  * (query, bounds) pair — the per-dimension factors precompute on the
  * driver (q, mn, step as doubles) exactly as the literal arrays did. */
case class Sq8ScoreExpr(child: Expression, q: Array[Double],
                        mn: Array[Double], step: Array[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(q.length == mn.length && q.length == step.length,
    s"sq8_score: mismatched factor arrays (${q.length}/${mn.length}/${step.length})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_score"
  override def nullSafeEval(codes: Any): Any =
    Sq8Kernel.score(codes.asInstanceOf[ArrayData], q, mn, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("q", q, "double[]")
    val mnRef = ctx.addReferenceObj("mn", mn, "double[]")
    val stRef = ctx.addReferenceObj("step", step, "double[]")
    nullSafeCodeGen(ctx, ev, codes => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.plans.Sq8Kernel.score($codes, $qRef, $mnRef, $stRef);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Sq8ScoreExpr =
    copy(child = newChild)
}

object Sq8Exprs {
  def encode(emb: Column, bounds: Array[(Float, Float)]): Column =
    ColumnBridge.column(Sq8EncodeExpr(ColumnBridge.expression(emb),
      bounds.map(_._1), bounds.map(_._2)))
  def score(codes: Column, bounds: Array[(Float, Float)],
            queryVec: Array[Float]): Column =
    ColumnBridge.column(Sq8ScoreExpr(ColumnBridge.expression(codes),
      queryVec.map(_.toDouble),
      bounds.map(_._1.toDouble),
      bounds.map { case (lo, hi) =>
        if (hi > lo) (hi.toDouble - lo.toDouble) / 255.0 else 0.0 }))
}
