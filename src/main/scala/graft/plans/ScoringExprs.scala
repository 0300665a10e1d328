package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd feature-bucketing kernel for the model-based scorers
  * ([[graft.llm.Scoring]]): token array → md5-derived hash-trick bucket
  * ids for every unigram and word-bigram feature, in one compiled pass.
  *
  * The HOF reference form (`transform(ngramFeatures(toks), f =>
  * md5Int(f, 8) % buckets)`) computes bit-identical values —
  * ScoringSpec asserts the equivalence — but evaluates an interpreted
  * md5-hex + substring + conv(16,10) chain per ELEMENT. This kernel
  * digests raw UTF-8 bytes once per feature with a per-row reused
  * MessageDigest and extracts the leading 4 bytes arithmetically: the
  * same `conv(substring(md5(f), 1, 8), 16, 10) % buckets` value with no
  * hex string, no BigInteger, no per-element lambda dispatch. This is
  * the scan-side cost of the q123/q124 scoring passes.
  *
  * Null tokens are not expected (TextFns.tokens never produces them —
  * the HashArrayInput contract); a null element fails loudly rather than
  * silently biasing the score toward bucket 0's weight (the HOF reference
  * form would yield a NULL score there, so any silent mapping diverges
  * from the spec-pinned equivalence exactly on the corrupt input).
  */
case class FeatureBucketsExpr(child: Expression, buckets: Int)
  extends UnaryExpression {

  require(buckets > 0, "buckets must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "feature_buckets"

  override def nullSafeEval(input: Any): Any =
    ScoringExprs.featureBuckets(input.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.ScoringExprs.featureBuckets($arr, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): FeatureBucketsExpr =
    copy(child = newChild)
}

object ScoringExprs {

  /** The [[WeightSumExpr]] kernel: element_at semantics replayed exactly —
    * 1-based positive indexing, negative indexes from the end, index 0
    * throws, past-either-end returns null (nulling the fold like the HOF
    * would), null elements null the margin. */
  def weightSum(bks: ArrayData, w: Array[Long]): java.lang.Long = {
    val n = bks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (bks.isNullAt(i)) return null
      val idx = (bks.getLong(i) + 1L).toInt // the HOF's (b + 1).cast("int")
      if (idx == 0) throw new IllegalArgumentException(
        "weight_sum: SQL array indices start at 1 (bucket id -1)")
      val j = if (idx > 0) idx - 1 else w.length + idx
      if (j < 0 || j >= w.length) return null
      acc += w(j)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }


  /** Column wrapper: bucket ids of every unigram + word-bigram feature
    * of a token-array column, unigrams first then bigrams — the same
    * feature order as `Scoring.ngramFeatures`. */
  def featureBuckets(toks: Column, buckets: Int): Column =
    ColumnBridge.column(FeatureBucketsExpr(ColumnBridge.expression(toks), buckets))

  /** Column wrapper: hashed-linear margin of a bucket array against a
    * frozen weight vector (one codegen'd kernel call per row). */
  def weightSumCol(bks: Column, weights: Array[Long]): Column =
    ColumnBridge.column(WeightSumExpr(ColumnBridge.expression(bks), weights))

  /** One digest instance per thread: getInstance per ROW would pay a JCA
    * provider lookup + allocation on the hot scan path; the per-feature
    * loop already reset()s before each use. */
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Runtime kernel (called from both eval and generated code). */
  def featureBuckets(arr: ArrayData, buckets: Int): GenericArrayData = {
    val md = mdLocal.get()
    val n = arr.numElements()
    val nBi = if (n >= 2) n - 1 else 0
    val out = new Array[Long](n + nBi)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "feature_buckets: null token element — corrupt upstream input " +
            "(TextFns.tokens never produces null tokens)")
      out(i) = bucketOf(md, arr.getUTF8String(i).getBytes, buckets)
      i += 1
    }
    i = 0
    while (i < nBi) {
      val a = arr.getUTF8String(i).getBytes
      val b = arr.getUTF8String(i + 1).getBytes
      val bytes = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, bytes, 0, a.length)
      bytes(a.length) = ' '
      System.arraycopy(b, 0, bytes, a.length + 1, b.length)
      out(n + i) = bucketOf(md, bytes, buckets)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** First 8 md5 hex digits as an unsigned int, mod buckets — equals
    * `conv(substring(md5(f), 1, 8), 16, 10) % buckets` bit-for-bit. */
  private def bucketOf(md: java.security.MessageDigest,
                       bytes: Array[Byte], buckets: Int): Long = {
    md.reset()
    val d = md.digest(bytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % buckets
  }

  /** The q123 frozen weight table, driver-side: weight(b) =
    * `md5Int(CAST(b AS STRING), 4) % 2001 - 1000` for b in [0, buckets)
    * — a pure function of the bucket id, so the ≤`buckets`-entry table
    * is a literal the scoring projection indexes instead of running a
    * second interpreted md5 chain per feature. */
  def frozenWeights(buckets: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(buckets) { b =>
      md.reset()
      val d = md.digest(String.valueOf(b).getBytes("UTF-8"))
      val v = ((d(0) & 0xffL) << 8) | (d(1) & 0xffL)
      v % 2001L - 1000L
    }
  }
}

/** Codegen'd hashed-linear margin: `Σ_b weights[b]` over a row's feature
  * bucket array — the serving/training inner loop of
  * [[graft.llm.Scoring]] (`scoreWithWeights`, `trainLogistic`'s
  * per-round margin). The HOF reference form (`aggregate(bks, 0L,
  * (acc, b) => acc + element_at(weights, (b + 1).cast("int")))`)
  * computes bit-identical values — ScoringSpec asserts the equivalence —
  * but runs an interpreted lambda dispatch plus a literal-array
  * element_at per FEATURE per row, re-entered every GD round. This
  * kernel is one primitive loop over the bucket array against a
  * reference-object long[], with the HOF form's exact semantics: Long
  * addition wraps identically, a null bucket element nulls the whole
  * margin, an out-of-range bucket id routes through element_at's
  * contract (negative from the end, past-the-end null, 0 throws). */
case class WeightSumExpr(child: Expression, weights: Array[Long])
  extends UnaryExpression {

  require(weights.nonEmpty, "weight_sum: empty weight vector")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "weight_sum"

  override def nullSafeEval(input: Any): Any =
    ScoringExprs.weightSum(input.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = graft.plans.ScoringExprs.weightSum($arr, $w);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WeightSumExpr =
    copy(child = newChild)
}
