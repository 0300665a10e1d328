package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd fingerprint kernels over a 64-bit hash array column — the
  * per-document inner loops of MinHash and SimHash.
  *
  * Both have HOF reference forms in [[graft.functions.TextFns]]
  * (`minhashFromHashes`, `simhashFromHashes`) that compute bit-identical
  * values; DedupSpec asserts the equivalence. The HOF forms traverse the
  * hash array k times (MinHash) or rebuild a 16-field struct per element
  * (SimHash); these expressions make one primitive pass with local
  * accumulators, which is where the dedup queries spend their scan-side
  * time. Null elements are skipped (the upstream token/shingle hash
  * pipeline never produces them).
  */
private[plans] trait HashArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
}

/** MinHash signature: `sig[i] = min_j (h_j * A_i + B_i)` for the k-hash
  * family derived from one 64-bit hash per element (same mix constants as
  * TextFns.mixA/mixB). Empty input yields Long.MaxValue sentinels (the
  * pipeline pre-filters empty docs). */
case class MinHashSignatureExpr(child: Expression, k: Int)
  extends UnaryExpression with HashArrayInput {

  // exposed as the SQL function minhash_signature: a non-positive k would
  // otherwise surface as a per-row NegativeArraySizeException (k < 0) or a
  // silently-valid empty signature (k = 0) that LSH banding accepts
  require(k >= 1, s"minhash_signature: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val mixA: Array[Long] =
    (0 until k).map(i => 0x9E3779B97F4A7C15L * (2L * i + 1)).toArray
  private lazy val mixB: Array[Long] =
    (0 until k).map(i => 0xBF58476D1CE4E5B9L * i + 0x94D049BB133111EBL).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var i = 0
        while (i < k) {
          val v = h * mixA(i) + mixB(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val a = ctx.addReferenceObj("mixA", mixA, "long[]")
      val b = ctx.addReferenceObj("mixB", mixB, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($arr.isNullAt($j)) continue;
         |  long $h = $arr.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = $h * $a[$i] + $b[$i];
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** SimHash-64: bit b of the result is set iff a strict majority of the
  * input hashes have bit b set (`ones(b)*2 > n`, n = non-null element
  * count) — identical to the SWAR HOF form's semantics. */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression with HashArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var n = 0
    var j = 0
    val m = arr.numElements()
    while (j < m) {
      if (!arr.isNullAt(j)) {
        n += 1
        val h = arr.getLong(j)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) fp |= 1L << b
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $counts = new int[64];
         |int $n = 0;
         |int $m = $arr.numElements();
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($arr.isNullAt($j)) continue;
         |  $n++;
         |  long $h = $arr.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] * 2 > $n) $fp |= 1L << $b;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Distinct word-n-gram hashes computed directly from per-token hashes —
  * the string-free shingle pipeline. The reference form builds every
  * n-gram STRING (`concat_ws` of n tokens), distincts them, and hashes;
  * this combines the n token hashes positionally (FNV-style fold: the
  * same token sequence always yields the same 64-bit key, order matters)
  * and dedups the combined hashes in one pass. Distinct-by-string and
  * distinct-by-hash agree up to 64-bit collisions (~D²/2^65 over D
  * distinct shingles — negligible at corpus scale; the dedup consumers
  * only ever use shingles as join/count keys, never as text). Output
  * order: first occurrence, matching array_distinct over the grams. */
case class NgramHashesExpr(child: Expression, n: Int)
  extends UnaryExpression with HashArrayInput {

  // n <= 0 would make every window fold to the bare FNV offset basis — a
  // single constant shingle shared by EVERY document, silently marking the
  // whole corpus as near-duplicate
  require(n >= 1, s"ngram_hashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    NgramHashesExpr.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.NgramHashesExpr.compute($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesExpr =
    copy(child = newChild)
}

object NgramHashesExpr {
  /** Shared kernel for eval + generated code. Null token hashes are
    * impossible upstream (hashes of non-null tokens) but skipped
    * defensively. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val th = new Array[Long](m)
    var cnt = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) { th(cnt) = arr.getLong(i); cnt += 1 }
      i += 1
    }
    if (cnt < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](cnt - n + 1)
    var w = 0
    val seen = new java.util.HashSet[java.lang.Long]((cnt - n + 1) * 2)
    i = 0
    while (i <= cnt - n) {
      var h = 0xcbf29ce484222325L // FNV-1a offset basis, widened
      var j = 0
      while (j < n) {
        h = (h ^ th(i + j)) * 0x100000001b3L
        j += 1
      }
      if (seen.add(h)) { out(w) = h; w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** Winnowing document fingerprints (the MOSS scheme): a Rabin-Karp
  * POLYNOMIAL ROLLING HASH over the text's UTF-8 bytes produces one
  * 64-bit hash per character k-gram in O(len) (each step drops the
  * leading byte and appends the next — no re-hashing), then each window
  * of `w` consecutive k-gram hashes contributes its minimum (rightmost
  * tie-winner, per the winnowing paper's robustness rule). Output is the
  * distinct selected hashes — a position-independent fingerprint set:
  * any shared substring of length ≥ k+w-1 guarantees ≥1 shared
  * fingerprint. Density is ~2/(w+1) of all k-grams, so the fingerprint
  * set stays small at corpus scale. */
case class RollingFingerprintsExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 2 && w >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprints"

  override def nullSafeEval(input: Any): Any =
    RollingFingerprintsExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.RollingFingerprintsExpr.compute($s, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintsExpr =
    copy(child = newChild)
}

object RollingFingerprintsExpr {
  private val P = 1099511628211L // FNV prime as the polynomial base

  /** Shared kernel for eval + generated code. */
  def compute(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // rolling k-gram hashes: h(i+1) = (h(i) - b(i)*P^(k-1)) * P + b(i+k)
    var pk = 1L
    var x = 0
    while (x < k - 1) { pk *= P; x += 1 }
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * P + (bytes(i) & 0xff); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xff) * pk) * P + (bytes(i + k - 1) & 0xff)
      hs(i) = h
      i += 1
    }
    // winnowing: min of each w-window, rightmost on ties; emit on change
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var start = 0
    while (start <= m - w || (start == 0 && m < w)) {
      val end = math.min(start + w, m)
      var min = hs(start)
      var j = start + 1
      while (j < end) {
        if (hs(j) <= min) min = hs(j)  // rightmost minimum
        j += 1
      }
      if (seen.add(min)) out.add(min)
      start += 1
    }
    val arr = new Array[Long](out.size)
    var z = 0
    while (z < arr.length) { arr(z) = out.get(z); z += 1 }
    new GenericArrayData(arr)
  }
}

/** Static NFC kernel, called from generated code (Scala objects without
  * companion classes get Java static forwarders, so
  * `graft.plans.NfcNormalize.nfc(...)` is referenceable from codegen). */
object NfcNormalize {
  /** NFC-normalize a UTF8String. ASCII and already-normalized inputs
    * return the INPUT OBJECT unchanged (zero-copy) — NFC is the identity
    * on ASCII, so on an all-ASCII corpus the pass costs one byte scan
    * per row and allocates nothing; only genuinely decomposed text pays
    * the String round trip. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization (canonical composition) — the encoding
  * realism pass ahead of the fingerprint/dedup family: composed (é) and
  * decomposed (e + U+0301) spellings of the same text hash identically
  * after it, so near-dups don't split across encodings (r11 verdict item
  * 5). Mirrors DuckDB's `nfc_normalize` exactly (both implement Unicode
  * NFC; the q214 gate pins the cross-engine agreement on a planted
  * non-ASCII fixture). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Static kernels for the AGGRESSIVE (lossy) fold — called from
  * generated code. Kept separate from [[NfcNormalize]] because these are
  * OPT-IN dedup keys, never part of the default tokenization: NFKC
  * erases meaningful distinctions (① → 1, ² → 2) and the confusable
  * skeleton erases script identity — exactly what cross-script
  * spam/boilerplate dedup wants, and exactly what a faithful text
  * pipeline must not do silently. */
object AggressiveFold {
  /** Unicode NFKC (compatibility composition): folds fullwidth forms,
    * ligatures, compatibility variants. ASCII zero-copy fast path. */
  def nfkc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }

  /** ICU confusable skeleton (UTS #39): maps visually-confusable
    * characters across scripts to one canonical form (Cyrillic а → Latin
    * a, ѕ → s, …), so a homoglyph-substituted near-dup folds onto its
    * original. The checker is immutable and thread-safe; built once per
    * JVM. ASCII is NOT a fixed point of the skeleton (l/I/1 share one
    * class), so equality of folds — not identity — is the contract. */
  private lazy val spoof = new com.ibm.icu.text.SpoofChecker.Builder().build()
  def skeleton(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      spoof.getSkeleton(s.toString))
}

/** NFKC compatibility normalization (lossy; opt-in — see
  * [[AggressiveFold]]). */
case class NfkcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfkc_normalize requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfkc_normalize"
  override def nullSafeEval(input: Any): Any =
    AggressiveFold.nfkc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AggressiveFold.nfkc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfkcNormalizeExpr =
    copy(child = newChild)
}

/** UTS #39 confusable-skeleton fold (lossy; opt-in — see
  * [[AggressiveFold]]). Interpreted eval only: the ICU call dominates,
  * so codegen uses the same static kernel. */
case class ConfusableSkeletonExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"confusable_skeleton requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "confusable_skeleton"
  override def nullSafeEval(input: Any): Any =
    AggressiveFold.skeleton(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AggressiveFold.skeleton($c)")
  override protected def withNewChildInternal(newChild: Expression): ConfusableSkeletonExpr =
    copy(child = newChild)
}

object TextExprs {
  /** Unicode NFC normalization of a string column (codegen'd; zero-copy
    * on ASCII). */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))

  /** Unicode NFKC compatibility normalization (lossy; opt-in). */
  def nfkcNormalize(text: Column): Column =
    ColumnBridge.column(NfkcNormalizeExpr(ColumnBridge.expression(text)))

  /** UTS #39 confusable-skeleton fold (lossy; opt-in). */
  def confusableSkeleton(text: Column): Column =
    ColumnBridge.column(ConfusableSkeletonExpr(ColumnBridge.expression(text)))

  /** k-minima MinHash signature of a 64-bit hash array column. */
  def minhashSignature(hashArr: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(hashArr), k))

  /** Position-agreement count of two MinHash signature columns (the
    * LSH verify inner loop). */
  def minhashAgreement(a: Column, b: Column): Column =
    ColumnBridge.column(MinhashAgreementExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 64-bit majority-vote SimHash of a hash array column. */
  def simhash64(hashArr: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(hashArr)))

  /** Distinct n-gram hashes from a per-token hash array (string-free
    * shingling). */
  def ngramHashes(tokenHashArr: Column, n: Int): Column =
    ColumnBridge.column(NgramHashesExpr(ColumnBridge.expression(tokenHashArr), n))

  /** Winnowing fingerprint set of a text column (rolling-hash k-grams,
    * min per w-window). */
  def rollingFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    ColumnBridge.column(RollingFingerprintsExpr(ColumnBridge.expression(text), k, w))
}

/** Codegen'd MinHash agreement count: positions where two ARRAY<LONG>
  * signatures carry the same minimum — the per-candidate-pair verify
  * loop of the banded-LSH dedup family ([[graft.llm.Dedup]]
  * minhashNearDupPairs / incrementalNearDedupe). The HOF reference form
  * (`aggregate(zip_with(a, b, (p, q) => when(p === q, 1).otherwise(0)),
  * 0, _ + _)`) computes bit-identical counts — DedupSpec asserts it —
  * but allocates the zipped intermediate and dispatches two interpreted
  * lambdas per position PER CANDIDATE PAIR. This kernel is one primitive
  * loop; semantics match the HOF exactly: ragged lengths contribute 0
  * beyond the overlap (zip_with's null padding routes to `otherwise(0)`),
  * null elements contribute 0 (`null === x` is null), and the count is
  * Int like the HOF's accumulator. */
case class MinhashAgreementExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "minhash_agreement"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    MinhashAgreementExpr.count(a, b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.MinhashAgreementExpr.count($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashAgreementExpr =
    copy(left = newLeft, right = newRight)
}

object MinhashAgreementExpr {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }
}
