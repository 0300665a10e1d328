package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The compiled BPE merge table the encode expression executes against —
  * ONE reference object per plan holding a pair-to-rank hash index,
  * instead of the merge list unrolled into nested column expressions (the
  * r5 form: plan size linear in merge count, unanalyzable at a production
  * 32k-merge vocabulary; this object makes plan size O(1) in the vocab).
  *
  * Encode semantics are EXACTLY the unrolled fold's — each merge, in rank
  * order, applied as one left-to-right non-overlapping pass — via the
  * equivalent rescan formulation: repeatedly find the minimum-rank
  * adjacent pair STRICTLY ABOVE the last applied rank and apply its pass.
  * Equivalence: between two applied ranks the symbols don't change, so
  * the next rank the fold would act on is precisely that minimum; ranks
  * at or below the last applied one are skipped exactly as the fold's
  * already-finished passes are. Cost per word: each applied pass shrinks
  * the symbol array, so at most s-1 passes of O(s) scans — O(s^2) in the
  * word length with hash-map rank lookups, INDEPENDENT of merge-table
  * size (the unrolled form paid O(merges x s) per word and O(merges)
  * plan nodes).
  */
final class BpeMergeTable(left: Array[String], right: Array[String])
  extends Serializable {
  require(left.length == right.length)

  /** pair -> ALL its 1-based ranks, ascending; the key length-prefixes
    * the left symbol so the packing is injective for ANY symbol content
    * (("ab","c") and ("a","bc") must not collide). Every rank is kept
    * because a trained table CAN legitimately list one pair twice: a
    * pair exhausted at rank j is re-created when a later merge
    * re-manufactures its left symbol (e.g. (ab,c) at rank 1, (a,b) at
    * rank 2 re-creates ab—c adjacencies, and a rank-3 (ab,c) merges
    * them) — the fold applies BOTH passes, so the rescan must be able to
    * find the pair again at its later rank. */
  private def key(l: String, r: String): String = l.length + ":" + l + r

  @transient private lazy val ranksOf: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, java.util.ArrayList[Integer]](left.length * 2)
    var i = 0
    while (i < left.length) {
      m.computeIfAbsent(key(left(i), right(i)), _ => new java.util.ArrayList[Integer])
        .add(Integer.valueOf(i + 1))
      i += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size * 2)
    m.forEach { (k, v) =>
      val arr = new Array[Int](v.size)
      var j = 0
      while (j < arr.length) { arr(j) = v.get(j).intValue; j += 1 }
      out.put(k, arr)   // insertion order is ascending rank already
    }
    out
  }

  /** Smallest rank of (l, r) strictly above `current`; MaxValue if none. */
  private def nextRank(l: String, r: String, current: Int): Int = {
    val rs = ranksOf.get(key(l, r))
    if (rs == null) return Int.MaxValue
    // rs is ascending and tiny (almost always length 1): linear scan
    var j = 0
    while (j < rs.length) {
      if (rs(j) > current) return rs(j)
      j += 1
    }
    Int.MaxValue
  }

  /** Code-point split, replicating `split(w, "")`: Java's empty-regex
    * split keeps surrogate pairs whole and maps "" to [""]. */
  private def codePointSplit(w: String): Array[String] = {
    if (w.isEmpty) return Array("")
    val out = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out.add(w.substring(i, i + n))
      i += n
    }
    out.toArray(new Array[String](out.size))
  }

  /** One left-to-right non-overlapping merge pass (the mergeOnce fold:
    * "aaa" under (a,a) becomes ["aa","a"]). */
  private def mergePass(syms: Array[String], x: String, y: String,
                        xy: String): Array[String] = {
    val out = new java.util.ArrayList[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (!out.isEmpty && out.get(out.size - 1) == x && syms(i) == y)
        out.set(out.size - 1, xy)
      else out.add(syms(i))
      i += 1
    }
    out.toArray(new Array[String](out.size))
  }

  def encodeWord(w: String): Array[String] = {
    var syms = codePointSplit(w)
    var current = 0
    while (syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = nextRank(syms(i), syms(i + 1), current)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) return syms
      syms = mergePass(syms, left(best - 1), right(best - 1),
        left(best - 1) + right(best - 1))
      current = best
    }
    syms
  }

  /** Encode an array of words and flatten the per-word symbol runs —
    * called from both the interpreted eval and the generated code. Null
    * words are skipped (the upstream split never produces them). */
  def encodeWords(words: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[UTF8String](words.numElements() * 4)
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        val toks = encodeWord(words.getUTF8String(i).toString)
        var j = 0
        while (j < toks.length) {
          out.add(UTF8String.fromString(toks(j)))
          j += 1
        }
      }
      i += 1
    }
    val arr = new Array[Any](out.size)
    var z = 0
    while (z < arr.length) { arr(z) = out.get(z); z += 1 }
    new GenericArrayData(arr)
  }
}

/** BPE encode over a word-array column: each word is code-point split and
  * merged under the compiled [[BpeMergeTable]]; the per-word symbol runs
  * are flattened into one `array<string>` of BPE tokens (the same output
  * as the unrolled `transform`+`aggregate` reference form in
  * [[graft.llm.Bpe.applyMergesUnrolled]] — TextPipelineSpec asserts the
  * parity, including at 1000+ merges where the unrolled plan stops being
  * practical). */
case class BpeEncodeExpr(child: Expression,
                         mergesLeft: Seq[String], mergesRight: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table =
    new BpeMergeTable(mergesLeft.toArray, mergesRight.toArray)

  override def nullSafeEval(input: Any): Any =
    table.encodeWords(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeMergeTable].getName)
      s"${ev.value} = $ref.encodeWords($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeExprs {
  /** BPE-encode a word-array column under a rank-ordered merge list. */
  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeExpr(ColumnBridge.expression(words),
      merges.map(_._1), merges.map(_._2)))
}
