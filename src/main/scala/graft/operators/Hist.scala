package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fixed-domain counting-histogram sketch — the QUANTILE member of the
  * warehouse's mergeable-sketch trio ([[Hll]] distinct, [[Cms]]
  * frequency): per-partition/day bucket-count arrays that merge by
  * elementwise addition, from which any quantile is answered to bucket
  * resolution without re-touching the data.
  *
  * Unlike t-digest/KLL (whose merged state depends on merge order), a
  * counting histogram over a FIXED bucketing is a pure function of the
  * value multiset — partial sketches merged any way are bit-identical to
  * the one-shot sketch, and every derived statistic is deterministic and
  * re-expressible in plain SQL (`floor((x-lo)/width)` + cumulative
  * counts), which is what lets the q119 gate be a DuckDB oracle rather
  * than a golden file. The trade is needing domain bounds up front —
  * the normal case for warehouse money/measure columns; values outside
  * [lo, hi) clamp into the edge buckets so nothing is silently dropped.
  *
  * Quantile answers are bucket LOWER BOUNDS (lo + i·width with i the
  * integer bucket index) — resolution = (hi-lo)/buckets, the standard
  * histogram-quantile contract.
  */
object Hist {

  /** Bucket index for x, clamping out-of-range values to the edge buckets;
    * -1 for NaN (a NaN has no position on the domain — without the explicit
    * branch it would land in bucket 0 via NaN.toInt == 0 and silently skew
    * the low edge and every quantile derived from it). */
  private def bucketOf(x: Double, lo: Double, width: Double, n: Int): Int = {
    if (x.isNaN) return -1
    val b = math.floor((x - lo) / width)
    if (b < 0) 0 else if (b >= n) n - 1 else b.toInt
  }

  private final class SketchAgg(lo: Double, width: Double, n: Int)
    extends Aggregator[Double, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](n)
    override def reduce(b: Array[Long], x: Double): Array[Long] = {
      val i = bucketOf(x, lo, width, n)
      if (i >= 0) b(i) += 1   // NaN rows are dropped, not edge-bucketed
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < n) { a(i) += b(i); i += 1 }; a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  private final class UnionAgg(n: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](n)
    override def reduce(b: Array[Long], s: Seq[Long]): Array[Long] = {
      var i = 0; while (i < n) { b(i) += s(i); i += 1 }; b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < n) { a(i) += b(i); i += 1 }; a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate a numeric column into an n-bucket count histogram over
    * [lo, hi); out-of-range values clamp to the edge buckets. */
  def sketch(c: Column, lo: Double, hi: Double, buckets: Int): Column = {
    require(hi > lo && buckets > 0)
    udaf(new SketchAgg(lo, (hi - lo) / buckets, buckets), Encoders.scalaDouble)(
      c.cast("double"))
  }

  /** Merge a column of histograms into one (re-aggregation). */
  def union(sketches: Column, buckets: Int): Column =
    udaf(new UnionAgg(buckets), ExpressionEncoder[Seq[Long]]())(sketches)

  /** Lower bound of the bucket holding quantile q (0 < q ≤ 1): the first
    * bucket where the cumulative count reaches ceil(q·total). Empty
    * histogram → lo. */
  def quantileLowerBoundOf(counts: Seq[Long], q: Double, lo: Double,
                           width: Double): Double = {
    // empty histogram -> lo (the documented contract; without the guard a
    // zero-length counts seq would fall through to lo + (0-1)*width)
    if (counts.isEmpty || counts.sum == 0) return lo
    val target = math.ceil(q * counts.sum).toLong
    var cum = 0L
    var i = 0
    while (i < counts.length) {
      cum += counts(i)
      if (cum >= target) return lo + i * width
      i += 1
    }
    lo + (counts.length - 1) * width
  }

  /** Column form of [[quantileLowerBoundOf]] over a sketch column. NULL
    * sketch (e.g. the unmatched side of an outer join) → NULL, not an NPE. */
  def quantileLowerBound(sketch: Column, q: Double, lo: Double, hi: Double,
                         buckets: Int): Column = {
    require(q > 0 && q <= 1)
    val width = (hi - lo) / buckets
    graft.plans.SketchExprs.histQuantileLb(sketch, q, lo, width)
  }
}
