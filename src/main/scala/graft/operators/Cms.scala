package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan) as typed Aggregators — the
  * re-aggregatable FREQUENCY sketch that pairs with [[Hll]]'s distinct
  * sketch in a 100 TB warehouse's per-partition/day sketch tables:
  * `count ≈ cms_estimate(key)` with one-sided error (never an
  * under-count, over by ≤ εN with probability 1-δ; here d=4 rows × w=2048
  * counters → ε ≈ 2e/w ≈ 0.13%, δ ≈ e⁻⁴, constant 64 KB per group).
  *
  * Like classic HLL (and unlike a sampled top-k), the state is a pure
  * function of the item MULTISET: counters are sums, so partial sketches
  * merged in any grouping/order are bit-identical to the one-shot sketch
  * — safe behind a deterministic gate and under arbitrary re-partitioning.
  * Items are pre-hashed in the plan with `xxhash64` (codegen'd); the d row
  * slots derive from that one hash via Kirsch-Mitzenmacher double hashing
  * (g_i = h₁ + i·h₂), so the aggregator does no string work per row.
  *
  * Counters are 64-bit little-endian lanes in an `Array[Byte]` buffer
  * (`Encoders.BINARY`, mirroring [[Hll]]): the per-row update is a
  * carry-walk increment, no per-row allocation.
  */
object Cms {

  val D: Int = 4
  val W: Int = 2048          // power of two: slot = mix & (W-1)
  private val Bytes = D * W * 8

  private def newBuf = new Array[Byte](Bytes)

  private def slot(h: Long, row: Int): Int = {
    val h2 = (h >>> 32) * 2 + 1        // odd second hash
    val g = h + row * h2
    (((g ^ (g >>> 31)) & (W - 1)).toInt) + row * W
  }

  private def inc(b: Array[Byte], s: Int): Unit = {
    var off = s << 3
    var i = 0
    while (i < 8) {
      val v = (b(off) + 1).toByte
      b(off) = v
      if (v != 0) return
      off += 1; i += 1
    }
  }

  private def addAt(b: Array[Byte], s: Int, w: Long): Unit =
    writeAt(b, s, readAt(b, s) + w)

  private def readAt(b: Array[Byte], s: Int): Long = {
    val off = s << 3
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def writeAt(b: Array[Byte], s: Int, v: Long): Unit = {
    val off = s << 3
    var x = v; var i = 0
    while (i < 8) { b(off + i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
  }

  private def addInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var s = 0
    while (s < D * W) { writeAt(a, s, readAt(a, s) + readAt(b, s)); s += 1 }
    a
  }

  /** Point-frequency estimate for a pre-hashed item: min over the d rows. */
  def estimateOf(sketch: Array[Byte], h: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = readAt(sketch, slot(h, r))
      if (c < best) best = c
      r += 1
    }
    best
  }

  private final class SketchAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = newBuf
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      var r = 0
      while (r < D) { inc(b, slot(h, r)); r += 1 }
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = addInto(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class WeightedAgg
    extends Aggregator[(Long, Long), Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = newBuf
    override def reduce(b: Array[Byte], in: (Long, Long)): Array[Byte] = {
      var r = 0
      while (r < D) { addAt(b, slot(in._1, r), in._2); r += 1 }
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = addInto(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class UnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = newBuf
    override def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] = addInto(b, s)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = addInto(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a column into a 64 KB frequency sketch (any hashable type;
    * each NULL counts as one occurrence of the xxhash64 seed value —
    * pre-filter if nulls should not count). */
  def sketch(c: Column): Column =
    udaf(new SketchAgg, Encoders.scalaLong)(xxhash64(c))

  /** Weighted update: add `weight` occurrences of each item. Bit-identical
    * to `weight` per-row [[sketch]] updates (counters are sums), so the
    * cheap plan for token-grain streams is a codegen'd exact
    * `groupBy(item).count` FIRST, then this over the (item, count) table:
    * the typed-aggregator (object-path) row cost is paid per DISTINCT
    * item, not per token — the same partial-aggregate-before-expensive-op
    * move as everywhere else in the engine. */
  def sketchWeighted(item: Column, weight: Column): Column =
    udaf(new WeightedAgg, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))(
      xxhash64(item), weight)

  /** Merge a column of sketches into one (re-aggregation). */
  def union(sketches: Column): Column =
    udaf(new UnionAgg, Encoders.BINARY)(sketches)

  /** Estimated frequency of `item` under `sketch` — a codegen'd
    * expression over the 64 KB payload (plans/SketchExprs). NULL sketch
    * (e.g. the unmatched side of an outer join) → NULL, not an NPE. */
  def estimate(sketch: Column, item: Column): Column =
    graft.plans.SketchExprs.cmsEstimate(sketch, xxhash64(item))
}
