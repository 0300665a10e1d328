package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Classic HyperLogLog (Flajolet et al.) as typed Aggregators — the
  * re-aggregatable count-distinct sketch a 100 TB warehouse keeps per
  * partition/day and merges at query time.
  *
  * Why not Spark's built-in `hll_sketch_agg`: the DataSketches HLL it wraps
  * carries a history-dependent HIP accumulator, so its ESTIMATE depends on
  * how rows were grouped into partitions (measured here: 7434 vs 7496 for
  * the same 7507-distinct input at 1 vs 32 partitions). That is fine for
  * interactive approximation but cannot back a deterministic gate or an
  * incremental sketch table that must not drift under re-partitioning.
  * Classic HLL's state is REGISTER MAX ONLY: sketch(S) is a pure function
  * of the item SET — insertion order, grouping, and merge shape are all
  * irrelevant — so partial sketches merged any way are bit-identical to
  * the one-shot sketch, and the estimate is reproducible everywhere.
  *
  * Layout: p = 12 → m = 4096 one-byte registers (≈1.6% standard error),
  * constant 4 KB per group. Items are pre-hashed in the PLAN with
  * `xxhash64` (codegen'd; one hash per row), the aggregator only does the
  * register update. Estimator: harmonic mean with the standard small-range
  * (linear counting) correction.
  */
object Hll {

  val P: Int = 12
  val M: Int = 1 << P

  private def newRegs = new Array[Byte](M)

  private def update(regs: Array[Byte], h: Long): Array[Byte] = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rho = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
    regs
  }

  private def unionInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Estimate distinct count from a serialized sketch. */
  def estimateOf(regs: Array[Byte]): Long = {
    var sum = 0.0; var zeros = 0; var i = 0
    while (i < M) {
      sum += java.lang.Math.scalb(1.0, -(regs(i) & 0xff)); if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1 + 1.079 / M)
    val raw = alpha * M.toLong * M.toLong / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)  // linear counting
      else raw
    math.round(est)
  }

  private final class SketchAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = newRegs
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = update(b, h)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = unionInto(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class UnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = newRegs
    override def reduce(b: Array[Byte], s: Array[Byte]): Array[Byte] = unionInto(b, s)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = unionInto(a, b)
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a column into a 4 KB sketch (any hashable type; nulls hash
    * to the xxhash64 seed, i.e. count as ONE distinct value — pre-filter
    * if nulls should not count). */
  def sketch(c: Column): Column =
    udaf(new SketchAgg, Encoders.scalaLong)(xxhash64(c))

  /** Merge a column of sketches into one. */
  def union(sketches: Column): Column =
    udaf(new UnionAgg, Encoders.BINARY)(sketches)

  /** Estimate column over a sketch column — a codegen'd expression over
    * the 4 KB payload (plans/SketchExprs); NULL sketch → NULL. */
  val estimate: Column => Column = graft.plans.SketchExprs.hllEstimate(_)
}
