package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level vector math over ARRAY<FLOAT> embedding columns, built from
  * `zip_with`/`aggregate` higher-order functions (codegen-friendly, no UDF).
  *
  * All reductions accumulate in DECIMAL so the result is independent of
  * evaluation order and bit-identical across engines (see
  * [[graft.operators.Aggregates]] for the rationale); float→double widening
  * is exact, and double→decimal(30,15) rounding is deterministic.
  */
object VectorFns {
  // Precision headroom matters: Spark promotes decimal ADD to
  // (max(p)+1, s) and silently REDUCES SCALE once precision exceeds 38
  // (allowPrecisionLoss) — which would re-introduce order-dependent
  // rounding. (22,15) + (20,15) peaks at precision 23, so every step stays
  // exact. Bounds: |element product| < 10^5, |sum| < 10^7.
  private val acc  = DecimalType(22, 15)
  private val term = DecimalType(20, 15)

  private def dsumArr(arr: Column): Column =
    aggregate(
      arr,
      lit(java.math.BigDecimal.ZERO).cast(acc),
      (a, x) => (a + x.cast(term)).cast(acc)
    ).cast("double")

  /** Exact dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    dsumArr(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Exact squared L2 norm / L2 norm. */
  def normSq(a: Column): Column = dot(a, a)
  def norm(a: Column): Column   = sqrt(normSq(a))

  /** Cosine similarity (null-safe denominators are the caller's concern;
    * embeddings here are non-zero). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Plain-double dot product — NOT order-independent (last-ULP drift), so
    * never oracle-compared directly; use as a cheap prefilter with a small
    * margin, then confirm survivors with the exact [[dot]]
    * (Similarity.nearDuplicatePairs does). A custom codegen'd expression
    * (one primitive loop, no zipped intermediate array) — the hot inner
    * loop of every candidate-pair prefilter. */
  def dotDouble(a: Column, b: Column): Column =
    graft.plans.FloatArrayDot(a, b)
}
