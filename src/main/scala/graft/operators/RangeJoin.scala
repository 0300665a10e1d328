package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap range join via fixed-width banding.
  *
  * The naive plan for `l.start <= r.end AND r.start <= l.end` (+ an
  * optional equi-key) is a nested-loop or, with the equi-key, an
  * equi-join whose every key group still cross-products before the range
  * filter. The banded form is the standard scalable rewrite (it is what
  * Databricks' range-join optimization and Sedona's spatial join do under
  * the hood):
  *
  *   1. explode each interval into the fixed-width bands it touches
  *      (`floor(start/W) .. floor(end/W)`),
  *   2. equi-join on (key, band) — a plain shuffled hash join,
  *   3. re-check the exact overlap predicate,
  *   4. keep a pair only in ONE band — the band containing
  *      `max(l.start, r.start)` — so overlaps spanning several bands are
  *      emitted exactly once with NO distinct/groupBy dedup pass.
  *
  * Cost: each interval is replicated `len/W + 1` times, and candidate
  * pairs are confined to same-band cohabitants. `bandWidth` is the knob:
  * ~the typical interval length is a good default (≈2 bands per
  * interval, few false candidates). Degenerate skew (a band×key holding
  * a large fraction of all intervals) hot-spots one task — same remedy
  * as any equi-join skew (salting / AQE skew split), because after
  * banding this IS a plain equi-join.
  *
  * Bounds are numeric longs: map dates via `datediff(day0, d)` and
  * timestamps via `unix_micros` before calling. Intervals are closed on
  * both ends ([s, e], overlap iff `ls <= re && rs <= le`).
  */
object RangeJoin {

  /** Generic two-sided overlap join. `left`/`right` column names must be
    * disjoint (pre-rename); output = left.* ++ right.* for each
    * overlapping pair with equal keys. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    def banded(df: DataFrame, start: String, end: String) =
      df.withColumn("__band",
        explode(sequence(floor(col(start) / bandWidth).cast("long"),
          floor(col(end) / bandWidth).cast("long"))))
    val l = banded(left, lStart, lEnd)
    val r = banded(right, rStart, rEnd).withColumnRenamed("__band", "__rband")
    l.join(r, col("__band") === col("__rband") && col(leftKey) === col(rightKey))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // emit-once: only the band where the later-starting interval begins
      .filter(col("__band") ===
        floor(greatest(col(lStart), col(rStart)) / bandWidth).cast("long"))
      .drop("__band", "__rband")
  }

  /** Self overlap: canonical (id_a < id_b) pairs of same-key rows whose
    * [start, end] intervals intersect. `idCol` must be unique per row. */
  def selfOverlapPairs(df: DataFrame, keyCol: String, idCol: String,
                       startCol: String, endCol: String,
                       bandWidth: Long): DataFrame = {
    val right = df.select(
      col(keyCol).as("__k2"), col(idCol).as("id_b"),
      col(startCol).as("__s2"), col(endCol).as("__e2"))
    val left = df.select(
      col(keyCol), col(idCol).as("id_a"),
      col(startCol), col(endCol))
    overlapJoin(left, right, keyCol, "__k2", startCol, endCol, "__s2", "__e2",
        bandWidth)
      .filter(col("id_a") < col("id_b"))
      .select(col(keyCol), col("id_a"), col("id_b"),
        // overlap length in the same units (closed intervals: +1)
        (least(col(endCol), col("__e2")) - greatest(col(startCol), col("__s2")) + 1)
          .as("overlap_len"))
  }
}
