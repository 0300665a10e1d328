package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance for ALGEBRAIC aggregates: a rollup is kept
  * as a mergeable STATE table (count + exact decimal sums + min/max), and a
  * new data slice refreshes it by aggregating ONLY the delta and merging —
  * at 100 TB the daily refresh touches one day's partition, never the
  * multi-year fact history. The invariant the q148 oracle pins:
  * merge(state(A), state(B)) == state(A ∪ B), EXACTLY — counts and decimal
  * sums are associative (order-independent, unlike double sums — the
  * [[Aggregates]] rationale), and min/max are idempotent semilattice ops.
  *
  * State columns per group: `cnt`, `sum_<col>` DECIMAL(18,2) (kept as
  * DECIMAL — the merge must re-sum them exactly; the double cast happens
  * only in [[finalizeState]]), `min_<col>` / `max_<col>`.
  *
  * Non-algebraic aggregates ride the state as mergeable sketches:
  * COUNT DISTINCT via `distinctCols` (register-max [[Hll]], q152) and
  * quantiles via `histCols` ([[Hist]] fixed-domain counting histograms —
  * `hist_<col>` bucket-count arrays that merge by elementwise addition
  * and are bit-identical to one-shot under any slicing, q158).
  */
object Ivm {

  /** Histogram-state config for one column: fixed [lo, hi) domain split
    * into `buckets` (the [[Hist]] contract — quantile answers are bucket
    * lower bounds at (hi-lo)/buckets resolution). */
  final case class HistCol(name: String, lo: Double, hi: Double, buckets: Int)

  private def dec(c: Column) = c.cast(DecimalType(18, 2))

  /** Aggregate a slice into its mergeable state. `distinctCols` carry an
    * [[Hll]] sketch per group (`hll_<col>`, 4 KB binary) — COUNT DISTINCT
    * is not algebraic, but the register-max sketch is: merged slices are
    * bit-identical to the one-shot sketch (the Druid/BigQuery
    * sketches-in-the-MV pattern; q152 gates it). */
  def rollupState(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                  minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
                  distinctCols: Seq[String] = Nil,
                  histCols: Seq[HistCol] = Nil): DataFrame = {
    val aggs = ((count(lit(1)).as("cnt") +:
      sumCols.map(c => sum(dec(col(c))).as(s"sum_$c"))) ++
      minCols.map(c => min(col(c)).as(s"min_$c")) ++
      maxCols.map(c => max(col(c)).as(s"max_$c"))) ++
      distinctCols.map(c => Hll.sketch(col(c)).as(s"hll_$c")) ++
      histCols.map(h => Hist.sketch(col(h.name), h.lo, h.hi, h.buckets).as(s"hist_${h.name}"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state tables (any number, any overlap of groups): SUM of counts
    * and decimal sums, MIN of mins, MAX of maxs, register-max UNION of
    * sketches. One shuffle over rows bounded by (groups × slices), not by
    * the data. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String], sumCols: Seq[String],
                  minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
                  distinctCols: Seq[String] = Nil,
                  histCols: Seq[HistCol] = Nil): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state table")
    val aggs = ((sum(col("cnt")).as("cnt") +:
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))) ++
      minCols.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
      maxCols.map(c => max(col(s"max_$c")).as(s"max_$c"))) ++
      distinctCols.map(c => Hll.union(col(s"hll_$c")).as(s"hll_$c")) ++
      histCols.map(h => Hist.union(col(s"hist_${h.name}"), h.buckets).as(s"hist_${h.name}"))
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read-time finalize: decimal sums cast to DOUBLE, derived means
    * (exact decimal sum / count — the [[Aggregates.davg]] seam DuckDB
    * reproduces bit-for-bit), sketch estimates as
    * `approx_distinct_<col>`. */
  def finalizeState(state: DataFrame, keys: Seq[String], sumCols: Seq[String],
                    minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
                    avgCols: Seq[String] = Nil,
                    distinctCols: Seq[String] = Nil,
                    histCols: Seq[HistCol] = Nil,
                    histQuantiles: Seq[Double] = Seq(0.5)): DataFrame = {
    val cols = keys.map(col) ++ Seq(col("cnt")) ++
      sumCols.map(c => col(s"sum_$c").cast("double").as(s"sum_$c")) ++
      minCols.map(c => col(s"min_$c")) ++
      maxCols.map(c => col(s"max_$c")) ++
      avgCols.map(c => (col(s"sum_$c").cast("double") / col("cnt")).as(s"avg_$c")) ++
      distinctCols.map(c => Hll.estimate(col(s"hll_$c")).as(s"approx_distinct_$c")) ++
      histCols.flatMap(h => histQuantiles.map { q =>
        val pct = math.round(q * 100).toInt
        Hist.quantileLowerBound(col(s"hist_${h.name}"), q, h.lo, h.hi, h.buckets)
          .as(s"p${pct}_${h.name}")
      })
    state.select(cols: _*)
  }
}
