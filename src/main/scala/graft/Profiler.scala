package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling (SURVEY §2.5 A13/A14 — complete_analyzer.py:44-179
  * parity). One aggregation pass computes every column's stats (the
  * reference loops column-by-column in pandas); the per-column rows are then
  * unpivoted from the single result row, so profiling a 100 TB table is one
  * scan regardless of column count.
  */
object Profiler {

  /** Per-column profile: (column, dtype, row_count, non_null, nulls,
    * distinct_count, min_str, max_str). `exact=false` uses HyperLogLog
    * distinct counts (constant memory at scale); `exact=true` matches a
    * COUNT(DISTINCT) oracle. */
  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"nn_${f.name}"),
        (if (exact) countDistinct(c) else approx_count_distinct(c)).as(s"d_${f.name}"),
        min(c).cast("string").as(s"mn_${f.name}"),
        max(c).cast("string").as(s"mx_${f.name}"))
    } :+ count(lit(1)).as("rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        col("rows").as("row_count"),
        col(s"nn_${f.name}").as("non_null"),
        (col("rows") - col(s"nn_${f.name}")).as("nulls"),
        col(s"d_${f.name}").as("distinct_count"),
        col(s"mn_${f.name}").as("min_str"),
        col(s"mx_${f.name}").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** A14: value_counts for one column, top-k, deterministic order. */
  def valueCounts(df: DataFrame, column: String, topK: Int = 10): DataFrame =
    graft.operators.Aggregates.valueCounts(df, column, topK)
}
