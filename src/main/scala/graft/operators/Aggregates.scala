package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent ("oracle-exact") aggregation helpers.
  *
  * Floating-point `SUM`/`AVG`/`STDDEV` are not associative, so a distributed
  * Spark sum and a single-threaded DuckDB sum over the same doubles can differ
  * in the last ULPs and break hash comparison. Every money-like aggregate in
  * this engine therefore sums through an exact DECIMAL and only converts back
  * to DOUBLE at the end; variance is computed from exact decimal power sums.
  * This is also the right posture at 100 TB: decimal partial aggregates are
  * map-side combinable and deterministic regardless of partitioning.
  *
  * Mirrors the money-column handling of the reference warehouse (DECIMAL
  * columns in e.g. /root/reference/airflow/dags/sales_analytics_dag.py:233).
  */
object Aggregates {
  /** SUM(CAST(x AS DECIMAL(18,2))) :: DOUBLE — exact, order-independent. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same with 6 fractional digits, for pre-multiplied ratios like
    * extendedprice*discount. */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact mean: decimal sum (deterministic) divided as DOUBLE.
    * Matches DuckDB's CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/COUNT(x). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Sample standard deviation from exact decimal power sums:
    * sqrt((Σx² − (Σx)²/n) / (n−1)), null for n<2 (matches DuckDB stddev_samp).
    * Order-independent, unlike the streaming Welford implementation. */
  def dstddev(c: Column): Column = {
    val n  = count(c)
    val s  = sum(c.cast(DecimalType(18, 2))).cast("double")
    val s2 = sum((c * c).cast(DecimalType(30, 4))).cast("double")
    when(n >= 2, sqrt(greatest((s2 - s * s / n) / (n - lit(1)), lit(0.0))))
  }

  /** A14 value_counts: group-count one column, descending, deterministic. */
  def valueCounts(df: DataFrame, col: String, topK: Int = 10): DataFrame =
    df.groupBy(col).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc(col))
      .limit(topK)
}
