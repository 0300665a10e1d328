package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function suite (SURVEY §2.8, T4 per-group top-k). */
object Windows {
  /** T4: keep the first `k` rows per group under `order` —
    * `row_number() OVER (PARTITION BY group ORDER BY order) <= k`.
    * Partitioned window: shuffles once on the group key, no global sort. */
  def topKPerGroup(df: DataFrame, group: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy(group: _*).orderBy(order: _*)))
      .filter(col("rn") <= k)

  /** Ranking suite over one partitioned window (row_number/rank/dense_rank +
    * an exact decimal running sum — decimal so the prefix sums are
    * order-of-evaluation independent across engines). */
  def rankingSuite(df: DataFrame, group: Column, order: Seq[Column], value: Column): DataFrame = {
    val w = Window.partitionBy(group).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("running_value",
        sum(value.cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
  }
}
