package graft.ecom

import graft.operators.{Baskets, Bins}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics pipeline (reference product_analytics_dag.py). The
  * reference's iterrows loops (U1 at :53-65, U2 at :197-206 — its slowest
  * code) become explode + co-partitioned self-join plans.
  */
object ProductAnalytics {

  /** U1: one row per order item with total_value = qty * price
    * (product_analytics_dag.py:53-65). */
  def orderItems(transactions: DataFrame): DataFrame =
    Baskets.explodeItems(
      transactions.withColumn("items", Baskets.parseItems(col("product_metadata"))),
      col("items"),
      Seq(col("created_at").as("transaction_date"), col("booking_id")))

  /** J1 + A3 (product_analytics_dag.py:68-84): products ⟕ per-product sales
    * agg; unsold products fill 0. The agg side is product-cardinality —
    * broadcast-range; Catalyst/AQE picks the broadcast automatically. */
  def productSales(products: DataFrame, items: DataFrame): DataFrame = {
    val sales = items.groupBy(col("product_id"))
      .agg(
        sum(col("quantity")).as("total_quantity"),
        sum(col("total_value")).as("total_value"),
        avg(col("item_price")).as("avg_item_price"))
    products
      .join(sales, products("id") === sales("product_id"), "left")
      .drop("product_id")
      .na.fill(Map("total_quantity" -> 0, "total_value" -> 0, "avg_item_price" -> 0))
  }

  /** fact_category_performance (A4, product_analytics_dag.py:111-120). */
  def factCategoryPerformance(productSales: DataFrame): DataFrame =
    productSales
      .groupBy(col("masterCategory").as("category"))
      .agg(
        count(col("id")).as("product_count"),
        sum(col("total_quantity")).as("total_quantity"),
        sum(col("total_value")).as("total_value"))

  /** fact_seasonal_performance (A5, product_analytics_dag.py:123-126). */
  def factSeasonalPerformance(productSales: DataFrame): DataFrame =
    productSales
      .groupBy(col("season"), col("masterCategory").as("category"))
      .agg(
        sum(col("total_quantity")).as("total_quantity"),
        sum(col("total_value")).as("total_value"))

  /** fact_price_performance (A6 over P13 bins,
    * product_analytics_dag.py:129-139). */
  def factPricePerformance(productSales: DataFrame): DataFrame =
    Bins.distributedNtileBins(
        productSales.filter(col("avg_item_price") > 0),
        col("avg_item_price"), col("id"), 4,
        Seq("Budget", "Medium", "Premium", "Luxury"), "price_range")
      .groupBy(col("price_range"))
      .agg(
        count(col("id")).as("product_count"),
        sum(col("total_quantity")).as("total_quantity"),
        sum(col("total_value")).as("total_value"))

  /** fact_top_products (T1, product_analytics_dag.py:142-145): top-k by
    * value — TakeOrderedAndProject, no global sort materialization. */
  def factTopProducts(productSales: DataFrame, k: Int = 100): DataFrame =
    productSales
      .orderBy(desc("total_value"), asc("id"))
      .limit(k)
      .select(col("id"), col("productDisplayName"), col("total_quantity"),
        col("total_value"), col("avg_item_price"))

  /** fact_product_combinations (U2 + A7 + J2,
    * product_analytics_dag.py:197-234): canonical within-order pairs,
    * frequency, names attached twice (broadcast dim), top-k. */
  def factProductCombinations(products: DataFrame, items: DataFrame,
                              k: Int = 100): DataFrame = {
    val freq = Baskets.pairFrequencies(
      Baskets.pairs(items, "booking_id", "product_id"))
    val names = products.select(col("id"), col("productDisplayName"))
    freq
      .join(broadcast(names.select(col("id"),
          col("productDisplayName").as("product_1_name"))),
        col("product_1") === col("id"), "left").drop("id")
      .join(broadcast(names.select(col("id"),
          col("productDisplayName").as("product_2_name"))),
        col("product_2") === col("id"), "left").drop("id")
      .orderBy(desc("frequency"), asc("product_1"), asc("product_2"))
      .limit(k)
  }
}
