package graft.ecom

import graft.operators.{Baskets, Bins, Temporal}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sales-analytics pipeline (reference sales_analytics_dag.py, re-expressed
  * as one lazy plan per output table — the XCom hand-offs between Airflow
  * tasks vanish into the plan; call [[enriched]].persist() at the branch
  * point if both fact families run in one job).
  */
object SalesAnalytics {

  /** Transform stage (sales_analytics_dag.py:46-91): parse the basket JSON,
    * per-row basket totals (P17 — higher-order fns, no explode/shuffle),
    * ratio columns (P8), temporal features (P14), quantile size bins (P13).
    */
  def enriched(transactions: DataFrame): DataFrame = {
    val withItems = transactions
      .withColumn("items", Baskets.parseItems(col("product_metadata")))
    val withTotals = Baskets.basketTotals(col("items")).foldLeft(withItems) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
    val withRatios = withTotals
      // pandas yields inf/NaN on zero denominators; we document null instead
      .withColumn("shipping_cost_ratio", col("shipment_fee") / col("total_amount") * 100)
      .withColumn("discount_ratio", col("promo_amount") / col("total_amount") * 100)
    val withTime = Temporal.timeFeatures(col("created_at")).foldLeft(withRatios) {
      case (df, (name, c)) => df.withColumn(name, c)
    }
    // qcutBins, not ntileBins: transactions is the FACT table, and qcut's
    // edges come from one percentile aggregate + a broadcast — no global
    // sort through a single task (Bins' own scale contract), and it is the
    // reference's actual pd.qcut semantics.
    Bins.qcutBins(withTime, "total_amount", 4,
      Seq("Small", "Medium", "Large", "Extra Large"), "transaction_size")
      .drop("items")
  }

  /** fact_daily_sales (A8, sales_analytics_dag.py:102-109). */
  def factDailySales(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(Temporal.day(col("created_at")).as("sale_date"))
      .agg(
        count(col("booking_id")).as("total_transactions"),
        sum(col("total_amount")).as("total_sales"),
        sum(col("total_items")).as("total_items"),
        sum(col("promo_amount")).as("total_promo"))

  /** fact_payment_analysis (A9, sales_analytics_dag.py:112-116). */
  def factPaymentAnalysis(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("payment_method"))
      .agg(
        count(col("booking_id")).as("transaction_count"),
        sum(col("total_amount")).as("total_amount"),
        sum(col("total_items")).as("total_items"))

  /** fact_promo_effectiveness (A10, sales_analytics_dag.py:119-126):
    * notna-filtered promo rows, post-agg discount ratio. */
  def factPromoEffectiveness(enriched: DataFrame): DataFrame =
    enriched
      .filter(col("promo_code").isNotNull)
      .groupBy(col("promo_code"))
      .agg(
        count(col("booking_id")).as("usage_count"),
        sum(col("promo_amount")).as("total_promo_amount"),
        sum(col("total_amount")).as("total_sales"))
      .withColumn("avg_discount_ratio",
        col("total_promo_amount") / col("total_sales") * 100)

  /** fact_customer_ltv (A11 + Q-ltv, sales_analytics_dag.py:169-197),
    * including the reference's lifetime==0 -> 1 divisor substitution. */
  def factCustomerLtv(transactions: DataFrame): DataFrame = {
    val base = transactions
      .groupBy(col("customer_id"))
      .agg(
        count(col("booking_id")).as("frequency"),
        sum(col("total_amount")).as("total_spent"),
        avg(col("total_amount")).as("avg_order_value"),
        min(col("created_at")).as("first_purchase"),
        max(col("created_at")).as("last_purchase"))
    val lifetime = datediff(to_date(col("last_purchase")), to_date(col("first_purchase")))
    val divisor = when(lifetime === 0, 1).otherwise(lifetime)
    base
      .withColumn("customer_lifetime_days", lifetime)
      .withColumn("purchase_rate", col("frequency") / divisor)
      .withColumn("customer_ltv",
        col("avg_order_value") * (col("frequency") / divisor) * 365)
  }
}
