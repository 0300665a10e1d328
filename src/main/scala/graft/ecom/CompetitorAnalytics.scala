package graft.ecom

import graft.operators.Aggregates
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Competitor-price pipeline (reference web_scraping_dag.py:140-207) over a
  * pluggable price feed with the [[Schemas.competitorPrices]] shape — the
  * Selenium scrape itself (S7) is an external connector concern, out of the
  * engine core per SURVEY §2.1.
  */
object CompetitorAnalytics {

  /** fact_competitor_prices (A12, web_scraping_dag.py:149-157): per-product
    * avg/min/max/stddev of quotes. pandas std = sample stddev (ddof=1) →
    * stddev_samp, null for single-quote products (SURVEY §7.4.9). */
  def factCompetitorPrices(feed: DataFrame): DataFrame =
    feed
      .groupBy(col("our_product_id"), col("our_product_name"))
      .agg(
        count(col("competitor_price")).as("quote_count"),
        avg(col("competitor_price")).as("avg_competitor_price"),
        min(col("competitor_price")).as("min_competitor_price"),
        max(col("competitor_price")).as("max_competitor_price"),
        Aggregates.dstddev(col("competitor_price")).as("std_competitor_price"))

  /** fact_price_comparison (J5 + P8 + P16, web_scraping_dag.py:160-186):
    * our per-product price (avg sold item price) vs the market average,
    * with the 3-way position label. */
  def factPriceComparison(ourPrices: DataFrame, stats: DataFrame): DataFrame = {
    val diff = col("our_price") - col("avg_competitor_price")
    ourPrices
      .join(stats, ourPrices("id") === stats("our_product_id"), "left")
      .withColumn("price_difference", diff)
      .withColumn("price_difference_percentage",
        diff / col("avg_competitor_price") * 100)
      .withColumn("price_position",
        when(diff > 0, "Above Market")
          .when(diff < 0, "Below Market")
          .when(diff === 0, "At Market"))
      .select(col("id"), col("our_price"), col("avg_competitor_price"),
        col("price_difference"), col("price_difference_percentage"),
        col("price_position"))
  }
}
