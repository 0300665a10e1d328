package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External competitor-price connector (SURVEY §2.1 S7).
  *
  * The reference scrapes Tokopedia with Selenium (web_scraping_dag.py:63-135)
  * — a side-effecting source outside an engine core. Here the connector is a
  * trait producing a DataFrame in the [[graft.ecom.Schemas.competitorPrices]]
  * shape; any real scraper/feed plugs in behind it. A deterministic
  * synthetic provider derives quotes from the product list itself (top-5
  * quotes per product, price-string parsing included — P18), so pipelines
  * and tests run hermetically.
  */
trait CompetitorFeed {
  def fetch(spark: SparkSession): DataFrame
}

object Competitor {

  /** Deterministic synthetic feed over the driver `part` table: `quotes`
    * competitor quotes per product, prices spread ±10% around retail by a
    * hash-free arithmetic schedule (oracle-expressible in ANSI SQL). Also
    * exercises the reference's "Rp1.234.567" price-string parse path (P18):
    * the price rides as a formatted string and is parsed back to a long. */
  def syntheticFeedFromPart(part: DataFrame, quotes: Int = 3): DataFrame = {
    val quoteIdx = explode(sequence(lit(1), lit(quotes)))
    val base = part.select(
        col("p_partkey").cast("int").as("our_product_id"),
        col("p_name").as("our_product_name"),
        col("p_brand").as("our_category"),
        col("p_retailprice"),
        quoteIdx.as("rank"))
      // price schedule: rank r shifts price by (r - (q+1)/2) * 5% of retail;
      // "Rp" + integer rupiah string, then parsed back (P18)
      .withColumn("competitor_price_raw",
        round(col("p_retailprice") * (lit(1.0) +
          (col("rank") - lit((quotes + 1) / 2.0)) * lit(0.05)), 0).cast("long"))
      .withColumn("price_str", concat(lit("Rp"), col("competitor_price_raw").cast("string")))
      .withColumn("competitor_price",
        regexp_replace(col("price_str"), "[^0-9]", "").cast("long"))
    base.select(
      col("our_product_id"), col("our_product_name"), col("our_category"),
      concat(lit("competitor_"), col("rank")).as("competitor_name"),
      concat(col("our_product_name"), lit(" (alt ") , col("rank"), lit(")"))
        .as("competitor_product"),
      col("competitor_price"),
      lit("2026-01-01").cast("date").as("scrape_date"),
      col("rank").cast("int").as("rank"))
  }
}
