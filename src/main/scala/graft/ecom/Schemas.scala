package graft.ecom

import org.apache.spark.sql.types._

/** Declared schemas for the reference's source tables (SURVEY §1.2;
  * DDL at /root/reference/init_db.py:43-109, camelCase product headers per
  * the CSVs the DAGs actually read — product_analytics_dag.py:111).
  * Explicit StructTypes replace pandas dtype inference (S1 determinism).
  */
object Schemas {

  val customer: StructType = new StructType()
    .add("customer_id", IntegerType)
    .add("first_name", StringType)
    .add("last_name", StringType)
    .add("username", StringType)
    .add("email", StringType)
    .add("gender", StringType)
    .add("birthdate", DateType)
    .add("device_type", StringType)
    .add("device_id", StringType)
    .add("device_version", StringType)
    .add("home_location_lat", DoubleType)
    .add("home_location_long", DoubleType)
    .add("home_location", StringType)
    .add("home_country", StringType)
    .add("first_join_date", TimestampType)

  /** camelCase headers — the CSV names the DAGs use, not the snake_case DDL. */
  val product: StructType = new StructType()
    .add("id", IntegerType)
    .add("gender", StringType)
    .add("masterCategory", StringType)
    .add("subCategory", StringType)
    .add("articleType", StringType)
    .add("baseColour", StringType)
    .add("season", StringType)
    .add("year", IntegerType)
    .add("usage", StringType)
    .add("productDisplayName", StringType)

  val transactions: StructType = new StructType()
    .add("created_at", TimestampType)
    .add("customer_id", IntegerType)
    .add("booking_id", StringType)
    .add("session_id", StringType)
    .add("product_metadata", StringType)  // JSON array of item structs (S5)
    .add("payment_method", StringType)
    .add("payment_status", StringType)
    .add("promo_amount", LongType)
    .add("promo_code", StringType)
    .add("shipment_fee", LongType)
    .add("shipment_date_limit", TimestampType)
    .add("shipment_location_lat", DoubleType)
    .add("shipment_location_long", DoubleType)
    .add("total_amount", LongType)

  val clickStream: StructType = new StructType()
    .add("session_id", StringType)
    .add("event_name", StringType)
    .add("event_time", TimestampType)
    .add("event_id", StringType)
    .add("traffic_source", StringType)
    .add("event_metadata", StringType)    // event-dependent JSON object

  /** Competitor price feed (replaces live scraping — S7 connector schema,
    * web_scraping_dag.py:228-237). */
  val competitorPrices: StructType = new StructType()
    .add("our_product_id", IntegerType)
    .add("our_product_name", StringType)
    .add("our_category", StringType)
    .add("competitor_name", StringType)
    .add("competitor_product", StringType)
    .add("competitor_price", LongType)
    .add("scrape_date", DateType)
    .add("rank", IntegerType)
}
