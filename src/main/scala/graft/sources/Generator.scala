package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic click/transaction event source (SURVEY §2.1 S8).
  *
  * The reference's `DataGenerator.generate_batch`
  * (src/utils/data_generator.py:26-111) emits micro-batches of click events
  * (uuid ids, per-type JSON metadata, timestamps spread over a 1-hour
  * horizon) plus transactions with a 1–3-item basket. This generator keeps
  * the same shape but is a pure Spark plan over `spark.range`: every field
  * derives deterministically from the row id through xxhash64, so a given
  * (seed, n) always produces the same batch on any cluster size — no RNG
  * state, no driver loop, embarrassingly parallel.
  */
object Generator {

  private def h(seed: Long, salt: Int) =
    abs(xxhash64(lit(salt), col("id") + lit(seed)))

  val eventTypes: Seq[String] = Seq("HOMEPAGE", "SEARCH", "ITEM_DETAIL", "ADD_TO_CART", "CHECKOUT")

  /** One micro-batch of `n` click events starting at `startTs` (epoch
    * seconds), timestamps spread over the following hour. `event_metadata`
    * is the reference's event-dependent JSON: search keywords for SEARCH,
    * product info for ITEM_DETAIL/ADD_TO_CART, null otherwise. */
  def clickBatch(spark: SparkSession, n: Long, seed: Long, startTs: Long): DataFrame = {
    val typeIdx = h(seed, 1) % eventTypes.size
    val eventType = eventTypes.zipWithIndex.foldLeft(lit(eventTypes.head)) {
      case (acc, (t, i)) => when(typeIdx === i, t).otherwise(acc)
    }
    spark.range(n)
      .withColumn("event_id", md5(concat(lit("ev"), lit(seed), col("id"))))
      .withColumn("session_id", md5(concat(lit("sess"), lit(seed), floor(col("id") / 5))))
      .withColumn("customer_id", (h(seed, 0) % 1000 + 1).cast("int"))
      .withColumn("event_type", eventType)
      .withColumn("ts", timestamp_seconds(lit(startTs) + h(seed, 2) % 3600))
      .withColumn("traffic_source",
        when(h(seed, 3) % 3 === 0, "organic")
          .when(h(seed, 3) % 3 === 1, "ads").otherwise("referral"))
      .withColumn("event_metadata",
        when(col("event_type") === "SEARCH",
          to_json(struct((h(seed, 4) % 97).cast("string").as("search_keywords"))))
        .when(col("event_type").isin("ITEM_DETAIL", "ADD_TO_CART"),
          to_json(struct((h(seed, 5) % 500 + 1).as("product_id"),
            concat(lit("product "), h(seed, 5) % 500 + 1).as("product_name")))))
      .drop("id")
  }

  /** Transactions for ~30% of sessions: a 1–3-item basket serialized as the
    * reference's `product_metadata` JSON array (data_generator.py:63-75),
    * qty 1–3, price 50k–500k. */
  def transactionBatch(spark: SparkSession, n: Long, seed: Long, startTs: Long): DataFrame = {
    val item = (salt: Int) => struct(
      (h(seed, salt) % 500 + 1).cast("int").as("product_id"),
      (h(seed, salt + 10) % 3 + 1).cast("int").as("quantity"),
      (h(seed, salt + 20) % 450001 + 50000).as("item_price"))
    val nItems = h(seed, 6) % 3 + 1
    spark.range(n)
      .filter(h(seed, 7) % 10 < 3)
      .withColumn("booking_id", md5(concat(lit("bk"), lit(seed), col("id"))))
      .withColumn("session_id", md5(concat(lit("sess"), lit(seed), floor(col("id") / 5))))
      .withColumn("customer_id", (h(seed, 0) % 1000 + 1).cast("int"))
      .withColumn("created_at", timestamp_seconds(lit(startTs) + h(seed, 8) % 3600))
      .withColumn("__items", slice(array(item(30), item(31), item(32)), lit(1), nItems.cast("int")))
      .withColumn("product_metadata", to_json(col("__items")))
      .withColumn("payment_method",
        when(h(seed, 9) % 3 === 0, "credit_card")
          .when(h(seed, 9) % 3 === 1, "bank_transfer").otherwise("e_wallet"))
      // total_amount IS the basket total (reference data_generator.py:60-75
      // keeps them consistent; an independent random total would make
      // basket-vs-amount ratios internally impossible)
      .withColumn("total_amount", aggregate(col("__items"), lit(0L),
        (a, x) => a + x.getField("quantity").cast("long") * x.getField("item_price")))
      .drop("__items", "id")
  }

  /** Rename a click batch/stream to the reference's clickStream schema
    * (event_name/event_time — Schemas.clickStream, data_generator.py:36-40)
    * so generated data feeds the ecom pipelines directly. */
  def asClickStream(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumnRenamed("event_type", "event_name")
      .withColumnRenamed("ts", "event_time")

  /** Structured Streaming variant of the click source: the `rate` source
    * mapped onto the same deterministic event shape — each input row becomes
    * one click event keyed by the rate stream's value (ST1 surface). */
  def clickStream(spark: SparkSession, rowsPerSecond: Int, seed: Long): DataFrame = {
    val value = col("value")
    def hh(salt: Int) = abs(xxhash64(lit(salt), value + lit(seed)))
    val typeIdx = hh(1) % eventTypes.size
    val eventType = eventTypes.zipWithIndex.foldLeft(lit(eventTypes.head)) {
      case (acc, (t, i)) => when(typeIdx === i, t).otherwise(acc)
    }
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .withColumn("event_id", md5(concat(lit("ev"), lit(seed), value)))
      .withColumn("customer_id", (hh(0) % 1000 + 1).cast("int"))
      .withColumn("event_type", eventType)
      .withColumn("ts", col("timestamp"))
      .select("event_id", "customer_id", "event_type", "ts")
  }
}
