package graft

import graft.ecom._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

/** End-to-end pipeline parity on hand-written e-commerce fixtures embedding
  * the FIXTURES.md §A edge cases: tenure exactly on bin edges, birthday on
  * the asOf date, duplicate product in one basket, two transactions sharing
  * a session (J3 multiplicity), lifetime-0 customer, zero total_amount,
  * unsold product, single-quote competitor stddev.
  */
class EcomPipelinesSpec extends SparkSpecBase {
  import spark.implicits._

  private val asOf = lit("2026-01-01").cast("date")
  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String)  = Date.valueOf(s)

  // tenure at 2026-01-01: join 2025-10-03 -> 90d (edge), 2025-10-02 -> 91,
  // 2025-07-05 -> 180 (edge), 2025-01-01 -> 365 (edge), 2024-11-01 -> 426
  private lazy val customers = Seq(
    (1, d("1990-06-15"), "Mobile",  "Jakarta",  ts("2025-10-10 00:00:00")),
    (2, d("1985-03-02"), "desktop", "Jakarta",  ts("2025-10-03 00:00:00")),
    (3, d("2000-12-31"), "MOBILE",  "Bandung",  ts("2025-10-02 00:00:00")),
    (4, d("1975-05-20"), "tablet",  "Bandung",  ts("2025-07-05 00:00:00")),
    (5, d("1995-08-09"), "mobile",  "Surabaya", ts("2025-01-01 00:00:00")),
    (6, d("1988-02-29"), "desktop", "Surabaya", ts("2024-11-01 00:00:00")),
    (7, d("1990-01-01"), "mobile",  "Jakarta",  ts("2025-12-31 00:00:00")),
    (8, d("1970-07-07"), "desktop", "Medan",    ts("2020-01-01 00:00:00"))
  ).toDF("customer_id", "birthdate", "device_type", "home_location", "first_join_date")

  private def items(s: String) = s
  private lazy val transactions = Seq(
    (ts("2026-01-01 10:00:00"), 1, "b1", "s1",
      items("""[{"product_id":1,"quantity":2,"item_price":100},{"product_id":2,"quantity":1,"item_price":50}]"""),
      "credit_card", null.asInstanceOf[String], 0L, 250L, 25L),
    (ts("2026-01-03 11:00:00"), 1, "b2", "s2",
      items("""[{"product_id":3,"quantity":5,"item_price":10}]"""),
      "e_wallet", "P10", 10L, 50L, 5L),
    (ts("2026-01-01 09:00:00"), 2, "b3", "s3",
      items("""[{"product_id":1,"quantity":1,"item_price":100},{"product_id":1,"quantity":3,"item_price":100}]"""),
      "credit_card", "P10", 40L, 400L, 0L),
    (ts("2026-01-02 09:30:00"), 2, "b4", "s3",
      items("""[{"product_id":2,"quantity":2,"item_price":50}]"""),
      "bank_transfer", null.asInstanceOf[String], 0L, 100L, 10L),
    (ts("2026-01-05 12:00:00"), 5, "b5", "s5",
      items("""[{"product_id":3,"quantity":1,"item_price":10}]"""),
      "credit_card", "P20", 5L, 10L, 1L),
    (ts("2026-01-06 13:00:00"), 6, "b6", "s6",
      items("""[{"product_id":2,"quantity":1,"item_price":50}]"""),
      "e_wallet", null.asInstanceOf[String], 0L, 0L, 0L)
  ).toDF("created_at", "customer_id", "booking_id", "session_id",
    "product_metadata", "payment_method", "promo_code", "promo_amount",
    "total_amount", "shipment_fee")

  private lazy val clicks = Seq(
    ("s1", "HOMEPAGE",    "e01"), ("s1", "SEARCH", "e02"), ("s1", "CHECKOUT", "e03"),
    ("s2", "ITEM_DETAIL", "e04"), ("s2", "CHECKOUT", "e05"),
    ("s3", "ADD_TO_CART", "e06"), ("s3", "CHECKOUT", "e07"),
    ("s_orphan", "HOMEPAGE", "e08"), ("s_orphan", "SEARCH", "e09")
  ).toDF("session_id", "event_name", "event_id")

  private lazy val products = Seq(
    (1, "Apparel",  "Summer", "Red Shirt"),
    (2, "Apparel",  "Winter", "Blue Coat"),
    (3, "Footwear", "Summer", "Sandals"),
    (4, "Footwear", "Winter", "Unsold Boots"),
    (5, "Apparel",  "All Season", "Scarf"),
    (6, "Accessories", "Summer", "Hat")
  ).toDF("id", "masterCategory", "season", "productDisplayName")

  private lazy val dim = CustomerAnalytics.dimCustomers(customers, asOf)

  test("dimCustomers: segment bin edges are right-closed; age flips on birthday") {
    val seg = dim.select("customer_id", "customer_segment").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(seg(1) == "New")      // 83 days
    assert(seg(2) == "New")      // exactly 90
    assert(seg(3) == "Regular")  // 91
    assert(seg(4) == "Regular")  // exactly 180
    assert(seg(5) == "Loyal")    // exactly 365
    assert(seg(6) == "VIP")      // 426
    val ages = dim.select("customer_id", "age").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(ages(7) == 36)        // birthday exactly on asOf
    assert(ages(1) == 35)        // birthday not yet reached in 2026
    val mob = dim.select("customer_id", "is_mobile_user").collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(mob(1) && mob(3) && !mob(2) && !mob(4))  // case-insensitive P11
  }

  test("dimCustomerLocations aggregates per location") {
    val loc = CustomerAnalytics.dimCustomerLocations(dim).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(loc == Map("Jakarta" -> 3L, "Bandung" -> 2L, "Surabaya" -> 2L, "Medan" -> 1L))
  }

  test("factCustomerBehavior: J3 multiplicity + A2 distinct-vs-count semantics") {
    val b = CustomerAnalytics.factCustomerBehavior(clicks, transactions, dim)
      .collect().map(r => r.getInt(0) -> r).toMap
    // cust 1: sessions s1+s2 = 2 distinct, 5 events, 2.5 per session
    assert(b(1).getAs[Long]("total_sessions") == 2L)
    assert(b(1).getAs[Long]("total_events") == 5L)
    assert(b(1).getAs[Double]("events_per_session") == 2.5)
    // cust 2: s3 has TWO transactions -> its 2 click rows join twice (4
    // events) but still 1 distinct session — the reference's trap
    assert(b(2).getAs[Long]("total_sessions") == 1L)
    assert(b(2).getAs[Long]("total_events") == 4L)
    assert(b(2).getAs[Double]("events_per_session") == 4.0)
    // orphan session joined nothing
    assert(!b.contains(8))
    // segment attached (J4)
    assert(b(1).getAs[String]("customer_segment") == "New")
  }

  test("sales enriched: P17 basket totals incl. the num_unique misnomer + P8 null on zero denominator") {
    val e = SalesAnalytics.enriched(transactions)
    val byBooking = e.collect().map(r => r.getAs[String]("booking_id") -> r).toMap
    assert(byBooking("b1").getAs[Int]("total_items") == 3)
    assert(byBooking("b1").getAs[Long]("total_product_value") == 250L)
    assert(byBooking("b1").getAs[Int]("num_unique_products") == 2)
    // b3: duplicate product -> length 2, not distinct 1 (SURVEY §7.4.5)
    assert(byBooking("b3").getAs[Int]("num_unique_products") == 2)
    assert(byBooking("b3").getAs[Int]("total_items") == 4)
    // zero total_amount -> null ratio (Spark) where pandas gives inf
    assert(byBooking("b6").isNullAt(byBooking("b6").fieldIndex("discount_ratio")))
    // P14 temporal features
    assert(byBooking("b1").getAs[String]("order_day") == "Thursday")
    assert(byBooking("b1").getAs[Int]("order_hour") == 10)
    // P13 quantile bins exist with all four labels over 6 txns
    assert(e.select("transaction_size").distinct().count() == 4)
  }

  test("factDailySales / factPaymentAnalysis / factPromoEffectiveness") {
    val e = SalesAnalytics.enriched(transactions)
    val daily = SalesAnalytics.factDailySales(e).collect()
      .map(r => r.getDate(0).toString -> r).toMap
    assert(daily("2026-01-01").getAs[Long]("total_transactions") == 2L) // b1,b3
    assert(daily("2026-01-01").getAs[Long]("total_sales") == 650L)
    assert(daily("2026-01-01").getAs[Long]("total_items") == 7L)
    val pay = SalesAnalytics.factPaymentAnalysis(e).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("transaction_count")).toMap
    assert(pay == Map("credit_card" -> 3L, "e_wallet" -> 2L, "bank_transfer" -> 1L))
    val promo = SalesAnalytics.factPromoEffectiveness(e).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(promo.keySet == Set("P10", "P20"))           // nulls filtered (A10)
    assert(promo("P10").getAs[Long]("usage_count") == 2L)
    assert(promo("P10").getAs[Long]("total_promo_amount") == 50L)
    assert(promo("P10").getAs[Long]("total_sales") == 450L)
  }

  test("factCustomerLtv: lifetime-0 divisor substitution (Q-ltv)") {
    val ltv = SalesAnalytics.factCustomerLtv(transactions).collect()
      .map(r => r.getInt(0) -> r).toMap
    // cust 1: freq 2, lifetime 2 days, rate 1.0, avg 150 -> ltv 54750
    assert(ltv(1).getAs[Int]("customer_lifetime_days") == 2)
    assert(ltv(1).getAs[Double]("purchase_rate") == 1.0)
    assert(ltv(1).getAs[Double]("customer_ltv") == 150.0 * 365)
    // cust 5: single purchase, lifetime 0 -> divisor 1 (the replace(0,1))
    assert(ltv(5).getAs[Int]("customer_lifetime_days") == 0)
    assert(ltv(5).getAs[Double]("purchase_rate") == 1.0)
    assert(ltv(5).getAs[Double]("customer_ltv") == 10.0 * 365)
  }

  test("productSales: unsold product filled with zeros (J1+P6)") {
    val ps = ProductAnalytics.productSales(products,
      ProductAnalytics.orderItems(transactions))
    val m = ps.collect().map(r => r.getAs[Int]("id") -> r).toMap
    assert(m(1).getAs[Long]("total_quantity") == 6L)   // 2 + 1 + 3
    assert(m(1).getAs[Long]("total_value") == 600L)
    assert(m(4).getAs[Long]("total_quantity") == 0L)   // never sold
    assert(m(4).getAs[Double]("avg_item_price") == 0.0)
  }

  test("category/seasonal/top-k facts") {
    val items = ProductAnalytics.orderItems(transactions)
    val ps = ProductAnalytics.productSales(products, items)
    val cat = ProductAnalytics.factCategoryPerformance(ps).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(cat("Apparel").getAs[Long]("product_count") == 3L)
    assert(cat("Apparel").getAs[Long]("total_quantity") == 10L)  // p1:6 p2:4
    assert(cat("Footwear").getAs[Long]("total_quantity") == 6L)  // p3:6
    val top = ProductAnalytics.factTopProducts(ps, 2).collect()
    assert(top.map(_.getAs[Int]("id")).toSeq == Seq(1, 2))       // 600 > 200
    val seas = ProductAnalytics.factSeasonalPerformance(ps)
      .filter($"season" === "Summer" && $"category" === "Apparel").head
    assert(seas.getAs[Long]("total_quantity") == 6L)
  }

  test("factProductCombinations: pairs only from multi-distinct-product baskets") {
    val items = ProductAnalytics.orderItems(transactions)
    val combos = ProductAnalytics.factProductCombinations(products, items)
      .collect()
    // only b1 has two distinct products (b3's two items are the same product)
    assert(combos.length == 1)
    assert(combos.head.getAs[Int]("product_1") == 1)
    assert(combos.head.getAs[Int]("product_2") == 2)
    assert(combos.head.getAs[Long]("frequency") == 1L)
    assert(combos.head.getAs[String]("product_1_name") == "Red Shirt")
    assert(combos.head.getAs[String]("product_2_name") == "Blue Coat")
  }

  test("competitor stats: stddev_samp null for single quote; position labels") {
    val feed = Seq(
      (1, "Red Shirt", "compA", 100L), (1, "Red Shirt", "compB", 110L),
      (1, "Red Shirt", "compC", 120L),
      (2, "Blue Coat", "compA", 50L)
    ).toDF("our_product_id", "our_product_name", "competitor_name", "competitor_price")
    val stats = CompetitorAnalytics.factCompetitorPrices(feed)
    val m = stats.collect().map(r => r.getInt(0) -> r).toMap
    assert(m(1).getAs[Double]("avg_competitor_price") == 110.0)
    assert(math.abs(m(1).getAs[Double]("std_competitor_price") - 10.0) < 1e-9)
    assert(m(2).isNullAt(m(2).fieldIndex("std_competitor_price")))  // n=1
    val ours = Seq((1, 120.0), (2, 40.0), (3, 99.0)).toDF("id", "our_price")
    val cmp = CompetitorAnalytics.factPriceComparison(ours, stats).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(cmp(1).getAs[String]("price_position") == "Above Market")
    assert(cmp(2).getAs[String]("price_position") == "Below Market")
    assert(cmp(3).isNullAt(cmp(3).fieldIndex("price_position")))  // no quotes
  }

  test("generated clicks+transactions flow end-to-end through customer behavior") {
    import graft.sources.Generator
    // same seed -> click and transaction session_ids align by construction
    val clicks = Generator.asClickStream(
      Generator.clickBatch(spark, 500, seed = 7, startTs = 1700000000L))
      .drop("customer_id")  // behavior derives the customer via the session join
    val txns = Generator.transactionBatch(spark, 500, seed = 7, startTs = 1700000000L)
    val dim = txns.select(col("customer_id")).distinct()
      .withColumn("customer_segment", lit("Regular"))
    val behavior = CustomerAnalytics.factCustomerBehavior(clicks, txns, dim)
    val rows = behavior.collect()
    assert(rows.nonEmpty)
    // every session holds 5 clicks, so events = 5 x (txn rows in that
    // customer's joined sessions) and events_per_session is a multiple of 5
    assert(rows.forall(_.getAs[Double]("events_per_session") % 5.0 == 0.0))
    assert(rows.forall(_.getAs[String]("customer_segment") == "Regular"))
  }
}
