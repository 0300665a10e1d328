package graft.ecom

import graft.operators.{Bins, Temporal}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Customer-analytics pipeline (reference customer_analytics_dag.py). All
  * "today"-relative logic takes an explicit `asOf` date column — the
  * reference's wall-clock now() (customer_analytics_dag.py:76) is
  * nondeterministic by construction (SURVEY §7.4.2).
  */
object CustomerAnalytics {

  /** dim_customers (customer_analytics_dag.py:63-95): age (P9), tenure
    * (P10), segment bins (P12, right-closed 90/180/365), mobile flag (P11). */
  def dimCustomers(customers: DataFrame, asOf: Column): DataFrame =
    customers
      .withColumn("age", Temporal.ageAt(col("birthdate"), asOf))
      .withColumn("customer_tenure_days",
        Temporal.tenureDays(to_date(col("first_join_date")), asOf))
      .withColumn("customer_segment",
        Bins.fixedBins(col("customer_tenure_days"), Seq(90d, 180d, 365d),
          Seq("New", "Regular", "Loyal", "VIP")))
      .withColumn("is_mobile_user", lower(col("device_type")) === "mobile")

  /** dim_customer_locations (A1, customer_analytics_dag.py:98-102). */
  def dimCustomerLocations(dimCustomers: DataFrame): DataFrame =
    dimCustomers
      .groupBy(col("home_location"))
      .agg(
        count(col("customer_id")).as("customer_count"),
        avg(col("age")).as("avg_age"),
        avg(col("customer_tenure_days")).as("avg_tenure_days"))

  /** The J3 big join (customer_analytics_dag.py:177-188): clicks ⋈
    * transactions on session_id. The reference writes a LEFT join plus
    * `WHERE t.customer_id IS NOT NULL`, which is an inner join; a session
    * with k transactions multiplies its click rows by k — reproduced
    * faithfully (SURVEY §7.4.6). At scale this is the one join that must
    * stay sort-merge: both sides are fact-sized, never broadcast. */
  def clicksWithCustomer(clicks: DataFrame, transactions: DataFrame): DataFrame =
    clicks.join(
      transactions.select(col("session_id"), col("customer_id"))
        .filter(col("customer_id").isNotNull),
      Seq("session_id"), "inner")

  /** fact_customer_behavior (A2 + P8 + J4,
    * customer_analytics_dag.py:191-218): per-customer distinct sessions +
    * event count + events/session, then segment attached (broadcast dim). */
  def factCustomerBehavior(clicks: DataFrame, transactions: DataFrame,
                           dimCustomers: DataFrame): DataFrame =
    clicksWithCustomer(clicks, transactions)
      .groupBy(col("customer_id"))
      .agg(
        countDistinct(col("session_id")).as("total_sessions"),
        count(col("event_name")).as("total_events"))
      .withColumn("events_per_session", col("total_events") / col("total_sessions"))
      .join(
        broadcast(dimCustomers.select(col("customer_id"), col("customer_segment"))),
        Seq("customer_id"), "left")
}
