package graft

import graft.ecom.{CustomerAnalytics, SalesAnalytics, Schemas}
import graft.sources.Csv
import org.apache.spark.sql.functions._

/** CSV landing parity: fixture CSVs written in the reference's source
  * format are read back through `Csv.read` + `ecom.Schemas` StructTypes and
  * flow into the pipelines — the end-to-end ingestion path a reference user
  * would migrate first. */
class EcomLandingSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-test/$name"

  test("transactions CSV -> Schemas.transactions -> enriched pipeline") {
    val csv = Seq(
      // created_at, customer_id, booking_id, session_id, product_metadata,
      // payment_method, payment_status, promo_amount, promo_code,
      // shipment_fee, shipment_date_limit, lat, long, total_amount
      """2026-01-01T10:00:00.000,1,b1,s1,"[{""product_id"":1,""quantity"":2,""item_price"":100}]",credit_card,success,0,,25,2026-01-03T00:00:00.000,-6.2,106.8,250""",
      """2026-01-02T11:30:00.000,2,b2,s2,"[{""product_id"":2,""quantity"":1,""item_price"":50}]",e_wallet,success,10,P10,5,2026-01-04T00:00:00.000,-6.9,107.6,50"""
    )
    val header = "created_at,customer_id,booking_id,session_id,product_metadata," +
      "payment_method,payment_status,promo_amount,promo_code,shipment_fee," +
      "shipment_date_limit,shipment_location_lat,shipment_location_long,total_amount"
    spark.sparkContext.parallelize(header +: csv, 1).toDF("line")
      .coalesce(1).write.mode("overwrite").text(tmp("txn_csv"))
    val txns = Csv.read(spark, tmp("txn_csv"), Schemas.transactions)
    assert(txns.count() == 2)
    assert(txns.schema("created_at").dataType.typeName == "timestamp")
    val e = SalesAnalytics.enriched(txns)
    val b1 = e.filter($"booking_id" === "b1").head
    assert(b1.getAs[Int]("total_items") == 2)
    assert(b1.getAs[Long]("total_product_value") == 200L)
    assert(b1.getAs[Int]("order_hour") == 10)
    // null promo_code survives the CSV round-trip as null (empty field)
    assert(b1.isNullAt(b1.fieldIndex("promo_code")))
  }

  test("customer CSV -> Schemas.customer -> dim pipeline") {
    val header = "customer_id,first_name,last_name,username,email,gender," +
      "birthdate,device_type,device_id,device_version,home_location_lat," +
      "home_location_long,home_location,home_country,first_join_date"
    val rows = Seq(
      "1,Ana,Putri,ana,ana@x.io,F,1990-06-15,Mobile,d1,v1,-6.2,106.8,Jakarta,Indonesia,2025-10-10T00:00:00.000",
      "2,Budi,Santoso,budi,budi@x.io,M,1985-03-02,desktop,d2,v2,-6.9,107.6,Bandung,Indonesia,2020-01-01T00:00:00.000")
    spark.sparkContext.parallelize(header +: rows, 1).toDF("line")
      .coalesce(1).write.mode("overwrite").text(tmp("cust_csv"))
    val customers = Csv.read(spark, tmp("cust_csv"), Schemas.customer)
    val dim = CustomerAnalytics.dimCustomers(customers, lit("2026-01-01").cast("date"))
    val m = dim.collect().map(r => r.getAs[Int]("customer_id") -> r).toMap
    assert(m(1).getAs[String]("customer_segment") == "New")
    assert(m(1).getAs[Boolean]("is_mobile_user"))
    assert(m(2).getAs[String]("customer_segment") == "VIP")
    assert(m(1).getAs[Int]("age") == 35)
  }
}
