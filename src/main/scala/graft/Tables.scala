package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver test tables (parquet under /root/testdata/sfN/).
  *
  * One function per table so every query goes through a single, schema-stable
  * entry point. The `events` table is written with parquet TIMESTAMP(NANOS)
  * which Spark cannot read natively; we read it as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds,
  * matching DuckDB's `CAST(ts_ns AS TIMESTAMP)` truncation semantics.
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = p(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "embeddings")

  /** events with `ts` as a microsecond TIMESTAMP (truncated from nanos). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
