package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration. */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // pandas-permissive semantics (the reference never errors on bad
      // casts/overflow); every oracle query guards its own denominators.
      .config("spark.sql.ansi.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) — read as long, convert in
      // Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE re-plans at runtime: broadcast-after-stats, skew-join splitting.
      .config("spark.sql.adaptive.enabled", "true")
      // managed tables (S9/S12 warehouse queries) land in scratch space,
      // never in the repo tree
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")

  def local(cpus: String): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
