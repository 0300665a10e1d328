package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV source/sink (SURVEY §2.1 S1/S4/S10).
  *
  * The reference lands CSVs with pandas `read_csv` (inference, chunking,
  * `on_bad_lines='skip'`, `escapechar='\\'` — data_sampling.py:110-135) and
  * writes them back with `QUOTE_ALL` (clean_product_v2.py:63). Here both
  * directions are declarative: explicit `StructType` for deterministic
  * schemas (S1), `DROPMALFORMED` for tolerant scans (S4), and Spark's
  * input-split parallelism replaces the 100k-row chunk loop (S2) — a single
  * scan is already bounded-memory and parallel.
  */
object Csv {

  /** S1: whole-file scan with an explicit schema (header row skipped).
    * Quote escaping is RFC 4180 doubling ("" inside a quoted field) — the
    * pandas to_csv/read_csv default the reference's CSVs use, not Spark's
    * backslash default.
    *
    * @param multiLine set true for files whose quoted fields embed
    *   newlines (legal RFC 4180, and pandas reads them). The trade is
    *   real: multiLine parses each FILE as one unsplittable unit, losing
    *   input-split parallelism — at warehouse scale, prefer many smaller
    *   files or keep records single-line. Default false = split-parallel
    *   line-oriented scan. */
  def read(spark: SparkSession, path: String, schema: StructType,
           multiLine: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS")
      .schema(schema)
      .csv(path)

  /** S4: malformed-record-tolerant scan — rows that fail the schema are
    * dropped, mirroring `on_bad_lines='skip'` + `escapechar='\\'`.
    *
    * NOT the CSV source's `mode=DROPMALFORMED`: that detects malformed rows
    * only in the columns a given query actually parses, so the same file
    * yields different row counts per query (`count()` parses nothing and
    * drops nothing — and the scan-level corrupt-record column is barred
    * from corrupt-only queries). Instead the file is scanned as text and
    * parsed with the `from_csv` expression: the validity check is ordinary
    * column logic, evaluated identically in every query shape, and the
    * whole parse stays inside codegen. Header rows are dropped by name
    * match (quotes stripped), per pandas `header=0`.
    *
    * CONSTRAINTS of the line-oriented design (both inherent to scanning as
    * text): records must not embed newlines inside quoted fields (use
    * [[read]] with multiLine for such files — tolerant + multiline can't
    * combine without giving up split parallelism), and a data line whose
    * full text exactly equals the header line is dropped as a header
    * (position information does not exist in a distributed text scan). */
  def readTolerant(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val corrupt = "_graft_corrupt"
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> corrupt,
      "escape" -> "\"",
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSS")
    val headerLine = schema.fieldNames.mkString(",")
    val parsed = spark.read.text(path)
      .filter(regexp_replace(col("value"), "\"", "") =!= headerLine)
      .select(from_csv(col("value"),
        StructType(schema.fields :+ StructField(corrupt, StringType)),
        opts).as("r"))
      .filter(col(s"r.$corrupt").isNull)
    parsed.select(schema.fieldNames.map(f => col(s"r.$f").as(f)): _*)
  }

  /** S10: CSV sink, header + QUOTE_ALL (clean_product_v2.py:63 parity). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS")
      .csv(path)
}
