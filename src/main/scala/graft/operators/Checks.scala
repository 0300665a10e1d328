package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One data-quality constraint: a named aggregate metric over the frame
  * plus the pass predicate evaluated on the metric's value. */
final case class Check(name: String, metric: Column, pass: Column => Column)

/** Deequ-style data-quality constraint suite: completeness, uniqueness,
  * accepted values, ranges, referential integrity — each a named metric
  * with a pass/fail verdict. The reference's pipelines validate by
  * crashing (pandas `astype` / NOT NULL load failures); this is the
  * declarative report a 100 TB ingest gate needs instead.
  *
  * Plan shape: ONE aggregation pass over `df` computes every metric
  * (map-side combining, 1-row result), then a driver-trivial explode
  * emits one (check, metric, passed) row per constraint. Keep at most
  * one distinct-aggregate metric per suite — a second adds an Expand
  * that doubles the scan's output. Referential checks: pre-join `df` to
  * the broadcast dimension keyset with a presence flag and count the
  * misses as a plain conditional sum (see q157).
  */
object Checks {

  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val names = checks.map(_.name)
    require(names.distinct.size == names.size, s"duplicate check names: $names")
    val metrics = checks.zipWithIndex.map { case (c, i) =>
      c.metric.cast("double").as(s"__m$i")
    }
    val agg = df.agg(metrics.head, metrics.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      // a NULL metric (e.g. MIN over an empty frame) must read as a
      // FAILED check, not a NULL that slips past `!passed` consumers
      struct(lit(c.name).as("check"), col(s"__m$i").as("metric"),
        coalesce(c.pass(col(s"__m$i")), lit(false)).as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.check").as("check"), col("__r.metric").as("metric"),
        col("__r.passed").as("passed"))
  }

  /** Row-level expectations (the DLT-expectations / Deequ row-routing
    * half of the suite, where [[report]] is the dataset-level half): adds
    * `failed_rules` — the ordered comma-joined names of every rule the
    * row violates, "" when the row is clean. A pure codegen'd projection;
    * route with `filter(failed_rules === "")` / its negation and the scan
    * is still read once per branch with no shuffle. */
  def withViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val names = rules.map(_._1)
    require(names.distinct.size == names.size, s"duplicate rule names: $names")
    // a rule whose predicate is NULL (e.g. comparing a NULL column) did
    // NOT pass — coalesce to a violation, the conservative routing
    df.withColumn("failed_rules", concat_ws(",",
      rules.map { case (n, ok) => when(!coalesce(ok, lit(false)), lit(n)) }: _*))
  }

  /** Split into (valid, quarantined) on the [[withViolations]] marker —
    * the ingest-gate shape: clean rows continue, violators land in a
    * reject table with their reasons attached. */
  def routeInvalid(df: DataFrame, rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val marked = withViolations(df, rules)
    (marked.filter(col("failed_rules") === lit("")).drop("failed_rules"),
      marked.filter(col("failed_rules") =!= lit("")))
  }
}
