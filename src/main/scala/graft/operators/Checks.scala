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
      struct(lit(c.name).as("check"), col(s"__m$i").as("metric"),
        c.pass(col(s"__m$i")).as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.check").as("check"), col("__r.metric").as("metric"),
        col("__r.passed").as("passed"))
  }
}
