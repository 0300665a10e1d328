package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time derivations (SURVEY §2.2 P9/P10/P14/P15).
  *
  * The reference computes age/tenure against wall-clock `now()`
  * (/root/reference/airflow/dags/customer_analytics_dag.py:76) which is
  * nondeterministic; here "today" is always an explicit `asOf` parameter
  * (SURVEY §7.4.2).
  */
object Temporal {
  /** Exact integer age at `asOf`: year difference minus one if the birthday
    * has not yet occurred (customer_analytics_dag.py:76-82 semantics). */
  def ageAt(birth: Column, asOf: Column): Column =
    year(asOf) - year(birth) -
      when(month(asOf) < month(birth) ||
           (month(asOf) === month(birth) && dayofmonth(asOf) < dayofmonth(birth)), 1)
        .otherwise(0)

  /** P10: whole days between `since` and `asOf` (pandas `.dt.days`). */
  def tenureDays(since: Column, asOf: Column): Column =
    datediff(asOf, since)

  /** P14: (hour, weekday-name, month, year) — pandas `.dt.hour/day_name()/...`.
    * `date_format 'EEEE'` yields full English names like pandas day_name(). */
  def timeFeatures(ts: Column): Seq[(String, Column)] = Seq(
    "order_hour"  -> hour(ts),
    "order_day"   -> date_format(ts, "EEEE"),
    "order_month" -> month(ts),
    "order_year"  -> year(ts)
  )

  /** P15: calendar-day truncation used as a group key (`.dt.date`). */
  def day(ts: Column): Column = to_date(ts)
}
