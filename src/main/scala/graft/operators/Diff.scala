package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level snapshot diff: compare two keyed snapshots of a table and
  * emit one row per differing key — `added` / `removed` / `changed`, with
  * the comma-joined list of attributes that differ (null-safe compare).
  * The audit primitive behind "what did last night's load change": the
  * reference rewrites whole warehouse tables blind
  * (`to_sql(if_exists='replace')`, customer_analytics_dag.py:145-151);
  * this makes the delta observable instead.
  *
  * Plan shape: one FULL OUTER join on the key — both snapshots shuffle
  * once; at warehouse scale write snapshots bucketed on the key
  * ([[graft.sources.Warehouse]] bucketed layouts) and the exchanges
  * disappear. Presence flags (not attribute nulls) distinguish a missing
  * row from a null attribute; unchanged keys are dropped before anything
  * rides the output, so rows-out = |delta|, not |table|.
  */
object Diff {

  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                   attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    // presence flags live outside the "__a_<attr>"/"__b_<attr>" namespace
    // (an attr literally named "p" must not collide with them — the spec
    // pins it); attrs may not start with "__" so the reverse is true too.
    require(attrCols.forall(!_.startsWith("__")), "attr names may not start with __")
    val la = a.select(keyCols.map(col) ++
      attrCols.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__present_a"): _*)
    val lb = b.select(keyCols.map(col) ++
      attrCols.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__present_b"): _*)
    val j = la.join(lb, keyCols, "full_outer")
    val aP = coalesce(col("__present_a"), lit(false))
    val bP = coalesce(col("__present_b"), lit(false))
    // concat_ws skips nulls, so this is the ordered list of attrs whose
    // old/new values are NOT null-safe-equal ("" when none differ).
    val changed = concat_ws(",",
      attrCols.map(c => when(!(col(s"__a_$c") <=> col(s"__b_$c")), lit(c))): _*)
    j.withColumn("change_type",
        when(aP && !bP, lit("removed"))
          .when(bP && !aP, lit("added"))
          .when(changed =!= lit(""), lit("changed")))
      .filter(col("change_type").isNotNull)
      .withColumn("changed_cols",
        when(col("change_type") === lit("changed"), changed))
      .select(keyCols.map(col) :+ col("change_type") :+ col("changed_cols"): _*)
  }
}
