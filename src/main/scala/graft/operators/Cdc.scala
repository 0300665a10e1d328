package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture log reduction: collapse an (op, key, attrs, ts, seq)
  * event feed to the CURRENT state of the table it describes — the
  * set-based consumption of a Debezium/outbox-style feed.
  *
  * The reference maintains its warehouse row-at-a-time through Postgres
  * `INSERT .. ON CONFLICT` (test_db.py:53-65) and full-table
  * `to_sql(if_exists='replace')` rewrites (customer_analytics_dag.py:145-151);
  * at 100 TB neither survives — the affordable shape is "reduce the day's
  * change feed, merge once", and this operator is the reduce half (the
  * merge half is [[graft.sources.Warehouse.upsert]] / partitioned
  * overwrite).
  *
  * Contract: `(tsCol, seqCol)` totally orders each key's events (a CDC
  * feed's LSN / offset — required unique per key; equal pairs would make
  * the winner tie-break on payload bytes). The latest event wins; a key
  * whose latest op is `"D"` has no current row.
  *
  * Plan shape: ONE map-side-combining aggregation — `MAX` of a
  * (ts, seq, op, attrs) struct per key — so each task reduces its slice of
  * the log to at most one candidate per key BEFORE the exchange: shuffle
  * volume ∝ keys × partitions, never log length, and there is no window /
  * per-key sort (the argmax-by-struct idiom also used for canonical-doc
  * selection in [[graft.llm.Clusters]]).
  */
object Cdc {

  /** Fail loudly on a NULL op (a corrupt event): with three-valued logic a
    * null op would flunk `op =!= "D"` and silently ERASE its key's entire
    * state as if it were deleted — while also masking the key's earlier
    * valid events. The raise_error convention matches the drift/stats
    * guards elsewhere in the repo. */
  private def guardedOp(opCol: String) =
    when(col(opCol).isNull,
      raise_error(lit("Cdc: NULL op in CDC feed — corrupt event")))
      .otherwise(col(opCol))

  /** Current state of the table described by `log`: one row per key whose
    * latest event is not a delete, carrying that event's attribute values
    * and its `tsCol` (the row's last-modified stamp). */
  def applyLog(log: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
               tsCol: String = "ts", seqCol: String = "seq",
               opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    // seq widened to long so state rows re-entering via applyToState (seq
    // = Long.MinValue) compare against int-typed feeds without a union
    // type clash; widening preserves order so the tie-break is unchanged.
    val payload = struct(
      col(tsCol) +: col(seqCol).cast("long").as(seqCol) +:
        guardedOp(opCol).as(opCol) +: attrCols.map(col): _*)
    log.groupBy(keyCols.map(col): _*)
      .agg(max(payload).as("__last"))
      .filter(col(s"__last.$opCol") =!= lit("D"))
      .select(keyCols.map(col) ++
        attrCols.map(a => col(s"__last.$a").as(a)) :+
        col(s"__last.$tsCol").as(tsCol): _*)
  }

  /** Build the FULL SCD2 history from a CDC log (the dbt-snapshot /
    * warehouse-history move, where [[applyLog]] keeps only current
    * state): every I/U event opens a version at its `tsCol`; the version
    * closes at the key's NEXT event of any kind (so a delete closes the
    * prior version and opens none); open-ended versions are flagged
    * `is_current`. Ready for [[graft.sources.Warehouse.scd2Lookup]].
    *
    * Plan shape: one window per key ordered by (ts, seq) — rows per key
    * = the key's change count, the same bounded-fanout argument as
    * scd2Lookup; the lead() is computed BEFORE deletes are dropped,
    * which is what closes a deleted key's last version. */
  def historyFrom(log: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
                  tsCol: String = "ts", seqCol: String = "seq",
                  opCol: String = "op"): DataFrame = {
    // same misuse guard as applyLog: an empty keyCols would build an
    // un-partitioned global window (single-task sort of the whole log)
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(seqCol).cast("long"))
    log.withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      .filter(guardedOp(opCol) =!= lit("D"))
      .select(keyCols.map(col) ++ attrCols.map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        col("__next_ts").as("valid_to"),
        col("__next_ts").isNull.as("is_current")): _*)
  }

  /** Incremental nightly merge: apply a new CDC slice on top of a
    * previously-applied state. State rows re-enter as `op = "I"` events at
    * their stored `tsCol` with `seq = Long.MinValue`, so any genuinely
    * newer event in the slice wins and an untouched key carries through
    * unchanged: `applyToState(applyLog(a), b) == applyLog(a union b)`
    * whenever the slice's (ts, seq) are ≥ the state's (SourcesSpec pins
    * the equivalence). Cost is the same single aggregation — the state
    * rides the exchange as one extra event per key. */
  def applyToState(state: DataFrame, log: DataFrame, keyCols: Seq[String],
                   attrCols: Seq[String], tsCol: String = "ts",
                   seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    val asEvents = state.select(keyCols.map(col) ++ attrCols.map(col) ++ Seq(
      col(tsCol),
      lit(Long.MinValue).as(seqCol),
      lit("I").as(opCol)): _*)
    applyLog(
      asEvents.unionByName(log.select(asEvents.columns.map(col): _*)),
      keyCols, attrCols, tsCol, seqCol, opCol)
  }
}
