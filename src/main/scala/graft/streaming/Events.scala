package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

/** Structured Streaming surface (SURVEY §2.10 ST1).
  *
  * The reference has no streaming runtime — its daily DAG cadence is a
  * tumbling 1-day batch (README roadmap defers Kafka). Here the same
  * aggregations run incrementally: event-time tumbling windows with a
  * watermark bound the state store, so the query runs forever at constant
  * memory. The transform functions below are stream/batch agnostic — the
  * parity test (StreamingSpec) runs the identical plan over a MemoryStream
  * and over the same rows as a batch and asserts equal results.
  */
object Events {

  /** A8-as-stream: tumbling-window event counts + value totals per type.
    * Works unchanged on a batch or streaming DataFrame with (ts, event_type,
    * value). The watermark caps state: windows older than `lateness` are
    * finalized and evicted. */
  def windowedTypeCounts(events: DataFrame,
                         windowLen: String = "1 day",
                         lateness: String = "1 hour"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness) else events
    withWm
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("events"), col("total_value"))
  }

  /** A2-as-stream: per-user distinct-ish activity. True countDistinct is
    * unsupported in streaming aggregation, so the stream path counts via
    * approx_count_distinct — the documented trade: constant-size HLL state
    * per (window, user) vs an unbounded exact set. */
  def windowedUserActivity(events: DataFrame,
                           windowLen: String = "1 hour",
                           lateness: String = "1 hour"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", lateness) else events
    withWm
      .groupBy(window(col("ts"), windowLen).as("w"), col("user_id"))
      .agg(count(lit(1)).as("total_events"),
        approx_count_distinct(col("event_id")).as("approx_distinct_events"))
      .select(col("w.start").as("window_start"), col("user_id"),
        col("total_events"), col("approx_distinct_events"))
  }

  /** Wire a streaming aggregate to an in-memory sink for tests/demos. */
  def toMemorySink(df: DataFrame, queryName: String): DataStreamWriter[Row] =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())

  /** Append-mode parquet sink for a watermarked windowed aggregate: each
    * window is written exactly once, when the watermark passes its end —
    * the streaming analog of the reference's daily batch overwrite (S9),
    * but incremental and idempotent via the checkpoint. */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())

  /** Stream-stream attribution join (J3 as a stream): attach each purchase
    * to the same user's click that preceded it by at most `attribution`.
    * Both sides carry watermarks and the join condition bounds event-time
    * distance, so Spark can evict state once the watermark passes — the
    * state store holds only `attribution + lateness` worth of events per
    * side, regardless of stream length. Works identically on batch frames
    * (watermarks become no-ops), which is how the spec asserts parity. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      attribution: String = "30 minutes",
                      lateness: String = "1 hour"): DataFrame = {
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", lateness) else clicks)
      .select(col("user_id"), col("ts").as("click_ts"), col("event_type"))
    val p = (if (purchases.isStreaming) purchases.withWatermark("ts", lateness) else purchases)
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("amount"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $attribution"))
      .select(col("user_id"), col("click_ts"), col("event_type"),
        col("purchase_ts"), col("amount"))
  }

  /** Streaming exact dedup: drop rows whose key columns were already seen
    * within the watermark horizon (`dropDuplicatesWithinWatermark` — state
    * is evicted once the watermark passes, so memory stays bounded by the
    * horizon, not history; the batch-side analog is
    * [[graft.llm.Dedup.dedupe]]). Key on a content hash (e.g.
    * `md5(text)`) for streaming corpus dedup. On a BATCH frame (where
    * Spark rejects the within-watermark form) this degrades to the exact
    * `dropDuplicates` — the stream/batch-agnostic contract the sibling
    * transforms keep. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts", lateness: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, lateness)
        .dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Streaming upsert-lite sink: each micro-batch is folded into a managed
    * table with ON-CONFLICT-DO-NOTHING semantics (S11 on a stream) via
    * foreachBatch + [[graft.sources.Warehouse.upsertPlan]] — existing keys
    * win, replays of the same batch are no-ops, so the sink is idempotent
    * under retries. Batches must be deduped on `keys` internally, which
    * upsertPlan's anti-join does not do — dropDuplicates here covers it.
    * At scale the anti-join is one shuffle keyed on `keys` against a
    * key-pruned scan of the target table.
    *
    * Crash safety (two durable writes per batch — the price of not
    * losing the table): `overwriteTable` DROPS the target before
    * rewriting, so the merged frame is first written to a durable
    * staging TABLE and the target overwrite then reads staging from
    * disk — never volatile localCheckpoint blocks. A crash between the
    * target drop and its rewrite leaves staging holding the full merge:
    * the retry recovers its base from staging (re-merging the same
    * batch is a no-op under existing-wins), so no window loses
    * previously upserted rows. */
  def toUpsertSink(df: DataFrame, table: String, keys: Seq[String],
                   checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val staging = table + "_upsert_stage"
        val incoming = batch.dropDuplicates(keys)
        // base = target; else the staging copy a torn overwrite left
        val base =
          if (spark.catalog.tableExists(table)) Some(spark.table(table))
          else if (spark.catalog.tableExists(staging)) Some(spark.table(staging))
          else None
        val merged = base match {
          case Some(b) => graft.sources.Warehouse
            .upsertPlan(b, incoming, keys)
            // the plan may read the table about to be overwritten
            // (recovery case) — materialize before the staging write
            .localCheckpoint(eager = true)
          case None => incoming
        }
        graft.sources.Warehouse.overwriteTable(merged, staging)
        graft.sources.Warehouse.overwriteTable(spark.table(staging), table)
        // staging is only needed between its write and the completed
        // target overwrite above; dropping it here (r11 advice) frees
        // the 2x storage AND removes the stale-resurrection hazard — a
        // later intentional DROP of the target followed by a stream
        // restart would otherwise adopt the old staging copy as base
        spark.sql(s"DROP TABLE IF EXISTS $staging")
        ()
      }

  /** Stream → JDBC warehouse sink: the reference's DAG→Postgres landing
    * (`to_sql`, customer_analytics_dag.py:145-151) as a stream. Each
    * micro-batch is upserted into the JDBC table with
    * ON-CONFLICT-DO-NOTHING semantics: anti-join the batch against the
    * table's current keys, append only the new ones. Replays of a
    * micro-batch (the foreachBatch at-least-once contract) become
    * no-ops, so the sink is idempotent end-to-end. "Table absent" is
    * decided by a JDBC metadata probe, never by catching read failures:
    * a transient error (network, auth, timeout) during the key read must
    * fail the micro-batch so the retry re-runs the anti-join — swallowing
    * it would append the batch un-deduped exactly in the replay scenarios
    * the idempotence contract exists for. At scale, swap the whole-table
    * key read for a `readQuery` keyed IN-list or a staging-table MERGE —
    * the batch boundary and retry semantics stay identical. */
  def toJdbcUpsertSink(df: DataFrame, url: String, table: String,
                       keys: Seq[String], checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // r12: the dedup moved DATABASE-SIDE — ship the (in-batch
        // deduped) micro-batch to a per-epoch staging table and run one
        // INSERT..WHERE NOT EXISTS merge in the warehouse
        // (Jdbc.upsertStaged). The previous shape read the target's FULL
        // key set back through JDBC every micro-batch (O(table) per
        // batch — the dominant term in the 32x sweep); this ships only
        // the batch. Per-epoch staging for the same zombie-writer reason
        // as the exactly-once sink; a replayed epoch re-stages and the
        // NOT EXISTS makes the merge a no-op.
        val staging = s"${table}_ups_stage_$epochId"
        graft.sources.Jdbc.write(batch.dropDuplicates(keys), url, staging,
          SaveMode.Overwrite)
        graft.sources.Jdbc.upsertStaged(url, table, staging, keys)
      }

  /** EXACTLY-ONCE stream → TxLog table landing: each micro-batch lands
    * as one idempotent transactional batch append
    * ([[graft.sources.TxLog.appendBatchTx]]) keyed on the epoch id —
    * the foreachBatch at-least-once replay hits the commit ledger and
    * becomes a no-op (staged files discarded), and the ledger survives
    * log checkpoint/expiry, so the guarantee holds for the table's
    * lifetime. Because TxLog commits are safe under CONCURRENT writers,
    * batch jobs (compaction, backfill, another stream on other
    * partitions) can write the same table while the stream runs — the
    * writer-vs-writer story the JDBC sinks delegate to the database.
    * Epoch ids are stable across restarts FROM THE SAME CHECKPOINT
    * (Spark's foreachBatch contract); pair a fresh checkpoint with a
    * fresh table or a new `ledgerPrefix`. Empty micro-batches are
    * skipped (nothing to land — and an empty commit would be
    * indistinguishable from the real batch landing empty on replay). */
  def toTxLogSink(df: DataFrame, root: String, partCol: String,
                  checkpoint: String,
                  ledgerPrefix: String = "epoch"): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty)
          graft.sources.TxLog.appendBatchTx(batch, root, partCol,
            s"$ledgerPrefix-$epochId"): Unit
      }

  /** EXACTLY-ONCE stream → JDBC landing via the staged-commit protocol —
    * the upgrade from [[toJdbcUpsertSink]]'s key-dedup idempotence (which
    * needs a natural key) to transactional exactly-once for ANY schema:
    *
    *   1. skip-check: batch id already in the `<table>_commits` ledger →
    *      this is a replay of a committed batch, do nothing;
    *   2. stage: overwrite `<table>_stage` with the batch (NOT
    *      transactional, but idempotent — a crashed attempt is simply
    *      overwritten by the retry);
    *   3. commit: one database transaction moves staging → target AND
    *      inserts the batch id into the ledger
    *      ([[graft.sources.Jdbc.commitStaged]]). Atomicity of that
    *      transaction is the exactly-once guarantee; a crash between
    *      stage and commit replays into step 1 finding no ledger row.
    *
    * Epoch ids are stable across restarts FROM THE SAME CHECKPOINT
    * (Spark's foreachBatch contract) — that continuity is what the
    * ledger keys on. Starting a brand-new checkpoint against the same
    * target restarts epochs at 0, so pair a fresh checkpoint with a
    * fresh ledger/target. At scale the driver-side INSERT..SELECT move
    * runs inside the warehouse (partition swap / MERGE in a real one) —
    * the Spark-side batch boundary and ledger protocol are unchanged.
    *
    * Staging is PER-EPOCH (`<table>_stage_<epochId>`): a zombie driver
    * replaying an old epoch can only clobber its OWN epoch's staging,
    * never the batch a recovery driver is mid-commit on — with one
    * shared staging table the zombie's overwrite could land between
    * another driver's stage and commit, duplicating old rows under a
    * fresh ledger id. Committed epochs drop their staging afterwards
    * (best-effort; a zombie's recreated leftover is harmless garbage,
    * never read by a commit). */
  def toJdbcExactlyOnceSink(df: DataFrame, url: String, table: String,
                            checkpoint: String,
                            props: Map[String, String] = Map.empty): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val staging = s"${table}_stage_$epochId"
        val commits = table + "_commits"
        if (!graft.sources.Jdbc.isBatchCommitted(url, commits, epochId, props)) {
          graft.sources.Jdbc.write(batch, url, staging, SaveMode.Overwrite, props)
          graft.sources.Jdbc.commitStaged(url, table, staging, commits,
            epochId, props)
          graft.sources.Jdbc.dropTableIfExists(url, staging, props)
        }
      }
}
