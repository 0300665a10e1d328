package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `right.ts <= left.ts` (or `<` in strict mode) on the same key — the
  * time-series "value as of t" join (price at order time, last touch
  * before purchase, sensor state at event time).
  *
  * Spark has no native ASOF JOIN, and the naive composition — range join
  * on `r.ts <= l.ts` then argmax per left row — materializes every
  * (left, earlier-right) pair before collapsing: O(|L|·|R|) per key. The
  * scalable form used here is union-and-carry-forward:
  *
  *   1. tag both sides and union them (no join!),
  *   2. ONE shuffle: window partitioned by key, ordered by (ts, side),
  *   3. `last(payload, ignoreNulls)` carries the latest right payload
  *      forward to each left row,
  *   4. keep only left rows.
  *
  * Cost is one shuffle + one per-key sort over |L|+|R| rows — linear, no
  * pair explosion, independent of how many right rows precede each left
  * row. Equal-timestamp semantics are encoded in the sort: the right row
  * sorts BEFORE the left row at the same ts for inclusive (<=) mode and
  * AFTER it for strict (<) mode, so the window frame (UNBOUNDED PRECEDING
  * .. CURRENT ROW) includes or excludes it with no extra pass. At 100 TB
  * the only hot spot is a single key owning a huge fraction of rows (one
  * sort task) — same failure mode and same remedy (key salting by time
  * range) as any windowed computation.
  *
  * @param payload  right-side columns carried to the output (pre-rename
  *   them on `right` if they clash with left column names); the right
  *   timestamp is always carried as `asofTsAs` for tolerance filtering
  *   and gap math.
  * @param tieBreak extra right-side order columns making `last` pick
  *   deterministic when (key, ts) repeats on the right (left rows are
  *   unaffected: every ordering of equal-ts left rows sees the same
  *   carried payload).
  * @param tolerance max lookback as a SQL interval literal body (e.g.
  *   "7 days"): matches older than `left.ts - tolerance` are nulled out,
  *   matching pandas merge_asof's tolerance contract.
  */
object AsofJoin {
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           payload: Seq[String],
           asofTsAs: String = "asof_ts",
           strict: Boolean = false,
           tieBreak: Seq[String] = Nil,
           tolerance: Option[String] = None): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    val leftCols = left.columns.toSeq

    // right rows at ts == left ts: side 0 sorts first (inclusive), 2 last (strict)
    val rightSide = if (strict) 2 else 0
    val pStruct = struct(col(rightTs).as(asofTsAs) +: payload.map(col): _*)

    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tie"),
      struct(leftCols.map(col): _*).as("__row"))
    // __tie: dense per-right-row rank under tieBreak is overkill; a single
    // monotonic long from the tie-break columns' hash is enough to make the
    // window order total. xxhash64 over the tie-break columns is stable.
    // a right row with NULL ts sorts before everything and would be
    // carried as the "earliest" match for every left row — a row with
    // unknown time can never be "most recent at or before t", so drop it
    val r = right.filter(col(rightTs).isNotNull).select(
      col(rightKey).as("__k"), col(rightTs).as("__t"), lit(rightSide).as("__side"),
      (if (tieBreak.isEmpty) lit(0L) else xxhash64(tieBreak.map(col): _*)).as("__tie"),
      lit(null).cast(l.schema("__row").dataType).as("__row"),
      pStruct.as("__p"))
    val lp = l.withColumn("__p", lit(null).cast(r.schema("__p").dataType))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lp.unionByName(r.select(lp.columns.map(col): _*))
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withTol = tolerance match {
      case Some(iv) => carried.withColumn("__m",
        when(col(s"__m.$asofTsAs") >= col("__t") - expr(s"INTERVAL $iv"), col("__m")))
      case None => carried
    }
    withTol.select(
      leftCols.map(c => col(s"__row.$c").as(c)) ++
        (asofTsAs +: payload).map(c => col(s"__m.$c").as(c)): _*)
  }
}
