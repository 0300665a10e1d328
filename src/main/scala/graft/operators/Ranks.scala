package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Distributed exact global ranking (SURVEY §2.2 P13 at scale).
  *
  * `row_number()`/`ntile()` over an UN-partitioned window force every row
  * through one task — the classic 100-TB scale-killer (a global sort into a
  * single `Exchange SinglePartition`). This primitive computes the same
  * exact ranks with no single-task stage, as the standard two-pass scheme:
  *
  *   1. `repartitionByRange` on the sort key (sampled range boundaries, so
  *      skewed keys still spread by tie-break columns), pinned with
  *      `localCheckpoint` — partition ids MUST be frozen because the range
  *      sampler re-draws per physical execution, and pass 2 and pass 3
  *      would otherwise see different partitionings (wrong ranks, silently).
  *      Set the `graft.checkpointDir` session option for the durable
  *      `checkpoint` variant ([[graft.Checkpoints]]), same note as
  *      [[graft.llm.Clusters]].
  *   2. per-partition counts (one tiny job: ≤ `partitions` longs to the
  *      driver) → cumulative offsets.
  *   3. local `row_number` partitioned BY the range-partition id, plus the
  *      partition's offset → exact global rank. The window shuffles by
  *      partition id, so tasks stay range-balanced; no task ever sees more
  *      than one range partition.
  */
object Ranks {
  /** Exact global `row_number` under `order` (must be a total order for
    * determinism — include a tie-break key), written to long column `out`.
    * Also returns the total row count (pass 2 already paid for it). */
  private def rankedWithCount(df: DataFrame, order: Seq[Column],
                              out: String, partitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.Checkpoints.pin(
      df.repartitionByRange(p, order: _*)
        .withColumn("__pid", spark_partition_id()))
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2)
    val total = offsets.last
    val offDf = spark.createDataFrame(
      counts.zip(offsets).map { case ((pid, _), off) => (pid, off) }.toSeq)
      .toDF("__opid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val ranked = ranged
      .join(broadcast(offDf), col("__pid") === col("__opid"))
      .withColumn(out, row_number().over(w).cast("long") + col("__off"))
      .drop("__pid", "__opid", "__off")
    (ranked, total)
  }

  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String,
                      partitions: Int = 0): DataFrame =
    rankedWithCount(df, order, out, partitions)._1

  /** Exact global RUNNING SUM of `value` under `order` (inclusive frame) —
    * `SUM(v) OVER (ORDER BY …)` without the un-partitioned window's
    * single-task global sort. Same two-pass scheme as
    * [[globalRowNumber]]: range-partition + pin, per-partition SUMS (≤
    * `partitions` longs to the driver) → cumulative offsets, then a local
    * running sum per pinned partition plus the offset. `order` must be a
    * total order (include a tie-break) and `value` must be integral —
    * long accumulation keeps the result exact and association-free, so it
    * is bit-equal to the single-window form at any parallelism. */
  def globalCumSum(df: DataFrame, order: Seq[Column], value: Column,
                   out: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.Checkpoints.pin(
      df.repartitionByRange(p, order: _*)
        .withColumn("__v", value.cast("long"))
        .withColumn("__pid", spark_partition_id()))
    val sums = ranged.groupBy(col("__pid")).agg(sum(col("__v")).as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = sums.scanLeft(0L)(_ + _._2)
    val offDf = spark.createDataFrame(
      sums.zip(offsets).map { case ((pid, _), off) => (pid, off) }.toSeq)
      .toDF("__opid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), col("__pid") === col("__opid"))
      .withColumn(out, sum(col("__v")).over(w) + col("__off"))
      .drop("__pid", "__opid", "__off", "__v")
  }

  /** [[globalCumSum]] for SEVERAL value columns in ONE pass: one range
    * repartition, one pin, one per-partition sums collect (≤ partitions
    * rows × |values| longs), one window — where chaining globalCumSum
    * pays the range shuffle and pin once per value. Same bit-exactness
    * contract per column. `values` maps output name → integral column. */
  def globalCumSums(df: DataFrame, order: Seq[Column],
                    values: Seq[(String, Column)],
                    partitions: Int = 0): DataFrame = {
    require(values.nonEmpty, "at least one value column")
    val spark = df.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val vNames = values.indices.map(i => s"__v$i")
    val ranged = graft.Checkpoints.pin(
      values.zip(vNames).foldLeft(
          df.repartitionByRange(p, order: _*)) { case (d, ((_, c), vn)) =>
          d.withColumn(vn, c.cast("long"))
        }
        .withColumn("__pid", spark_partition_id()))
    val sums = ranged.groupBy(col("__pid"))
      .agg(sum(col(vNames.head)).as("s0"),
        vNames.tail.zipWithIndex.map { case (vn, i) =>
          sum(col(vn)).as(s"s${i + 1}")
        }: _*)
      .collect()
      .map(r => r.getInt(0) -> vNames.indices.map(i => r.getLong(i + 1)))
      .sortBy(_._1)
    val offsets = sums.scanLeft(vNames.indices.map(_ => 0L)) {
      case (acc, (_, vs)) => acc.zip(vs).map { case (a, v) => a + v }
    }
    val offDf = spark.createDataFrame(
      sums.zip(offsets).map { case ((pid, _), offs) => Row.fromSeq(pid +: offs) }
        .toSeq.asJava,
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__opid",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
          vNames.indices.map(i => org.apache.spark.sql.types.StructField(
            s"__off$i", org.apache.spark.sql.types.LongType, nullable = false))))
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    values.zipWithIndex.foldLeft(
        ranged.join(broadcast(offDf), col("__pid") === col("__opid"))) {
        case (d, ((out, _), i)) =>
          d.withColumn(out, sum(col(s"__v$i")).over(w) + col(s"__off$i"))
      }
      .drop(Seq("__pid", "__opid") ++ vNames ++
        vNames.indices.map(i => s"__off$i"): _*)
  }

  /** Exact `NTILE(k) OVER (ORDER BY order)` — SQL NTILE semantics (first
    * `N mod k` tiles get `ceil(N/k)` rows), bit-equal to the single-window
    * form, with no single-partition stage. */
  def distributedNtile(df: DataFrame, order: Seq[Column], k: Int,
                       out: String, partitions: Int = 0): DataFrame = {
    require(k > 0, "ntile k must be positive")
    val (ranked, n) = rankedWithCount(df, order, "__rn", partitions)
    val q = n / k
    val rem = n % k
    val threshold = rem * (q + 1)
    // integral `div` (Column./ is floating division); q==0 (N < k) keeps
    // every row in the first branch, so the max(q,1) guard is never taken
    val tile = when(col("__rn") <= threshold,
        expr(s"(__rn - 1) div ${q + 1}") + 1)
      .otherwise(lit(rem) + expr(s"(__rn - 1 - $threshold) div ${math.max(q, 1)}") + 1)
    ranked.withColumn(out, tile.cast("int")).drop("__rn")
  }

  /** Exact `NTILE(k) OVER (PARTITION BY groupCols ORDER BY order)` with
    * NO per-group single-task sort — the per-group twin of
    * [[distributedNtile]] for SKEWED group keys (a language column where
    * one language is 95% of the corpus would force nearly every row
    * through one window task; the partitioned-window plan passes the
    * PlanAudit shape gate but dies at scale anyway).
    *
    * Scheme: rank GLOBALLY by (groupCols, order) via the range-
    * partitioned two-pass row_number — the dominant group then spans as
    * many partitions as it needs — and join back each group's start
    * offset and size (one row per group, broadcast; the group count must
    * be broadcast-small, which a language/source/bucket key is). The
    * rank-in-group is `global - start + 1` and the tile is the closed-
    * form SQL NTILE (first `n mod k` tiles get `ceil(n/k)` rows),
    * per-group `n` as a column. Bit-equal to the window form. */
  def groupedNtile(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                   k: Int, out: String, partitions: Int = 0): DataFrame = {
    require(k > 0, "ntile k must be positive")
    groupedRankAndSize(df, groupCols, order, partitions)
      .withColumn("__q", expr(s"__n div $k"))
      .withColumn("__rem", col("__n") % k)
      .withColumn("__th", col("__rem") * (col("__q") + 1))
      // integral `div` throughout (Column./ is floating division); the
      // greatest(__q, 1) guard is never taken when n < k — every row then
      // lands in the first branch, matching SQL NTILE
      .withColumn(out, when(col("__rn") <= col("__th"),
          expr("(__rn - 1) div (__q + 1)") + 1)
        .otherwise(col("__rem") + expr("(__rn - __th - 1) div greatest(__q, 1)") + 1)
        .cast("int"))
      .drop("__rn", "__n", "__q", "__rem", "__th")
  }

  /** Exact `ROW_NUMBER() OVER (PARTITION BY groupCols ORDER BY order)`
    * with NO per-group single-task sort — the per-group rank twin of
    * [[groupedNtile]], for skewed group keys (per-domain top-k caps where
    * one domain dominates the corpus). Bit-equal to the window form. */
  def groupedRowNumber(df: DataFrame, groupCols: Seq[String],
                       order: Seq[Column], out: String,
                       partitions: Int = 0): DataFrame =
    groupedRankAndSize(df, groupCols, order, partitions)
      // INT like the window ROW_NUMBER it is bit-equal to (the long
      // __gn - __g0 + 1 arithmetic is internal); callers comparing
      // schemas against the window form need no cast
      .withColumn(out, col("__rn").cast("int"))
      .drop("__rn", "__n")

  /** Shared core of [[groupedNtile]]/[[groupedRowNumber]]: the input plus
    * `__rn` (1-based rank within its group under `order`) and `__n` (the
    * group's size), computed via the range-partitioned two-pass global
    * rank over (groupCols, order) — the dominant group spans as many
    * partitions as it needs — plus one broadcast-small per-group
    * (start, size) join. */
  private def groupedRankAndSize(df: DataFrame, groupCols: Seq[String],
                                 order: Seq[Column],
                                 partitions: Int): DataFrame = {
    require(groupCols.nonEmpty, "grouped rank needs group columns")
    // pinned: referenced twice below (the per-group offset aggregate and
    // the join's probe side) — unpinned, the ranking window pass would
    // execute twice per call
    val ranked = graft.Checkpoints.pin(
      globalRowNumber(df, groupCols.map(col) ++ order, "__gn", partitions))
    val grp = ranked.groupBy(groupCols.map(col): _*)
      .agg(min(col("__gn")).as("__g0"), count(lit(1)).as("__n"))
    // null-SAFE group equality: a window's PARTITION BY treats NULL as a
    // valid partition, and an inner equi-join would silently drop it
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    val grpR = groupCols.foldLeft(grp)((d, c) => d.withColumnRenamed(c, s"__g_$c"))
    ranked.join(broadcast(grpR), cond)
      .drop(groupCols.map(c => s"__g_$c"): _*)
      .withColumn("__rn", col("__gn") - col("__g0") + 1)
      .drop("__gn", "__g0")
  }
}
