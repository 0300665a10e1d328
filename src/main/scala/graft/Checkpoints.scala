package graft

import org.apache.spark.sql.DataFrame

/** Lineage pinning for iterative operators ([[graft.llm.Clusters]],
  * [[graft.operators.Ranks]], [[graft.llm.Bpe]]): every round/pass must
  * truncate the logical plan (cached plans double per round until analysis
  * OOMs) and freeze the physical partitioning (range samplers re-draw per
  * execution — unpinned, pass 2 and pass 3 of the rank schemes would see
  * DIFFERENT partitionings and produce silently wrong ranks).
  *
  * Default is `localCheckpoint` — executor-local blocks, no I/O, right for
  * local mode and for clusters that accept recomputation-on-loss;
  * superseded rounds' blocks are released by the ContextCleaner as the
  * dropped references are GC'd. Setting the session option
  * `graft.checkpointDir` to a durable path (HDFS/object store) switches
  * every pin to a reliable `checkpoint`: executor loss then recovers from
  * storage instead of killing the whole iterative job — the posture a
  * 1000-executor run wants. Results are identical in both modes
  * (CheckpointModeSpec asserts it); only the failure-recovery story
  * changes.
  *
  * DURABLE-MODE RETENTION: Spark deletes superseded reliable-checkpoint
  * files only when `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * (off by default, and it must be set at SparkContext start). Long-lived
  * sessions running many iterative jobs against a durable dir should set
  * that flag — or point `graft.checkpointDir` at a storage path with a
  * TTL/lifecycle rule — otherwise each round's table copy accumulates for
  * the application's lifetime.
  */
object Checkpoints {

  val DirKey = "graft.checkpointDir"

  /** Pin `df`: eager materialization + lineage truncation, local or
    * durable per the session option above. */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir appends a per-context UUID subdir; set it only
        // once so all pins of a session share one checkpoint root. If the
        // context already has a dir that does NOT live under the
        // configured root (set earlier by other code, or the option was
        // changed mid-session — a SparkContext's dir cannot be moved),
        // say so loudly instead of silently pinning to the stale path.
        spark.sparkContext.getCheckpointDir match {
          case None => spark.sparkContext.setCheckpointDir(dir)
          case Some(existing) =>
            // setCheckpointDir(d) makes the context dir d/<uuid>, so the
            // existing dir's PARENT must equal the configured root —
            // compared as whole path segments (a startsWith would accept
            // the sibling /ckpt-old for /ckpt) and by scheme when the
            // option specifies one (hdfs://ns1/x vs file:/x differ even
            // with equal paths)
            val want = new org.apache.hadoop.fs.Path(dir)
            val parent = Option(new org.apache.hadoop.fs.Path(existing).getParent)
            val matches = parent.exists { p =>
              p.toUri.getPath.stripSuffix("/") ==
                want.toUri.getPath.stripSuffix("/") &&
              Option(want.toUri.getScheme)
                .forall(s => Option(p.toUri.getScheme).contains(s))
            }
            if (!matches)
              System.err.println(
                s"[graft] WARN Checkpoints.pin: $DirKey=$dir but the " +
                s"SparkContext checkpoint dir is already $existing — " +
                "pins continue to the existing dir (a context's " +
                "checkpoint dir cannot be changed after first use)")
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** Stats-based partition target for a pinned iteration substrate:
    * ceil(optimizer-estimated bytes / bytesPerPartition), floor 1. None
    * when the optimizer has no usable estimate (unknown sizes propagate
    * as defaultSizeInBytes ≈ Long.Max through joins over pinned RDDs) —
    * callers keep the current partitioning then.
    *
    * The default threshold is deliberately SMALL (256 KB of estimated —
    * i.e. compressed-parquet-derived — bytes per task): the estimate
    * undercounts both the decoded width and the per-round COMPUTE over
    * a row (tokenize/bucket/dot-product), so an aggressive value
    * serializes CPU-bound iteration rounds onto a few cores. Measured:
    * a 32 MB/partition target coalesced the 32×-scale classifier design
    * (19 MB compressed, 160k docs) to ONE partition and took q206b from
    * ~11 s to 85 s — 40 gradient rounds on one core. 256 KB only fires
    * when tasks are too small to amortize their own launch. */
  def sizeMatchedParts(df: DataFrame,
                       bytesPerPartition: Long = 256L << 10): Option[Int] = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= 0 || bytes >= BigInt(Long.MaxValue) / 4) None
    else Some(((bytes + bytesPerPartition - 1) / bytesPerPartition)
      .min(1 << 20).toInt.max(1))
  }

  /** [[pin]], with the substrate first coalesced to a size-matched
    * partition count. An iterative operator re-reads its pinned
    * substrate EVERY round; when the substrate is small (a design
    * matrix, an edge fringe) but scan-rooted over many files, each round
    * otherwise schedules one task per file for kilobytes of work — 40
    * rounds × 32 file-tasks was the measured q206b overhead at 1×
    * many-files. Coalesce only ever REDUCES partitions (a 100 TB
    * substrate keeps its scan parallelism: size-matched count exceeds
    * the current one and the clamp is a no-op), so big-data behavior is
    * unchanged. NOT for range-partitioned substrates ([[graft.operators.
    * Ranks]]) — coalesce would merge the sampler's boundaries. */
  def pinCompact(df: DataFrame,
                 bytesPerPartition: Long = 256L << 10): DataFrame =
    sizeMatchedParts(df, bytesPerPartition) match {
      case Some(n) if n < df.rdd.getNumPartitions => pin(df.coalesce(n))
      case _ => pin(df)
    }
}
