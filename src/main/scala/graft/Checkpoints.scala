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
        // once so all pins of a session share one checkpoint root
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
