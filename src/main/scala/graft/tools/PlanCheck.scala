package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Plan-shape predicates shared by the PlanAudit CLI and the regression
  * specs. Traverses across AQE boundaries (AdaptiveSparkPlanExec /
  * QueryStageExec wrap their real subplans in fields, not `children`). */
object PlanCheck {
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case o                        => o.children
    }
    p +: inner.flatMap(walk)
  }

  /** Window operators whose partition spec is empty — i.e. every row is
    * forced through ONE task (an `Exchange SinglePartition` + global sort).
    * Benign over bounded inputs (a per-day aggregate); a scale-killer over
    * anything fact-sized. [[graft.operators.Ranks]] is the exact
    * distributed replacement. */
  def unpartitionedWindows(df: DataFrame): Seq[SparkPlan] = {
    val exec = df.queryExecution.executedPlan
    exec.execute().count() // finalize AQE on THIS instance (clone-free)
    walk(exec).filter {
      case w: WindowExec           => w.partitionSpec.isEmpty
      case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
      case _                       => false
    }
  }

  /** A subtree that provably produces at most one row: a global
    * (groupless) aggregate or a LIMIT ≤ 1 at the TOP of the build side,
    * looking through row-preserving/reducing single-child wrappers
    * (project/filter/exchange/sort/codegen/AQE shells). This is exactly
    * the shape of the engine's intentional scalar broadcasts
    * (`crossJoin(broadcast(df.agg(...)))` — q65's audit counters, q82's
    * corpus size, q115's one-row sketch). Deliberately NOT an
    * anywhere-below `exists`: a fact-sized build side would pass that
    * test whenever any scalar aggregate appears deeper in its subtree
    * (e.g. fact ⨯ (fact ⨯ broadcast(scalar))), which is precisely the
    * quadratic regression this gate exists to catch. */
  private def oneRowBounded(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case g: GlobalLimitExec   => g.limit <= 1
    case a: AdaptiveSparkPlanExec => oneRowBounded(a.executedPlan)
    case q: QueryStageExec        => oneRowBounded(q.plan)
    // a REUSED broadcast/shuffle of a one-row aggregate is still one row
    // (ReusedExchangeExec is leaf-like — its source plan lives in .child)
    case r: ReusedExchangeExec    => oneRowBounded(r.child)
    // scalar × scalar = scalar: a keyless join of two one-row sides (the
    // `broadcast(aggA).crossJoin(broadcast(aggB))` totals idiom) stays
    // one row — each side must prove out independently
    case j: BroadcastNestedLoopJoinExec =>
      oneRowBounded(j.left) && oneRowBounded(j.right)
    case j: CartesianProductExec =>
      oneRowBounded(j.left) && oneRowBounded(j.right)
    case o if o.children.size == 1 && passThrough(o) => oneRowBounded(o.children.head)
    case _ => false
  }

  /** Single-child physical wrappers that never increase row count. */
  private def passThrough(p: SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    n.startsWith("Project") || n.startsWith("Filter") ||
      n.contains("Exchange") || n.startsWith("Sort") ||
      n.startsWith("WholeStageCodegen") || n == "InputAdapter" ||
      n.startsWith("AQEShuffleRead") || n.startsWith("Coalesce") ||
      n.startsWith("LocalLimit") || n.startsWith("ColumnarToRow")
  }

  /** Files actually planned by `df`'s scans — the file-count pruning
    * gate. Executes THIS QueryExecution instance and sums `numFiles`
    * across its file scans. The naive
    * `df.foreachPartition(...); df.queryExecution.executedPlan...metrics`
    * pattern is SILENTLY VACUOUS: Dataset actions run through a separate
    * `rddQueryExecution`, so the inspected plan's metrics never fill and
    * the gate reads 0 — `exec.execute().count()` runs the inspected
    * instance itself (the clone-free idiom above). */
  def filesRead(df: DataFrame): Long = {
    val exec = df.queryExecution.executedPlan
    exec.execute().count()
    walk(exec).collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        sc.metrics("numFiles").value
    }.sum
  }

  /** [[filesRead]] restricted to the TABLE's data scans: deletion-vector
    * sidecar scans (rooted under `data/dv-` dirs) are excluded — a dv'd
    * read legitimately opens every live sidecar whatever the partition
    * filter, so a partition-pruning gate over a dv'd table must measure
    * the data scan alone or the constant sidecar term drowns the signal. */
  def dataFilesRead(df: DataFrame): Long = {
    val exec = df.queryExecution.executedPlan
    exec.execute().count()
    walk(exec).collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if !sc.relation.location.rootPaths
            .exists(_.toString.contains("/data/dv-")) =>
        sc.metrics("numFiles").value
    }.sum
  }

  /** True iff `df` is a PINNED materialization (Checkpoints.pin): its
    * logical plan is an RDD scan, so the subtree that produced it ran
    * exactly once — at pin time — and NO consumer can re-trigger it.
    * This is the mechanical form of the multi-reference rule ("pin any
    * derived table referenced twice"): CurationSpec asserts it on the
    * composed pipeline's pair set (the q125 double-mining trap). */
  def isPinned(df: DataFrame): Boolean =
    df.queryExecution.logical.getClass.getSimpleName == "LogicalRDD"

  /** Join operators with NO join keys whose build/either side is not a
    * provably-bounded scalar — a CartesianProduct over two fact-sized
    * inputs, or a BroadcastNestedLoopJoin broadcasting something that
    * isn't one row. Both are quadratic-blowup regressions at 100 TB; the
    * one-row-agg broadcasts the engine uses on purpose are allowed by
    * the [[oneRowBounded]] shape test rather than a name allow-list. */
  def unboundedJoins(df: DataFrame): Seq[SparkPlan] = {
    val exec = df.queryExecution.executedPlan
    exec.execute().count() // finalize AQE on THIS instance (clone-free)
    walk(exec).filter {
      case j: CartesianProductExec =>
        !(oneRowBounded(j.left) || oneRowBounded(j.right))
      case j: BroadcastNestedLoopJoinExec =>
        val build = j.buildSide match {
          case BuildRight => j.right
          case BuildLeft  => j.left
        }
        !oneRowBounded(build)
      case _ => false
    }
  }
}
