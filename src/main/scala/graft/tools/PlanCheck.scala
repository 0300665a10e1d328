package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
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
}
