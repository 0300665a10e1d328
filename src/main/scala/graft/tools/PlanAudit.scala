package graft.tools

import graft._

/** Prints a compact physical-plan audit for the headline queries:
  * exchanges (shuffles), broadcasts, scans with pushed filters, codegen
  * spans. Run at sf0.01/sf0.1 to eyeball 100-TB posture (SURVEY §7.4.11).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.count()  // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
        .findAllIn(plan).size
      val bcasts = "BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoop".r
        .findAllIn(plan).toSeq.count(_ == "BroadcastHashJoin")
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).map(identity).toSet.size
      println(f"$name%-28s shuffles=$shuffles%-3d bhj=$bcasts%-3d smj=$smj%-3d codegenSpans=$wsc")
    }
    spark.stop()
  }
}
