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
      // run the physical plan instance itself — count()/write would clone
      // the QueryExecution and leave THIS plan un-finalized (no AQE result,
      // no codegen markers)
      val exec = df.queryExecution.executedPlan
      exec.execute().count()
      // toString carries "== Final Plan ==" AND "== Initial Plan ==" — audit
      // only the final (post-AQE) section; codegen spans print as *(n)
      val full = exec.toString
      val plan = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i  => full.substring(0, i)
      }
      val shuffles = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
        .findAllIn(plan).size
      val bcasts = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(f"$name%-28s shuffles=$shuffles%-3d bhj=$bcasts%-3d smj=$smj%-3d codegenSpans=$wsc")
    }
    spark.stop()
  }
}
