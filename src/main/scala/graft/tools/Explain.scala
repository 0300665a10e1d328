package graft.tools

import graft._

/** Prints the FULL formatted executed plan for the named queries (the
  * per-query drill-down behind PlanAudit's one-line summary). Usage:
  *   sbt "runMain graft.tools.Explain q143_semantic_contamination"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val exec = df.queryExecution.executedPlan
      exec.execute().count() // finalize AQE on this instance
      println(s"==== $name ====")
      println(exec.toString)
    }
    spark.stop()
  }
}
