package graft.tools
import graft._
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val df = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
    val exec = df.queryExecution.executedPlan
    exec.execute().count()
    println("PLAN_START")
    println(exec.toString)
    println("PLAN_END")
    spark.stop()
  }
}
