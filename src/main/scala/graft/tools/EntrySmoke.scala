package graft.tools
import graft._
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_SMOKE rows=$n")
    require(n > 0)
    spark.stop()
  }
}
