package graft.tools
import graft._
import graft.llm.Dedup

object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).explain("formatted")
    spark.stop()
  }
}
