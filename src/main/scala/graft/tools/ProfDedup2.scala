package graft.tools
// End-to-end timing of the dedup query functions + physical plan dumps.
import graft._
import graft.llm.Dedup
import org.apache.spark.sql.functions._

object ProfDedup2 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warmup count") { docs.count() }
    time("q42 ngramJaccard e2e") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    time("q42 again (warm)") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    time("q43 minhashLsh e2e") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 4, 0.7).count()
    }
    time("q43 again (warm)") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 4, 0.7).count()
    }
    time("q44 simhash e2e") {
      Dedup.simhashPairs(docs, "doc_id", "text", 3).count()
    }
    spark.stop()
  }
}
