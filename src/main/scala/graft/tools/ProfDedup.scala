package graft.tools
// Profiling harness for the dedup hot path.
import graft._
import graft.functions.TextFns
import org.apache.spark.sql.functions._

object ProfDedup {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("tokens materialized") {
      docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .agg(sum(size(col("toks")))).head.getLong(0)
    }
    val toksDf = docs.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    time("staged: toks->shingles") {
      toksDf.select(col("doc_id"), TextFns.shinglesFromTokens(col("toks"), 3).as("sh"))
        .agg(sum(size(col("sh")))).head.getLong(0)
    }
    val shDf = toksDf.select(col("doc_id"), TextFns.shinglesFromTokens(col("toks"), 3).as("sh"))
    time("staged: sh->hashes") {
      shDf.select(col("doc_id"), TextFns.shingleHashes(col("sh")).as("hs"))
        .agg(sum(size(col("hs")))).head.getLong(0)
    }
    val hsDf = shDf.select(col("doc_id"), TextFns.shingleHashes(col("sh")).as("hs"))
    time("staged: hashes->sig k=32") {
      hsDf.select(col("doc_id"), TextFns.minhashFromHashes(col("hs"), 32).as("sig"))
        .agg(sum(size(col("sig")))).head.getLong(0)
    }
    println("--- explain of staged sig plan:")
    hsDf.select(col("doc_id"), TextFns.minhashFromHashes(col("hs"), 32).as("sig"))
      .explain("formatted")
    spark.stop()
  }
}
