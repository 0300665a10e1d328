package graft.tools

import graft._
import graft.operators.Baskets

object ProfPairs {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val items = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    time("warmup") { items.count() }
    time("self-join pairs") {
      Baskets.pairFrequencies(Baskets.pairs(items, "l_orderkey", "l_partkey")).count()
    }
    time("self-join again") {
      Baskets.pairFrequencies(Baskets.pairs(items, "l_orderkey", "l_partkey")).count()
    }
    time("generator pairs") {
      Baskets.pairFrequencies(Baskets.pairsViaGenerator(items, "l_orderkey", "l_partkey")).count()
    }
    time("generator again") {
      Baskets.pairFrequencies(Baskets.pairsViaGenerator(items, "l_orderkey", "l_partkey")).count()
    }
    spark.stop()
  }
}
