package graft

import graft.llm.{Bpe, Clusters, Dedup}
import graft.operators.Ranks
import org.apache.spark.sql.functions._

/** The `graft.checkpointDir` option switches every iterative pin from
  * localCheckpoint to durable checkpoint ([[Checkpoints]]). These cases
  * run the three iterative operator families in BOTH modes and assert
  * bit-identical results — the option changes failure recovery, never
  * values or plan shapes.
  */
class CheckpointModeSpec extends SparkSpecBase {
  import spark.implicits._

  private def withDurable[T](body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try body
    finally {
      spark.conf.unset(Checkpoints.DirKey)
      // the context checkpoint dir sticks for the JVM; harmless for other
      // suites (pin() only uses it when the option is set)
    }
  }

  test("connectedComponents identical in local and durable checkpoint modes") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b")
    def run() = Clusters.connectedComponents(
        docs.select("doc_id"), "doc_id", pairs, "doc_a", "doc_b")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val local = run()
    val durable = withDurable(run())
    assert(local == durable)
    assert(local.nonEmpty)
  }

  test("pinCompact: a tiny many-file substrate coalesces, values " +
      "identical; stats-blind plans keep their partitioning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pc").toString
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(32).write.parquet(s"$dir/many")
    val src = spark.read.parquet(s"$dir/many")
    // split packing may already bundle the 32 tiny files; the coalesce
    // must still reduce below whatever the scan produced
    val before = src.rdd.getNumPartitions
    assert(before > 1, s"fixture degenerate: $before scan partitions")
    // ~8 KB total → far below 256 KB/task: coalesce fires
    val compact = Checkpoints.pinCompact(src)
    assert(compact.rdd.getNumPartitions < before,
      s"tiny substrate kept ${compact.rdd.getNumPartitions} of $before")
    assert(compact.orderBy("id").collect().map(_.toSeq).toSeq ===
      Checkpoints.pin(src).orderBy("id").collect().map(_.toSeq).toSeq)
    // REDUCTION ONLY: a substrate whose size-matched count meets or
    // exceeds its current partitioning is left alone — the contract
    // that keeps a 100 TB substrate's scan parallelism intact. Force it
    // with a tiny per-task threshold instead of a big fixture.
    val big = src.repartition(3)
    val keptN = Checkpoints.pinCompact(big, bytesPerPartition = 1L)
      .rdd.getNumPartitions
    assert(keptN === 3, s"reduction-only violated: 3 -> $keptN")
  }

  test("globalRowNumber and globalCumSum identical in both modes") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    def rn() = Ranks.globalRowNumber(docs, Seq(col("len").desc, col("doc_id")), "rn")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    def cs() = Ranks.globalCumSum(docs, Seq(col("doc_id")), col("len"), "cum")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val (rnLocal, csLocal) = (rn(), cs())
    val (rnDurable, csDurable) = withDurable((rn(), cs()))
    assert(rnLocal == rnDurable)
    assert(csLocal == csDurable)
  }

  test("pageRankFixedPoint identical in local and durable checkpoint modes") {
    val nodes = (1L to 12L).toDF("id")
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 5L -> 6L,
      6L -> 7L, 8L -> 9L).toDF("a", "b")
    def run() = Clusters.pageRankFixedPoint(nodes, "id", pairs, "a", "b",
        iters = 5)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val local = run()
    val durable = withDurable(run())
    assert(local == durable)
    assert(local.size == 12)
  }

  test("composed curation pipeline (q127 shape) identical in both modes") {
    // the heaviest pin consumer: exact/pairs/nearKept/clfKept/selected
    // plus CC's per-round pins and the two cumsum range-pins all flip to
    // durable checkpoints under the option — values must not move
    val docs = Tables.documents(spark, sf)
    def run() = graft.llm.Curation.pipeline(docs, "doc_id", "text",
        lmRef = docs.filter(col("doc_id") < 250),
        tokenBudget = 15000, seqLen = 512).packed
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val local = run()
    val durable = withDurable(run())
    assert(local == durable)
    assert(local.nonEmpty)
  }

  test("trainMerges identical in both modes") {
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    def run() = Bpe.trainMerges(corpus, "text", 4)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val local = run()
    val durable = withDurable(run())
    assert(local == durable)
    assert(local.size == 4)
  }
}
