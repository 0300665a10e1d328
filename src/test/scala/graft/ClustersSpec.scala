package graft

import graft.llm.Clusters
import org.apache.spark.sql.functions._

/** Connected-components / duplicate-cluster guarantees on hand-built graphs
  * (the oracle covers the embeddings-derived case end-to-end in q62). */
class ClustersSpec extends SparkSpecBase {
  import spark.implicits._

  private def nodes(ids: Long*) = ids.toDF("id")
  private def edges(ps: (Long, Long)*) = ps.toDF("a", "b")

  test("connectedComponents labels every node with its component minimum") {
    // components: {1,2,3} via chain, {5,6}, singletons 4 and 7
    val cc = Clusters.connectedComponents(
        nodes(1, 2, 3, 4, 5, 6, 7), "id",
        edges(1L -> 2L, 2L -> 3L, 5L -> 6L), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connectedComponents converges on a long path (diameter > 2 rounds)") {
    val path = (1L until 10L).map(i => i -> (i + 1))
    val cc = Clusters.connectedComponents(
        nodes(1L to 10L: _*), "id", edges(path: _*), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(1L))
  }

  test("duplicateClusters drops singletons and sizes clusters correctly") {
    val dc = Clusters.duplicateClusters(
        nodes(1, 2, 3, 4, 5, 6, 7), "id",
        edges(1L -> 2L, 2L -> 3L, 5L -> 6L), "a", "b")
      .collect()
      .map(r => r.getAs[Long]("cluster_rep") ->
        (r.getAs[Long]("cluster_size"), r.getAs[Long]("max_member"))).toMap
    assert(dc == Map(1L -> (3L, 3L), 5L -> (2L, 6L)))
  }

  test("non-convergence within maxIters fails loudly, never returns partial labels") {
    val path = (1L until 10L).map(i => i -> (i + 1))
    val e = intercept[IllegalStateException] {
      Clusters.connectedComponents(nodes(1L to 10L: _*), "id",
        edges(path: _*), "a", "b", maxIters = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("edge direction and duplicate edges do not change components") {
    val a = Clusters.connectedComponents(nodes(1, 2, 3), "id",
      edges(1L -> 2L, 2L -> 3L), "a", "b")
    val b = Clusters.connectedComponents(nodes(1, 2, 3), "id",
      edges(2L -> 1L, 2L -> 3L, 3L -> 2L, 1L -> 2L), "a", "b")
    assert(a.orderBy("id").collect().toSeq == b.orderBy("id").collect().toSeq)
  }

  test("accelerated (pointer-jumping) mode: identical labels, log-diameter rounds") {
    // random graphs: both modes agree exactly
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val n = 40
      val es = (for (a <- 0L until n; b <- (a + 1) until n) yield (a, b))
        .filter(_ => rnd.nextInt(100) < 5)
      val ns = nodes(0L until n: _*)
      val base = Clusters.connectedComponents(ns, "id", edges(es: _*), "a", "b",
        maxIters = 40).orderBy("id").collect().map(_.toSeq).toSeq
      val acc = Clusters.connectedComponents(ns, "id", edges(es: _*), "a", "b",
        maxIters = 40, accelerated = true).orderBy("id").collect().map(_.toSeq).toSeq
      assert(base == acc)
    }
    // a 31-node path (diameter 30): plain min-propagation cannot converge
    // in 8 rounds; pointer jumping contracts the chain exponentially
    val path = (1L until 31L).map(i => i -> (i + 1))
    intercept[IllegalStateException] {
      Clusters.connectedComponents(nodes(1L to 31L: _*), "id",
        edges(path: _*), "a", "b", maxIters = 8).collect()
    }
    val fast = Clusters.connectedComponents(nodes(1L to 31L: _*), "id",
      edges(path: _*), "a", "b", maxIters = 8, accelerated = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.values.toSet == Set(1L), "whole path is one component labeled 1")
  }

  // ---- pageRankFixedPoint ---------------------------------------------

  /** Independent reference: the same fixed-point update in plain Scala
    * over an adjacency map (no Spark) — what the DataFrame loop must
    * reproduce bit-for-bit. */
  private def refPageRank(ids: Seq[Long], es: Seq[(Long, Long)],
                          iters: Int): Map[Long, Long] = {
    val sym = (es ++ es.map(_.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    var r = ids.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val recv = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, vs) <- adj; v <- vs) recv(v) += (85L * r(u)) / (100L * deg(u))
      r = ids.map(id => id -> (150000000L + recv(id))).toMap
    }
    r
  }

  test("pageRankFixedPoint matches the plain-Scala reference on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 25L
      val ids = 0L until n
      val es = (for (a <- 0L until n; b <- (a + 1) until n) yield (a, b))
        .filter(_ => rnd.nextInt(100) < 8)
      val got = Clusters.pageRankFixedPoint(nodes(ids: _*), "id",
          edges(es: _*), "a", "b", iters = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPageRank(ids, es, 5), s"trial $trial")
    }
  }

  test("pageRankFixedPoint invariants: regular graphs uniform, isolated = base") {
    // triangle (2-regular): mass flows symmetrically, every rank stays
    // exactly scale; isolated node 9 holds the teleport base
    val out = Clusters.pageRankFixedPoint(nodes(1, 2, 3, 9), "id",
        edges(1L -> 2L, 2L -> 3L, 1L -> 3L), "a", "b", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1000000000L && out(2L) == 1000000000L && out(3L) == 1000000000L)
    assert(out(9L) == 150000000L)
    // star: the hub outranks leaves, and floors only ever LOSE mass
    val star = Clusters.pageRankFixedPoint(nodes(1, 2, 3, 4), "id",
        edges(1L -> 2L, 1L -> 3L, 1L -> 4L), "a", "b", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star(1L) > star(2L) && star(2L) == star(3L) && star(3L) == star(4L))
    assert(star.values.sum <= 4L * 1000000000L)
  }

  test("canonical-by-rank composition picks the hub, not the min id (q126 shape)") {
    // star centered on 3 with satellites 1,2,4: min-id convention (q94)
    // would keep 1; rank-argmax keeps the hub 3
    val ns = nodes(1, 2, 3, 4, 9)
    val es = edges(3L -> 1L, 3L -> 2L, 3L -> 4L)
    val cc = Clusters.connectedComponents(ns, "id", es, "a", "b")
    val pr = Clusters.pageRankFixedPoint(ns, "id", es, "a", "b", iters = 5)
    val j = cc.join(pr, "id")
    val canon = j.groupBy(col("cluster_rep"))
      .agg(max(struct(col("rank_fp").as("r"), col("id").as("i"))).as("m"))
      .select(col("cluster_rep"), col("m.i").as("canonical_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon(1L) == 3L)   // cluster labeled by min id 1, canonical = hub 3
    assert(canon(9L) == 9L)   // isolated node is its own canonical
  }

  test("pageRankFixedPoint is partitioning-independent (integer arithmetic)") {
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 5L -> 6L)
    val a = Clusters.pageRankFixedPoint(nodes(1L to 7L: _*), "id",
      edges(es: _*), "a", "b", iters = 5).orderBy("id").collect().toSeq
    val b = Clusters.pageRankFixedPoint(nodes(1L to 7L: _*).repartition(13), "id",
      edges(es: _*).repartition(17), "a", "b", iters = 5)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
