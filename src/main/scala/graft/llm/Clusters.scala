package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-duplicate PAIRS (the output of
  * [[Dedup.ngramJaccardPairs]] / [[Dedup.minhashLshPairs]] /
  * [[Similarity.nearDuplicatePairs]]) into connected components, so a
  * curation pipeline can keep ONE representative per duplicate cluster —
  * the step the pair-miners feed in a real training-data dedup
  * (pairs → clusters → keep min-id doc, drop the rest).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the min label across itself and
  * its neighbors; converges in O(component diameter) rounds. Near-dup
  * components are tiny and dense (duplicates of one document), so the
  * diameter is small — the driver only ever sees a one-long convergence
  * counter per round, never the data. Each round is one broadcast-or-shuffle
  * join keyed on the node id; at 100 TB this is the standard
  * label-propagation loop (GraphX/GraphFrames connectedComponents does the
  * same with more machinery).
  */
object Clusters {

  /** Connected components over an undirected pair list.
    *
    * @param nodes df with one id column `idCol` (every node, incl. isolated)
    * @param pairs df with two id columns (`aCol`, `bCol`), one row per edge
    * @return (idCol, cluster_rep) — cluster_rep = min node id reachable
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20): DataFrame = {
    // symmetric edge list, cached: reused every round
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .cache()
    // Propagate only over nodes that touch an edge: isolated nodes can
    // never change label, so they are attached (lbl = id) in one anti-join
    // AFTER convergence. The loop's working set is O(|edge endpoints|),
    // not O(|corpus|) — in a dedup pipeline edges are the rare near-dups,
    // so this is the difference between iterating over a 100 TB corpus
    // and iterating over its duplicate fringe.
    // localCheckpoint each round, NOT cache: caching keeps the logical plan,
    // which doubles in size every iteration (the next round's joins re-embed
    // it) until analysis itself OOMs; checkpointing truncates lineage to the
    // materialized RDD. Same rule a 1000-executor iterative job follows —
    // there with checkpoint() to durable storage for executor-loss recovery.
    // Superseded rounds' checkpoint blocks are released asynchronously by
    // Spark's ContextCleaner once the dropped `labels` reference is GC'd —
    // at most a few round's worth of the (id, lbl) table is ever live.
    // Round 0 for free: initialize each endpoint to min(self, min neighbor)
    // with ONE aggregation over the symmetric edge list — the first
    // propagation round without its join. Any init that is ≥ the final
    // label and ≤ self is valid for min-label propagation; this one ends
    // diameter-≤1 components (the bulk of near-dup clusters) before the
    // loop's first convergence check.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("id"), least(col("id"), col("__mn")).as("lbl"))
      .localCheckpoint(eager = true)
    var converged = false
    var iter = 0
    try {
      while (!converged && iter < maxIters) {
        // min label among each node's neighbors...
        val fromNeighbors = edges
          .join(labels, edges("src") === labels("id"))
          .groupBy(col("dst").as("id2")).agg(min(col("lbl")).as("nlbl"))
        // ...folded with the node's own label; the convergence flag rides
        // along in the SAME pass (one checkpoint + one cheap scan per
        // round, no separate old-vs-new join job)
        val next = labels
          .join(fromNeighbors, labels("id") === col("id2"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
            (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
          .localCheckpoint(eager = true)
        converged = next.filter(col("chg")).limit(1).count() == 0
        labels = next.drop("chg")
        iter += 1
      }
    } finally edges.unpersist()
    // partially-propagated labels would silently split one component into
    // several "clusters" — fail loudly instead (same posture as the
    // packing guards in Dedup): callers with genuinely deep graphs raise
    // maxIters (rounds needed = component diameter).
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters rounds; " +
        "a component's diameter exceeds maxIters — raise it")
    val isolated = nodes.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left_anti")
      .withColumn("lbl", col("id"))
    labels.unionByName(isolated)
      .select(col("id").as(idCol), col("lbl").as("cluster_rep"))
  }

  /** Triangle enumeration over an oriented near-dup pair list (`aCol` <
    * `bCol` per row, the miners' output convention) — the dedup-QA
    * metric: a high triangle density inside a candidate cluster means the
    * pair evidence is mutually consistent (true duplicate cliques close
    * their triangles; chains of borderline matches don't). Standard
    * wedge-then-close plan: self-join edges on the shared middle vertex
    * (a<b ⋈ b<c gives each wedge exactly once, already ordered a<b<c),
    * then a semi-join probes the closing (a,c) edge — two equi-joins
    * keyed on vertices, no all-pairs stage. At scale, orientation caps
    * fan-out by the same hot-vertex logic as the miners' `maxDocFreq`
    * (orient by degree instead of id to bound the worst wedge set —
    * id-orientation is kept here because the miners already emit id
    * order, and dedup-graph degrees are cap-bounded upstream). */
  def triangles(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    val wedges = e.join(e.select(col("a").as("__m"), col("b").as("c")),
      col("b") === col("__m"))
    wedges.join(e.select(col("a").as("__ca"), col("b").as("__cb")),
        col("a") === col("__ca") && col("c") === col("__cb"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }

  /** End-to-end cluster summary: components + per-cluster size, one row per
    * MULTI-document cluster (singletons are not duplicates). */
  def duplicateClusters(nodes: DataFrame, idCol: String,
                        pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(nodes, idCol, pairs, aCol, bCol)
      .groupBy("cluster_rep")
      .agg(count(lit(1)).as("cluster_size"), max(col(idCol)).as("max_member"))
      .filter(col("cluster_size") >= 2)
}
