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
  /** @param accelerated add a POINTER-JUMPING step per round (each node
    *   also adopts its current label's label): convergence drops from
    *   O(diameter) to O(log diameter) rounds — the difference between 20
    *   and 5 joins on a chain-shaped component. Costs one extra join per
    *   round, which near-dup graphs (tiny dense components, diameter ≤
    *   2-3) don't need — hence opt-in; results are identical either way
    *   (ClustersSpec property-checks it, incl. on long chains). */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20,
                          accelerated: Boolean = false): DataFrame = {
    // symmetric edge list, cached: reused every round. Built with ONE
    // explode rather than a two-branch union — a union would reference
    // the `pairs` subtree twice and Spark executes each branch separately
    // (no cross-branch subtree reuse), doubling a possibly-expensive
    // upstream pair-mining pipeline.
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .cache()
    // Propagate only over nodes that touch an edge: isolated nodes can
    // never change label, so they are attached (lbl = id) in one anti-join
    // AFTER convergence. The loop's working set is O(|edge endpoints|),
    // not O(|corpus|) — in a dedup pipeline edges are the rare near-dups,
    // so this is the difference between iterating over a 100 TB corpus
    // and iterating over its duplicate fringe.
    // Checkpoints.pin each round, NOT cache: caching keeps the logical plan,
    // which doubles in size every iteration (the next round's joins re-embed
    // it) until analysis itself OOMs; checkpointing truncates lineage to the
    // materialized RDD. Set graft.checkpointDir for the durable-storage
    // variant a 1000-executor run wants (executor-loss recovery).
    // Local mode: superseded rounds' checkpoint blocks are released
    // asynchronously by Spark's ContextCleaner once the dropped `labels`
    // reference is GC'd — at most a few rounds' worth of the (id, lbl)
    // table is ever live. Durable mode: see the retention note on
    // graft.Checkpoints (cleanCheckpoints flag or a storage TTL).
    // Round 0 for free: initialize each endpoint to min(self, min neighbor)
    // with ONE aggregation over the symmetric edge list — the first
    // propagation round without its join. Any init that is ≥ the final
    // label and ≤ self is valid for min-label propagation; this one ends
    // diameter-≤1 components (the bulk of near-dup clusters) before the
    // loop's first convergence check.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("id"), least(col("id"), col("__mn")).as("lbl"))
      .transform(graft.Checkpoints.pin)
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
        val stepped = labels
          .join(fromNeighbors, labels("id") === col("id2"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("m"),
            col("lbl").as("old"))
        // pointer jump: adopt the label's OWN label too. Every label is a
        // node id that touches an edge (labels are mins over edge
        // endpoints), so the lookup join always hits.
        val next = (if (!accelerated) stepped.select(col("id"), col("m"), col("old"))
          else {
            val byId = labels.select(col("id").as("__jid"), col("lbl").as("__jlbl"))
            stepped.join(byId, col("m") === col("__jid"), "left")
              .select(col("id"),
                least(col("m"), coalesce(col("__jlbl"), col("m"))).as("m"),
                col("old"))
          })
          .select(col("id"), col("m").as("lbl"), (col("m") < col("old")).as("chg"))
          .transform(graft.Checkpoints.pin)
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
    // The wedge-then-close join references the edge list THREE times, and
    // Spark recomputes an unmaterialized subtree once per reference — fed
    // by a pair-mining pipeline that tripled the dominant cost (measured
    // 25.7 s -> ~9 s at 32x on q104). The pair list is the SMALL derived
    // artifact (near-dup pairs, not the corpus), so pin it once; a real
    // pipeline persists this table anyway.
    val e = graft.Checkpoints.pin(pairs.select(col(aCol).as("a"), col(bCol).as("b")))
    val wedges = e.join(e.select(col("a").as("__m"), col("b").as("c")),
      col("b") === col("__m"))
    wedges.join(e.select(col("a").as("__ca"), col("b").as("__cb")),
        col("a") === col("__ca") && col("c") === col("__cb"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }

  /** [[triangles]] with DEGREE orientation — the worst-case-bounded
    * variant the id-oriented scaladoc points at: every edge is directed
    * from its lower-(degree, id) endpoint to the higher one, so each
    * triangle is produced exactly once from its π-smallest vertex and a
    * vertex's wedge fan-out is its OUT-degree under the orientation,
    * which is O(√m) on any graph (a vertex with out-degree d has d
    * higher-degree neighbors, each of degree ≥ d, so d² ≤ 2m). Total
    * wedge work is therefore O(m^1.5) regardless of hot vertices —
    * id-orientation hits C(deg,2) on an unlucky low-id hub and relies on
    * the upstream miners' caps instead. Costs one extra degree
    * aggregation + two joins over [[triangles]]; same output set
    * (ClustersSpec property-checks the equivalence on random graphs).
    *
    * @param pairs undirected edge list, `aCol` < `bCol` per row */
  def trianglesByDegree(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // pinned for the same multi-reference reason as [[triangles]] (degree
    // agg + orientation join + the three-way wedge join all read it)
    val e0 = graft.Checkpoints.pin(
      pairs.select(col(aCol).as("u"), col(bCol).as("v")))
    val deg = e0.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val withD = e0
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    // π(v) = (degree, id); orient every edge π-ascending. The target's π
    // rides along so the wedge join can order the two out-neighbors.
    val oriented = withD.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("s"), col("v").as("t"),
          struct(col("dv").as("d"), col("v").as("id")).as("pt")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"),
            struct(col("du").as("d"), col("u").as("id")).as("pt"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.pt").as("pt"))
    // wedges at the π-smallest vertex: two out-edges, neighbors π-ordered
    // so each unordered pair appears once; close on the oriented third edge
    val w = oriented.select(col("s"), col("t").as("t1"), col("pt").as("p1"))
      .join(oriented.select(col("s"), col("t").as("t2"), col("pt").as("p2")), "s")
      .filter(col("p1") < col("p2"))
    val closed = w.join(
      oriented.select(col("t").as("__ct"), col("s").as("__cs")),
      col("t1") === col("__cs") && col("t2") === col("__ct"), "left_semi")
    closed.select(
      element_at(array_sort(array(col("s"), col("t1"), col("t2"))), 1).as("a"),
      element_at(array_sort(array(col("s"), col("t1"), col("t2"))), 2).as("b"),
      element_at(array_sort(array(col("s"), col("t1"), col("t2"))), 3).as("c"))
  }

  /** Fixed-point integer PageRank over an undirected pair list — the
    * graph-centrality ranking a dedup pipeline uses to pick the CANONICAL
    * document of a near-dup neighborhood (the most-connected member, not
    * just the min id) and to rank boilerplate hubs for inspection.
    *
    * Determinism is the design driver: float PageRank drifts across
    * engines and partitionings (sum order), so ranks are BIGINT fixed
    * point at `scale` = 1.0. Update per round, all integer:
    * `r'(v) = floor(scale·(1−d)) + Σ_{u→v} floor(d_num·r(u) / (d_den·deg(u)))`
    * with d = d_num/d_den = 0.85. Integer sums are associative-exact, so
    * the result is bit-identical on any partitioning and any engine
    * (DuckDB mirrors with `//`; both floor-divide non-negative values).
    * No dangling-mass redistribution: the symmetric edge list gives every
    * edge-touching node out-degree ≥ 1, and isolated nodes hold the
    * teleport base — the standard simplification for undirected graphs.
    *
    * Scale shape: the edge list (with out-degree attached once) is
    * pinned and reused every round; each of the FIXED `iters` rounds is
    * one join keyed on the node id + one map-side-combining sum keyed on
    * the destination — the label-propagation loop's cost model, with
    * lineage truncated per round via [[graft.Checkpoints.pin]]. Driver
    * sees nothing but the loop counter. Overflow headroom: ranks are
    * bounded by total mass ≈ N·scale, so d_num·r fits a long for
    * N·scale ≪ 2^63/d_num (10^8 nodes at the default scale). */
  def pageRankFixedPoint(nodes: DataFrame, idCol: String,
                         pairs: DataFrame, aCol: String, bCol: String,
                         iters: Int = 5, scale: Long = 1000000000L,
                         dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 1 && scale > 0 && dampNum >= 0 && dampDen > dampNum)
    // pin the symmetric edge list BEFORE deriving degrees: the degree agg
    // and the degree join both reference it, and two unmaterialized
    // references re-run the (possibly expensive) upstream pair-mining
    // pipeline twice (the triangles multi-reference lesson)
    val sym = graft.Checkpoints.pinCompact(pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct())
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = graft.Checkpoints.pin(sym.join(deg, "src"))
    val base = scale * (dampDen - dampNum) / dampDen
    val ids = nodes.select(col(idCol).as("id"))
    var ranks = ids.select(col("id"), lit(scale).as("r"))
    (1 to iters).foreach { _ =>
      val contribs = edges.join(ranks, edges("src") === ranks("id"))
        // integral div (never /: a double quotient is inexact past 2^53)
        .select(col("dst"), expr(s"($dampNum * r) div ($dampDen * deg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = graft.Checkpoints.pin(
        ids.join(contribs, col("id") === col("dst"), "left")
          .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("r")))
    }
    ranks.select(col("id").as(idCol), col("r").as("rank_fp"))
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
