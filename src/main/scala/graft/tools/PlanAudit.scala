package graft.tools

import graft._

/** Prints a compact physical-plan audit for the headline queries:
  * exchanges (shuffles), broadcasts, scans with pushed filters, codegen
  * spans. Run at sf0.01/sf0.1 to eyeball 100-TB posture (SURVEY §7.4.11).
  *
  * Also the single-partition-window CI gate: `--windows` sweeps EVERY
  * registered query and exits nonzero if any query outside
  * [[PlanAudit.globalWindowAllowed]] executes a Window with an empty
  * partition spec (a one-task global sort — the 100-TB scale-killer the
  * r3 verdict flagged on q19/q70; both now use
  * [[graft.operators.Ranks]]).
  */
object PlanAudit {
  /** Queries allowed to keep an un-partitioned window: their window input
    * is already a bounded aggregate (rows ≤ group cardinality, not fact
    * cardinality), where a global sort is the right plan. */
  val globalWindowAllowed: Set[String] = Set(
    "q72_moving_average", // input = one row per DAY (bounded by calendar)
    "q73_yoy_growth"      // input = one row per YEAR
  )

  /** Queries allowed to keep a BroadcastNestedLoopJoin: their broadcast
    * side is the ANN QUERY TABLE — one row by the operator contract
    * (`query: a 1-row df`), bounded by the caller's query batch in
    * general. The plan-shape test in [[PlanCheck.unboundedJoins]] can't
    * prove a `filter(vec_id === 0)` is one row, so these are allow-listed
    * by name; everything else must pass the shape test. */
  val broadcastQueryAllowed: Set[String] = Set(
    "q46_ann_brute_topk",  // brute top-k: emb ⨯ broadcast(1-row query)
    "q47_ann_ivf_topk",    // IVF probe: centroids/emb ⨯ broadcast(query)
    "q59_ann_ivf_kmeans",  // same probe shape over k-means cells
    "q61_multimodal_ann",  // same probe shape over image features
    "q59a_kmeans_recall_audit", // audit twins: re-run the parent's 1-row
    "q91a_pq_fixed_capacity_audit", // query broadcast to measure live recall
    "q91b_pq_recall_scaled",    // same, under the annScale policy
    "q61a_multimodal_ann_audit", // same (multimodal brute top-k)
    // semantic decon: the broadcast side is the EVAL corpus — bounded by
    // contract (a benchmark suite, thousands of vectors vs the 100 TB
    // train side; Similarity.semanticContamination documents it as the
    // small side). The shape test can't prove a `vec_id % 10 === 0`
    // filter is small, so allow-listed like the ANN query tables.
    "q143_semantic_contamination",
    // its r12 fixed-size twin: the broadcast side is the FIXED 40-vector
    // eval slice — the same can't-prove-a-filter-small allow-list reason,
    // now with the size constant by construction
    "q143b_semantic_contamination_fixed",
    // batched ANN: the broadcast side is the QUERY BATCH — bounded by the
    // caller's batch size (8 rows here; thousands at most in production
    // vs the corpus scan side). Same can't-prove-a-filter-small reason.
    "q151_ann_batch_search"
  )

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if (args.headOption.contains("--windows")) {
      val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val n = PlanCheck.unpartitionedWindows(SparkEntry.queries(name)(spark, dir)).size
        if (n > 0) { println(f"$name%-28s unpartitioned windows=$n"); Some(name) }
        else None
      }
      val viol = bad.filterNot(globalWindowAllowed)
      println(s"violations (not allow-listed): ${viol.mkString(", ")}")
      spark.stop()
      sys.exit(if (viol.nonEmpty) 1 else 0)
    }
    // --joins: fail on CartesianProduct / BroadcastNestedLoopJoin nodes
    // whose build side isn't a provably one-row scalar (the shape test in
    // PlanCheck.unboundedJoins replaces a per-query allow-list) — the
    // cartesian twin of the --windows gate.
    if (args.headOption.contains("--joins")) {
      val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val js = PlanCheck.unboundedJoins(SparkEntry.queries(name)(spark, dir))
        if (js.nonEmpty) {
          println(f"$name%-28s unbounded joins=${js.size} (${js.map(_.nodeName).distinct.mkString(",")})")
          Some(name)
        } else None
      }
      val viol = bad.filterNot(broadcastQueryAllowed)
      println(s"violations (not allow-listed): ${viol.mkString(", ")}")
      spark.stop()
      sys.exit(if (viol.nonEmpty) 1 else 0)
    }
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      // run the physical plan instance itself — count()/write would clone
      // the QueryExecution and leave THIS plan un-finalized (no AQE result,
      // no codegen markers)
      val exec = df.queryExecution.executedPlan
      exec.execute().count()
      // toString carries "== Final Plan ==" AND "== Initial Plan ==" — audit
      // only the final (post-AQE) section; codegen spans print as *(n)
      val full = exec.toString
      val plan = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i  => full.substring(0, i)
      }
      val shuffles = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
        .findAllIn(plan).size
      val bcasts = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(f"$name%-28s shuffles=$shuffles%-3d bhj=$bcasts%-3d smj=$smj%-3d codegenSpans=$wsc")
    }
    spark.stop()
  }
}
