package graft

import graft.llm.Curation
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline guarantees on a corpus with planted
  * structure (exact dups, near dups, junk). */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val corpus = {
    val base = (1 to 40).map(i => s"the tok$i of and").mkString(" ")
    val near = ((1 to 39).map(i => s"the tok$i of and") :+ "the CHANGED of and").mkString(" ")
    Seq(
      (0L, base), (1L, base),            // exact dups
      (2L, near),                        // near dup of 0
      (3L, "a completely different document with the usual amount of the stopwords and words to pass the quality bar " + (1 to 30).map(i => s"word$i").mkString(" ")),
      (4L, "x y")                        // junk: too short, no stopwords
    ).toDF("doc_id", "text")
  }

  test("curate: exact dup dropped, near dup clustered away, junk filtered") {
    val out = Curation.curate(corpus, "doc_id", "text",
      minQuality = 0.3, jaccardThreshold = 0.8).collect()
    val kept = out.map(_.getAs[Long]("doc_id")).toSet
    assert(!kept.contains(1L))            // exact dup of 0
    assert(!kept.contains(2L))            // near dup of 0 (same cluster)
    assert(!kept.contains(4L))            // junk quality
    assert(kept.contains(0L) && kept.contains(3L))
    assert(out.forall(r => r.getAs[Double]("quality_score") >= 0.3))
  }

  test("leakageFreeSplit: no near-dup pair straddles splits; deterministic at any partitioning") {
    val nodes = (0L until 64L).map(Tuple1(_)).toDF("id")
    // a chain component {0,1,2,3}, a pair {4,5}, singletons elsewhere
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val out = Curation.leakageFreeSplit(nodes, "id", pairs, "a", "b").collect()
    val split = out.map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    val rep = out.map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_rep")).toMap
    // the whole point: every edge is co-assigned
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L)).foreach { case (a, b) =>
      assert(split(a) == split(b) && rep(a) == rep(b))
    }
    assert(out.length == 64 && rep(10L) == 10L)  // singletons are their own rep
    // 2/2/12 sixteenths over ~60 clusters: all three splits materialize,
    // train dominates (deterministic — md5 buckets, no RNG)
    assert(split.values.toSet == Set("train", "val", "test"))
    assert(split.values.count(_ == "train") > split.values.count(_ != "train"))
    val again = Curation.leakageFreeSplit(nodes.repartition(16), "id",
      pairs.repartition(4), "a", "b").collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("trainSplit is deterministic and content-keyed") {
    val docs = (0 until 200).map(i => (i.toLong, s"document number $i body")).toDF("doc_id", "text")
    val a = docs.withColumn("t", Curation.trainSplit("text")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val b = docs.orderBy(desc("doc_id")).withColumn("t", Curation.trainSplit("text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(a == b)                        // row order irrelevant
    assert(a.values.exists(identity) && a.values.exists(!_))  // both sides hit
  }

  test("pipeline: pair mine pinned exactly once; stages monotone; packing consistent") {
    val stages = Curation.pipeline(corpus, "doc_id", "text",
      lmRef = corpus.filter(col("doc_id") < 3), tokenBudget = 500, seqLen = 64)
    // the q125 double-mining trap as a mechanical gate: the pair set the
    // component loop consumes must be a PINNED materialization (the
    // mining subtree ran once, at pin time; no consumer can re-run it) —
    // same for the twice-referenced selection table
    assert(graft.tools.PlanCheck.isPinned(stages.pairs))
    assert(graft.tools.PlanCheck.isPinned(stages.selected))
    val ex = stages.exact.count()
    val nr = stages.nearKept.count()
    val out = stages.packed.orderBy("doc_id").collect()
    assert(ex == 4 && nr == 3)            // exact dup gone, near dup clustered
    assert(out.length <= nr)
    // packed layout: offsets consistent with a concatenated stream in
    // doc_id order under seqLen-64 chunking
    var cum = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("seq_id") == cum / 64)
      assert(r.getAs[Long]("seq_offset") == cum % 64)
      cum += r.getAs[Long]("n_tokens")
    }
    // budget respected and selection cum totals are the running sums of
    // the (score desc, id) order
    assert(out.forall(_.getAs[Long]("cum_tokens") <= 500))
  }

  test("pipeline optional stages: decon drops leaked docs, scrub redacts downstream, substrate pinned") {
    val clean = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val docs = Seq(
      (0L, clean + " contact bob@example.com for details"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi")
    ).toDF("doc_id", "text")
    // eval doc shares an 8-token run with doc 1 ONLY → doc 1 is leaked
    val eval_ = Seq(
      (100L, "totally unrelated prefix alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val stages = Curation.pipeline(docs, "doc_id", "text",
      lmRef = docs, tokenBudget = 500, seqLen = 64,
      evalDocs = Some(eval_), piiScrub = true)
    // the curated substrate is multi-referenced (classifier gate + semi-join)
    // and must be pinned like the pair set
    assert(graft.tools.PlanCheck.isPinned(stages.curated))
    val curated = stages.curated.collect()
    assert(curated.map(_.getAs[Long]("doc_id")).toSet == Set(0L)) // doc 1 decontaminated away
    val text0 = curated.head.getAs[String]("text")
    assert(text0.contains("[EMAIL]") && !text0.contains("bob@example.com"))
    // defaults-off parity: with neither stage on, curated IS nearKept
    val plain = Curation.pipeline(docs, "doc_id", "text",
      lmRef = docs, tokenBudget = 500, seqLen = 64)
    assert(plain.curated eq plain.nearKept)
  }

  test("funnel counts are monotone and consistent") {
    val f = Curation.funnel(corpus, "doc_id", "text").head
    val raw = f.getAs[Long]("raw_docs")
    val ex = f.getAs[Long]("after_exact_dedup")
    val nr = f.getAs[Long]("after_near_dedup")
    val q = f.getAs[Long]("after_quality_filter")
    val tr = f.getAs[Long]("train_docs")
    assert(raw == 5 && ex == 4 && nr == 3)
    assert(q <= nr && tr <= q)
  }
}
