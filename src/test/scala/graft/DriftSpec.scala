package graft

import graft.llm.{Drift, Packing}
import org.apache.spark.sql.functions._

/** Corpus-snapshot drift (PSI / vocabulary overlap) and shard-manifest
  * guarantees on constructed snapshots. */
class DriftSpec extends SparkSpecBase {
  import spark.implicits._

  test("psiByBin: identical snapshots give zero PSI on every bin; full fixed spine") {
    val a = (1L to 100L).map(i => Tuple1(i % 90)).toDF("n")
    val out = Drift.psiByBin(a, a, "n", 20, 15).orderBy("bin").collect()
    assert(out.length == 15)
    assert(out.map(_.getAs[Int]("bin")).toSeq == (0 until 15))
    assert(out.forall(_.getAs[Double]("psi_term") == 0.0))
    assert(out.forall(r => r.getAs[Long]("cnt_a") == r.getAs[Long]("cnt_b")))
  }

  test("psiByBin: a shifted snapshot produces positive total PSI; last bin clamps the tail") {
    val a = (1L to 200L).map(i => Tuple1(i % 40)).toDF("n")          // bins 0-1
    val b = (1L to 200L).map(i => Tuple1(100L + (i % 40))).toDF("n") // bins 5-6
    val out = Drift.psiByBin(a, b, "n", 20, 15).collect()
    assert(out.map(_.getAs[Double]("psi_term")).sum > 0.5)
    // smoothing keeps every term finite even on 0-vs-200 bins
    assert(out.forall(r => !r.getAs[Double]("psi_term").isNaN
      && !r.getAs[Double]("psi_term").isInfinite))
    val c = Seq(Tuple1(100000L)).toDF("n")
    val clamp = Drift.psiByBin(c, c, "n", 20, 15).collect()
    assert(clamp.find(_.getAs[Int]("bin") == 14).get.getAs[Long]("cnt_a") == 1L)
  }

  test("vocabOverlap: identical snapshots -> jaccard 1, disjoint -> 0") {
    val a = Seq("alpha beta gamma", "beta delta").map(Tuple1(_)).toDF("text")
    val b = Seq("zeta eta theta").map(Tuple1(_)).toDF("text")
    val toks = graft.functions.TextFns.tokens(col("text"))
    val same = Drift.vocabOverlap(a, a, toks).collect().head
    assert(same.getAs[Long]("vocab_a") == 4 && same.getAs[Long]("vocab_shared") == 4)
    assert(same.getAs[Double]("vocab_jaccard") == 1.0)
    val disj = Drift.vocabOverlap(a, b, toks).collect().head
    assert(disj.getAs[Long]("vocab_shared") == 0
      && disj.getAs[Double]("vocab_jaccard") == 0.0)
  }

  test("driftSummary: total PSI is the decimal-exact sum of the rounded per-bin terms") {
    val a = (1L to 150L).map(i => (i, s"doc $i words", i % 90)).toDF("doc_id", "text", "n")
    val b = (1L to 150L).map(i => (i, s"doc $i words", (i * 3) % 200)).toDF("doc_id", "text", "n")
    val terms = Drift.psiByBin(a, b, "n", 20, 15).collect()
      .map(r => BigDecimal.valueOf(r.getAs[Double]("psi_term"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val summary = Drift.driftSummary(a, b, "n", 20, 15,
      graft.functions.TextFns.tokens(col("text"))).collect().head
    assert(math.abs(summary.getAs[Double]("total_psi") - terms.sum.toDouble) < 1e-12)
    assert(summary.getAs[Long]("docs_a") == 150 && summary.getAs[Long]("docs_b") == 150)
    assert(summary.getAs[Long]("vocab_shared") == summary.getAs[Long]("vocab_a"))
  }

  test("shardManifest: order-independent signature, shardShuffle-consistent, detects tampering") {
    val docs = (1L to 100L).map(i => (i, s"text body $i")).toDF("doc_id", "text")
    val m1 = Packing.shardManifest(docs, "doc_id", "text", 8).collect()
    assert(m1.map(_.getAs[Long]("n_docs")).sum == 100L)
    // row order and partitioning are irrelevant to every manifest column
    val m2 = Packing.shardManifest(docs.orderBy(desc("doc_id")).repartition(13),
      "doc_id", "text", 8).collect()
    assert(m1.map(_.toSeq).toSet == m2.map(_.toSeq).toSet)
    // the manifest describes shardShuffle's layout: same assignment rule
    val sh = Packing.shardShuffle(docs, "doc_id", 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("shard")).toMap
    val one = Packing.shardManifest(docs.filter(col("doc_id") === 7L),
      "doc_id", "text", 8).collect().head
    assert(one.getAs[Int]("shard") == sh(7L))
    // altering ONE row changes exactly that shard's signature
    val mutated = docs.withColumn("text",
      when(col("doc_id") === 7L, lit("text body 7 TAMPERED")).otherwise(col("text")))
    val m3 = Packing.shardManifest(mutated, "doc_id", "text", 8).collect()
    val by1 = m1.map(r => r.getAs[Int]("shard") -> r.getAs[Long]("content_sig")).toMap
    val by3 = m3.map(r => r.getAs[Int]("shard") -> r.getAs[Long]("content_sig")).toMap
    assert(by1(sh(7L)) != by3(sh(7L)))
    assert((by1.keySet - sh(7L)).forall(k => by1(k) == by3(k)))
  }

  test("ks2Sample: hand-checked statistic; identical samples -> 0; " +
      "disjoint samples -> 1; smallest argmax value on ties") {
    import graft.llm.Drift
    // A = {1,2,3}, B = {2,3,4}: D = 1/3 attained first at v=1
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
      (2.0, false), (3.0, false), (4.0, false)).toDF("v", "a")
    val r = Drift.ks2Sample(df, "v", $"a").head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 0.333333)  // round-6 of 1/3
    assert(r.getDouble(3) == 1.0)
    // identical samples: KS = 0
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "a")
    assert(Drift.ks2Sample(same, "v", $"a").head.getDouble(2) == 0.0)
    // disjoint supports: KS = 1
    val disj = Seq((1.0, true), (2.0, true), (10.0, false), (11.0, false))
      .toDF("v", "a")
    assert(Drift.ks2Sample(disj, "v", $"a").head.getDouble(2) == 1.0)
  }

  test("chiSquare: zero statistic under identical mixes; TOTAL row is the " +
      "decimal-exact sum; hand 2x2 value") {
    import graft.llm.Drift
    // identical category mix on both sides -> every term 0
    val same = Seq(("x", true), ("y", true), ("x", false), ("y", false))
      .toDF("c", "a")
    val rows = Drift.chiSquare(same, "c", $"a").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.values.forall(_ == 0.0))
    // classic 2x2: a:(10 x, 20 y), b:(20 x, 10 y) -> chi2 = 6.666667
    val skewed = (Seq.fill(10)(("x", true)) ++ Seq.fill(20)(("y", true)) ++
      Seq.fill(20)(("x", false)) ++ Seq.fill(10)(("y", false))).toDF("c", "a")
    val tot = Drift.chiSquare(skewed, "c", $"a").collect()
      .find(_.getString(0) == "TOTAL").get
    assert(tot.getLong(1) == 30 && tot.getLong(2) == 30)
    assert(math.abs(tot.getDouble(3) - 6.666666) < 1e-5)
  }

  test("ks2Sample/chiSquare fail loudly when one side is empty; a fully " +
      "empty input stays an empty frame") {
    import graft.llm.Drift
    // one-sided input: would be 0/0 = NaN (KS) / E=0 Infinity (chi2) —
    // both must raise instead of returning garbage rows (r10 advice)
    val oneSided = Seq((1.0, true), (2.0, true)).toDF("v", "a")
    val eKs = intercept[Exception](
      Drift.ks2Sample(oneSided, "v", $"a").collect())
    assert(eKs.getMessage.contains("zero rows") ||
      eKs.getCause != null && eKs.getCause.getMessage.contains("zero rows"))
    val oneCat = Seq(("x", false), ("y", false)).toDF("c", "a")
    val eChi = intercept[Exception](
      Drift.chiSquare(oneCat, "c", $"a").collect())
    assert(eChi.getMessage.contains("zero rows") ||
      eChi.getCause != null && eChi.getCause.getMessage.contains("zero rows"))
    // fully empty input: no data rows -> no verdict (and no raise); the
    // chi2 TOTAL row degenerates to nulls rather than erroring
    val empty = Seq.empty[(Double, Boolean)].toDF("v", "a")
    assert(Drift.ks2Sample(empty, "v", $"a").count() == 0)
    assert(Drift.chiSquare(empty, "v", $"a").collect()
      .forall(_.getString(0) == "TOTAL"))
  }
}
