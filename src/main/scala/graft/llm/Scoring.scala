package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document scoring for training-data curation: the
  * fastText-shape hashed linear classifier (the quality filter CCNet /
  * LLaMA-style pipelines run over every candidate page) and DSIR
  * importance weighting (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling") — hashed-n-gram bag-of-words
  * likelihood ratios between a target and a raw corpus.
  *
  * Both use the hashing trick: features (unigrams + word bigrams) are
  * bucketed by a cross-engine-reproducible md5-derived integer, never a
  * vocabulary dictionary — the property that lets a 100 TB scoring pass
  * run without any driver-side vocab state, and lets the DuckDB oracle
  * re-derive identical buckets.
  */
object Scoring {

  /** First `hexChars` hex digits of md5(c) as a non-negative long —
    * the engine-portable hash both scorers bucket with (the q63/q86
    * sampling precedent; DuckDB mirror:
    * `CAST('0x' || substr(md5(e), 1, n) AS BIGINT)`). */
  def md5Int(c: Column, hexChars: Int): Column =
    conv(substring(md5(c.cast("binary")), 1, hexChars), 16, 10).cast("long")

  /** Unigram + word-bigram feature array over a MATERIALIZED token-array
    * column (TextFns' perf contract — the lambda reads an attribute). */
  def ngramFeatures(toks: Column): Column =
    concat(toks,
      when(size(toks) >= 2,
        transform(slice(toks, lit(1), size(toks) - 1),
          (t, i) => concat_ws(" ", t, element_at(toks, i + lit(2)))))
        .otherwise(array().cast("array<string>")))

  /** Frozen-model hashed linear classifier score — the fastText quality
    * filter's serving path: every unigram/bigram feature hashes into one
    * of `buckets` weight slots, the document's score is the exact BIGINT
    * sum of its features' weights, and the verdict is `score > 0`. The
    * weight table here is FROZEN as a deterministic function of the
    * bucket id (md5-derived integer in [-1000, 1000]) — the stand-in for
    * a broadcast trained weight vector, chosen so the whole model is
    * reproducible cross-engine and the gate is exact; swapping in real
    * trained weights changes one line (a broadcast array lookup), not
    * the plan.
    *
    * Scale shape: a PURE PROJECTION — per-row HOFs over the feature
    * array (hash → bucket → weight → integer fold), zero joins, zero
    * shuffles, zero state. At 100 TB this is the ideal scoring plan: one
    * codegen'd map pass over the corpus. The score is a sum of integers
    * (order-free, partition-independent); the mean is one IEEE division
    * of exact integers — bit-reproducible. */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 1024): DataFrame =
    // One codegen'd bucket pass (plans/ScoringExprs) + a literal weight
    // table indexed per feature: the weight is a pure function of the
    // bucket id, so the second md5 chain of the r6 form collapses to a
    // ≤`buckets`-entry array lookup. Values are bit-identical to
    // `md5Int((md5Int(f,8) % buckets).cast("string"), 4) % 2001 - 1000`
    // (ScoringSpec asserts both equivalences); the oracle is unchanged.
    scoreWithWeights(docs, idCol, textCol,
      graft.plans.ScoringExprs.frozenWeights(buckets))

  /** [[hashedLinearScore]]'s serving path with an EXPLICIT weight
    * vector — the one-line swap the frozen-model scaladoc promises:
    * plug in [[trainLogistic]]'s output (or any externally-fit
    * `buckets`-slot model) and the plan is unchanged — a pure
    * codegen'd projection, the weight array a broadcast literal. */
  def scoreWithWeights(docs: DataFrame, idCol: String, textCol: String,
                       weightsFp: Array[Long]): DataFrame = {
    val buckets = weightsFp.length
    require(buckets > 0)
    docs.select(col(idCol),
        graft.functions.TextFns.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        graft.plans.ScoringExprs.featureBuckets(col("toks"), buckets).as("bks"))
      .select(col(idCol),
        size(col("bks")).cast("long").as("n_feats"),
        // codegen'd margin kernel — bit-identical to the aggregate-HOF
        // fold it replaced (ScoringSpec), minus the per-feature lambda
        graft.plans.ScoringExprs.weightSumCol(col("bks"), weightsFp)
          .as("score"))
      .select(col(idCol), col("n_feats"), col("score"),
        (col("score").cast("double") / col("n_feats")).as("avg_weight"),
        (col("score") > 0L).as("is_quality"))
  }

  /** Fixed-point scale every [[trainLogistic]] quantity lives at:
    * weight slots, margins, and hard-sigmoid outputs are integers in
    * units of 1e-6. */
  val TrainScale = 1000000L

  /** Deterministic DISTRIBUTED logistic-regression training over the
    * hashed feature space — the fitting pass the frozen
    * [[hashedLinearScore]] model stands in for (fastText
    * Wikipedia-vs-CC shape: positives = in-domain corpus, negatives =
    * raw crawl). Batch gradient descent, `iters` full passes, every
    * quantity a BIGINT at [[TrainScale]] fixed point so the fit is
    * bit-reproducible across engines, partitionings, and retries (the
    * q125 integer-PageRank recipe, applied to model fitting):
    *
    *   margin_d = Σ_occurrences w[b]              (fp; tf folds in)
    *   p_d      = clamp(S/2 + margin_d div 4, 0, S)   (hard sigmoid)
    *   grad_b   = Σ_occurrences (p_d − y_d·S)     (exact integer sum)
    *   w_b     −= (lrNum·grad_b) div (lrDen·nDocs)
    *
    * The hard sigmoid (σ̂(m) = clip(½ + m/4)) replaces exp with the
    * piecewise-linear form both engines compute exactly in integer
    * arithmetic; `div` is TRUNCATING division, which DuckDB's `//`
    * matches on negatives too (both toward zero). A saturated
    * correctly-classified doc has residual 0 and drops out of the
    * gradient — the clip is also why weights can't run away.
    *
    * Scale shape — textbook distributed GD (Spark ML's own layout):
    * the design matrix (label + feature-bucket array per doc) is
    * computed ONCE, pinned, and never reshaped; each round is one
    * codegen'd map pass (margin/residual per doc — zero shuffle, the
    * model a broadcast literal) feeding one ≤`buckets`-key map-side-
    * combined aggregation; the 8 KB gradient collects to the driver,
    * which updates the model it rebroadcasts next round. Nothing
    * row-count-sized ever touches the driver. Docs with no features
    * contribute nDocs mass but no gradient (they have no occurrences).
    *
    * Returns the dense fixed-point weight vector, slot b = bucket b —
    * feed it to [[scoreWithWeights]] / `Curation.pipeline(clfWeights)`.
    */
  def trainLogistic(docs: DataFrame, idCol: String, textCol: String,
                    label: Column, buckets: Int = 1024, iters: Int = 3,
                    lrNum: Long = 1L, lrDen: Long = 1L,
                    posWeight: Long = 1L, lrDecay: Boolean = false): Array[Long] = {
    require(buckets > 0 && iters >= 0 && lrNum > 0 && lrDen > 0 && posWeight > 0)
    val S = TrainScale
    // pinCompact: every GD round re-reads the design; size-matched
    // coalesce keeps a many-file small corpus from paying one task per
    // source file per round (measured +4.7 s on q206b at 1× many-files)
    val design = graft.Checkpoints.pinCompact(docs
      .select(when(label, 1L).otherwise(0L).as("__y"),
        graft.functions.TextFns.tokens(col(textCol)).as("toks"))
      .select(col("__y"),
        graft.plans.ScoringExprs.featureBuckets(col("toks"), buckets)
          .as("bks")))
    // one small agg: total docs + positives (the weighted-loss mass)
    val cnts = design.agg(count(lit(1)).as("n"), sum(col("__y")).as("np")).head
    val nDocs = cnts.getLong(0)
    require(nDocs > 0, "trainLogistic: empty corpus")
    val nPos = cnts.getLong(1)
    val w = Array.fill(buckets)(0L)
    // class-weighted loss: positive residuals count posWeight× (integer,
    // so the fixed-point replay stays exact); the step denominator is
    // the WEIGHTED doc mass, keeping the effective learning rate stable
    // as posWeight grows
    val denom = lrDen * (nPos * posWeight + (nDocs - nPos))
    for (k <- 1 to iters) {
      val grads = design
        // per-round margin through the codegen'd kernel (same fold as the
        // aggregate-HOF form, ScoringSpec-pinned) — the round's weights
        // ride a reference object, not a re-analyzed literal array
        .withColumn("__m",
          graft.plans.ScoringExprs.weightSumCol(col("bks"), w.clone()))
        .withColumn("__p",
          least(greatest(lit(S / 2) + expr("__m div 4"), lit(0L)), lit(S)))
        .withColumn("__r", (col("__p") - col("__y") * S) *
          when(col("__y") === 1L, lit(posWeight)).otherwise(lit(1L)))
        .select(explode(col("bks")).as("b"), col("__r"))
        .groupBy("b").agg(sum(col("__r")).as("g"))
        .collect()
      // harmonic decay (eta_k = eta_1 / k): the standard Robbins-Monro
      // schedule that damps the fixed-step oscillation batch GD shows on
      // imbalanced splits; integer k keeps the fixed-point replay exact
      val divisor = if (lrDecay) denom * k else denom
      grads.foreach { r =>
        val b = r.getLong(0).toInt
        w(b) = w(b) - (lrNum * r.getLong(1)) / divisor  // Long / truncates = div
      }
    }
    w
  }

  /** [[trainLogistic]] with the positive-class weight DERIVED from the
    * split: posWeight = max(1, negatives div positives) — the standard
    * "balanced" class weighting, kept integer so the fixed-point oracle
    * replays it exactly. Closes the q206 finding: on a 5%-positive
    * split, unweighted fixed-η GD collapses to the majority class
    * (every round's gradient is negative-dominated); weighting the
    * minority residuals by the class ratio restores a symmetric
    * effective loss and the same rounds separate the split (q206b). */
  def trainLogisticBalanced(docs: DataFrame, idCol: String, textCol: String,
                            label: Column, buckets: Int = 1024,
                            iters: Int = 3, lrNum: Long = 1L,
                            lrDen: Long = 1L): Array[Long] = {
    val c = docs.agg(count(lit(1)).as("n"),
      sum(when(label, 1L).otherwise(0L)).as("np")).head
    val nPos = c.getLong(1)
    require(nPos > 0, "trainLogisticBalanced: no positive examples")
    val pw = math.max(1L, (c.getLong(0) - nPos) / nPos)
    trainLogistic(docs, idCol, textCol, label, buckets, iters,
      lrNum, lrDen, posWeight = pw, lrDecay = true)
  }

  /** DSIR importance log-ratio: ln p̂_target(x) − ln p̂_raw(x) under
    * add-one-smoothed hashed-n-gram bag-of-words models fit on a target
    * (in-domain) and a raw corpus —
    * `Σ_b tf_b(x) · (ln((ct_b+1)/(Nt+B)) − ln((cr_b+1)/(Nr+B)))`
    * over the doc's feature buckets. High log_ratio ≈ looks like the
    * target distribution; DSIR resamples the raw corpus ∝ exp(ratio)
    * (pair with [[graft.sources.Sampling.weightedTicketSample]]).
    *
    * Determinism (the q82/q83/q120 recipe): per-doc contributions fold
    * in BUCKET-ID order (sorted-run traversal in [[dsirScore]]),
    * mirrored by the oracle's `list_reduce(list(... ORDER BY bucket))`,
    * and the score is rounded to 6 dp to absorb ≤1-ulp cross-engine `ln`
    * drift. Scale shape: [[dsirModels]] + [[dsirScore]] — dense
    * broadcast model arrays, zero-shuffle scoring projection. */
  def dsirLogRatio(target: DataFrame, raw: DataFrame,
                   idCol: String, textCol: String,
                   buckets: Int = 1024): DataFrame =
    dsirScore(raw, dsirModels(target, raw, idCol, textCol, buckets),
      idCol, textCol, buckets)

  private def bucketArrays(df: DataFrame, idCol: String, textCol: String,
                           buckets: Int) = df
    .select(col(idCol), graft.functions.TextFns.tokens(col(textCol)).as("toks"))
    .select(col(idCol),
      graft.plans.ScoringExprs.featureBuckets(col("toks"), buckets).as("bks"))

  /** The two fitted DSIR models as ONE 1-row DataFrame (dense bucket-
    * indexed count arrays `__ta`/`__ra` + totals `__nt`/`__nr`) — the
    * frozen artifact a streaming deployment broadcasts to score an
    * ingest stream against a static target/raw fit ([[dsirScore]] is a
    * stateless projection, so the same scorer serves batch and stream).
    * Each model densifies to a bucket-indexed count array (slot b =
    * occurrences of bucket b; ≤ `buckets` longs) plus its total. An
    * empty corpus yields an all-zero array and total 0 — the uniform
    * add-one model, not null scores. */
  def dsirModels(target: DataFrame, raw: DataFrame,
                 idCol: String, textCol: String,
                 buckets: Int = 1024): DataFrame = {
    require(buckets > 0)
    def modelRow(df: DataFrame, arrName: String, totName: String) = df
      .select(explode(col("bks")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("mp"))
      .select(transform(sequence(lit(0), lit(buckets - 1)),
        i => coalesce(element_at(col("mp"), i.cast("long")), lit(0L))).as(arrName))
      .select(col(arrName),
        aggregate(col(arrName), lit(0L), (acc, x) => acc + x).as(totName))
    modelRow(bucketArrays(target, idCol, textCol, buckets), "__ta", "__nt")
      .crossJoin(modelRow(bucketArrays(raw, idCol, textCol, buckets), "__ra", "__nr"))
  }

  /** Score `docs` against frozen [[dsirModels]]: a PURE PROJECTION plus
    * one 1-row broadcast crossJoin — runs unchanged on a batch DataFrame
    * or a readStream (StreamingSpec asserts stream == batch). Per doc:
    * sort the bucket array, find run starts (a run = one distinct
    * bucket), and fold tf·Δ(b) in bucket-id order, where Δ(b) reads the
    * two broadcast model arrays by index. Zero shuffles, zero
    * per-occurrence rows: at 100 TB the scoring job is one codegen'd map
    * over the corpus (the model fits shuffle ≤ `buckets` rows per
    * partition thanks to map-side combine). Fold order and per-run
    * arithmetic (tf * (ln − ln) on identical doubles) are unchanged from
    * the r6 shuffle-based plan, so the output is bit-identical and the
    * q124 oracle needs no change. Every array a lambda reads below is
    * MATERIALIZED as a column first (TextFns' perf contract): a lambda
    * that re-references the building expression would re-sort / re-scan
    * it once per ELEMENT. */
  def dsirScore(docs: DataFrame, models: DataFrame,
                idCol: String, textCol: String,
                buckets: Int = 1024): DataFrame = {
    require(buckets > 0)
    val delta: Column => Column = b =>
      log((element_at(col("__ta"), (b + 1).cast("int")) + lit(1.0)) /
          (col("__nt") + lit(buckets))) -
      log((element_at(col("__ra"), (b + 1).cast("int")) + lit(1.0)) /
          (col("__nr") + lit(buckets)))
    val contribs = transform(col("__rs"), (q, j) => {
      val nextStart = when(j === size(col("__rs")) - 1, size(col("__s")))
        .otherwise(element_at(col("__rs"), (j + 2).cast("int")).getField("p"))
      (nextStart - q.getField("p")).cast("long") * delta(q.getField("b"))
    })
    bucketArrays(docs, idCol, textCol, buckets)
      .filter(size(col("bks")) > 0)   // mirror the r6 explode, which dropped
      .crossJoin(broadcast(models))   // feature-less docs from the output
      .withColumn("__s", array_sort(col("bks")))
      .withColumn("__rs", filter(
        transform(col("__s"), (x, i) => struct(x.as("b"), i.as("p"))),
        q => q.getField("p") === 0 ||
          !(element_at(col("__s"), q.getField("p")) <=> q.getField("b"))))
      .select(col(idCol), size(col("__s")).cast("long").as("n_feats"),
        round(aggregate(contribs, lit(0.0), (acc, x) => acc + x), 6)
          .as("log_ratio"))
  }
}
