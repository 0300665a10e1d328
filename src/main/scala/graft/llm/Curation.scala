package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually runs over a raw document table, assembled from this package's
  * operators —
  *
  *   1. exact dedup (normalized-text hash, keep min-id)           [[Dedup]]
  *   2. near-dup clustering (pair mining → connected components →
  *      keep one representative per cluster)        [[Dedup]] + [[Clusters]]
  *   3. quality filtering (score threshold)                   [[TextStats]]
  *   4. deterministic train/holdout split (content hash, not RNG — the
  *      same document lands on the same side on every engine and run)
  *
  * Everything stays a lazy plan except the bounded per-round convergence
  * counters inside connected components. Each step is one-to-two shuffles;
  * nothing is ever all-pairs. The stages are public so callers can rewire
  * (e.g. swap n-gram Jaccard for MinHash-LSH at petabyte scale, where the
  * exact inverted index's common-shingle posting lists get hot).
  */
object Curation {

  /** Near-dup removal: mine pairs (exact n-gram Jaccard by default), build
    * duplicate clusters, keep each cluster's min-id representative.
    * `maxDocFreq` defaults to the q94 petabyte cap (df ≤ 16): exact at
    * the shipped SFs for hot-shingle-free corpora and the bound that
    * keeps the posting expansion linear on duplicate-heavy ones
    * (uncapped, the q66 funnel ran 8.2× wall at 32× data — r7 sweep). */
  def dropNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.8,
                         useMinhash: Boolean = false,
                         maxDocFreq: Long = 16): DataFrame = {
    val pairs =
      if (useMinhash) Dedup.minhashLshPairs(docs, idCol, textCol, threshold = threshold,
        shingleN = n).select(col("doc_a"), col("doc_b"))
      else Dedup.ngramJaccardPairs(docs, idCol, textCol, n, threshold,
        maxDocFreq = maxDocFreq)
        .select(col("doc_a"), col("doc_b"))
    val comps = Clusters.connectedComponents(
      docs.select(col(idCol)), idCol, pairs, "doc_a", "doc_b")
    // keep only rows that are their own cluster representative
    docs.join(comps.filter(col(idCol) === col("cluster_rep")).select(idCol),
      Seq(idCol), "left_semi")
  }

  /** Quality-ordered selection under a token budget — "take the best N
    * tokens": documents are ranked by (`scoreCol` desc, `idCol` asc for a
    * total order) and kept while the running token total stays within
    * `tokenBudget` (a document that would cross the budget line is cut,
    * as are all below it). The running total is
    * [[graft.operators.Ranks.globalCumSum]] — range-partitioned two-pass,
    * no single-task global sort — so the selection is exact and
    * deterministic at any parallelism. Returns the kept docs with
    * `n_tokens` and the inclusive `cum_tokens` attached. */
  def selectTokenBudget(docs: DataFrame, idCol: String, scoreCol: String,
                        tokenCol: String, tokenBudget: Long,
                        partitions: Int = 0): DataFrame = {
    require(tokenBudget > 0, "token budget must be positive")
    graft.operators.Ranks.globalCumSum(docs,
        Seq(col(scoreCol).desc, col(idCol)), col(tokenCol), "cum_tokens",
        partitions)
      .filter(col("cum_tokens") <= tokenBudget)
  }

  /** Deterministic content-hash split flag: true → train, false → holdout.
    * `holdoutSixteenths` of 16 md5-prefix buckets go to holdout. Same
    * bucketing primitive as the referential sampler, so the split and any
    * hash-sampled extracts stay mutually consistent. */
  def trainSplit(textCol: String, holdoutSixteenths: Int = 1) =
    !graft.sources.Sampling.hashSampleKey(col(textCol), holdoutSixteenths)

  /** LEAKAGE-FREE train/val/test split: assign whole near-duplicate
    * CLUSTERS — not individual documents — to a split, so two near-dups
    * can never straddle train and test (the document-level hash split
    * above has exactly that leak: near-dups hash independently). Pairs
    * come from any of the pair miners (n-gram Jaccard, MinHash-LSH,
    * embedding near-dups); the split key is an md5-bucket of the
    * cluster representative — deterministic across engines, runs, and
    * re-partitionings, so the split is reproducible without an RNG.
    *
    * `valSixteenths`/`testSixteenths` of 16 md5-prefix buckets go to
    * val/test; the rest train. Returns (idCol, cluster_rep, split).
    *
    * 100 TB shape: the component loop works over the duplicate fringe
    * only ([[Clusters.connectedComponents]]); the split itself is one
    * codegen'd projection — no extra shuffle beyond the CC join. */
  def leakageFreeSplit(nodes: DataFrame, idCol: String,
                       pairs: DataFrame, aCol: String, bCol: String,
                       valSixteenths: Int = 2, testSixteenths: Int = 2): DataFrame = {
    require(valSixteenths >= 0 && testSixteenths >= 0 &&
      valSixteenths + testSixteenths <= 16, "val+test sixteenths must fit in 16")
    val bucket = conv(substring(
      md5(concat(lit("sp:"), col("cluster_rep").cast("string")).cast("binary")),
      1, 1), 16, 10).cast("int")
    Clusters.connectedComponents(nodes, idCol, pairs, aCol, bCol)
      .withColumn("split",
        when(bucket < valSixteenths, lit("val"))
          .when(bucket < valSixteenths + testSixteenths, lit("test"))
          .otherwise(lit("train")))
  }

  /** Full curation: exact dedup → near-dup representatives → quality
    * filter → split flag. Returns the curated corpus with `quality_score`
    * and `is_train` attached. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.3, jaccardThreshold: Double = 0.8,
             useMinhash: Boolean = false): DataFrame = {
    val exact = Dedup.dedupe(docs, idCol, textCol, normalized = true)
    val nearDeduped = dropNearDuplicates(exact, idCol, textCol,
      threshold = jaccardThreshold, useMinhash = useMinhash)
    val scored = nearDeduped.join(
      TextStats.qualityScore(nearDeduped, idCol, textCol)
        .select(col(idCol), col("quality_score")),
      Seq(idCol))
    scored.filter(col("quality_score") >= minQuality)
      .withColumn("is_train", trainSplit(textCol))
  }

  /** The intermediate stages of [[pipeline]], exposed so the regression
    * spec can assert the composition's scale contract mechanically:
    * `pairs` must be PINNED (a materialized RDD scan, so the mining
    * subtree ran exactly once at pin time and no consumer — the
    * component loop's rounds, or any later stage — can re-trigger it:
    * the q125 double-mining trap as a checkable property). */
  final case class PipelineStages(
      exact: DataFrame, pairs: DataFrame, nearKept: DataFrame,
      curated: DataFrame, selected: DataFrame, packed: DataFrame)

  /** The COMPOSED end-to-end curation pipeline, one job (q127/q134):
    *
    *   raw docs → exact dedup → CAPPED Jaccard pairs (pinned ONCE) →
    *   connected components → [decontamination vs `evalDocs`] →
    *   [PII scrub] → hashed-classifier gate → bigram-LM score →
    *   token-budget selection → sequence packing
    *
    * i.e. every curation stage this package ships, chained the way a
    * training-data run actually chains them, sharing one pinned pair
    * set. Output: one row per SELECTED doc with its LM score, running
    * token total, and packed-sequence coordinates.
    *
    * The two bracketed stages are optional and default OFF (q127 parity):
    *   - `evalDocs`: drop near-dup survivors sharing ≥1 `deconN`-gram
    *     with the eval corpus ([[Dedup.crossCorpusContamination]] →
    *     distinct contaminated ids → one anti-join). Runs on ORIGINAL
    *     text, before any redaction, like the published recipes.
    *   - `piiScrub`: rewrite `textCol` through [[Pii.redact]] so every
    *     downstream consumer (classifier features, LM bigrams, token
    *     counts) sees redacted text — training sequences must never
    *     contain raw PII, so scrubbing after selection would be too late.
    *
    * Scale shape: the pair mine is df-capped and materializes once
    * (pinned before the component loop); decontamination is the same
    * inverted-index join as the pair mine (posting-mass cost, df-capped,
    * never |eval|×|train|); the scrub is one codegen'd projection; the
    * classifier and LM scores are zero-shuffle projections over
    * broadcast models; the running totals are the two-pass distributed
    * cumsum. No stage is all-pairs, no window is unpartitioned, and the
    * only iterative lineage is inside the component loop's own per-round
    * pins. */
  def pipeline(docs: DataFrame, idCol: String, textCol: String,
               lmRef: DataFrame, tokenBudget: Long, seqLen: Int,
               jaccardThreshold: Double = 0.8,
               maxDocFreq: Long = 16,
               evalDocs: Option[DataFrame] = None,
               deconN: Int = 8, deconMaxDocFreq: Long = 16,
               piiScrub: Boolean = false,
               clfWeights: Option[Array[Long]] = None): PipelineStages = {
    // every stage output below is referenced 2+ times downstream (the
    // module's multi-reference rule): exact feeds the pair mine, the CC
    // id set, and the survivor join; nearKept feeds the classifier and
    // the semi-join; clfKept feeds the token count and the LM's bigram
    // branch. Unpinned, each reference would re-execute the whole
    // upstream chain.
    val exact = graft.Checkpoints.pin(
      Dedup.dedupe(docs, idCol, textCol, normalized = true))
    val pairs = graft.Checkpoints.pin(
      Dedup.ngramJaccardPairs(exact, idCol, textCol, 3, jaccardThreshold,
          maxDocFreq = maxDocFreq)
        .select(col("doc_a"), col("doc_b")))
    val comps = Clusters.connectedComponents(
      exact.select(col(idCol)), idCol, pairs, "doc_a", "doc_b")
    val nearKept = graft.Checkpoints.pin(exact.join(
      comps.filter(col(idCol) === col("cluster_rep")).select(idCol),
      Seq(idCol), "left_semi"))
    // optional decontamination: anti-join away survivors that share any
    // deconN-gram with the eval corpus (original text — before redaction)
    val deconKept = evalDocs match {
      case Some(ev) =>
        val contaminated = Dedup.crossCorpusContamination(
            ev, nearKept, idCol, textCol, n = deconN,
            maxDocFreq = deconMaxDocFreq)
          .select(col("train_id").as(idCol)).distinct()
        nearKept.join(contaminated, Seq(idCol), "left_anti")
      case None => nearKept
    }
    // optional PII scrub: rewrite textCol in place so the classifier, LM,
    // and token counts all see redacted text. The curated substrate is
    // pinned whenever it differs from nearKept (it is referenced by the
    // classifier gate AND the semi-join below — the multi-reference rule);
    // when both stages are off it IS the already-pinned nearKept.
    val curated =
      if (piiScrub) graft.Checkpoints.pin(
        deconKept.withColumn(textCol, Pii.redact(col(textCol))))
      else if (evalDocs.isDefined) graft.Checkpoints.pin(deconKept)
      else deconKept
    // classifier gate: frozen weights by default; a TRAINED model
    // (Scoring.trainLogistic output) swaps in without changing the plan
    // — still a broadcast-literal projection feeding the semi-join
    val clfScores = clfWeights match {
      case Some(ws) => Scoring.scoreWithWeights(curated, idCol, textCol, ws)
      case None => Scoring.hashedLinearScore(curated, idCol, textCol)
    }
    val clfKept = graft.Checkpoints.pin(curated.join(
      clfScores.filter(col("is_quality")).select(idCol),
      Seq(idCol), "left_semi"))
    // LM-score the classifier survivors against the frozen reference
    // slice; <2-token docs score null and cannot be ranked — drop them
    // (they are also worthless as training sequences)
    val lm = TextStats.bigramLogProb(lmRef, clfKept, idCol, textCol)
      .filter(col("avg_logprob").isNotNull)
      .select(col(idCol), col("avg_logprob"))
    val scored = clfKept
      .select(col(idCol),
        size(graft.functions.TextFns.tokens(col(textCol))).cast("long")
          .as("n_tokens"))
      .join(lm, Seq(idCol))
    // pinned: referenced twice below (packing layout + score join-back) —
    // unpinned, the selection cumsum subtree would execute twice
    val selected = graft.Checkpoints.pin(
      selectTokenBudget(scored, idCol, "avg_logprob", "n_tokens", tokenBudget))
    val packed = graft.llm.Packing
      .packSequences(selected, idCol, "n_tokens", seqLen)
      .join(selected.select(col(idCol), col("avg_logprob"), col("cum_tokens")),
        Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("avg_logprob"),
        col("cum_tokens"), col("seq_id"), col("seq_offset"))
    PipelineStages(exact, pairs, nearKept, curated, selected, packed)
  }

  /** Curation funnel report: row counts surviving each stage — the
    * accounting a pipeline logs per run. Built stage-on-stage (NOT by
    * calling [[curate]] alongside the intermediate stages, which would run
    * the expensive near-dup mining twice). */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.3, jaccardThreshold: Double = 0.8): DataFrame = {
    val exact = Dedup.dedupe(docs, idCol, textCol, normalized = true)
    val near = dropNearDuplicates(exact, idCol, textCol, threshold = jaccardThreshold)
    val curated = near.join(
        TextStats.qualityScore(near, idCol, textCol)
          .select(col(idCol), col("quality_score")),
        Seq(idCol))
      .filter(col("quality_score") >= minQuality)
      .withColumn("is_train", trainSplit(textCol))
    docs.agg(count(lit(1)).as("raw_docs"))
      .crossJoin(exact.agg(count(lit(1)).as("after_exact_dedup")))
      .crossJoin(near.agg(count(lit(1)).as("after_near_dedup")))
      .crossJoin(curated.agg(
        count(lit(1)).as("after_quality_filter"),
        // coalesce: SUM over an empty (all-filtered) set is NULL, but the
        // report contract — and the q66 oracle — say 0 train docs
        coalesce(sum(when(col("is_train"), 1L).otherwise(0L)), lit(0L))
          .as("train_docs")))
  }
}
