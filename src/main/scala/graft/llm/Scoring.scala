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
                        buckets: Int = 1024): DataFrame = {
    require(buckets > 0)
    val weightOf: Column => Column = f =>
      md5Int((md5Int(f, 8) % buckets).cast("string"), 4) % 2001 - lit(1000L)
    docs.select(col(idCol),
        graft.functions.TextFns.tokens(col(textCol)).as("toks"))
      .select(col(idCol), ngramFeatures(col("toks")).as("feats"))
      .select(col(idCol),
        size(col("feats")).cast("long").as("n_feats"),
        aggregate(col("feats"), lit(0L), (acc, f) => acc + weightOf(f))
          .as("score"))
      .select(col(idCol), col("n_feats"), col("score"),
        (col("score").cast("double") / col("n_feats")).as("avg_weight"),
        (col("score") > 0L).as("is_quality"))
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
    * in BUCKET-ID order via `aggregate(array_sort(collect_list(...)))`,
    * mirrored by the oracle's `list_reduce(list(... ORDER BY bucket))`,
    * and the score is rounded to 6 dp to absorb ≤1-ulp cross-engine `ln`
    * drift. Scale shape: both fitted models are bucket-keyed count
    * tables with AT MOST `buckets` rows — broadcast-joined to the
    * per-doc bucket counts (never a shuffle on the model side); corpus
    * totals ride along as 1-row broadcasts. Per-doc state is one sorted
    * array bounded by min(doc feature count, buckets). */
  def dsirLogRatio(target: DataFrame, raw: DataFrame,
                   idCol: String, textCol: String,
                   buckets: Int = 1024): DataFrame = {
    require(buckets > 0)
    def bucketOcc(df: DataFrame) = df
      .select(col(idCol), graft.functions.TextFns.tokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(ngramFeatures(col("toks"))).as("f"))
      .select(col(idCol), (md5Int(col("f"), 8) % buckets).as("b"))
    val tgtCounts = bucketOcc(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val rawOcc    = bucketOcc(raw)
    val rawCounts = rawOcc.groupBy("b").agg(count(lit(1)).as("cr"))
    // coalesce: SUM over an EMPTY count table is NULL (an empty target
    // corpus must degrade to the uniform add-one model, not null scores)
    val totals = tgtCounts.agg(coalesce(sum(col("ct")), lit(0L)).as("__nt"))
      .crossJoin(rawCounts.agg(coalesce(sum(col("cr")), lit(0L)).as("__nr")))   // 1 row
    val perBucket = rawOcc
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("tf"))
      .join(broadcast(tgtCounts), Seq("b"), "left")
      .join(broadcast(rawCounts), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("b"), col("tf"),
        (col("tf") * (log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
            (col("__nt") + lit(buckets))) -
          log((coalesce(col("cr"), lit(0L)) + lit(1.0)) /
            (col("__nr") + lit(buckets))))).as("contrib"))
    perBucket.groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_feats"),
        aggregate(
          transform(array_sort(collect_list(struct(col("b"), col("contrib")))),
            x => x.getField("contrib")),
          lit(0.0), (acc, x) => acc + x).as("__sum"))
      .select(col(idCol), col("n_feats"),
        round(col("__sum"), 6).as("log_ratio"))
  }
}
