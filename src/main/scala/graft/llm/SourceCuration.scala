package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain/source-level curation — the C4/RefinedWeb stage that judges
  * PROVENANCE, not documents: a web-scale corpus is dominated by a few
  * domains, some of them boilerplate mills or PII-heavy, and the
  * published pipelines both (a) blocklist low-reputation domains
  * wholesale and (b) cap any single domain's contribution so the mix
  * isn't owned by whoever published the most pages.
  *
  * Both operators are built from this package's per-document signals
  * ([[TextStats.qualityScore]], [[Pii]] match counts, [[Dedup]]'s
  * normalized-text keep convention) aggregated per source — one
  * map-side-combining aggregation over doc-keyed inputs; nothing
  * pairwise, no window over the corpus. The per-source means use the
  * decimal-exact-sum recipe (order-independent, so the report is
  * bit-stable across partitionings and engines — the q98 centroid
  * rationale).
  */
object SourceCuration {

  /** Per-source reputation report: one row per source with document
    * count, exact-duplicate count (docs that are NOT their normalized-
    * text group's min-id representative — [[Dedup]]'s keep convention),
    * total PII matches (email+phone+IP over the ORIGINAL text), token
    * mass, mean quality (decimal-exact sum, round 6), and the composite
    * `keep` verdict: mean quality ≥ `minMeanQuality` AND PII matches per
    * doc ≤ `maxPiiPerDoc` AND duplicate fraction ≤ `maxDupRatio`. */
  def sourceReputation(docs: DataFrame, idCol: String, textCol: String,
                       sourceCol: String,
                       minMeanQuality: Double = 0.45,
                       maxPiiPerDoc: Double = 1.5,
                       maxDupRatio: Double = 0.5): DataFrame = {
    val quality = TextStats.qualityScore(docs, idCol, textCol)
      .select(col(idCol), col("quality_score"))
    val pii = Pii.scrub(docs, idCol, textCol)
      .select(col(idCol),
        (col("n_email") + col("n_phone") + col("n_ip")).as("__pii"))
    // a doc is a duplicate iff it is not its normalized-text group's
    // min-id representative
    val rep = docs
      .groupBy(md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
        .as("__norm"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), lit(true).as("__is_rep"))
    val perDoc = docs
      .select(col(idCol), col(sourceCol).as("source"),
        size(graft.functions.TextFns.tokens(col(textCol))).cast("long")
          .as("__tok"))
      .join(quality, Seq(idCol))
      .join(pii, Seq(idCol))
      .join(rep, Seq(idCol), "left")
    perDoc.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__is_rep").isNull, 1L).otherwise(0L)).as("dup_docs"),
        sum(col("__pii")).as("pii_matches"),
        sum(col("__tok")).as("total_tokens"),
        round(
          sum(col("quality_score")
              .cast(org.apache.spark.sql.types.DecimalType(20, 15)))
            .cast("double") / count(lit(1)), 6).as("mean_quality"))
      .withColumn("keep",
        col("mean_quality") >= minMeanQuality &&
          col("pii_matches").cast("double") / col("n_docs") <= maxPiiPerDoc &&
          col("dup_docs").cast("double") / col("n_docs") <= maxDupRatio)
  }

  /** Per-source contribution cap: each source keeps at most `cap` docs,
    * the best by (`quality_score` desc, id asc). The rank is
    * [[graft.operators.Ranks.groupedRowNumber]] — the skew-safe grouped
    * rank, because a PARTITION BY source window serializes on the
    * dominant domain at scale. Returns the kept docs with their
    * quality score and in-source rank attached. */
  def sourceCappedCorpus(docs: DataFrame, idCol: String, textCol: String,
                         sourceCol: String, cap: Int,
                         partitions: Int = 0): DataFrame = {
    require(cap > 0, "source cap must be positive")
    val scored = docs.select(col(idCol), col(sourceCol).as("source"))
      .join(TextStats.qualityScore(docs, idCol, textCol)
        .select(col(idCol), col("quality_score")), Seq(idCol))
    graft.operators.Ranks.groupedRowNumber(
        scored, Seq("source"),
        Seq(col("quality_score").desc, col(idCol).asc), "src_rank",
        partitions)
      .filter(col("src_rank") <= cap)
  }
}
