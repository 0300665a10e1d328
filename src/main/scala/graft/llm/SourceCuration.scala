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
    // total PII matches derived from Pii.defaultRules so a new rule
    // reaches this count and the oracle's piiCountSql in lockstep
    val piiTotal = Pii.defaultRules
      .map(r => size(regexp_extract_all(col(textCol), lit(r.pattern), lit(0)))
        .cast("long"))
      .reduce(_ + _)
    // ONE corpus scan for every row-wise signal: source, token count and
    // PII total ride qualityScore's projection via `carry`
    val perDocSignals = TextStats.qualityScore(docs, idCol, textCol,
      carry = Seq(col(sourceCol).as("source"), piiTotal.as("__pii")))
    // a doc is a duplicate iff it is not its normalized-text group's
    // min-id representative — Dedup's exact keep convention, via Dedup
    // itself so the two can't drift
    val rep = Dedup.exactGroups(docs, idCol, textCol, normalized = true)
      .select(col("keep_id").as(idCol), lit(true).as("__is_rep"))
    val perDoc = perDocSignals
      .select(col(idCol), col("source"), col("n_tokens").as("__tok"),
        col("__pii"), col("quality_score"))
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
    * dominant domain at scale. Returns the kept docs' FULL rows (every
    * `docs` column) with `quality_score` and `src_rank` attached: the
    * rank runs over a slim (id, source, score) projection so the text
    * never rides the range shuffle, and one keep-list join brings the
    * doc columns back — cheaper at corpus scale than shuffling full
    * rows through the two-pass rank. */
  def sourceCappedCorpus(docs: DataFrame, idCol: String, textCol: String,
                         sourceCol: String, cap: Int,
                         partitions: Int = 0): DataFrame = {
    require(cap > 0, "source cap must be positive")
    // one scan: source rides the quality projection via carry
    val scored = TextStats.qualityScore(docs, idCol, textCol,
        carry = Seq(col(sourceCol).as("source")))
      .select(col(idCol), col("source"), col("quality_score"))
    val kept = graft.operators.Ranks.groupedRowNumber(
        scored, Seq("source"),
        Seq(col("quality_score").desc, col(idCol).asc), "src_rank",
        partitions)
      .filter(col("src_rank") <= cap)
      .select(col(idCol), col("quality_score"), col("src_rank"))
    docs.join(kept, Seq(idCol))
  }
}
