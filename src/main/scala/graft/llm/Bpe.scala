package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the tokenizer-training
  * core over a corpus, in the classic Sennrich form:
  *
  *   1. pre-tokenize to a DISTINCT-word frequency table (the Zipf cut: the
  *      corpus may be 100 TB, but the distinct-word table is its
  *      vocabulary, orders of magnitude smaller — every subsequent round
  *      runs on that table only, never re-reading the corpus);
  *   2. each round, count adjacent symbol pairs weighted by word frequency
  *      (one explode + one sum-agg over the word table), take the single
  *      most frequent pair (count DESC, then lexicographic — a TOTAL order,
  *      so training is partitioning-independent and golden-gateable), and
  *      merge it left-to-right non-overlapping in every word;
  *   3. emit the merge table (rank, left, right, merged, pair_count) — the
  *      artifact a tokenizer consumes.
  *
  * The driver sees ONE row per round (the argmax pair); per-round lineage
  * is localCheckpoint-truncated (the iterative-loop rule from
  * [[Clusters.connectedComponents]] — cached logical plans double per
  * round and OOM analysis otherwise).
  */
object Bpe {

  /** Whitespace pre-tokenizer → distinct-word frequency table
    * (word, n). Matches the repo-wide token definition
    * (lower + trim + split on `\s+`). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Adjacent symbol pairs of `syms` as structs (l, r); empty for
    * single-symbol words. */
  private def adjacentPairs(syms: org.apache.spark.sql.Column) =
    zip_with(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** One left-to-right non-overlapping merge of (x, y) → xy inside a
    * symbol array (the greedy BPE application order: "aaa" under (a,a)
    * becomes ["aa","a"], not ["a","aa"] or ["aaa"]). */
  private def mergeOnce(syms: org.apache.spark.sql.Column,
                        x: String, y: String) =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(x) && s === lit(y),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(x + y))))
          .otherwise(concat(acc, array(s))))

  /** Train `rounds` BPE merges over the corpus; returns
    * (merge_rank, left, right, merged, pair_count), one row per learned
    * merge, rank-ordered. Stops early if no adjacent pair remains. */
  def trainMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds > 0, "rounds must be positive")
    val spark = df.sparkSession
    var words = graft.Checkpoints.pin(wordCounts(df, textCol)
      .select(split(col("word"), "").as("syms"), col("n")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to rounds if !exhausted) {
      val top = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("n"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, l + r, cnt))
        words = graft.Checkpoints.pin(
          words.withColumn("syms", mergeOnce(col("syms"), l, r)))
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
  }

  /** Apply a learned merge table to a corpus: tokenize each row's text
    * into BPE symbols under the merges, applied in rank order (the encode
    * side). `merges` is collected to the driver (vocab-sized) and compiled
    * into ONE codegen'd expression ([[graft.plans.BpeEncodeExpr]]) holding
    * a pair-to-rank hash index — plan size O(1) and per-word cost O(s²)
    * in the word length, both independent of the merge count, so a
    * production 32k-merge vocabulary analyzes and runs fine (the unrolled
    * reference form below is linear in merges on both axes). */
  def applyMerges(df: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val ranked = merges.select("merge_rank", "left", "right")
      .collect().sortBy(_.getInt(0))
      .map(m => (m.getString(1), m.getString(2))).toSeq
    val words = split(lower(trim(col(textCol))), "\\s+")
    df.withColumn("bpe_tokens", graft.plans.BpeExprs.bpeEncode(words, ranked))
  }

  /** Reference encode: the merge list unrolled into nested `aggregate`
    * column expressions, one [[mergeOnce]] pass per merge in rank order.
    * Semantically identical to [[applyMerges]] (TextPipelineSpec asserts
    * parity) but plan size and per-word cost are linear in the merge
    * count — kept as the executable specification the compiled expression
    * is checked against, not for production vocabularies. */
  def applyMergesUnrolled(df: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val ranked = merges.select("merge_rank", "left", "right")
      .collect().sortBy(_.getInt(0))
    val start = split(lower(trim(col(textCol))), "\\s+")
    // per word: char-split then fold the merge list
    val encoded = transform(start, w => {
      val chars = split(w, "")
      ranked.foldLeft(chars)((acc, m) =>
        mergeOnce(acc, m.getString(1), m.getString(2)))
    })
    df.withColumn("bpe_tokens", flatten(encoded))
  }
}
