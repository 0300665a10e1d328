package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency-ranked dense vocabulary — the frozen StringIndexer /
  * tokenizer-vocab build: token id = global rank by (count DESC, token
  * ASC), so id 1 is the most frequent token and the mapping is a pure
  * deterministic function of the corpus (engine-replayable, unlike
  * MLlib's StringIndexer whose ties depend on partition order).
  *
  * Scale shape: the rank runs over |vocab| rows (the token AGGREGATE,
  * not the corpus) through [[graft.operators.Ranks.globalRowNumber]] —
  * the range-partitioned two-pass rank, because a 1e8-token vocabulary
  * under a single global window is a one-task sort. Encoding joins the
  * frozen vocab onto the token stream (broadcast while the vocab fits,
  * shuffle join beyond); out-of-vocabulary tokens encode as id 0 — the
  * standard UNK convention, distinguishable because real ids start at 1.
  * The freeze-then-apply split is the same contract as dsirModels /
  * dupSpanModel: build once on the reference corpus, encode every batch
  * against the frozen table.
  */
object Vocab {

  /** Build the vocabulary over an (already exploded) token column:
    * one row per distinct token — (token, n, id), id ∈ [1, |vocab|]. */
  def build(tokens: DataFrame, tokenCol: String): DataFrame = {
    val counts = tokens.groupBy(col(tokenCol).as("token"))
      .agg(count(lit(1)).as("n"))
    graft.operators.Ranks.globalRowNumber(
      counts, Seq(col("n").desc, col("token").asc), "id")
      .select(col("token"), col("n"), col("id").cast("long").as("id"))
  }

  /** Encode a token column against a FROZEN vocab: adds `idOut` with the
    * token's id, 0 (UNK) for out-of-vocabulary tokens.
    * `hintBroadcast = false` drops the broadcast hint for vocabularies
    * too large to ship whole (the 1e8-token case) — the join then falls
    * back to Spark's threshold-driven choice (shuffle join at scale). */
  def encodeTokens(df: DataFrame, tokenCol: String, vocab: DataFrame,
                   idOut: String, hintBroadcast: Boolean = true): DataFrame = {
    // the vocab id rides under an internal alias so idOut = "id" works
    val v = vocab.select(col("token").as(tokenCol), col("id").as("__vocab_id"))
    df.join(if (hintBroadcast) broadcast(v) else v, Seq(tokenCol), "left")
      .withColumn(idOut, coalesce(col("__vocab_id"), lit(0L)))
      .drop("__vocab_id")
  }
}
