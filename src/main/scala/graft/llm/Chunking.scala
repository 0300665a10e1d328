package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into overlapping
  * fixed-size token windows — the per-document counterpart of
  * [[Packing]]'s cross-document concatenate-and-chunk. This is the
  * standard retrieval/embedding prep (stride < size keeps boundary
  * context in both neighbors) and the long-document answer for models
  * with a context limit.
  *
  * Shape at scale: a pure projection + `explode` — a flatMap with NO
  * shuffle, cost linear in tokens scanned, embarrassingly parallel at
  * any corpus size. Window starts are `sequence(0, n-1, stride)` so
  * even an empty document yields its one (empty) chunk and every
  * chunk carries at least one token; the slice arithmetic is integral
  * and position-based, so output is deterministic under any
  * partitioning.
  */
object Chunking {

  /** One row per (document, window): `chunk_idx` (0-based), the window's
    * `start_token` offset, its actual `chunk_tokens` length (the last
    * window is short), and the re-joined `chunk_text`. Tokens are the
    * whitespace-split lowercase terms used across the text family
    * (TextStats). `stride` ≤ `size` gives overlapping windows. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    // stride > size would silently skip the tokens between windows,
    // violating the every-token-covered contract documented above
    require(stride <= size, "stride must be <= size (windows must cover every token)")
    docs
      // NULL text behaves as the empty document (one empty chunk) rather
      // than vanishing: size(split(NULL)) is NULL, and explode over a NULL
      // sequence would emit no row at all for the document
      .select(col(idCol),
        split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+").as("__toks"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      .withColumn("start_token",
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(stride))))
      .select(col(idCol),
        (col("start_token") / stride).cast("long").as("chunk_idx"),
        col("start_token").cast("long"),
        least(lit(size), col("__n") - col("start_token")).cast("long")
          .as("chunk_tokens"),
        array_join(slice(col("__toks"), col("start_token") + 1, lit(size)), " ")
          .as("chunk_text"))
  }
}
