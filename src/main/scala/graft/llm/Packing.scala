package graft.llm

import graft.operators.Ranks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: lay the corpus out as fixed-token-budget training
  * sequences — the step between a curated corpus and a dataloader. Each
  * document is assigned to the sequence containing its global token START
  * offset (documents are laid end-to-end in a deterministic total order),
  * which is the standard "concatenate and chunk" packing: a document
  * whose tokens straddle a boundary belongs to the sequence it starts
  * in, exactly as a dataloader reading the concatenated token stream
  * would begin it there.
  *
  * The global offset is the scale-sensitive part: a naive
  * `SUM(n) OVER (ORDER BY id)` is an un-partitioned window — one task
  * sorts the corpus. [[Ranks.globalCumSum]] computes the identical
  * running sum via range-partition + per-partition offsets (two passes,
  * no single-task stage), bit-equal to the window form at any
  * parallelism since the accumulation is integral.
  */
object Packing {

  /** Per-document sequence assignment: `seq_id` (0-based) and
    * `seq_offset` (the document's first-token position within its
    * sequence), from `tokenCol` counts laid out in `idCol` order.
    * `idCol` must be unique — it is the layout's total order. */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "token budget must be positive")
    Ranks.globalCumSum(docs, Seq(col(idCol)), col(tokenCol), "__cum", partitions)
      .withColumn("__start", col("__cum") - col(tokenCol))
      .select(col(idCol), col(tokenCol).cast("long").as("n_tokens"),
        expr(s"__start div $budget").as("seq_id"),
        (col("__start") % budget).as("seq_offset"))
  }

  /** Deterministic corpus shard shuffle — the dataloader-facing layout
    * between curation and training: every document gets a pseudo-random
    * but REPRODUCIBLE (shard, shard_pos) coordinate, so two runs (or two
    * engines) produce the identical global training order with no RNG
    * state. The shuffle key is an md5 ticket of the id (the q118/q63
    * hashing convention — engine-portable, oracle-checkable); the shard
    * is the ticket's leading 16 bits mod `nShards`; the position is the
    * dense ticket-order rank WITHIN the shard.
    *
    * Scale contract: the per-shard rank is a PARTITIONED window — one
    * sort per shard, in parallel. Choose `nShards` so a shard is
    * dataloader-file-sized (a few GB): the per-shard sort is then
    * exactly the per-output-file writer sort a sharded export does
    * anyway, and no task sees more than one shard. */
  def shardShuffle(docs: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val ticket = md5(concat(lit("sh:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("ticket"), col(idCol))
    docs.select(col(idCol), ticket.as("ticket"))
      .withColumn("shard",
        (conv(substring(col("ticket"), 1, 4), 16, 10).cast("int") % nShards))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("shard_pos"), col("ticket"))
  }

  /** Shard-export MANIFEST: the per-shard validation record a sharded
    * corpus export writes next to its files so a consumer (or a re-run)
    * can verify completeness without re-reading the data — row count,
    * total characters, an ORDER-INDEPENDENT content signature (sum of a
    * 32-bit md5 prefix per row, so any dropped/duplicated/altered row
    * changes it regardless of row order), and the id range. Shard
    * assignment is [[shardShuffle]]'s md5-ticket convention, so the
    * manifest describes exactly the shards that operator lays out.
    *
    * 100 TB shape: ONE map-side-combining aggregation over a single scan
    * — no window, no sort; the manifest is nShards rows. */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val ticket = md5(concat(lit("sh:"), col(idCol).cast("string")))
    docs.select(col(idCol), col(textCol),
        (conv(substring(ticket, 1, 4), 16, 10).cast("int") % nShards).as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        sum(conv(substring(md5(col(textCol).cast("binary")), 1, 8), 16, 10)
          .cast("long")).as("content_sig"),
        min(col(idCol)).as("min_doc"), max(col(idCol)).as("max_doc"))
  }
}
