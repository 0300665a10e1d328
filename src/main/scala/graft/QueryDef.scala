package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Queries without an oracle get the driver's weaker rows-only
  * check and are additionally property-tested in `src/test`.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Queries gated by a committed golden parquet instead of re-expressible
    * SQL (hash-family/ANN/generator algorithms DuckDB cannot reproduce).
    * Their outputs are deterministic by construction, so the oracle is a
    * `read_parquet` of the snapshot — a full rows+schema+hash gate. The
    * driver verifies at sf0.01 (the committed label); regenerate with
    * `runMain graft.tools.MakeGolden` after any intended output change.
    * GoldenSpec replays the sf0.001 snapshots in CI. */
  val goldenGated: Seq[String] = Seq(
    "q38_synthetic_events", "q43_dedup_minhash_lsh", "q44_dedup_simhash",
    "q47_ann_ivf_topk", "q53_ann_lsh_buckets", "q59_ann_ivf_kmeans",
    "q61_multimodal_ann", "q66_curation_funnel", "q67_winnowing_pairs",
    "q91_ann_pq")

  def golden(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef = {
    require(goldenGated.contains(name), s"$name missing from goldenGated")
    QueryDef(name, fn,
      Some(s"SELECT * FROM read_parquet('/root/repo/golden/sf0.01/$name.parquet')"))
  }
}
