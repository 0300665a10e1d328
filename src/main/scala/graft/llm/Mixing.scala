package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus mixture control: temperature/alpha-weighted domain re-balancing,
  * the multilingual-pretraining recipe (p_d ∝ n_d^α with α < 1 flattening
  * the domain distribution; XLM-style language sampling, Pile-style source
  * weighting) realized as pure DOWN-sampling so it stays a one-pass
  * deterministic filter:
  *
  *   kept_d = n_d · r_d ∝ n_d^α  with  r_d = (n_min / n_d)^(1-α)
  *
  * — the smallest domain keeps everything, larger domains keep
  * progressively less, and the kept counts follow the α-tempered mixture
  * exactly (up to hash-uniformity noise). α = 1 is a no-op; α = 0 targets
  * the uniform mixture.
  *
  * Membership is the repo's deterministic md5-key cut (no RNG — same
  * engine-portable idiom as [[graft.sources.Sampling]]): a doc is kept iff
  * its first 4 md5 hex digits, read as an integer in [0, 65536), fall
  * below the domain's threshold. Rates are rounded to 6 decimals BEFORE
  * thresholding so the pow/divide float path can't flip a boundary doc
  * between engines (same rationale as the BM25 score rounding).
  *
  * Scale shape: one count aggregation (tiny — |domains| rows), a 1-row
  * min, and one broadcast join of the thresholds onto the corpus — the
  * corpus itself is touched once, filter-pushdown-friendly, no shuffle of
  * the data rows at all.
  */
object Mixing {

  /** Per-domain integer thresholds in [0, 65536]: domain, n, thr. */
  def domainThresholds(df: DataFrame, domainCol: String,
                       alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
    val nMin = counts.agg(min(col("n")).as("mn"))
    counts.crossJoin(broadcast(nMin))
      .withColumn("thr",
        floor(round(pow(col("mn").cast("double") / col("n"), 1 - alpha), 6)
          * 65536).cast("long"))
      .select(col(domainCol), col("n"), col("thr"))
  }

  /** Keep a deterministic α-tempered subsample of `df`; `idCol` must be a
    * stable unique id (the hash key). Adds no columns, drops no ordering
    * guarantees — a pure filter over the input. */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
                        alpha: Double): DataFrame = {
    val thr = domainThresholds(df, domainCol, alpha)
    val hashInt = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(thr.drop("n")), Seq(domainCol))
      .filter(hashInt < col("thr"))
      .drop("thr")
      .select(df.columns.map(col): _*)
  }
}
