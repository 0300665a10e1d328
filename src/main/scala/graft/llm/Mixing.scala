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

  /** EXACT target-mixture downsample (the static DoReMi/Pile-weights
    * application step, where [[temperatureSample]] is the α-heuristic):
    * returns the LARGEST sub-corpus whose domain proportions follow
    * `targetShares` exactly up to floor rounding —
    *
    *   scale = min_d(n_d / s_d),  quota_d = floor(s_d · scale)
    *
    * — the binding domain keeps everything, every other domain keeps its
    * proportional quota. Domains absent from `targetShares` are dropped;
    * every share domain must be present in the data (a zero-count share
    * domain would silently zero EVERY quota via scale = 0 — refused).
    *
    * Per-domain selection is the deterministic md5-key order (unbiased
    * w.r.t. any value column, engine-portable), ranked with the
    * skew-safe grouped rank ([[graft.operators.Ranks.groupedRowNumber]]
    * — a PARTITION BY domain window would serialize on the dominant
    * domain at scale). Quotas are computed driver-side from the bounded
    * per-domain count aggregate (|domains| rows) with plain IEEE double
    * arithmetic, so a DuckDB oracle replays them bit-for-bit. */
  def matchTargetMix(df: DataFrame, domainCol: String, idCol: String,
                     targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0),
      "targetShares must be non-empty and positive")
    val spark = df.sparkSession
    import spark.implicits._
    val inMix = df.filter(col(domainCol).isin(targetShares.keys.toSeq: _*))
    val counts = inMix.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = targetShares.keySet -- counts.keySet
    require(missing.isEmpty, s"share domains absent from data: $missing")
    val scale = targetShares.map { case (d, s) => counts(d) / s }.min
    val quotas = targetShares.toSeq.map { case (d, s) =>
      d -> math.floor(s * scale).toLong
    }
    val quotaDf = broadcast(quotas.toDF(domainCol, "__quota"))
    graft.operators.Ranks.groupedRowNumber(inMix, Seq(domainCol),
        Seq(md5(col(idCol).cast("string")), col(idCol)), "__rnk")
      .join(quotaDf, Seq(domainCol))
      .filter(col("__rnk") <= col("__quota"))
      .select(df.columns.map(col): _*)
  }
}
