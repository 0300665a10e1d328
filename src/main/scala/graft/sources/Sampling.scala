package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential-integrity-preserving sampler (SURVEY §2.6 T5 + §2.4 J6).
  *
  * The reference samples 10% of customers (seed 42) and then filters the
  * fact tables chunk-by-chunk with `isin(customer_ids)`
  * (data_sampling.py:16-97 — the id list is collected to the driver). Here
  * the dimension is sampled distributedly and the facts are closed over it
  * with `left_semi` joins: no driver-side key list, one shuffle per fact
  * (broadcast when the sampled dim is small). Row-for-row parity with
  * pandas' RNG is impossible (SURVEY §7.4.4); tests assert the statistical
  * fraction and referential closure instead.
  */
object Sampling {

  /** T5: seeded fraction sample of a dimension table. */
  def sampleDim(dim: DataFrame, fraction: Double, seed: Long): DataFrame =
    dim.sample(withReplacement = false, fraction, seed)

  /** T5, deterministic: key-hash sample — keep rows whose md5(key) falls in
    * the first `sixteenths` of 16 hex buckets (fraction = sixteenths/16).
    * Unlike the RNG sampler this is reproducible across engines, runs, and
    * partitionings (the property a 100 TB pipeline needs for re-runnable
    * extracts), and therefore oracle-checkable. */
  def hashSampleKey(key: Column, sixteenths: Int): Column = {
    require(sixteenths >= 0 && sixteenths <= 16)
    conv(substring(md5(key.cast("string").cast("binary")), 1, 1), 16, 10)
      .cast("int") < sixteenths
  }

  def sampleDimDeterministic(dim: DataFrame, keyCol: String,
                             sixteenths: Int): DataFrame =
    dim.filter(hashSampleKey(col(keyCol), sixteenths))

  /** T5, stratified: per-stratum sampling rates (in sixteenths), same
    * deterministic key-hash mechanism — the "keep 50% of rare-class rows
    * but 6% of the majority class" cut a training pipeline takes without
    * an RNG. One predicate, no shuffle, no per-stratum pass; rates are
    * folded into a single CASE in deterministic (sorted-key) order. */
  def stratifiedHashSample(df: DataFrame, stratumCol: Column, keyCol: Column,
                           rates: Map[String, Int],
                           defaultSixteenths: Int): DataFrame = {
    require((defaultSixteenths +: rates.values.toSeq).forall(s => s >= 0 && s <= 16))
    val sixteenths = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultSixteenths)) {
      case (acc, (stratum, rate)) => when(stratumCol === stratum, lit(rate)).otherwise(acc)
    }
    df.filter(
      conv(substring(md5(keyCol.cast("string").cast("binary")), 1, 1), 16, 10)
        .cast("int") < sixteenths)
  }

  /** T5, fixed-k per group: exactly `k` rows per group (fewer when the
    * group is smaller), chosen by md5-of-key order — the balanced
    * per-class subset an eval-set builder takes: unbiased w.r.t. any
    * value column, reproducible across engines/runs/partitionings, and
    * oracle-checkable. One window partitioned BY GROUP (never global);
    * the keyCol tie-break makes the pick total. */
  def perGroupDeterministic(df: DataFrame, groupCol: String, keyCol: String,
                            k: Int): DataFrame = {
    require(k > 0, "sample size k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Stratified k-fold assignment: fold = (md5-order rank within the
    * stratum − 1) mod k, so every stratum's rows spread across the k
    * folds with sizes differing by AT MOST ONE (exact balance — hash%k
    * folds are only binomially balanced), deterministic and
    * engine-replayable. Ranked with the skew-safe grouped rank
    * ([[graft.operators.Ranks.groupedRowNumber]] — a PARTITION BY
    * stratum window serializes on the dominant class at scale). The
    * cross-validation / sharded-eval split builder. */
  def stratifiedKFold(df: DataFrame, stratumCol: String, idCol: String,
                      k: Int): DataFrame = {
    require(k > 1, "need at least 2 folds")
    graft.operators.Ranks.groupedRowNumber(df, Seq(stratumCol),
        Seq(md5(col(idCol).cast("string").cast("binary")), col(idCol)), "__rnk")
      .withColumn("fold", ((col("__rnk") - 1) % k).cast("int"))
      .drop("__rnk")
  }

  /** T5, weighted: deterministic weight-proportional top-k — the "sample
    * ∝ quality" corpus downsample, without an RNG. Each row enters a
    * ticket race with `w` tickets (w = its integer weight clamped to
    * [1, maxWeight]); a ticket is `md5(id ":" i)`, the row's key is its
    * MINIMUM ticket, and the k smallest keys win. All Σw tickets are
    * i.i.d. uniform by the hash, so the global minimum belongs to row i
    * with probability exactly wᵢ/Σw (symmetry); successive minima give
    * the standard ticket-race approximation of weighted sampling without
    * replacement (a chosen row's remaining tickets stay in the order —
    * negligible for k ≪ distinct rows). Exact integer/string arithmetic
    * end-to-end: reproducible across engines, runs, and partitionings,
    * hence oracle-checkable — the reason to prefer this over float-keyed
    * Efraimidis-Spirakis (u^(1/w) ULPs differ across engines).
    *
    * Plan shape: ticket explode (flatMap, ≤ maxWeight rows per input) →
    * map-side-combining min-agg keyed by id → TakeOrdered k. No global
    * sort, no state beyond the k winners.
    *
    * Output schema is exactly (idCol, weight, ticket) — the input's other
    * columns are dropped, so a pre-existing `weight`/`ticket` column on
    * the input can't be silently replaced mid-pipeline (the weight
    * expression is evaluated against the ORIGINAL input row first). */
  def weightedTicketSample(df: DataFrame, idCol: String, weightCol: Column,
                           k: Int, maxWeight: Int = 16): DataFrame = {
    require(k > 0 && maxWeight >= 1)
    df.select(col(idCol),
        least(greatest(weightCol.cast("int"), lit(1)), lit(maxWeight)).as("weight"))
      .select(col(idCol), col("weight"),
        explode(sequence(lit(1), col("weight"))).as("__i"))
      .select(col(idCol), col("weight"),
        md5(concat_ws(":", col(idCol).cast("string"),
          col("__i").cast("string")).cast("binary")).as("__t"))
      .groupBy(col(idCol), col("weight"))
      .agg(min(col("__t")).as("ticket"))
      .orderBy(col("ticket"), col(idCol))
      .limit(k)
  }

  /** J6: close a fact table over a sampled dimension — keep only fact rows
    * whose key appears in the sample. */
  def closeOver(fact: DataFrame, factKey: String,
                sampledDim: DataFrame, dimKey: String): DataFrame =
    fact.join(sampledDim.select(dimKey).withColumnRenamed(dimKey, factKey),
      Seq(factKey), "left_semi")
}
