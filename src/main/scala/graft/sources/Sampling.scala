package graft.sources

import org.apache.spark.sql.DataFrame

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

  /** J6: close a fact table over a sampled dimension — keep only fact rows
    * whose key appears in the sample. */
  def closeOver(fact: DataFrame, factKey: String,
                sampledDim: DataFrame, dimKey: String): DataFrame =
    fact.join(sampledDim.select(dimKey).withColumnRenamed(dimKey, factKey),
      Seq(factKey), "left_semi")
}
