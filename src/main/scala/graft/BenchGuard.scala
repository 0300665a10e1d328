package graft

/** Pure decision logic for [[Bench]]'s noise detection — factored out of
  * the main so a spec can drive it with deliberately polluted windows
  * (the r8/r9 lesson: two consecutive rounds shipped bench JSONs whose
  * numbers needed judge-side adjudication because the trip wire was too
  * loose; a 1.68x start canary passed the old 2x wire while the suite's
  * numbers ran 1.2-3.2x inflated).
  */
object BenchGuard {

  /** Canary trip factor: any canary sample (start / mid-suite / end)
    * above `CanaryFactor` x its recorded clean-window baseline marks the
    * WHOLE window suspect. 1.5 (was 2.0): the r9 driver window shipped
    * 1.4x-off numbers under a 1.68x canary, so the wire must sit below
    * that; clean-window canary history at sf0.1 varies 0.20-0.48 s
    * against the 0.40 s baseline (max ratio ~1.2), so 1.5 keeps margin
    * on both sides. */
  val CanaryFactor = 1.5

  /** Per-query retry factor: a query measuring above `RetryFactor` x its
    * recorded BASELINE.md row gets one isolated re-measure before the
    * JSON line is emitted (min of both passes) — co-tenant load arriving
    * mid-suite inflates individual queries even when every canary
    * bracket is clean. */
  val RetryFactor = 2.0

  /** True when any canary sample exceeds [[CanaryFactor]] x baseline.
    * No baseline recorded for this SF -> None ("unknown", never
    * "clean"). */
  def noiseSuspect(canaries: Seq[Double], baseline: Option[Double]): Option[Boolean] =
    baseline.map(b => canaries.max > CanaryFactor * b)

  /** True when a measured wall exceeds [[RetryFactor]] x the query's
    * recorded baseline (false when no baseline row exists — new queries
    * can't retry against a number that was never measured). */
  def needsRetry(measuredSec: Double, baselineSec: Option[Double]): Boolean =
    baselineSec.exists(b => measuredSec > RetryFactor * b)
}
