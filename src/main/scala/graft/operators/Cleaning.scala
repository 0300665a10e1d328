package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-cleaning operators (SURVEY §2.2 P3/P6/P7 —
  * clean_product_v2.py:14-69 parity).
  *
  * The reference coerces ids with `pd.to_numeric(errors='coerce')`, drops
  * null/out-of-int32-range ids, and fills per-column defaults. Here each
  * step is one declarative column op: `try_cast` (coerce-to-null), a range
  * filter, and `na.fill` — all inside whole-stage codegen, pushdown-friendly.
  */
object Cleaning {

  /** P7: coerce a column to the target type, invalid values → null
    * (`pd.to_numeric(errors='coerce')`). */
  def coerce(c: Column, to: String): Column = c.cast("string").try_cast(to)

  /** P3: id-validity filter — not null and within int32 range
    * (clean_product_v2.py:35-50). */
  def validId(c: Column): Column =
    c.isNotNull && c.between(Int.MinValue.toLong, Int.MaxValue.toLong)

  /** P6: per-column default fill (clean_product_v2.py:56-59 shape). */
  def fillDefaults(df: DataFrame, defaults: Map[String, Any]): DataFrame =
    df.na.fill(defaults)

  /** Winsorization: clip `valueCol` to its [pLow, pHigh] exact
    * interpolated percentiles, rounded to `scale` decimals so the bounds
    * (and therefore every clipped value) live in the value's own decimal
    * domain — exact-percentile interpolation is cross-engine bit-stable
    * (the q68 property), and rounding the two BOUNDS once avoids pushing
    * full-precision doubles into downstream decimal sums. Plan shape:
    * one exact-percentile aggregate (single 1-row result broadcast back
    * via crossJoin — the quantile-edge pattern used by the binning
    * operators) + one clip projection; no shuffle of the data itself
    * beyond the aggregate's. At 100 TB swap the exact percentile for
    * approx_percentile with a documented tolerance — the clip projection
    * is unchanged. */
  def winsorize(df: DataFrame, valueCol: String,
                pLow: Double, pHigh: Double, scale: Int = 2): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh, "need 0 <= pLow < pHigh <= 1")
    val bounds = df.agg(
      round(expr(s"percentile($valueCol, $pLow)"), scale).as("__lo"),
      round(expr(s"percentile($valueCol, $pHigh)"), scale).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${valueCol}_winsorized",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .withColumn("__clipped",
        col(valueCol) < col("__lo") || col(valueCol) > col("__hi"))
  }
}
