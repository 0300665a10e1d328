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
}
