package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group closed-form OLS regression + Pearson correlation — the SQL
  * `REGR_SLOPE`/`REGR_INTERCEPT`/`CORR` family computed scale-correctly:
  * ONE map-side-combining aggregation of EXACT sums (n as long; Σx, Σy,
  * Σxy, Σx², Σy² as DECIMAL — associative and partition-order-free,
  * unlike double accumulation whose result depends on reduction order),
  * then the IEEE double formula applied once per group at finalize.
  * Rows-out = groups; nothing but the sums rides the exchange.
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
  *   intercept = (Σy − slope·Σx) / n
  *   corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx·Σx) · √(n·Σy² − Σy·Σy))
  *
  * Results are round-6 (the repo's float-score hash-gating recipe — the
  * one division/sqrt is IEEE-deterministic, but rounding makes the seam
  * explicit); zero-variance groups yield NULL slope/corr (the SQL
  * contract). Rows with a NULL x or y are excluded (REGR_* semantics).
  * Inputs are capped at DECIMAL(12,2)/(18,2) so Σxy stays well inside
  * DECIMAL(38) at any realistic group size.
  */
object Stats {

  def regression(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    // a value outside its decimal range would cast to NULL and silently
    // vanish from the sums while n still counts the row — fail loudly
    // instead (the ngramJaccardPairs raise_error convention)
    def guarded(c: String, t: DecimalType) = {
      val casted = col(c).cast(t)
      when(col(c).isNotNull && casted.isNull,
        raise_error(lit(s"$c outside $t range")).cast(t)).otherwise(casted)
    }
    val x = guarded(xCol, DecimalType(12, 2))
    val y = guarded(yCol, DecimalType(18, 2))
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val sums = base.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    def d(c: String) = col(c).cast("double")
    val cov = d("n") * d("sxy") - d("sx") * d("sy")
    val varx = d("n") * d("sxx") - d("sx") * d("sx")
    val vary = d("n") * d("syy") - d("sy") * d("sy")
    val slope = when(varx =!= 0.0, cov / varx)
    val corr = when(varx =!= 0.0 && vary =!= 0.0,
      cov / (sqrt(varx) * sqrt(vary)))
    sums.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(slope, 6).as("slope"),
      round(when(varx =!= 0.0, (d("sy") - slope * d("sx")) / d("n")), 6)
        .as("intercept"),
      round(corr, 6).as("corr")): _*)
  }

  /** Pairwise Pearson correlation MATRIX over `cols` — the profiling
    * report's "which measures move together" panel, in ONE aggregation
    * pass: n + per-column Σx/Σx² + per-pair Σxy as DECIMAL(18,6) exact
    * sums (k columns → k(k+1)/2 + k + 1 aggregates, all map-side
    * combining), then the IEEE corr formula per pair at finalize
    * (round-6 seam; zero-variance pairs NULL). Rows with a NULL in ANY
    * column are excluded so every pair sees the same n (the listwise
    * convention — pairwise-complete would need per-pair counts). Output
    * is tall: one (col_a, col_b, n, corr) row per unordered pair. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.distinct.size == cols.size,
      "need at least two distinct columns")
    def guarded(c: String) = {
      val casted = col(c).cast(DecimalType(18, 6))
      when(col(c).isNotNull && casted.isNull,
        raise_error(lit(s"$c outside DECIMAL(18,6) range"))
          .cast(DecimalType(18, 6))).otherwise(casted)
    }
    val base = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = (count(lit(1)).as("n") +:
      cols.flatMap(c => Seq(sum(guarded(c)).as(s"s_$c"),
        sum(guarded(c) * guarded(c)).as(s"ss_$c")))) ++
      pairs.map { case (a, b) => sum(guarded(a) * guarded(b)).as(s"sp_${a}__$b") }
    val s = base.agg(aggs.head, aggs.tail: _*)
    def d(c: String) = col(c).cast("double")
    val rows = pairs.map { case (a, b) =>
      val cov = d("n") * d(s"sp_${a}__$b") - d(s"s_$a") * d(s"s_$b")
      val va = d("n") * d(s"ss_$a") - d(s"s_$a") * d(s"s_$a")
      val vb = d("n") * d(s"ss_$b") - d(s"s_$b") * d(s"s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("n").as("n"),
        round(when(va =!= 0.0 && vb =!= 0.0, cov / (sqrt(va) * sqrt(vb))), 6)
          .as("corr"))
    }
    s.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.col_a").as("col_a"), col("__r.col_b").as("col_b"),
        col("__r.n").as("n"), col("__r.corr").as("corr"))
  }
}
