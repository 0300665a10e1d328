package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binning operators (SURVEY §2.2 P12 fixed bins, P13 quantile bins). */
object Bins {
  /** P12: fixed right-closed boundary bins, `pd.cut` semantics
    * (customer_analytics_dag.py:88-92): value ≤ edge(i) → label(i),
    * else last label. `labels.size == edges.size + 1`. */
  def fixedBins(c: Column, edges: Seq[Double], labels: Seq[String]): Column = {
    require(labels.size == edges.size + 1, "labels must be edges+1")
    val chain = edges.zip(labels).foldRight(lit(labels.last): Column) {
      case ((edge, label), elseC) => when(c <= edge, label).otherwise(elseC)
    }
    // pd.cut maps NaN -> NaN; a naive CASE chain would fall through to the
    // last label on NULL *or NaN* input (NaN fails every <=), so guard both.
    when(c.isNull || isnan(c.cast("double")), lit(null).cast("string")).otherwise(chain)
  }

  /** P13: 4-tile (or k-tile) quantile bins via a rank window — NTILE
    * semantics (equal COUNTS per bucket; matches a SQL NTILE oracle
    * exactly, which is why q19/q09 use it). NOTE: NULL values sort first
    * and land in tile 1 — that IS what the NTILE oracle computes, but it
    * differs from pd.qcut, which maps NaN/NULL to null; the pd.qcut-parity
    * path is [[qcutBins]]. `tieBreak` must make the ordering total
    * (e.g. the table's key) so bucket assignment is deterministic.
    *
    * NOTE (100 TB): `ntile` over an un-partitioned window is a global sort
    * into one task — fine for the dimension-sized inputs it is used on here
    * (part, per-customer aggregates); for fact-sized inputs use
    * [[approxQuantileBins]], which is a 2-pass scan with no global sort.
    */
  def ntileBins(df: DataFrame, c: Column, tieBreak: Column, k: Int,
                labels: Seq[String], out: String): DataFrame = {
    require(labels.size == k)
    val w = Window.orderBy(c.asc, tieBreak.asc)
    val lbl = labels.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (l, i)) => when(col("__tile") === (i + 1), l).otherwise(acc)
    }
    df.withColumn("__tile", ntile(k).over(w))
      .withColumn(out, lbl)
      .drop("__tile")
  }

  /** [[ntileBins]] with identical NTILE-exact semantics but NO
    * single-partition window: ranks come from [[Ranks.distributedNtile]]
    * (range-partition + offset two-pass), so the same oracle SQL matches
    * while the plan scales to fact-sized inputs. Costs one extra shuffle
    * and a bounded driver collect of per-partition counts. */
  def distributedNtileBins(df: DataFrame, c: Column, tieBreak: Column, k: Int,
                           labels: Seq[String], out: String): DataFrame = {
    require(labels.size == k)
    val lbl = labels.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (l, i)) => when(col("__tile") === (i + 1), l).otherwise(acc)
    }
    Ranks.distributedNtile(df, Seq(c.asc, tieBreak.asc), k, "__tile")
      .withColumn(out, lbl)
      .drop("__tile")
  }

  /** P13 with EXACT `pd.qcut` semantics: right-closed bins at the linear-
    * interpolated quantile edges (numpy's default method, which qcut uses),
    * from Spark's exact `percentile` aggregate. Two passes: one aggregation
    * producing k-1 edge doubles (a single tiny row, broadcast back), one
    * labeling projection — NO global sort and no tie-break column needed
    * (contrast [[ntileBins]], which equalizes bucket COUNTS and so is only
    * qcut-like when values are distinct). Edge arithmetic is bit-identical
    * to DuckDB's `quantile_cont` (verified at both test SFs), so the bins
    * are oracle-exact. */
  def qcutBins(df: DataFrame, colName: String, k: Int,
               labels: Seq[String], out: String): DataFrame = {
    require(labels.size == k)
    val probs = (1 until k).map(_.toDouble / k)
    // pd.qcut computes quantiles over non-NaN values only; percentile
    // skips NULLs itself but would rank NaN as the greatest double
    val edges = df.filter(!isnan(col(colName).cast("double"))).agg(
      expr(s"percentile($colName, array(${probs.mkString(", ")}))").as("__edges"))
    val chain = (0 until k - 1).foldRight(lit(labels.last): Column) { (i, elseC) =>
      when(col(colName) <= col("__edges").getItem(i), labels(i)).otherwise(elseC)
    }
    df.crossJoin(broadcast(edges))
      .withColumn(out,
        // NULL and NaN -> null, pd.cut/qcut parity (NaN fails every <= and
        // would otherwise fall through to the LAST label — same guard as
        // fixedBins)
        when(col(colName).isNull || isnan(col(colName).cast("double")),
          lit(null).cast("string")).otherwise(chain))
      .drop("__edges")
  }

  /** Scale path for P13: approximate quantile edges (Greenwald-Khanna sketch,
    * single pass, driver gets only k-1 doubles) + a broadcast CASE. Not
    * oracle-exact on ties; used where data is fact-sized. */
  def approxQuantileBins(df: DataFrame, colName: String, k: Int,
                         labels: Seq[String], out: String,
                         relErr: Double = 1e-4): DataFrame = {
    require(labels.size == k)
    val probs = (1 until k).map(_.toDouble / k).toArray
    val edges = df.stat.approxQuantile(colName, probs, relErr)
    df.withColumn(out, fixedBins(col(colName), edges.toSeq, labels))
  }
}
