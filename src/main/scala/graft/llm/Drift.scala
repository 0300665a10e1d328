package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-snapshot drift monitoring — the "did this month's crawl change
  * under us" report a continuously-ingesting training pipeline runs before
  * it retrains: compare two corpus snapshots on (a) the token-count
  * distribution via the Population Stability Index over fixed bins and
  * (b) vocabulary overlap (distinct-token Jaccard).
  *
  * Reference scope: the reference pipeline re-profiles each load
  * (/root/reference/src/utils/data_profiler.py — per-column stats on every
  * run) but has no cross-run comparison; this is that missing step,
  * expressed as two snapshot-vs-snapshot aggregates.
  *
  * 100 TB shape: each side collapses to a K-row (bin, count) table in ONE
  * map-side-combining aggregation per snapshot — the joins/crossJoins
  * downstream all operate on K ≤ a few dozen rows (broadcast, no data
  * shuffle). Vocabulary overlap is one groupBy-token per side (the same
  * shape as building a term dictionary) and one join on token.
  *
  * Determinism: bin shares use Laplace smoothing ((cnt + 0.5)/(N + K/2))
  * so empty bins never divide by zero and the PSI term is total; the
  * per-bin PSI term is rounded to 6 decimals (the bigram-LM precedent for
  * transcendental outputs — ln may differ between engines in the last
  * ulp), and the TOTAL is a sum of the rounded terms as DECIMAL(18,6),
  * which is associative-exact and therefore partition-order-independent.
  */
object Drift {

  /** Fixed-width bin id for a non-negative integral value: `value div
    * binWidth`, clamped to the last of `nBins` bins. Fixed boundaries —
    * never data-derived — so two snapshots (and two engines) always bin
    * identically. */
  private def binOf(valueCol: String, binWidth: Long, nBins: Int): Column =
    least(expr(s"$valueCol div $binWidth"), lit(nBins - 1L)).cast("int")

  private def binnedCounts(df: DataFrame, valueCol: String, binWidth: Long,
                           nBins: Int, cntName: String): DataFrame =
    df.select(binOf(valueCol, binWidth, nBins).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(cntName))

  /** Per-bin PSI report between snapshot `a` and snapshot `b` over
    * `valueCol` (e.g. a per-doc token count): one row per fixed bin with
    * both counts, smoothed shares, and the PSI term
    * (share_a − share_b)·ln(share_a/share_b).
    *
    * Two scans total (one per snapshot — at scale the snapshots are
    * separate tables); everything after the two K-row aggregates is
    * broadcast-sized. */
  def psiByBin(a: DataFrame, b: DataFrame, valueCol: String,
               binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 1, "need binWidth > 0 and nBins > 1")
    val spine = a.sparkSession.range(nBins).select(col("id").cast("int").as("bin"))
    val joined = spine
      .join(binnedCounts(a, valueCol, binWidth, nBins, "cnt_a"), Seq("bin"), "left")
      .join(binnedCounts(b, valueCol, binWidth, nBins, "cnt_b"), Seq("bin"), "left")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val totals = joined.agg(sum("cnt_a").as("__na"), sum("cnt_b").as("__nb"))
    val pa = (col("cnt_a") + lit(0.5)) / (col("__na") + lit(nBins * 0.5))
    val pb = (col("cnt_b") + lit(0.5)) / (col("__nb") + lit(nBins * 0.5))
    joined.crossJoin(broadcast(totals))
      .withColumn("share_a", round(pa, 6))
      .withColumn("share_b", round(pb, 6))
      .withColumn("psi_term", round((pa - pb) * log(pa / pb), 6))
      .select("bin", "cnt_a", "cnt_b", "share_a", "share_b", "psi_term")
  }

  /** Distinct-token vocabularies of the two snapshots compared: one row
    * with per-side vocabulary sizes, the shared-token count, and their
    * Jaccard. `tokensCol` must evaluate to ARRAY<STRING> (pass
    * `TextFns.tokens(col(text))` to stay in lockstep with the engine's
    * tokenizer). */
  def vocabOverlap(a: DataFrame, b: DataFrame, tokensCol: Column): DataFrame = {
    def vocab(df: DataFrame) =
      df.select(explode(tokensCol).as("tok")).distinct()
    val va = vocab(a).cache()
    val vb = vocab(b).cache()
    val na = va.agg(count(lit(1)).as("vocab_a"))
    val nb = vb.agg(count(lit(1)).as("vocab_b"))
    val shared = va.join(vb, Seq("tok")).agg(count(lit(1)).as("vocab_shared"))
    na.crossJoin(broadcast(nb)).crossJoin(broadcast(shared))
      .withColumn("vocab_jaccard",
        round(col("vocab_shared") /
          (col("vocab_a") + col("vocab_b") - col("vocab_shared")), 6))
  }

  /** One-row drift summary: doc counts, total PSI (decimal-exact sum of
    * the rounded per-bin terms of [[psiByBin]]), and the vocabulary
    * overlap columns of [[vocabOverlap]]. */
  def driftSummary(a: DataFrame, b: DataFrame, valueCol: String,
                   binWidth: Long, nBins: Int, tokensCol: Column): DataFrame = {
    val psi = psiByBin(a, b, valueCol, binWidth, nBins)
      .agg(sum(col("cnt_a")).as("docs_a"), sum(col("cnt_b")).as("docs_b"),
        sum(col("psi_term").cast("decimal(18,6)")).cast("double").as("total_psi"))
    psi.crossJoin(broadcast(vocabOverlap(a, b, tokensCol)))
      .select("docs_a", "docs_b", "total_psi",
        "vocab_a", "vocab_b", "vocab_shared", "vocab_jaccard")
  }

  /** Two-sample Kolmogorov–Smirnov statistic over a NUMERIC column — the
    * unbinned companion to [[psiByBin]] (PSI sees only what its fixed
    * bins resolve; KS is the sup-norm CDF distance at full resolution).
    * One row: sample sizes, the KS statistic, and the value where the
    * sup is attained (smallest such value on ties).
    *
    * Exactness: the sup runs over INTEGER-scaled deviations
    * |cumA·nB − cumB·nA| — an argmax over exact longs, so the winner is
    * partition-order-free and engine-identical; ONE double division at
    * the end (round-6 seam). The cumulative counts come from
    * [[graft.operators.Ranks.globalCumSum]] — the range-partitioned
    * two-pass running sum, because `SUM OVER (ORDER BY v)` at full value
    * resolution under a single window is a one-task global sort.
    * `isA` labels side A; rows with a NULL value are excluded. */
  def ks2Sample(df: DataFrame, valueCol: String, isA: Column): DataFrame = {
    import graft.operators.Ranks
    val g = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"), when(isA, 1L).otherwise(0L).as("__ia"))
      .groupBy("v").agg(sum(col("__ia")).as("an"),
        sum(lit(1L) - col("__ia")).as("bn"))
    val cum = Ranks.globalCumSums(g, Seq(col("v").asc),
      Seq("ca" -> col("an"), "cb" -> col("bn")))
    val totals = g.agg(sum("an").as("n_a"), sum("bn").as("n_b"))
    // an all-one-side input would yield n_a·n_b = 0 and a 0/0 = NaN
    // statistic — garbage rows; fail loudly instead (the Stats.regression
    // raise_error convention). A fully EMPTY input stays an empty frame.
    val dev = cum.crossJoin(broadcast(totals))
      .withColumn("dd",
        when(col("n_a") === 0 || col("n_b") === 0,
          raise_error(lit("ks2Sample: one side has zero rows")).cast("long"))
        .otherwise(abs(col("ca") * col("n_b") - col("cb") * col("n_a"))))
    val mx = dev.agg(max("dd").as("__mx"))
    dev.crossJoin(broadcast(mx)).filter(col("dd") === col("__mx"))
      .groupBy("n_a", "n_b", "__mx")
      .agg(min(col("v")).as("at_value"))
      .select(col("n_a"), col("n_b"),
        round(col("__mx").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("ks_stat"),
        col("at_value"))
  }

  /** Chi-square independence report for a CATEGORICAL column across two
    * snapshots (the categorical companion to [[ks2Sample]]): one row per
    * category with both observed counts and its round-6 chi-square term
    * Σ_side (O − E)²/E, plus a TOTAL row whose statistic is the
    * DECIMAL(18,6) sum of the rounded terms — associative-exact, the
    * same partition-order-free total recipe as [[psiByBin]]. Expected
    * counts use the standard margin product E = rowTotal·sideTotal/N.
    * One map-side-combining aggregation over the data; everything after
    * is category-count-sized. */
  def chiSquare(df: DataFrame, catCol: String, isA: Column): DataFrame = {
    val g = df.select(col(catCol).as("category"),
        when(isA, 1L).otherwise(0L).as("__ia"))
      .groupBy("category").agg(sum(col("__ia")).as("n_a"),
        sum(lit(1L) - col("__ia")).as("n_b"))
    val totals = g.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    // an empty side makes every E = rowTotal·0/N = 0 and the term
    // (O−E)²/E = Infinity — garbage; fail loudly (ks2Sample convention).
    val withT = g.crossJoin(broadcast(totals))
      .withColumn("__n",
        when(col("__ta") === 0 || col("__tb") === 0,
          raise_error(lit("chiSquare: one side has zero rows"))
            .cast("double"))
        .otherwise((col("__ta") + col("__tb")).cast("double")))
      .withColumn("__rt", (col("n_a") + col("n_b")).cast("double"))
    def term(o: Column, sideTotal: Column) = {
      val e = col("__rt") * sideTotal.cast("double") / col("__n")
      (o.cast("double") - e) * (o.cast("double") - e) / e
    }
    val perCat = withT
      .withColumn("chi2_term",
        round(term(col("n_a"), col("__ta")) + term(col("n_b"), col("__tb")), 6))
      .select(col("category"), col("n_a"), col("n_b"), col("chi2_term"))
    perCat.unionByName(
      perCat.agg(sum("n_a").as("n_a"), sum("n_b").as("n_b"),
          sum(col("chi2_term").cast("decimal(18,6)")).cast("double")
            .as("chi2_term"))
        .select(lit("TOTAL").as("category"), col("n_a"), col("n_b"),
          col("chi2_term")))
  }
}
