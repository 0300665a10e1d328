package graft.llm

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * features, and a stopword-profile language-ID heuristic. Pure column
  * expressions — scales as a single projection over the corpus.
  */
object TextStats {

  /** BPE-ish pre-tokenization regex: letter runs, digit runs, single
    * non-space symbols (ASCII-safe so Java and RE2-style engines agree). */
  val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with fixed priority order. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "zh" -> Seq("的", "了", "是", "我", "不"))

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))

  /** Per-document quality/statistics features. */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t    = col(textCol)
    val toks = TextFns.tokens(t)
    val nTok = size(toks).cast("long")
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      nTok.as("n_tokens"),
      size(regexp_extract_all(lower(t), lit(bpeishPattern), lit(0))).cast("long").as("n_bpeish_tokens"),
      (length(regexp_replace(t, "\\s+", "")).cast("double") / nTok).as("avg_token_len"),
      size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0))).cast("long").as("punct_count"),
      hits(toks, stopwords).cast("long").as("stopword_hits"),
      (hits(toks, stopwords).cast("double") / nTok).as("stopword_ratio"))
  }

  /** Quality score in [0,1]: a deterministic blend of length, token-shape
    * and stopword signals (double arithmetic on exact integer inputs). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    stats(docs, idCol, textCol).withColumn("quality_score",
      least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5 +
        least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3 +
        when(col("avg_token_len").between(3.0, 10.0), 0.2).otherwise(0.0))

  /** Stopword-profile language ID: count profile hits per language, take the
    * argmax in fixed priority order (ties → earlier profile). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val scored = docs.select(
      (col(idCol) +: langProfiles.map { case (l, ws) => hits(toks, ws).cast("long").as(s"s_$l") }): _*)
    val best = langProfiles.map(_._1).map(l => col(s"s_$l"))
    val maxScore = best.reduce((a, b) => greatest(a, b))
    val pred = langProfiles.map(_._1).foldRight(lit("unknown"): Column) { (l, elseC) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, l).otherwise(elseC)
    }
    scored.withColumn("predicted_lang", pred)
  }
}
