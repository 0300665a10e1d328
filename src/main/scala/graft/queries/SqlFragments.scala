package graft.queries

/** The DuckDB oracle-SQL fragments that MUST stay in lockstep with the
  * engine's token/shingle semantics ([[graft.functions.TextFns]]): one
  * definition, imported by every query module, so a tokenizer change
  * can't silently leave one module's oracles gating stale semantics
  * (previously TextQueries and CurationQueries carried hand-synced
  * copies).
  */
private[queries] object SqlFragments {

  /** Literal `\s` for use inside s-interpolated SQL. */
  val ws: String = "\\s"

  /** A string embedded in a single-quoted SQL literal: embedded quotes
    * double (`'` → `''`) so a future rule/stopword containing one can't
    * break — or silently truncate — the generated oracle. */
  private def sqlLit(s: String): String = s.replace("'", "''")

  /** A regex embedded in a single-quoted SQL literal: quote-escaped like
    * [[sqlLit]], plus a guard that the pattern stays inside the RE2
    * subset DuckDB executes — Java-only syntax (lookaround `(?=`/`(?!`/
    * `(?<`, backreferences `\1`) would compile in Spark but diverge or
    * fail in the oracle, exactly the silent-drift class this blocks. */
  private def sqlRegex(p: String): String = {
    require(!p.contains("(?=") && !p.contains("(?!") && !p.contains("(?<"),
      s"regex uses lookaround, which DuckDB's RE2 lacks: $p")
    require(!"\\\\[1-9]".r.findFirstIn(p).isDefined,
      s"regex uses a backreference, which DuckDB's RE2 lacks: $p")
    sqlLit(p)
  }

  /** Whitespace tokens of a lower-cased trimmed NFC-normalized text
    * EXPRESSION — must match `TextFns.tokens` (NFC is the identity on
    * the ASCII fixtures, so pre-r12 oracle values are unchanged; the
    * q214 non-ASCII gate pins the cross-engine NFC agreement). */
  def toksOfSql(textExpr: String): String =
    s"""string_split_regex(lower(trim(nfc_normalize($textExpr))), '\\s+')"""

  /** Whitespace tokens of the lower-cased trimmed text — must match
    * `TextFns.tokens`. */
  val toksSql: String = toksOfSql("text")

  /** The PII redaction chain over a text expression — generated from
    * [[graft.llm.Pii.defaultRules]] so the oracle can't drift from the
    * engine's rule list, patterns, or application order. */
  def piiRedactSql(textExpr: String): String =
    graft.llm.Pii.defaultRules.foldLeft(textExpr)((acc, r) =>
      s"regexp_replace($acc, '${sqlRegex(r.pattern)}', '${sqlLit(r.replacement)}', 'g')")

  /** Total PII match count over a text expression — the sum of all
    * default-rule matches, mirroring [[graft.llm.Pii.scrub]]'s per-rule
    * counts. */
  def piiCountSql(textExpr: String): String =
    "CAST(" + graft.llm.Pii.defaultRules
      .map(r => s"len(regexp_extract_all($textExpr, '${sqlRegex(r.pattern)}'))")
      .mkString(" + ") + " AS BIGINT)"

  /** The quality-score CTE pair over `src` (a table/CTE with (doc_id,
    * text)): `qs` = the base stats, `q` = `qs` plus `quality_score` —
    * must match `TextStats.stats`/`TextStats.qualityScore` (stopword set
    * generated from [[graft.llm.TextStats.stopwords]] so the oracles
    * can't drift from the engine's list). `extraCols` (e.g. " source,")
    * rides through both CTEs. */
  def qualityCtesSql(src: String, extraCols: String = ""): String = {
    val sw = graft.llm.TextStats.stopwords.map(w => s"'${sqlLit(w)}'").mkString(", ")
    s"""qs AS (
       |  SELECT doc_id,$extraCols
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter($toksSql, t -> t IN ($sw))) AS DOUBLE)
       |      / len($toksSql) AS stopword_ratio,
       |    CAST(length(regexp_replace(text, '$ws+', '', 'g')) AS DOUBLE) / len($toksSql) AS avg_token_len
       |  FROM $src),
       |q AS (SELECT qs.*,
       |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
       |      + least(stopword_ratio * 5.0, 1.0) * 0.3
       |      + CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN 0.2 ELSE 0.0 END AS quality_score
       |  FROM qs)""".stripMargin
  }

  /** Distinct space-joined n-gram shingles over an already-tokenized
    * list expression — must match `TextFns.shinglesFromTokens`. */
  def shinglesSql(toks: String, n: Int): String = {
    val gram = (0 until n)
      .map(j => if (j == 0) s"$toks[i]" else s"$toks[i+$j]")
      .mkString(" || ' ' || ")
    s"""list_distinct(list_transform(generate_series(1, greatest(len($toks)-${n - 1}, 0)),
       |  i -> $gram))""".stripMargin
  }
}
