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

  /** Whitespace tokens of a lower-cased trimmed text EXPRESSION — must
    * match `TextFns.tokens`. */
  def toksOfSql(textExpr: String): String =
    s"""string_split_regex(lower(trim($textExpr)), '\\s+')"""

  /** Whitespace tokens of the lower-cased trimmed text — must match
    * `TextFns.tokens`. */
  val toksSql: String = toksOfSql("text")

  /** The PII redaction chain over a text expression — generated from
    * [[graft.llm.Pii.defaultRules]] so the oracle can't drift from the
    * engine's rule list, patterns, or application order. */
  def piiRedactSql(textExpr: String): String =
    graft.llm.Pii.defaultRules.foldLeft(textExpr)((acc, r) =>
      s"regexp_replace($acc, '${r.pattern}', '${r.replacement}', 'g')")

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
