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

  /** Whitespace tokens of the lower-cased trimmed text — must match
    * `TextFns.tokens`. */
  val toksSql: String = """string_split_regex(lower(trim(text)), '\s+')"""

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
