package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass a training-data pipeline
  * runs before anything leaves curation: find personally-identifying
  * spans (emails, phone numbers, IP addresses) and replace them with
  * typed placeholder tags, reporting per-document match counts so the
  * pipeline can quarantine PII-dense sources.
  *
  * Pure column expressions (`regexp_extract_all` for counts on the
  * ORIGINAL text, a `regexp_replace` chain for the redaction) — one
  * projection over the corpus, whole-stage codegen, no shuffle. The
  * default patterns are deliberately ASCII-conservative so Java regex
  * and RE2-family engines agree token-for-token (no lookbehind, no
  * Unicode classes); redaction applies rules in declaration order, so
  * the output is deterministic even when patterns could overlap.
  */
object Pii {

  /** One scrub rule: `pattern` must be valid in BOTH Java regex and RE2
    * (no lookaround/backrefs); `replacement` is a literal tag. */
  final case class Rule(name: String, pattern: String, replacement: String)

  val email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
  val phone: Rule = Rule("phone",
    "\\b\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]")
  val ipv4: Rule = Rule("ip",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]")

  /** Email first (its matches contain digits a later numeric rule could
    * otherwise chew on), then phone, then IP. */
  val defaultRules: Seq[Rule] = Seq(email, phone, ipv4)

  /** The redaction chain as a plain column expression, for callers that
    * rewrite a text column in place (e.g. the curation pipeline's scrub
    * stage) rather than carrying a separate `redacted` column. */
  def redact(c: org.apache.spark.sql.Column,
             rules: Seq[Rule] = defaultRules): org.apache.spark.sql.Column = {
    require(rules.nonEmpty, "at least one scrub rule required")
    rules.foldLeft(c)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))
  }

  /** Per-document scrub: `n_<rule>` match counts (on the original text)
    * plus the fully-redacted text. */
  def scrub(df: DataFrame, idCol: String, textCol: String,
            rules: Seq[Rule] = defaultRules): DataFrame = {
    require(rules.nonEmpty, "at least one scrub rule required")
    val t = col(textCol)
    val counts = rules.map(r =>
      size(regexp_extract_all(t, lit(r.pattern), lit(0))).cast("long").as(s"n_${r.name}"))
    df.select((col(idCol) +: counts) :+ redact(t, rules).as("redacted"): _*)
  }
}
