package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives used by the LLM-pipeline operators
  * (graft.llm). Everything here is built from codegen'd Catalyst
  * expressions — no UDFs — so the hot path stays inside whole-stage codegen.
  */
object TextFns {
  /** Unicode NFC normalization — canonical composition ahead of every
    * hash/fingerprint below, so composed and decomposed spellings of the
    * same text can never split a near-dup cluster (zero-copy on ASCII;
    * [[graft.plans.NfcNormalizeExpr]]). The DuckDB oracle mirror is
    * `nfc_normalize`, kept in lockstep by SqlFragments. */
  def nfc(text: Column): Column = graft.plans.TextExprs.nfcNormalize(text)

  /** Whitespace-collapsed, lower-cased, NFC-normalized normalization. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(nfc(text))), "\\s+", " ")

  /** AGGRESSIVE (lossy) dedup key: NFKC compatibility fold (fullwidth
    * forms, ligatures) + UTS #39 confusable-skeleton fold (cross-script
    * homoglyphs: Cyrillic а → Latin a), then the standard lower/trim/ws
    * collapse. OPT-IN — never part of [[tokens]]/[[normalize]]: NFKC
    * erases meaningful distinctions and the skeleton erases script
    * identity, which is precisely what catching homoglyph-substituted
    * spam/boilerplate duplicates requires (q216) and what a faithful
    * default tokenization must not do. Equality of folds is the
    * contract, not identity (ASCII l/I/1 share one skeleton class). */
  def confusableFoldKey(text: Column): Column =
    regexp_replace(lower(trim(
      graft.plans.TextExprs.confusableSkeleton(
        graft.plans.TextExprs.nfkcNormalize(text)))), "\\s+", " ")

  /** Whitespace tokens of the lower-cased NFC-normalized text. */
  def tokens(text: Column): Column = split(lower(trim(nfc(text))), "\\s+")

  /** Distinct word n-gram shingles over an ALREADY-MATERIALIZED token-array
    * column (an attribute, not an inline expression).
    *
    * PERFORMANCE CONTRACT: pass a materialized column. Catalyst evaluates a
    * lambda's captured child expression once per reference per element, so
    * an inline `split(...)` here re-tokenizes the whole document for every
    * n-gram — quadratic per row (measured 26 s for 5 000 docs at sf0.1;
    * linear form is < 1 s). A separate `.select(tokens(text).as("toks"))`
    * projection is not collapsed into its consumer because CollapseProject
    * keeps non-cheap aliases that are referenced more than once. */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Convenience single-expression shingles for tests/small inputs. Hot
    * paths must use [[shinglesFromTokens]] over a materialized column. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Mixing constants for the k-hash family: odd multipliers (mod-2^64
    * bijections) + offsets, splitmix64-style spacing. */
  private def mixA(i: Int): Long = 0x9E3779B97F4A7C15L * (2L * i + 1)
  private def mixB(i: Int): Long = 0xBF58476D1CE4E5B9L * i + 0x94D049BB133111EBL

  /** MinHash signature: array of k minima over a MATERIALIZED array of
    * 64-bit shingle hashes (see [[shingleHashes]]). Each shingle string is
    * hashed once; the k family members are cheap arithmetic mixes
    * h*A_i + B_i (odd A_i = a bijection on Z_2^64), so the whole signature
    * is one string-hash pass + k long passes — no shuffle, no state. */
  def minhashFromHashes(hashArr: Column, k: Int = 32): Column =
    array((0 until k).map { i =>
      array_min(transform(hashArr, h => h * lit(mixA(i)) + lit(mixB(i))))
    }: _*)

  /** One 64-bit hash per array element (materialize this before calling
    * [[minhashFromHashes]] / [[simhashFromHashes]]). */
  def shingleHashes(arr: Column): Column = transform(arr, s => xxhash64(s))

  /** Back-compat single-expression form (tests/small inputs only). */
  def minhashSignature(shingleArr: Column, k: Int = 32): Column =
    minhashFromHashes(shingleHashes(shingleArr), k)

  /** SimHash-64 bit-count accumulator, SWAR-packed: one aggregate pass over
    * the hash array with a struct of 16 longs, each long holding four
    * 16-bit one-counters for bits {g, g+16, g+32, g+48}. Per token that is
    * 16 shift-mask-adds instead of 64 separate array passes (4x fewer ops,
    * ONE traversal). Supports up to 65 535 tokens per document (16-bit
    * lanes); chunk longer docs upstream. */
  def simhashAccumulate(hashArr: Column): Column = {
    val laneMask = lit(0x0001000100010001L)
    val zero = struct((0 until 16).map(g => lit(0L).as(s"g$g")): _*)
    aggregate(hashArr, zero,
      (a, h) => struct((0 until 16).map { g =>
        (a.getField(s"g$g") + shiftright(h, g).bitwiseAND(laneMask)).as(s"g$g")
      }: _*))
  }

  /** Finish SimHash from a MATERIALIZED accumulator struct + token count:
    * bit b = 16*lane + group is set iff ones(b)*2 > n (strict-majority —
    * identical to sign(Σ±1) > 0). `acc` must be an attribute: it is
    * referenced 64 times here and would otherwise re-run the aggregation
    * per reference. */
  def simhashFinish(acc: Column, n: Column): Column = {
    val bits = for { g <- 0 until 16; lane <- 0 until 4 } yield {
      val ones = shiftright(acc.getField(s"g$g"), 16 * lane).bitwiseAND(lit(0xffffL))
      when(ones * 2 > n, shiftleft(lit(1L), 16 * lane + g)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Single-expression SimHash for tests/small inputs; hot paths must
    * materialize [[simhashAccumulate]] first (Dedup.simhashPairs does). */
  def simhashFromHashes(hashArr: Column): Column =
    simhashFinish(simhashAccumulate(hashArr), size(hashArr).cast("long"))

  /** Back-compat single-expression SimHash over a token array. */
  def simhash64(toks: Column): Column = simhashFromHashes(shingleHashes(toks))

  /** Popcount of a 64-bit value (for SimHash hamming distance) via the
    * classic SWAR reduction, expressed as Catalyst arithmetic. */
  def popcount64(c: Column): Column = {
    val m1 = lit(0x5555555555555555L)
    val m2 = lit(0x3333333333333333L)
    val m4 = lit(0x0f0f0f0f0f0f0f0fL)
    val x1 = c - shiftright(c, 1).bitwiseAND(m1)
    val x2 = x1.bitwiseAND(m2) + shiftright(x1, 2).bitwiseAND(m2)
    val x3 = (x2 + shiftright(x2, 4)).bitwiseAND(m4)
    shiftright(x3 * lit(0x0101010101010101L), 56).bitwiseAND(lit(0x7fL))
  }
}
