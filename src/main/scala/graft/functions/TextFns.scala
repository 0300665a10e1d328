package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives used by the LLM-pipeline operators
  * (graft.llm). Everything here is built from codegen'd Catalyst
  * expressions — no UDFs — so the hot path stays inside whole-stage codegen.
  */
object TextFns {
  /** Whitespace-collapsed, lower-cased normalization. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the lower-cased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word n-gram shingles (the dedup unit). Returns an empty array
    * for texts shorter than n tokens. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** k seeded 64-bit hashes of one column — xxhash64 with the seed mixed in
    * as an extra hashed column gives k independent hash functions. */
  def seededHashes(c: Column, k: Int): Seq[Column] =
    (0 until k).map(i => xxhash64(lit(i), c))

  /** MinHash signature (array of k minima over the shingle set). Runs as a
    * single projection: no shuffle, no per-row state. */
  def minhashSignature(shingleArr: Column, k: Int = 32): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleArr, s => xxhash64(lit(i), s)))
    }: _*)

  /** SimHash-64 over whitespace tokens: per bit, sign of the sum of
    * (+1/-1) votes from each token's xxhash64 bit. */
  def simhash64(toks: Column): Column = {
    val bits = (0 until 64).map { b =>
      val votes = aggregate(
        toks,
        lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

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
