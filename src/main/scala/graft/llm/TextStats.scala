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

  /** Per-document quality/statistics features. `carry` columns ride
    * through the projection so composite callers (e.g.
    * [[SourceCuration]]) get their extra per-row signals in the SAME
    * corpus scan instead of re-scanning and joining. */
  /** Output column names [[stats]] always emits — a carry alias
    * colliding with one would produce duplicate columns that fail only
    * at a downstream reference, so [[stats]] rejects it up front. */
  private val statsOutputCols = Set("n_chars", "n_tokens", "n_bpeish_tokens",
    "avg_token_len", "punct_count", "stopword_hits", "stopword_ratio",
    "quality_score")

  def stats(docs: DataFrame, idCol: String, textCol: String,
            carry: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    if (carry.nonEmpty) {
      val carryNames = docs.select(carry: _*).columns.toSeq
      val clash = carryNames.filter(n => statsOutputCols.contains(n) || n == idCol)
      require(clash.isEmpty,
        s"carry aliases collide with stats output columns: ${clash.mkString(", ")}")
    }
    val t    = col(textCol)
    val toks = TextFns.tokens(t)
    val nTok = size(toks).cast("long")
    docs.select(Seq(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      nTok.as("n_tokens"),
      size(regexp_extract_all(lower(t), lit(bpeishPattern), lit(0))).cast("long").as("n_bpeish_tokens"),
      (length(regexp_replace(t, "\\s+", "")).cast("double") / nTok).as("avg_token_len"),
      size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0))).cast("long").as("punct_count"),
      hits(toks, stopwords).cast("long").as("stopword_hits"),
      (hits(toks, stopwords).cast("double") / nTok).as("stopword_ratio")
    ) ++ carry: _*)
  }

  /** Quality score in [0,1]: a deterministic blend of length, token-shape
    * and stopword signals (double arithmetic on exact integer inputs). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
                   carry: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    stats(docs, idCol, textCol, carry).withColumn("quality_score",
      least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5 +
        least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3 +
        when(col("avg_token_len").between(3.0, 10.0), 0.2).otherwise(0.0))

  /** Repetition metrics per document — the Gopher-rule family a curation
    * pipeline uses to drop template/boilerplate pages: fraction of tokens
    * that are the single most-frequent token, distinct-token ratio, and
    * duplicate-bigram fraction.
    *
    * Scale shape: the distinct counts are LINEAR per-row HOFs over a
    * materialized token array (`array_distinct` — never the quadratic
    * count-each-token-by-filter form), and the top-token count is a
    * distributed mode(): explode → partial-agg on (doc, term) → per-doc
    * max, both shuffles keyed by the doc id. No window, no collect; at
    * 100 TB this is two map-side-combining aggregations. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      topTokenThreshold: Double = 0.1,
                      dupBigramThreshold: Double = 0.1): DataFrame = {
    val toksDf = docs.select(col(idCol), TextFns.tokens(col(textCol)).as("toks"))
    // bigrams over the MATERIALIZED toks attribute (lambda captures an
    // attribute read, not a re-tokenization — see TextFns' perf contract)
    val base = toksDf
      .select(col(idCol), col("toks"),
        when(size(col("toks")) >= 2,
          transform(slice(col("toks"), lit(1), size(col("toks")) - 1),
            (t, i) => concat_ws(" ", t, element_at(col("toks"), i + lit(2)))))
          .otherwise(array().cast("array<string>")).as("bg"))
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        size(array_distinct(col("bg"))).cast("long").as("n_distinct_bigrams"))
    val top = toksDf.select(col(idCol), explode(col("toks")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col(idCol)).agg(max(col("tf")).as("top_tf"))
    val ttr = col("top_tf").cast("double") / col("n_tokens")
    val dbr = when(col("n_tokens") > 1,
      lit(1.0) - col("n_distinct_bigrams").cast("double") / (col("n_tokens") - 1))
      .otherwise(0.0)
    base.join(top, Seq(idCol))
      .select(col(idCol),
        col("n_tokens"),
        (col("n_distinct_tokens").cast("double") / col("n_tokens")).as("distinct_ratio"),
        ttr.as("top_token_ratio"),
        dbr.as("dup_bigram_ratio"),
        (ttr >= topTokenThreshold || dbr >= dupBigramThreshold).as("is_repetitive"))
  }

  /** The Gopher quality-filter rule set (Rae et al. 2021, Appendix A),
    * adapted to this engine's signals — the published composite gate a
    * curation pipeline applies BEFORE model-based scoring: a document is
    * kept iff EVERY rule passes. Each rule is exact arithmetic (integer
    * counts, one IEEE division), so the whole verdict table is
    * oracle-gateable. Rules: token count in [minTokens, maxTokens];
    * mean word length in [3, 10]; symbol ratio ('#' / '...') ≤ 0.1;
    * ≥ 80% of words contain an alphabetic character; ≥ 2 stopword hits;
    * not repetitive per [[repetitionStats]] (top-token and dup-bigram
    * fractions under their Gopher thresholds).
    *
    * Scale shape: one projection over the corpus (per-row HOFs on the
    * materialized token array) joined with repetitionStats' two
    * doc-keyed aggregations — no window, nothing global. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minTokens: Long = 50, maxTokens: Long = 100000): DataFrame = {
    val withToks = docs.select(col(idCol), col(textCol).as("__text"),
      TextFns.tokens(col(textCol)).as("__toks"))
    val n = size(col("__toks")).cast("long")
    val base = withToks.select(
      col(idCol),
      n.as("n_tokens"),
      (length(regexp_replace(col("__text"), "\\s+", "")).cast("double") / n)
        .as("avg_token_len"),
      size(regexp_extract_all(col("__text"), lit("#|\\.\\.\\."), lit(0)))
        .cast("long").as("n_symbols"),
      size(filter(col("__toks"), tk => tk.rlike("[a-z]")))
        .cast("long").as("n_alpha_words"),
      hits(col("__toks"), stopwords).cast("long").as("stopword_hits"))
    val reps = repetitionStats(docs, idCol, textCol)
      .select(col(idCol), col("top_token_ratio"), col("dup_bigram_ratio"))
    val r = base.join(reps, Seq(idCol))
      .withColumn("r_length",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("r_word_len", col("avg_token_len").between(3.0, 10.0))
      .withColumn("r_symbol",
        col("n_symbols").cast("double") / col("n_tokens") <= 0.1)
      .withColumn("r_alpha",
        col("n_alpha_words").cast("double") / col("n_tokens") >= 0.8)
      .withColumn("r_stopwords", col("stopword_hits") >= 2)
      .withColumn("r_repetition",
        col("top_token_ratio") < 0.1 && col("dup_bigram_ratio") < 0.1)
    r.withColumn("kept",
      col("r_length") && col("r_word_len") && col("r_symbol") &&
        col("r_alpha") && col("r_stopwords") && col("r_repetition"))
      .select(col(idCol), col("n_tokens"), col("r_length"), col("r_word_len"),
        col("r_symbol"), col("r_alpha"), col("r_stopwords"),
        col("r_repetition"), col("kept"))
  }

  /** C4's line- and page-level cleaning rules (Raffel et al. 2020 §2.2 —
    * the published pipeline behind the C4 corpus), Spark-first: the line
    * rules run INSIDE one codegen'd array `filter` HOF over
    * `split(text, '\n')` — no explode, no shuffle, no per-line rows; the
    * page rules are plain column predicates. Per line (on its trimmed
    * form): must end in terminal punctuation (`. ! ? "`), must have ≥
    * `minWordsPerLine` whitespace words, must not contain "javascript"
    * (case-insensitive). Per page: drop if it mentions "lorem ipsum"
    * (case-insensitive), contains `{`, or keeps fewer than
    * `minLinesPerDoc` lines. Emits per doc: line counts, each page
    * verdict, `kept`, and the REBUILT text (kept lines re-joined) for
    * surviving pages — the artifact downstream stages consume. Every
    * rule is deterministic string logic, so the q149 oracle replays the
    * whole thing in SQL (`list_filter` + regexes). */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
                   minWordsPerLine: Int = 3, minLinesPerDoc: Int = 1): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keep = filter(lines, l => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= minWordsPerLine &&
        !lower(t).contains("javascript")
    })
    docs.select(
        col(idCol),
        size(lines).cast("long").as("n_lines"),
        size(keep).cast("long").as("n_lines_kept"),
        (!lower(col(textCol)).contains("lorem ipsum")).as("r_no_lorem"),
        (!col(textCol).contains("{")).as("r_no_brace"),
        array_join(keep, "\n").as("__clean"))
      .withColumn("r_min_lines", col("n_lines_kept") >= minLinesPerDoc)
      .withColumn("kept",
        col("r_no_lorem") && col("r_no_brace") && col("r_min_lines"))
      .withColumn("clean_text",
        when(col("kept"), col("__clean")))
      .drop("__clean")
  }

  /** Stopword-profile language ID: count profile hits per language, take the
    * argmax in fixed priority order (ties → earlier profile). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenize ONCE into a materialized column: the five per-language
    // scores each read the attribute — inlined, every score column would
    // re-run the split regex over the text (5× the scan cost, measured
    // on the q130 composition)
    val scored = docs
      .select(col(idCol), TextFns.tokens(col(textCol)).as("__toks"))
      .select(
        (col(idCol) +: langProfiles.map { case (l, ws) =>
          hits(col("__toks"), ws).cast("long").as(s"s_$l") }): _*)
    val best = langProfiles.map(_._1).map(l => col(s"s_$l"))
    val maxScore = best.reduce((a, b) => greatest(a, b))
    val pred = langProfiles.map(_._1).foldRight(lit("unknown"): Column) { (l, elseC) =>
      when(col(s"s_$l") === maxScore && maxScore > 0, l).otherwise(elseC)
    }
    scored.withColumn("predicted_lang", pred)
  }

  /** LM-style novelty scoring against a reference corpus: the fraction of
    * a document's DISTINCT bigrams absent from the reference's bigram set.
    * The exact-arithmetic stand-in for n-gram-LM perplexity filtering
    * (high novelty ≈ high perplexity ≈ off-distribution text): counts and
    * the final IEEE division are bit-reproducible cross-engine, where a
    * log-prob score would not be. Plan shape: one shuffle on the bigram
    * key for the membership join (reference side pre-distincted), one
    * doc-keyed aggregation — both hash-partitioned, nothing global.
    * Docs with < 2 tokens report 0 bigrams and a NULL ratio (kept via
    * explode_outer, not dropped). */
  def bigramNovelty(reference: DataFrame, docs: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    def distinctBigrams(df: DataFrame) = df
      .select(col(idCol), TextFns.tokens(col(textCol)).as("toks"))
      // bigrams over the MATERIALIZED toks attribute (TextFns perf contract)
      .select(col(idCol),
        when(size(col("toks")) >= 2,
          transform(slice(col("toks"), lit(1), size(col("toks")) - 1),
            (t, i) => concat_ws(" ", t, element_at(col("toks"), i + lit(2)))))
          .otherwise(array().cast("array<string>")).as("bg"))
      .select(col(idCol), explode_outer(array_distinct(col("bg"))).as("bigram"))
    val refSet = distinctBigrams(reference)
      .filter(col("bigram").isNotNull).select("bigram").distinct()
      .withColumn("__seen", lit(true))
    distinctBigrams(docs)
      .join(refSet, Seq("bigram"), "left")
      .groupBy(idCol)
      .agg(
        sum(when(col("bigram").isNotNull, 1L).otherwise(0L)).as("n_bigrams"),
        sum(when(col("bigram").isNotNull && col("__seen").isNull, 1L)
          .otherwise(0L)).as("novel_bigrams"))
      .select(col(idCol), col("n_bigrams"), col("novel_bigrams"),
        when(col("n_bigrams") > 0,
          col("novel_bigrams").cast("double") / col("n_bigrams"))
          .as("novelty_ratio"))
  }

  /** Cross-document duplicated-span coverage — the substring-level dedup
    * diagnostic (the Lee et al. 2021 "Deduplicating Training Data" shape;
    * doc-level [[graft.llm.Dedup]] and line-level dedup miss templated
    * spans shared across otherwise-distinct pages): for each document,
    * the number of token positions covered by at least one word `n`-gram
    * that also occurs in `minDocs`-or-more DISTINCT documents, plus the
    * covered fraction. A high ratio marks boilerplate-heavy pages whose
    * every sentence appears elsewhere even though no whole doc or line
    * matches.
    *
    * Exactness: covered/total are BIGINT interval-union counts (union of
    * [p, p+n-1] computed by a sorted fold: first gram contributes n,
    * each later one min(n, pos - prev)); the ratio is one IEEE division
    * of exact integers — bit-reproducible cross-engine, no rounding
    * needed.
    *
    * Scale shape: one tokenize+gram pass (positional grams over the
    * MATERIALIZED token array — TextFns' perf contract), exploded once
    * and pinned (two consumers; re-running the explode would double the
    * corpus scan). Gram identity is the 64-bit xxhash64 (the q42
    * inverted-index precedent) so the document-frequency aggregation and
    * the semi-join shuffle longs, not strings. The coverage fold is a
    * per-doc hash aggregation over an array bounded by doc length — no
    * window, no global sort, nothing driver-side. */
  /** (doc, pos, gramHash) per positional n-gram OCCURRENCE, 1-based
    * positions — the shared substrate of [[dupSpanCoverage]] and
    * [[removeDuplicatedSpans]]. PINNED by default: those consumers
    * reference it twice (df filter + position semi-join); pass
    * `pin = false` for single-consumer uses ([[removeSpansWith]]). */
  private def positionalGramOcc(docs: DataFrame, idCol: String,
                                textCol: String, n: Int,
                                pin: Boolean = true): DataFrame = {
    val occ = docs
      .select(col(idCol), TextFns.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => struct((i + 1).cast("int").as("pos"),
              xxhash64(concat_ws(" ",
                (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*))
                .as("h"))))
          .otherwise(array().cast("array<struct<pos:int,h:bigint>>")).as("pg"))
      .select(col(idCol), explode(col("pg")).as("pg"))
      .select(col(idCol), col("pg.pos").as("pos"), col("pg.h").as("h"))
    if (pin) graft.Checkpoints.pin(occ) else occ
  }

  /** Grams shared by ≥ `minDocs` DISTINCT docs. */
  private def dupGrams(occ: DataFrame, idCol: String, minDocs: Int): DataFrame =
    occ.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs).select("h")

  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2)
    val occ = positionalGramOcc(docs, idCol, textCol, n)
    val dup = dupGrams(occ, idCol, minDocs)
    // one row per (doc, pos): pos is unique within a doc by construction
    // and the semi-join cannot re-multiply it
    val covered = occ.join(dup, Seq("h"), "left_semi")
      .groupBy(col(idCol))
      .agg(aggregate(
        array_sort(collect_list(col("pos"))),
        struct(lit(-n).cast("int").as("prev"), lit(0L).as("cov")),
        (acc, p) => struct(p.as("prev"),
          (acc.getField("cov") +
            least(lit(n).cast("int"), p - acc.getField("prev")).cast("long"))
            .as("cov")),
        acc => acc.getField("cov")).as("covered_tokens"))
    docs.select(col(idCol),
        size(TextFns.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("covered_tokens"), lit(0L)).cast("double") /
            col("n_tokens"))
          .as("dup_span_ratio"))
  }

  /** Exact-substring DEDUPLICATION (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better") — the REMOVAL step
    * [[dupSpanCoverage]] only measures: every token covered by an
    * n-gram occurring in ≥ `minDocs` distinct docs is cut, and each
    * doc's text is rebuilt from its surviving tokens. Document-level
    * dedup can't touch this boilerplate (license blocks, nav bars,
    * templated intros living inside otherwise-unique pages); span
    * removal is how production corpora actually strip it.
    *
    * Fully relational — every stage mirrors into SQL, so the q128 gate
    * checks the whole chain: positional gram occurrences (pinned once,
    * shared shape with the q122 diagnostic) → df-filtered duplicated
    * starts → covered positions by interval explode + distinct →
    * ANTI-join against the exploded tokens → order-preserving rebuild.
    * Shuffle volume is bounded by gram occurrences (≤ n_tokens rows) —
    * never pairwise — and the rebuild is one map-side-combining
    * groupBy. Docs with nothing removed come back verbatim
    * (token-normalized); docs removed entirely come back empty. */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2)
    val occ = positionalGramOcc(docs, idCol, textCol, n)
    rebuildWithoutSpans(docs, occ, dupGrams(occ, idCol, minDocs), idCol, textCol, n)
  }

  /** The FROZEN duplicated-span artifact: the distinct gram hashes
    * occurring in ≥ `minDocs` docs of a REFERENCE corpus, CARRYING the
    * gram width they were mined at. The width rides in the model (not as
    * a second argument to the scrub) because a mismatched `n` would not
    * fail — m-gram hashes never equal n-gram hashes, so the semi-join
    * would match nothing and every batch would pass through "clean" with
    * removed_tokens = 0 while boilerplate flowed into the corpus. */
  final case class SpanModel(grams: DataFrame, n: Int)

  /** Mine a [[SpanModel]] once on a reference corpus and hand it to
    * [[removeSpansWith]] — the streaming/ingest deployment of span
    * removal (the dsirModels/dsirScore split): the reference's
    * boilerplate set is fixed at model time, and every incoming batch is
    * scrubbed against it without re-mining. */
  def dupSpanModel(reference: DataFrame, idCol: String, textCol: String,
                   n: Int = 8, minDocs: Int = 2): SpanModel = {
    require(n >= 1 && minDocs >= 2)
    SpanModel(
      dupGrams(positionalGramOcc(reference, idCol, textCol, n), idCol, minDocs), n)
  }

  /** Span removal against a FROZEN [[SpanModel]] — same rebuild chain as
    * [[removeDuplicatedSpans]] but nothing is mined from `docs`, so it
    * applies to an ingest micro-batch (foreachBatch; the per-doc rebuild
    * is an aggregation, so append-mode streaming proper can't host it)
    * exactly as to a batch corpus. The occurrence table has a single
    * consumer here (the semi-join), so no pin. */
  def removeSpansWith(docs: DataFrame, model: SpanModel,
                      idCol: String, textCol: String): DataFrame = {
    val occ = positionalGramOcc(docs, idCol, textCol, model.n, pin = false)
    rebuildWithoutSpans(docs, occ, model.grams.select("h"), idCol, textCol, model.n)
  }

  /** Shared removal tail: covered positions from `dup`-matching gram
    * occurrences → ANTI-join against the exploded tokens →
    * order-preserving rebuild. */
  private def rebuildWithoutSpans(docs: DataFrame, occ: DataFrame,
                                  dup: DataFrame, idCol: String,
                                  textCol: String, n: Int): DataFrame = {
    val coveredPos = occ.join(dup, Seq("h"), "left_semi")
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (n - 1)))
        .as("pos"))
      .distinct()
    val toks = docs
      .select(col(idCol), TextFns.tokens(col(textCol)).as("toks"))
      .select(col(idCol), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).cast("int").as("pos"), col("tok"))
    val kept = toks.join(coveredPos, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok")), " ").as("deduped_text"))
    docs.select(col(idCol),
        size(TextFns.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"),
        coalesce(col("deduped_text"), lit("")).as("deduped_text"))
  }

  /** Bigram-LM average log-probability per document — the actual CCNet/
    * RefinedWeb-style LM quality filter ([[bigramNovelty]] is its
    * exact-arithmetic stand-in): an add-one-smoothed bigram model is
    * fit on `reference` and each scored doc gets
    * `avg_logprob = Σ tf(b)·ln((C(b)+1)/(C(w1)+V)) / Σ tf(b)` over its
    * bigram occurrences (V = reference vocabulary size; unseen histories
    * back off to the uniform 1/V floor). Low avg_logprob ≈ high
    * perplexity ≈ off-distribution text.
    *
    * Determinism (what lets this be oracle-gated despite floats): the
    * per-doc sum folds contributions in BIGRAM-LEXICOGRAPHIC order via
    * `aggregate(array_sort(collect_list(...)))` — identical association
    * on any partitioning and mirrored by the oracle's
    * `list_reduce(list(contrib ORDER BY b))` — and the result is rounded
    * to 6 dp, absorbing the ≤1-ulp cross-engine `ln` drift (the q82/q83
    * recipe). Plan shape at 100 TB: the fitted LM is two hash-aggregated
    * count tables joined back by key; per-doc state is one sorted
    * contribution array, bounded by the doc's distinct-bigram count.
    * Docs with < 2 tokens report 0 bigrams and NULL avg_logprob. */
  def bigramLogProb(reference: DataFrame, docs: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    def toks(df: DataFrame) =
      df.select(col(idCol), TextFns.tokens(col(textCol)).as("toks"))
    // (bigram, history) per OCCURRENCE, over the materialized toks attr
    def biOcc(df: DataFrame) = toks(df)
      .select(col(idCol),
        explode(zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => struct(concat_ws(" ", a, b).as("b"), a.as("w1")))).as("bw"))
      .select(col(idCol), col("bw.b").as("b"), col("bw.w1").as("w1"))
    val refUni = toks(reference).select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val refBi = biOcc(reference).groupBy("b").agg(count(lit(1)).as("cb"))
    val vocab = refUni.agg(count(lit(1)).as("__v"))   // 1-row broadcast
    val perBigram = biOcc(docs)
      // ONE shuffle for the whole per-doc pipeline: pre-partition the raw
      // occurrences by doc so BOTH aggregations (the (doc,b,w1) tf counts
      // here and the per-doc sorted fold below) are exchange-free —
      // hashpartitioning(doc) satisfies either clustering, and the
      // broadcast joins in between preserve it. Without this the
      // string-heavy bigram rows crossed the wire twice: the double
      // exchange was the bulk of the q130 wall at 32× (profiled r9).
      // Per-partition volume stays bounded by the docs it holds (the
      // partial combine the first agg loses compressed almost nothing —
      // tf is overwhelmingly 1).
      .repartition(col(idCol))
      .groupBy(col(idCol), col("b"), col("w1")).agg(count(lit(1)).as("tf"))
      // explicit broadcast: the single-shuffle plan above DEPENDS on
      // these joins staying map-side (they preserve the doc-id
      // partitioning); left to the size threshold they'd silently fall
      // to sort-merge at scale and reintroduce the removed exchanges
      .join(broadcast(refBi), Seq("b"), "left")
      .join(broadcast(refUni), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("b"), col("tf"),
        (col("tf") * log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cu"), lit(0L)) + col("__v")))).as("contrib"))
    val scored = perBigram.groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        aggregate(
          transform(array_sort(collect_list(struct(col("b"), col("contrib")))),
            x => x.getField("contrib")),
          lit(0.0), (acc, x) => acc + x).as("__sum"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__sum") / col("n_bigrams"), 6).as("avg_logprob"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"))
  }
}
