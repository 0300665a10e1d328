package graft.llm

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines, at 100 TB posture:
  * every variant is either a hash-groupBy or an LSH-style bucketed join —
  * never an all-pairs comparison.
  *
  *  - exact: md5-groupBy of (optionally normalized) text
  *  - minhashLsh: shingle → k-minhash signature → banded LSH buckets →
  *    within-bucket candidate pairs → signature-similarity verify
  *  - simhash: 64-bit fingerprint → band-16 pigeonhole buckets →
  *    hamming-distance verify
  *  - ngramJaccard: inverted-index join on distinct shingles (exact Jaccard;
  *    the ground truth the approximate variants are tested against)
  *  - embeddingNearDups: see [[Similarity.nearDuplicatePairs]]
  */
object Dedup {

  /** Exact duplicate groups: hash-groupBy, representative = min(id). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String,
                  normalized: Boolean = false): DataFrame = {
    val key = if (normalized) TextFns.normalize(col(textCol)) else col(textCol)
    docs.groupBy(md5(key.cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** Corpus-level dedupe: drop every exact duplicate except the min-id
    * representative — the end-to-end training-data curation step built on
    * [[exactGroups]] (one hash shuffle + one semi-join back). */
  def dedupe(docs: DataFrame, idCol: String, textCol: String,
             normalized: Boolean = false): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol, normalized)
      .select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Cross-corpus LINE-level dedup (the CCNet/RefinedWeb paragraph-dedup
    * shape): each distinct line survives only at its FIRST occurrence in
    * the corpus — min (doc, line-position) lexicographically — and every
    * other copy is dropped, which strips boilerplate (headers, nav bars,
    * license blocks) that document-level dedup can't touch.
    *
    * Input is one row per line (`idCol`, `idxCol`, `lineCol`); split the
    * corpus upstream with whatever line/paragraph rule fits the data.
    * Shape: one map-side-combining groupBy on the line to find the first
    * occurrence, one join back — no window, no sort. Grouping keys the
    * full line text so the result is collision-exact; at 100 TB key on
    * `xxhash64(line)` instead (identical plan, 8-byte shuffle keys,
    * one-in-2^64 false merges). */
  def lineDedup(lines: DataFrame, idCol: String, idxCol: String,
                lineCol: String): DataFrame = {
    // null-safe join: a null line (an upstream splitter's unparseable
    // segment) forms its own group and keeps its first occurrence like any
    // other value — a plain equi-join would silently drop every null row
    val first = lines.groupBy(col(lineCol).as("__line"))
      .agg(min(struct(col(idCol), col(idxCol))).as("__first"))
    lines.join(first, col(lineCol) <=> col("__line"))
      .filter(col(idCol) === col(s"__first.$idCol") &&
        col(idxCol) === col(s"__first.$idxCol"))
      .drop("__first", "__line")
  }

  /** Incremental-ingestion dedup: which INCOMING documents survive
    * against an already-curated corpus — the daily-batch shape (ingest →
    * drop exact dups against the corpus → drop intra-batch dups, keeping
    * each batch duplicate group's min-id). Cost: one hash groupBy over
    * the batch + one anti-join against the corpus's content hashes keyed
    * on the same md5 — at 100 TB the corpus side is the pre-computed
    * hash index a pipeline maintains, not a rescan (any (hash) projection
    * works; this takes the raw corpus for self-containment).
    *
    * @param prefixLen 0 = exact full-text hash; > 0 = the
    *   [[fingerprintGroups]] key (md5 of the first `prefixLen` chars of
    *   the normalized text), the cheap near-dup key an ingestion gate
    *   typically runs before the expensive shingle-level passes. */
  def incrementalDedupe(existing: DataFrame, incoming: DataFrame,
                        idCol: String, textCol: String,
                        normalized: Boolean = false,
                        prefixLen: Int = 0): DataFrame = {
    def h(df: DataFrame) = {
      val base =
        if (prefixLen > 0) substring(TextFns.normalize(df(textCol)), 1, prefixLen)
        else if (normalized) TextFns.normalize(df(textCol))
        else df(textCol)
      md5(base.cast("binary"))
    }
    // null-safe joins throughout: md5(null text) = null, and exactGroups /
    // dedupe already treat the null-text group like any other content group
    // (one min-id representative survives; it drops if the corpus has one).
    // Plain equi-joins would instead silently DELETE every null-text
    // incoming row — not even a representative would survive the batch.
    val inc = incoming.withColumn("__h", h(incoming))
    val firsts = inc.groupBy(col("__h").as("__fh")).agg(min(col(idCol)).as("__keep"))
    val corpusHashes = existing.select(h(existing).as("__ch")).distinct()
    inc.join(firsts, col("__h") <=> col("__fh"))
      .filter(col(idCol) === col("__keep"))
      .join(corpusHashes, col("__h") <=> col("__ch"), "left_anti")
      .drop("__h", "__fh", "__keep")
  }

  /** Near-duplicate fingerprint groups: md5 of the first `prefixLen` chars of
    * the normalized text (cheap document fingerprinting; one shuffle). */
  def fingerprintGroups(docs: DataFrame, idCol: String, textCol: String,
                        prefixLen: Int = 64): DataFrame =
    docs.groupBy(
        md5(substring(TextFns.normalize(col(textCol)), 1, prefixLen).cast("binary"))
          .as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Winnowing near-dup pairs: documents sharing ≥ `minShared` rolling-hash
    * fingerprints (graft.plans.RollingFingerprintsExpr — position-
    * independent, so reordered/partially-copied passages still collide;
    * any shared substring of length ≥ k+w-1 guarantees a shared
    * fingerprint). Same inverted-index shape as [[ngramJaccardPairs]]:
    * one shuffle on the fingerprint, local pair expansion, count.
    *
    * @param maxDocFreq posting-list cap, the same hot-key guard as
    *   [[ngramJaccardPairs]]'s. A fingerprint shared by c docs expands to
    *   C(c,2) pairs in one task, and boilerplate makes such fingerprints
    *   common in real corpora (measured on the sf0.1 fixture: one
    *   fingerprint hit 76% of all docs, and posting lists over 64 docs
    *   carried 104.0M of 104.9M total pair expansions). Error is
    *   ONE-SIDED: dropping a hot fingerprint only lowers pair counts, so
    *   capped output is a subset of exact output with counts ≤ exact
    *   (DedupSpec asserts it) — and since a fingerprint in a large
    *   fraction of the corpus is boilerplate by definition, the cap
    *   *improves* near-dup precision while bounding the worst task. */
  def winnowingPairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, w: Int = 4, minShared: Long = 3,
                     maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val fps = docs
      .select(col(idCol).as("doc"),
        explode(graft.plans.TextExprs.rollingFingerprints(
          TextFns.normalize(col(textCol)), k, w)).as("fp"))
    fps.groupBy(col("fp"))
      .agg(collect_list(col("doc")).as("basket"))  // fingerprint sets are per-doc distinct
      .filter(size(col("basket")).cast("long") <= maxDocFreq)
      .select(explode(graft.plans.PairArray.pairArray(col("basket"))).as("p"))
      .groupBy(col("p.product_1").as("doc_a"), col("p.product_2").as("doc_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }

  /** Distinct-shingle 64-bit hashes per doc, computed linearly and
    * string-free: tokenize once, hash each token once (xxhash64), then the
    * codegen'd [[graft.plans.NgramHashesExpr]] folds each n-token window
    * into one 64-bit key and dedups — no n-gram strings are ever built
    * (the `concat_ws` + string-hash form cost ~2x on the scan side; the
    * consumers only use shingles as join/count keys). Stages stay in
    * separate projections per the [[TextFns.shinglesFromTokens]]
    * performance contract. */
  private def shingleHashDf(docs: DataFrame, idCol: String, textCol: String, n: Int) =
    docs
      // cheap pre-filter (ONE split per row) instead of size(hs)>0 later:
      // a post-projection filter would be alias-pushed below the projects,
      // re-inlining the whole shingle pipeline into the filter
      .filter(size(TextFns.tokens(col(textCol))) >= n)
      .select(col(idCol).as("doc"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("doc"), TextFns.shingleHashes(col("toks")).as("th"))
      .select(col("doc"), graft.plans.TextExprs.ngramHashes(col("th"), n).as("hs"))

  /** Exact n-gram Jaccard pairs ≥ threshold via an inverted-index join on
    * distinct shingles: shuffle keyed on the shingle's 64-bit hash (8-byte
    * join keys instead of full n-gram strings; collision probability over a
    * corpus of D distinct shingles is ~D²/2^65 — negligible), intersection
    * by count, sizes joined back. O(pairs sharing a shingle), not O(n²). */
  /** Low bits reserved for the per-doc shingle count when packing (doc id,
    * size) into one long: supports 2^20-1 shingles/doc and doc ids < 2^43. */
  private val SzBits = 20
  private val SzMask = (1L << SzBits) - 1

  /** @param maxDocFreq posting-list cap (document frequency per shingle).
    *   Default = no cap → EXACT Jaccard. At petabyte scale a stopword-ish
    *   shingle shared by k documents expands to C(k,2) pairs in one task —
    *   the classic inverted-index hot key; capping drops those shingles
    *   from the intersection counts. Error is ONE-SIDED: a dropped shingle
    *   only lowers the intersection while document sizes keep counting it,
    *   so estimated Jaccard ≤ true Jaccard — capped output is always a
    *   SUBSET of the exact pairs (no false positives; DedupSpec asserts
    *   it). High-Jaccard pairs share mostly rare shingles, so recall loss
    *   concentrates on boilerplate-heavy docs. */
  /** Shared packed inverted-index intersection kernel for the n-gram
    * resemblance measures: emits one row per candidate pair with
    * (doc_a, doc_b, sz_a, sz_b, inter) — doc ids unpacked, shingle-set
    * sizes riding along, `inter` = count of shared distinct shingles.
    *
    * Pack each doc's shingle-set size into the low bits of its id before
    * exploding: sizes then ride through pair generation for free — no
    * second evaluation of the shingle pipeline and no size joins. Packing
    * is injective per doc, and pair order on packed values equals pair
    * order on doc ids (ids occupy the high bits).
    * Packing is only injective for 0 <= id < 2^43 and < 2^20 shingles/doc;
    * outside that range results would be silently wrong, so fail loudly in
    * the row pipeline (no extra scan) — callers with bigger ids/docs should
    * densify ids first (e.g. zipWithUniqueId) or join sizes separately. */
  private def packedIntersections(docs: DataFrame, idCol: String, textCol: String,
                                  n: Int, maxDocFreq: Long, fn: String): DataFrame = {
    val guardedDoc = when(
      col("doc") < 0 || col("doc") >= lit(1L << (63 - SzBits)),
      raise_error(concat(lit(s"$fn: doc id outside packable range [0, 2^43): "),
        col("doc").cast("string")))).otherwise(col("doc"))
    val guardedSize = when(
      size(col("hs")).cast("long") > lit(SzMask),
      raise_error(concat(lit(s"$fn: document exceeds 2^20-1 shingles; "),
        lit("use a separate size join for such corpora (doc id: "),
        col("doc").cast("string"), lit(")"))))
      .otherwise(size(col("hs")).cast("long"))
    val packed = shingleHashDf(docs, idCol, textCol, n)
      .select(
        (guardedDoc * lit(1L << SzBits) + guardedSize).as("pdoc"),
        explode(col("hs")).as("h"))
    // posting-list pair expansion: one shuffle keyed on the shingle, pairs
    // generated locally per posting list via the codegen'd PairArray
    // kernel — replaces the self-join (two shuffle sides + join)
    // collect_list: a doc contributes each distinct shingle once, so lists
    // are dup-free already (and PairArray dedups defensively anyway)
    val posting = packed.groupBy(col("h"))
      .agg(collect_list(col("pdoc")).as("basket"))
    val capped =
      if (maxDocFreq == Long.MaxValue) posting
      else posting.filter(size(col("basket")) <= maxDocFreq)
    capped
      .select(explode(graft.plans.PairArray.pairArray(col("basket"))).as("p"))
      .groupBy(col("p.product_1").as("product_1"), col("p.product_2").as("product_2"))
      .agg(count(lit(1)).as("inter"))
      .select(
        shiftright(col("product_1"), SzBits).as("doc_a"),
        shiftright(col("product_2"), SzBits).as("doc_b"),
        col("product_1").bitwiseAND(SzMask).as("sz_a"),
        col("product_2").bitwiseAND(SzMask).as("sz_b"),
        col("inter"))
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxDocFreq: Long = Long.MaxValue): DataFrame =
    packedIntersections(docs, idCol, textCol, n, maxDocFreq, "ngramJaccardPairs")
      .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** Asymmetric CONTAINMENT pairs (Broder's other resemblance measure):
    * containment of the SMALLER shingle set in the larger,
    * inter / min(|A|, |B|) — catches quote/excerpt/subset duplicates
    * whose Jaccard stays low because the container is much longer (a
    * 95%-contained excerpt of a 10x-longer doc has Jaccard ≈ 0.09).
    * Same packed inverted-index kernel and one-sided cap semantics as
    * [[ngramJaccardPairs]]; emits which side is the contained doc. */
  def ngramContainmentPairs(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, threshold: Double = 0.9,
                            maxDocFreq: Long = Long.MaxValue): DataFrame =
    packedIntersections(docs, idCol, textCol, n, maxDocFreq, "ngramContainmentPairs")
      .withColumn("containment", col("inter") / least(col("sz_a"), col("sz_b")))
      .filter(col("containment") >= threshold)
      .withColumn("contained_doc",
        when(col("sz_a") <= col("sz_b"), col("doc_a")).otherwise(col("doc_b")))
      .select("doc_a", "doc_b", "contained_doc", "containment")

  /** Cross-corpus contamination check — the train/eval leakage scan every
    * benchmark-respecting training pipeline runs before a data release:
    * for each eval document, the train documents sharing ≥ `minShared`
    * distinct n-gram shingles, with `contamination_ratio` = shared /
    * |eval doc's shingles| (1.0 = the eval doc is fully contained in a
    * train doc's n-gram set).
    *
    * Same inverted-index shape as [[ngramJaccardPairs]], but the join is
    * eval-postings ⋈ train-postings on the 64-bit shingle hash — cost is
    * the matching posting mass, never |eval|×|train|. Long `n` (default
    * 8, the 8–13-gram range the published decontamination recipes use)
    * keeps shingles rare, so posting lists stay short without a cap; pass
    * `maxDocFreq` anyway for corpora with boilerplate. */
  def crossCorpusContamination(evalDocs: DataFrame, trainDocs: DataFrame,
                               idCol: String, textCol: String,
                               n: Int = 8, minShared: Long = 1,
                               maxDocFreq: Long = Long.MaxValue): DataFrame = {
    def exploded(d: DataFrame, as: String) =
      shingleHashDf(d, idCol, textCol, n)
        .select(col("doc").as(as), explode(col("hs")).as("h"))
    val ev = exploded(evalDocs, "eval_id")
    val evSz = ev.groupBy("eval_id").agg(count(lit(1)).as("eval_ngrams"))
    val tr = exploded(trainDocs, "train_id")
    // cap via the posting-list shape every other measure in this file uses
    // (groupBy + size filter + explode back): the groupBy rides the shuffle
    // the h-join needs anyway, where a Window.partitionBy(h) would add a
    // full extra shuffle and buffer whole partitions just to count
    val trCapped =
      if (maxDocFreq == Long.MaxValue) tr
      else tr.groupBy(col("h"))
        .agg(collect_list(col("train_id")).as("__ids"))
        .filter(size(col("__ids")).cast("long") <= maxDocFreq)
        .select(col("h"), explode(col("__ids")).as("train_id"))
    ev.join(trCapped, "h")
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .join(evSz, "eval_id")
      .withColumn("contamination_ratio",
        col("shared_ngrams").cast("double") / col("eval_ngrams"))
      .select("eval_id", "train_id", "shared_ngrams", "contamination_ratio")
  }

  /** MinHash + banded LSH near-dup pairs.
    *
    * numHashes = bands * rowsPerBand. Candidates = pairs sharing any band
    * bucket (hash of the band's signature slice); verified by estimated
    * Jaccard = fraction of equal minhashes ≥ threshold. The only shuffles are
    * the explode-groupBy on (band, bucket) and the final distinct — each
    * bucket holds a handful of docs, so the join never goes quadratic.
    */
  /** @param maxBucket cap on LSH bucket size (docs per (band, bucket)).
    *   Default = uncapped. A degenerate bucket (boilerplate-identical
    *   signature slices) expands C(k,2) candidate pairs in one task;
    *   dropping oversized buckets loses only candidates from OTHER bands'
    *   smaller buckets' perspective — with b bands a true pair survives
    *   unless ALL its shared buckets are oversized, and verification
    *   never admits false positives either way. */
  /** (doc, sig, band, bucket) rows for LSH banding: tokens -> shingles ->
    * hashes -> k-minima signature, each in its own projection (one regex
    * pass, one string-hash pass, then ONE codegen'd k-minima pass —
    * graft.plans.MinHashSignatureExpr; bit-identical to the HOF reference
    * form, DedupSpec asserts it), then one bucket row per band (bucket =
    * xxhash64 of that band's signature slice). Shared by the batch pair
    * mine ([[minhashLshPairs]]) and the frozen ingest index
    * ([[minhashBucketIndex]] / [[incrementalNearDedupe]]) so the two
    * paths can never drift hash families. shingleHashDf pre-filters to
    * >= n tokens, so hs is never empty. */
  private def bandedSignatures(docs: DataFrame, idCol: String, textCol: String,
                               bands: Int, rowsPerBand: Int,
                               shingleN: Int): DataFrame = {
    val k = bands * rowsPerBand
    val sig = shingleHashDf(docs, idCol, textCol, shingleN)
      .select(col("doc"), graft.plans.TextExprs.minhashSignature(col("hs"), k).as("sig"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast("string")).as("bucket"))
    }
    sig.select(col("doc"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc"), col("sig"), col("bb.band"), col("bb.bucket"))
  }

  /** Unordered within-bucket pair expansion over a collect_list'd `ms`
    * array of (doc, payload-source) structs: for every i < j emit
    * (doc_a, doc_b, `payloadName`) with canonical doc order. The subtle
    * 1-based slice arithmetic lives here ONCE for both LSH families
    * ([[minhashLshPairs]] and [[simhashPairs]]). */
  private def bucketPairExpr(payloadName: String,
                             payload: (Column, Column) => Column): Column =
    flatten(transform(col("ms"), (x, i) =>
      transform(
        slice(col("ms"), i + lit(2), greatest(size(col("ms")) - i - 1, lit(0))),
        y => struct(
          least(x.getField("doc"), y.getField("doc")).as("doc_a"),
          greatest(x.getField("doc"), y.getField("doc")).as("doc_b"),
          payload(x, y).as(payloadName)))))

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      bands: Int = 8, rowsPerBand: Int = 4,
                      threshold: Double = 0.8, shingleN: Int = 3,
                      maxBucket: Long = Long.MaxValue): DataFrame = {
    val k = bands * rowsPerBand
    val buckets = bandedSignatures(docs, idCol, textCol, bands, rowsPerBand, shingleN)

    // ONE shuffle on (band,bucket): collect bucket members and expand the
    // local pair combinations with higher-order functions — a self-join
    // would shuffle twice and evaluate the whole signature pipeline once
    // per side. est_jaccard is verified inside the same projection and the
    // threshold filter runs BEFORE the distinct, so only verified pairs
    // (not every candidate) pay the dedup shuffle — est_jaccard is
    // deterministic per (doc_a, doc_b), so filter-then-distinct is
    // value-identical to distinct-then-filter.
    val members = buckets
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(struct(col("doc"), col("sig"))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucket)
    // agreement through the codegen'd kernel — bit-identical to the
    // aggregate(zip_with(...)) HOF it replaced (DedupSpec), minus two
    // interpreted lambda dispatches per signature position per pair
    val pairExpr = bucketPairExpr("est_jaccard", (x, y) =>
      graft.plans.TextExprs.minhashAgreement(
        x.getField("sig"), y.getField("sig")).cast("double") / k)
    members
      .select(explode(pairExpr).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .distinct()
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, pigeonhole-banded into
    * four 16-bit chunks (a pair within hamming distance ≤ 3 of 64 bits must
    * agree on at least one chunk), verified by exact popcount hamming. */
  /** @param maxBucket cap on docs per 16-bit chunk bucket (same hot-key
    *   guard and one-sided candidate loss as [[minhashLshPairs]]'s — a
    *   pair within the hamming budget shares ≥1 of 4 chunks, so it
    *   survives unless every shared chunk bucket is oversized). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Long = Long.MaxValue): DataFrame = {
    // 4 chunks pigeonhole-guarantee candidate recall only for hamming <= 3
    // (4 differing bits can fall one per chunk and never share a bucket);
    // accepting a larger budget would return a silently INCOMPLETE pair set
    require(maxHamming >= 0 && maxHamming <= 3,
      s"simhashPairs: maxHamming=$maxHamming exceeds the 4-chunk pigeonhole " +
        "recall guarantee (<= 3); re-band with maxHamming+1 chunks for a " +
        "larger budget")
    // one codegen'd majority-vote pass (graft.plans.SimHash64Expr) replaces
    // the SWAR accumulate+finish HOF pair — same fingerprints (DedupSpec)
    val fp = docs
      .select(col(idCol).as("doc"), TextFns.tokens(col(textCol)).as("toks"))
      .select(col("doc"), TextFns.shingleHashes(col("toks")).as("ths"))
      .select(col("doc"), graft.plans.TextExprs.simhash64(col("ths")).as("fp"))
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("fp"), c * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }
    val banded = fp.select(col("doc"), col("fp"), explode(array(chunks: _*)).as("cc"))
      .select(col("doc"), col("fp"), col("cc.chunk"), col("cc.key"))
    // one shuffle on (chunk,key) + local HOF pair expansion with the exact
    // hamming verify inline (same shape as minhashLshPairs — no self-join)
    val members = banded
      .groupBy(col("chunk"), col("key"))
      .agg(collect_list(struct(col("doc"), col("fp"))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucket)
    // the struct field is named "doc"/"fp"; bucketPairExpr reads "doc" for
    // ordering and hands both structs to the payload. Hamming is
    // deterministic per pair, so filtering before the distinct is
    // value-identical and spares below-budget candidates the dedup shuffle.
    val pairExpr = bucketPairExpr("hamming", (x, y) =>
      TextFns.popcount64(x.getField("fp").bitwiseXOR(y.getField("fp"))))
    members
      .select(explode(pairExpr).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .select("doc_a", "doc_b", "hamming")
  }

  /** FROZEN MinHash-LSH bucket index over a curated corpus — the stored
    * artifact a streaming/daily ingestion gate scores new batches
    * against ([[incrementalNearDedupe]]) without ever rescanning the
    * corpus text: one row per (band, bucket) with the member signatures,
    * the same freeze-then-score split as `Scoring.dsirModels` /
    * `dsirScore` and `TextStats.dupSpanModel` / `removeSpansWith`.
    * Hash family = [[bandedSignatures]], shared with [[minhashLshPairs]]
    * by construction.
    *
    * @param maxBucket cap on members per bucket, applied at FREEZE time
    *   (the hot-key guard of [[minhashLshPairs]] moved into the build):
    *   a boilerplate bucket with more members than the cap is dropped
    *   whole, bounding every scoring task; with b bands a true near-dup
    *   survives detection unless ALL its shared buckets are oversized —
    *   the same one-sided candidate loss as the batch mine's. */
  def minhashBucketIndex(corpus: DataFrame, idCol: String, textCol: String,
                         bands: Int = 8, rowsPerBand: Int = 4,
                         shingleN: Int = 3,
                         maxBucket: Long = Long.MaxValue): DataFrame =
    bandedSignatures(corpus, idCol, textCol, bands, rowsPerBand, shingleN)
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(struct(col("doc"), col("sig"))).as("members"))
      .filter(size(col("members")).cast("long") <= maxBucket)
      // build params ride with the artifact so a later scoring pass can
      // verify it banded with the same hash family (incrementalNearDedupe
      // checks them; a silent mismatch would bucket-collide ~never and
      // wave every near-dup through)
      .withColumn("index_bands", lit(bands))
      .withColumn("index_rows_per_band", lit(rowsPerBand))
      .withColumn("index_shingle_n", lit(shingleN))

  /** Near-duplicate incremental-ingestion dedup: which INCOMING documents
    * survive against a FROZEN corpus LSH index ([[minhashBucketIndex]]) —
    * the near-dup extension of [[incrementalDedupe]]'s exact/fingerprint
    * gates. Incoming docs band with the index's own hash family; one
    * shuffle join on (band, bucket) pairs each incoming doc with only its
    * colliding buckets (never the corpus); a doc matches when ANY bucket
    * member's estimated Jaccard (fraction of equal minhashes, exactly
    * [[minhashLshPairs]]'s verify arithmetic) reaches `threshold`, and
    * matched docs drop via one anti-join. Returns the surviving incoming
    * rows.
    *
    * 100 TB shape: the corpus appears only as the pre-built bucket index
    * (readable from a warehouse table, cells pruned by the incoming
    * batch's bucket keys); per-task work is bounded by the index's
    * freeze-time `maxBucket` cap; the batch never self-joins. Intra-batch
    * dups are out of scope by design — compose with [[incrementalDedupe]]
    * (exact) or [[minhashLshPairs]] (near) over the batch when needed. */
  def incrementalNearDedupe(index: DataFrame, incoming: DataFrame,
                            idCol: String, textCol: String,
                            bands: Int = 8, rowsPerBand: Int = 4,
                            threshold: Double = 0.8,
                            shingleN: Int = 3): DataFrame = {
    val k = bands * rowsPerBand
    // Fail loudly on a hash-family mismatch with the frozen index: with
    // different (bands, rowsPerBand, shingleN) the bucket hashes collide
    // essentially never, so scoring would silently wave EVERY near-dup
    // through. Reads ONE index row — bounded driver cost at any scale.
    index.select("index_bands", "index_rows_per_band", "index_shingle_n")
      .limit(1).collect().headOption.foreach { r =>
        val (ib, ir, in_) = (r.getInt(0), r.getInt(1), r.getInt(2))
        require(ib == bands && ir == rowsPerBand && in_ == shingleN,
          s"incrementalNearDedupe: frozen index was built with (bands=$ib, " +
            s"rowsPerBand=$ir, shingleN=$in_) but scoring requested (bands=$bands, " +
            s"rowsPerBand=$rowsPerBand, shingleN=$shingleN) — rebuild the index or " +
            "score with the build parameters")
      }
    val est = (m: Column) =>
      // same codegen'd agreement kernel as minhashNearDupPairs
      graft.plans.TextExprs.minhashAgreement(
        m.getField("sig"), col("sig")).cast("double") / k
    val matched = bandedSignatures(incoming, idCol, textCol, bands, rowsPerBand, shingleN)
      .join(index, Seq("band", "bucket"))
      .filter(exists(col("members"), m => est(m) >= threshold))
      .select(col("doc").as("__dup"))
      .distinct()
    incoming.join(matched, incoming(idCol) === col("__dup"), "left_anti")
  }
}
