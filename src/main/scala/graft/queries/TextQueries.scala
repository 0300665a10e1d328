package graft.queries

import graft.{QueryDef, Tables}
import graft.llm.{Dedup, TextStats}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text queries over the `documents` table: dedup family,
  * quality/statistics features, language ID, token counting, fingerprinting.
  * Oracle SQL mirrors the exact same shingle/token definitions in DuckDB;
  * the hash-family-dependent variants (MinHash, SimHash) are rows-only here
  * and are property-tested against the exact-Jaccard ground truth in
  * src/test (DedupSpec).
  */
object TextQueries {

  // DuckDB token/shingle fragments — single definitions in SqlFragments
  // (shared with CurationQueries so the modules can't drift apart).
  private val ws = SqlFragments.ws
  private val toksSql = SqlFragments.toksSql
  private def shinglesSql(toks: String) = SqlFragments.shinglesSql(toks, 3)
  // the BPE-ish tokenizer fragment (q100's oracle form) — paired with
  // TextStats.bpeishPattern on the Spark side; NOT interchangeable with
  // the whitespace toksSql (they agree only on all-lowercase
  // space-separated text, which the fixture happens to be)
  private val bpeToksSql =
    s"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9$ws]')"

  /** q141/q141a shared drift config: fixed token-count bins and the
    * doc_id-parity snapshot halves (month-N / month-N+1 stand-ins). ONE
    * definition so the two gates and their oracles can't drift apart. */
  private object DriftCfg {
    val binWidth = 20L
    val nBins = 15
    def snapshots(s: org.apache.spark.sql.SparkSession, dir: String)
        : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
      (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0))
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- q40: exact dedup groups (hash-groupBy; count 1 groups included so
    // the result is non-trivially checkable even on an all-distinct corpus)
    QueryDef.sql("q40_dedup_exact",
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
    },

    // ---- q41: fingerprint near-dup groups (normalized 64-char prefix md5)
    QueryDef.sql("q41_dedup_fingerprint",
      """SELECT md5(substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 64)) AS fingerprint,
        |       MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin) { (s, dir) =>
      Dedup.fingerprintGroups(Tables.documents(s, dir), "doc_id", "text", 64)
        .filter(col("dup_count") > 1)
    },

    // ---- q42: exact trigram-Jaccard near-dup pairs (inverted-index join)
    QueryDef.sql("q42_dedup_ngram_jaccard",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(i AS DOUBLE)/(sa.n + sb.n - i) AS jaccard
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text", 3, 0.8)
    },

    // ---- q42c: the PETABYTE configuration of q42 — posting lists capped at
    // maxDocFreq=4 (the hot-key guard that keeps a stopword-ish shingle from
    // expanding C(k,2) pairs in one task). The oracle re-derives the capped
    // semantics independently: shingles with document frequency > cap drop
    // out of the intersection while sizes keep counting them (one-sided
    // error). At sf0.01 this yields 20 of q42's 25 exact pairs — the cap
    // demonstrably bites and the gate is a strict-subset witness. (At sf0.1
    // both engines agree on 0 rows: that corpus's dup clusters are larger,
    // so every shared shingle has df > 4 — vacuous but still exact there;
    // the driver's hard gate runs at sf0.01.)
    QueryDef.sql("q42_dedup_ngram_jaccard_capped",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 4 GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(i AS DOUBLE)/(sa.n + sb.n - i) AS jaccard
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text", 3, 0.8,
        maxDocFreq = 4)
    },

    // ---- q214: NFC ENCODING REALISM (r11 verdict item 5) — the text
    // family's tokenization now NFC-normalizes first (TextFns.tokens /
    // TextFns.normalize, identity on the ASCII fixtures), and this gate
    // proves it on a planted NON-ASCII corpus: 30 docs get a COMPOSED
    // accent suffix (é = U+00E9), their twins the DECOMPOSED spelling
    // (e + combining U+0301) plus one extra token — byte-different,
    // canonically equal near-dups. Without NFC the twin pairs share no
    // accent shingle and the cross-encoding pairs vanish; the gate
    // REQUIRES all 30 planted pairs and the oracle replays the whole
    // pair mine through DuckDB's own nfc_normalize, pinning the
    // cross-engine NFC agreement byte-for-byte.
    QueryDef.sql("q214_nfc_encoding_dedup", {
      val comp = " café naïve résumé"
      val decomp = " café naïve résumé zz"
      s"""WITH v AS (
         |  SELECT doc_id, text || '$comp' AS text FROM documents WHERE doc_id < 30
         |  UNION ALL
         |  SELECT doc_id + 1000, text || '$decomp' FROM documents WHERE doc_id < 30),
         |t AS (SELECT doc_id, ${SqlFragments.toksOfSql("text")} AS toks FROM v),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(i AS DOUBLE)/(sa.n + sb.n - i) AS jaccard
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin
    }) { (s, dir) =>
      val comp = " café naïve résumé"
      val decomp = " café naïve résumé zz"
      val base = Tables.documents(s, dir).filter(col("doc_id") < 30)
      val corpus = base
        .select(col("doc_id"), concat(col("text"), lit(comp)).as("text"))
        .unionByName(base.select((col("doc_id") + 1000).as("doc_id"),
          concat(col("text"), lit(decomp)).as("text")))
      val pairs = graft.Checkpoints.pin(
        Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.8))
      val planted = pairs
        .filter(col("doc_b") === col("doc_a") + 1000).count()
      require(planted == 30,
        s"q214: only $planted/30 cross-encoding near-dup pairs found — " +
          "NFC normalization is not reaching the shingle family")
      pairs.orderBy("doc_a", "doc_b")
    },

    // ---- q216: CONFUSABLE/NFKC FOLD DEDUP — the aggressive cross-script
    // companion to q214's NFC gate: 30 docs get an ASCII marker suffix,
    // their twins a HOMOGLYPH-ATTACK spelling of the same suffix
    // (Cyrillic ѕ/е/с/о for s/e/c/o, the ﬁ ligature, fullwidth ａｌｐｈａ)
    // — visually identical, byte- and codepoint-different, and invisible
    // to NFC (these are compatibility/confusable variants, not canonical
    // decompositions). TextFns.confusableFoldKey (NFKC + UTS #39
    // skeleton, OPT-IN by design — both folds are lossy) must key each
    // twin pair together. The oracle is the CONSTRUCTION ground truth —
    // the planted (doc_a, doc_a+1000) list — which DuckDB states without
    // needing NFKC/ICU: the Spark side emits exactly the twin pairs its
    // fold recovers, so one missed fold drops a row and fails rows_match,
    // and a fold so aggressive it merges DIFFERENT base docs breaks the
    // group shape and drops rows too (exact-pair groups are required).
    QueryDef.sql("q216_confusable_fold_dedup", {
      s"""SELECT doc_id AS doc_a, doc_id + 1000 AS doc_b
         |FROM documents WHERE doc_id < 30 ORDER BY doc_a""".stripMargin
    }) { (s, dir) =>
      val clean = " security notice final alpha"
      val attack = " ѕесurity nоtiсе " +
        "ﬁnal ａｌｐｈａ"
      val base = Tables.documents(s, dir).filter(col("doc_id") < 30)
      val corpus = base
        .select(col("doc_id"), concat(col("text"), lit(clean)).as("text"))
        .unionByName(base.select((col("doc_id") + 1000).as("doc_id"),
          concat(col("text"), lit(attack)).as("text")))
      val pairs = corpus
        .select(col("doc_id"),
          graft.functions.TextFns.confusableFoldKey(col("text")).as("k"))
        .groupBy("k")
        .agg(min(col("doc_id")).as("doc_a"), max(col("doc_id")).as("doc_b"),
          count(lit(1)).as("n"))
        .filter(col("n") === 2 && col("doc_b") === col("doc_a") + 1000)
        .select("doc_a", "doc_b")
      val found = pairs.count()
      require(found == 30,
        s"q216: only $found/30 homoglyph twin pairs folded together — " +
          "the NFKC+skeleton key is not recovering the attack variants")
      pairs.orderBy("doc_a")
    },

    // ---- q43: MinHash + banded LSH near-dup pairs (rows-only: hash family
    // is engine-specific; recall/precision vs q42 asserted in DedupSpec)
    QueryDef.golden("q43_dedup_minhash_lsh") { (s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        bands = 8, rowsPerBand = 4, threshold = 0.7)
    },

    // ---- q43a: INDEPENDENT recall audit for the golden-gated q43. The
    // LSH hash family itself isn't SQL-expressible, but its RECALL against
    // exact Jaccard is: Spark semi-joins the oracle-exact q42 pair set
    // against the live q43 candidates, and the oracle is the full exact
    // pair set — the results are hash-equal IFF LSH found every exact
    // >= 0.8 pair (est >= 0.7 verify; 100% recall measured at sf0.001/
    // 0.01/0.1). A missed pair drops a row and fails the gate, so LSH
    // regressions are caught by the driver independently of the golden
    // snapshot's own determinism replay.
    QueryDef.sql("q43a_lsh_recall_audit",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(i AS DOUBLE)/(sa.n + sb.n - i) AS jaccard
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
          bands = 8, rowsPerBand = 4, threshold = 0.7)
        .select("doc_a", "doc_b")
      exact.join(lsh, Seq("doc_a", "doc_b"), "left_semi")
        .orderBy("doc_a", "doc_b")
    },

    // ---- q44: SimHash near-dup pairs (rows-only, verified in DedupSpec)
    QueryDef.golden("q44_dedup_simhash") { (s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)
    },

    // ---- q44a: INDEPENDENT recall audit for the golden-gated q44,
    // asymmetric bound gate (the q59a shape applied to text): the Spark
    // side measures how many oracle-exact Jaccard ≥ 0.9 pairs the live
    // SimHash banding recovers and emits its (total, caught) row ONLY
    // when caught*2 ≥ total (recall ≥ 50%); the oracle measures the
    // COMMITTED GOLDEN q44 pairs against DuckDB's own exact ≥ 0.9 pair
    // set and emits unconditionally. A banding/fingerprint regression
    // (even with a regenerated golden) drops the Spark row → rows_match
    // fails; live/golden drift → the caught counts diverge → hash fails.
    // Measured caught/total = 21/27, 15/25, 188/249 at sf0.001/0.01/0.1.
    QueryDef.sql("q44a_simhash_recall_audit",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |ex AS (SELECT doc_a, doc_b
         |       FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |       WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.9)
         |SELECT (SELECT COUNT(*) FROM ex) AS total_pairs,
         |  (SELECT COUNT(*) FROM ex
         |   JOIN read_parquet('${graft.QueryDef.goldenRoot}/sf0.01/q44_dedup_simhash.parquet') g
         |   ON ex.doc_a = g.doc_a AND ex.doc_b = g.doc_b) AS caught_pairs""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // pinned: the exact pair mine (the expensive subtree) feeds both
      // the total count and the caught semi-join
      val exact = graft.Checkpoints.pin(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.9)
          .select("doc_a", "doc_b"))
      val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
        .select("doc_a", "doc_b")
      val total = exact.agg(count(lit(1)).as("total_pairs"))
      val caught = exact.join(sim, Seq("doc_a", "doc_b"))
        .agg(count(lit(1)).as("caught_pairs"))
      broadcast(total).crossJoin(broadcast(caught))
        .filter(col("caught_pairs") * 2 >= col("total_pairs"))
    },

    // ---- q94: corpus dedup verdict — the FINAL artifact of the dedup
    // pipeline: capped-Jaccard pairs (q42's petabyte configuration,
    // maxDocFreq=16) → connected components → one row per document with
    // its canonical representative, cluster size, and the keep/drop
    // decision (keep = min-id member). The pair source is CAPPED by
    // default because this is the registered end-to-end pipeline: a
    // shingle shared by k docs expands C(k,2) pairs in one task, and on
    // duplicate-heavy corpora that stage is the one superlinear cost in
    // the chain (PLANS_r5: 12× wall at 32× data uncapped). Cap=16 bounds
    // every posting list to C(16,2)=120 expansions while staying EXACT at
    // sf0.01 (max shingle df there is 7) and biting at sf0.1 (drops
    // boilerplate-grade shingles; 256→178 pairs). The oracle re-derives
    // the whole capped chain independently: df-capped inverted-index
    // Jaccard in SQL, then a recursive-CTE transitive closure (DuckDB's
    // own fixpoint evaluation, not a re-implementation of ours).
    QueryDef.sql("q94_dedup_verdict",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 16 GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b
         |          FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
         |csize AS (SELECT lbl, COUNT(*) AS n FROM comp GROUP BY 1)
         |SELECT comp.id AS doc_id, comp.lbl AS canonical_id,
         |  CAST(csize.n AS BIGINT) AS cluster_size, comp.id = comp.lbl AS kept
         |FROM comp JOIN csize ON comp.lbl = csize.lbl
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
          maxDocFreq = 16)
        .select("doc_a", "doc_b")
      val cc = graft.llm.Clusters.connectedComponents(
        docs.select("doc_id"), "doc_id", pairs, "doc_a", "doc_b")
      val sizes = cc.groupBy(col("cluster_rep")).agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "cluster_rep")
        .select(col("doc_id"), col("cluster_rep").as("canonical_id"),
          col("cluster_size"), (col("doc_id") === col("cluster_rep")).as("kept"))
        .orderBy("doc_id")
    },

    // ---- q177: CANONICAL BY LENGTH — the third cluster-representative
    // rule beside q94 (min-id) and q126 (PageRank): keep the LONGEST
    // member of each near-dup cluster (what C4/RefinedWeb-style dedup
    // actually does — the fullest copy survives, truncated mirrors
    // drop). Same capped q94 chain; selection is one argmax-by-struct
    // aggregation per cluster — (n_chars DESC, doc_id ASC) via
    // MAX(struct(n_chars, −doc_id)), no window.
    QueryDef.sql("q177_canonical_by_length",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 16 GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b
         |          FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
         |pick AS (SELECT comp.lbl AS lbl,
         |           MAX({'q': d.n_chars, 'i': -comp.id}) AS m
         |         FROM comp JOIN documents d ON d.doc_id = comp.id GROUP BY 1)
         |SELECT comp.id AS doc_id, CAST(-((pick.m).i) AS BIGINT) AS canonical_id,
         |  CAST((pick.m).q AS BIGINT) AS canonical_chars,
         |  comp.id = -((pick.m).i) AS kept
         |FROM comp JOIN pick ON comp.lbl = pick.lbl
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
          maxDocFreq = 16)
        .select("doc_a", "doc_b")
      val cc = graft.llm.Clusters.connectedComponents(
        docs.select("doc_id"), "doc_id", pairs, "doc_a", "doc_b")
      val pick = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster_rep")
        .agg(max(struct(col("n_chars").as("q"),
          (-col("doc_id")).as("i"))).as("m"))
        .select(col("cluster_rep"),
          (-col("m.i")).as("canonical_id"), col("m.q").as("canonical_chars"))
      cc.join(pick, "cluster_rep")
        .select(col("doc_id"), col("canonical_id"), col("canonical_chars"),
          (col("doc_id") === col("canonical_id")).as("kept"))
        .orderBy("doc_id")
    },

    // ---- q199: CROSS-CORPUS CANONICAL — the RefinedWeb/Dolma
    // multi-source dedup rule: when near-duplicates straddle corpora,
    // keep the copy from the MOST TRUSTED source (priority 1 = curated
    // half, 2 = web half — doc_id parity stands in for provenance),
    // ties to the lower doc id. Same capped chain; the pick is one
    // argmin-by-struct per cluster ((priority, doc_id) MIN).
    QueryDef.sql("q199_cross_corpus_canonical",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 16 GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b
         |          FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
         |pr AS (SELECT id, CASE WHEN id % 2 = 0 THEN 1 ELSE 2 END AS priority
         |       FROM comp),
         |pick AS (SELECT comp.lbl AS lbl,
         |           MIN({'p': pr.priority, 'i': comp.id}) AS m
         |         FROM comp JOIN pr ON pr.id = comp.id GROUP BY 1)
         |SELECT comp.id AS doc_id,
         |  CAST((pick.m).i AS BIGINT) AS canonical_id,
         |  CAST((pick.m).p AS INTEGER) AS canonical_priority,
         |  comp.id = (pick.m).i AS kept
         |FROM comp JOIN pick ON comp.lbl = pick.lbl
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
          maxDocFreq = 16)
        .select("doc_a", "doc_b")
      val cc = graft.llm.Clusters.connectedComponents(
        docs.select("doc_id"), "doc_id", pairs, "doc_a", "doc_b")
      val withPr = cc.withColumn("priority",
        when(col("doc_id") % 2 === 0, 1).otherwise(2))
      val pick = withPr.groupBy("cluster_rep")
        .agg(min(struct(col("priority").as("p"), col("doc_id").as("i"))).as("m"))
        .select(col("cluster_rep"), col("m.i").as("canonical_id"),
          col("m.p").as("canonical_priority"))
      cc.join(pick, "cluster_rep")
        .select(col("doc_id"), col("canonical_id"), col("canonical_priority"),
          (col("doc_id") === col("canonical_id")).as("kept"))
        .orderBy("doc_id")
    },

    // ---- q196: WEIGHTED CORPUS INTERLEAVE — the dataloader curriculum
    // order: two corpora merged 2:1 (two of A per one of B) with
    // intra-corpus order preserved — virtual-time scheduling on INTEGER
    // clocks (item r of corpus i at time r·(L/wᵢ), L = lcm of weights;
    // ties to the lower corpus), so the schedule is exact and
    // engine-replayable where float virtual times would tie-break
    // unpredictably. Ranks via the skew-safe grouped rank; the global
    // sequence number via the distributed global rank.
    QueryDef.sql("q196_corpus_interleave",
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS corpus
        |  FROM documents),
        |r AS (SELECT doc_id, corpus,
        |    ROW_NUMBER() OVER (PARTITION BY corpus ORDER BY doc_id) AS rnk
        |  FROM c),
        |t AS (SELECT doc_id, corpus, rnk,
        |    rnk * (CASE corpus WHEN 'a' THEN 1 ELSE 2 END) AS vt
        |  FROM r)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY vt, corpus, rnk) AS BIGINT)
        |    AS global_idx,
        |  corpus, doc_id
        |FROM t""".stripMargin) { (s, dir) =>
      import graft.operators.Ranks
      val c = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("a")).otherwise(lit("b")).as("corpus"))
      val ranked = Ranks.groupedRowNumber(c, Seq("corpus"),
        Seq(col("doc_id").asc), "rnk")
      val vt = ranked.withColumn("vt",
        col("rnk").cast("long") * when(col("corpus") === "a", 1L).otherwise(2L))
      Ranks.globalRowNumber(vt,
          Seq(col("vt").asc, col("corpus").asc, col("rnk").asc), "global_idx")
        .select(col("global_idx"), col("corpus"), col("doc_id"))
    },

    // ---- q190: COLLOCATIONS BY PMI — top adjacent-bigram collocations
    // by pointwise mutual information (count floor 5 — PMI famously
    // explodes on singletons): exact integer counts end to end, ONE ln
    // per surviving pair with the round-6 seam, rank on the ROUNDED
    // score + pair tie-break so the top-20 is engine-independent. The
    // phrase-mining / tokenizer-seeding pass.
    QueryDef.sql("q190_collocations",
      s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
         |bg AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
         |         i -> {'a': toks[i], 'b': toks[i+1]})) AS p
         |       FROM t WHERE len(toks) >= 2),
         |pc AS (SELECT p.a AS a, p.b AS b, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
         |uc AS (SELECT unnest(toks) AS tok FROM t),
         |u AS (SELECT tok, COUNT(*) AS n FROM uc GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(SUM(n_ab) AS BIGINT) FROM pc) AS n_bi,
         |               (SELECT CAST(SUM(n) AS BIGINT) FROM u) AS n_uni)
         |SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
         |  ROUND(ln((CAST(n_ab AS DOUBLE) / n_bi) /
         |    ((CAST(ua.n AS DOUBLE) / n_uni) * (CAST(ub.n AS DOUBLE) / n_uni))), 6)
         |    AS pmi
         |FROM pc JOIN u ua ON pc.a = ua.tok JOIN u ub ON pc.b = ub.tok
         |CROSS JOIN tot
         |WHERE n_ab >= 5
         |ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin) { (s, dir) =>
      import graft.functions.TextFns
      val toks = Tables.documents(s, dir)
        .select(TextFns.tokens(col("text")).as("toks"))
      val bg = toks.filter(size(col("toks")) >= 2)
        .select(explode(transform(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          (t, i) => struct(t.as("a"),
            element_at(col("toks"), i + lit(2)).as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val pc = bg.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      val u = toks.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
      val tot = pc.agg(sum(col("n_ab")).as("n_bi"))
        .crossJoin(broadcast(u.agg(sum(col("n")).as("n_uni"))))
      pc.filter(col("n_ab") >= 5)
        .join(u.toDF("a", "na"), Seq("a"))
        .join(u.toDF("b", "nb"), Seq("b"))
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("n_ab"),
          round(log((col("n_ab") / col("n_bi")) /
            ((col("na") / col("n_uni")) * (col("nb") / col("n_uni")))), 6)
            .as("pmi"))
        .orderBy(desc("pmi"), asc("a"), asc("b")).limit(20)
    },

    // ---- q185: DEDUP QA SUMMARY — the one-row dashboard of the q94
    // chain: corpus size, docs in multi-member clusters, cluster count,
    // max cluster size, survivors, dedup rate. The "how duplicated is
    // this corpus" number a curation run reports before and after.
    QueryDef.sql("q185_dedup_summary",
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 16 GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b
         |          FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
         |csize AS (SELECT lbl, COUNT(*) AS n FROM comp GROUP BY 1)
         |SELECT CAST(SUM(n) AS BIGINT) AS total_docs,
         |  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS docs_in_clusters,
         |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS multi_clusters,
         |  CAST(MAX(n) AS BIGINT) AS max_cluster,
         |  CAST(COUNT(*) AS BIGINT) AS kept_docs,
         |  ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
         |    AS dedup_rate
         |FROM csize""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
          maxDocFreq = 16)
        .select("doc_a", "doc_b")
      val sizes = graft.llm.Clusters.connectedComponents(
          docs.select("doc_id"), "doc_id", pairs, "doc_a", "doc_b")
        .groupBy("cluster_rep").agg(count(lit(1)).as("n"))
      sizes.agg(
        sum(col("n")).as("total_docs"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("docs_in_clusters"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("multi_clusters"),
        max(col("n")).as("max_cluster"),
        count(lit(1)).as("kept_docs"))
        .select(col("total_docs"), col("docs_in_clusters"),
          col("multi_clusters"), col("max_cluster"), col("kept_docs"),
          round(lit(1.0) - col("kept_docs").cast("double") /
            col("total_docs").cast("double"), 6).as("dedup_rate"))
    },

    // ---- q182: CONTAINMENT PAIRS — Broder's asymmetric resemblance
    // (inter / min(|A|,|B|)): the quote/excerpt detector Jaccard misses
    // (a 95%-contained excerpt of a 10x-longer doc has Jaccard ≈ 0.09
    // — invisible to q42 at 0.8). Same packed inverted-index kernel and
    // one-sided df-16 cap; emits which side is the contained doc.
    QueryDef.sql("q182_containment_pairs",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 16 GROUP BY 1, 2),
         |c AS (SELECT doc_a, doc_b, sa.n AS sz_a, sb.n AS sz_b,
         |        CAST(i AS DOUBLE) / least(sa.n, sb.n) AS containment
         |      FROM inter JOIN sz sa ON doc_a = sa.doc_id
         |                 JOIN sz sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b,
         |  CASE WHEN sz_a <= sz_b THEN doc_a ELSE doc_b END AS contained_doc,
         |  containment
         |FROM c WHERE containment >= 0.9""".stripMargin) { (s, dir) =>
      Dedup.ngramContainmentPairs(Tables.documents(s, dir), "doc_id", "text",
        3, 0.9, maxDocFreq = 16)
    },

    // ---- q183: GROUPED PERCENT-RANK — per-language length percentile
    // (the CCNet-style within-language normalization, as a rank
    // transform): the skew-safe grouped rank + broadcast counts; the
    // (n_chars, doc_id) total order makes rank == row_number so SQL
    // PERCENT_RANK replays bit-equal; single-member groups pin to 0.
    QueryDef.sql("q183_grouped_percent_rank",
      """SELECT doc_id, lang,
        |  ROUND(PERCENT_RANK() OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id), 6) AS len_pctl
        |FROM documents""".stripMargin) { (s, dir) =>
      import graft.operators.Ranks
      val d = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
      val ranked = Ranks.groupedRowNumber(d, Seq("lang"),
        Seq(col("n_chars").asc, col("doc_id").asc), "rnk")
      val counts = d.groupBy("lang").agg(count(lit(1)).as("n"))
      ranked.join(broadcast(counts), Seq("lang"))
        .select(col("doc_id"), col("lang"),
          when(col("n") === 1, 0.0).otherwise(
            round((col("rnk") - 1).cast("double") /
              (col("n") - 1).cast("double"), 6)).as("len_pctl"))
    },

    // ---- q95: cross-corpus line-level dedup (CCNet-style paragraph
    // dedup). The fixture corpus has no newlines, so "lines" are derived
    // identically in both engines as 8-token chunks; each distinct line
    // survives only at its first (doc_id, line_idx) occurrence and docs
    // are reassembled from their surviving lines (docs losing every line
    // drop out — 3 fully-boilerplate docs at sf0.01, a non-trivial gate).
    QueryDef.sql("q95_line_dedup",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |ln AS (SELECT doc_id,
         |         unnest(generate_series(1, CAST(ceil(len(toks)/8.0) AS INTEGER))) AS line_idx,
         |         unnest(list_transform(generate_series(1, CAST(ceil(len(toks)/8.0) AS INTEGER)),
         |           i -> array_to_string(list_slice(toks, (i-1)*8+1, i*8), ' '))) AS line
         |       FROM t),
         |keep AS (SELECT line, MIN({'d': doc_id, 'i': line_idx}) AS first
         |         FROM ln GROUP BY 1)
         |SELECT ln.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS lines_kept,
         |  array_to_string(list(ln.line ORDER BY ln.line_idx), ' ') AS deduped_text
         |FROM ln JOIN keep ON ln.line = keep.line
         |WHERE ln.doc_id = keep.first.d AND ln.line_idx = keep.first.i
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val toksDf = Tables.documents(s, dir)
        .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("toks"))
      val nl = ceil(size(col("toks")) / lit(8.0)).cast("int")
      val linesArr = transform(sequence(lit(1), nl),
        i => array_join(slice(col("toks"), (i - 1) * lit(8) + 1, lit(8)), " "))
      val lines = toksDf
        .select(col("doc_id"), posexplode(linesArr).as(Seq("pos", "line")))
        .select(col("doc_id"), (col("pos") + 1).as("line_idx"), col("line"))
      Dedup.lineDedup(lines, "doc_id", "line_idx", "line")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("lines_kept"),
          array_join(
            transform(array_sort(collect_list(struct(col("line_idx"), col("line")))),
              s => s.getField("line")), " ").as("deduped_text"))
        .orderBy("doc_id")
    },

    // ---- q96: sequence packing (concatenate-and-chunk layout). The
    // oracle's running SUM OVER (ORDER BY doc_id) is the semantics; the
    // engine computes the identical cumsum via Ranks.globalCumSum (range
    // partition + per-partition offsets — no single-task global sort;
    // integral accumulation makes the two bit-equal). DuckDB SUM(BIGINT)
    // yields HUGEINT, so derived columns are cast back to BIGINT.
    QueryDef.sql("q96_sequence_packing",
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |        SUM(n_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM t)
         |SELECT doc_id, n_tokens,
         |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
         |  CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
         |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val withCounts = Tables.documents(s, dir)
        .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      graft.llm.Packing.packSequences(withCounts, "doc_id", "n_tokens", 512)
        .orderBy("doc_id")
    },

    // ---- q104: dedup-graph triangle census — the QA metric over the
    // near-dup pair graph: true duplicate cliques close their triangles,
    // chains of borderline matches don't. Wedge-then-close on the
    // id-oriented pair list from q42's CAPPED petabyte configuration
    // (maxDocFreq=16 — same rationale and same exact-at-sf0.01 /
    // bites-at-sf0.1 behavior as q94; uncapped this inherited q42's
    // C(df,2) posting expansion, 16.3× wall at 32× data in PLANS_r5).
    // The oracle enumerates the same ordered (a < b < c) triangles over
    // the identically-capped pair set with two joins.
    QueryDef.sql("q104_dedup_triangles",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 16 GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b
         |          FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8)
         |SELECT p1.doc_a AS a, p1.doc_b AS b, p2.doc_b AS c
         |FROM pairs p1
         |JOIN pairs p2 ON p2.doc_a = p1.doc_b
         |JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
         |ORDER BY a, b, c""".stripMargin) { (s, dir) =>
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir),
        "doc_id", "text", 3, 0.8, maxDocFreq = 16)
      // degree-oriented census: O(m^1.5) wedge work on ANY graph — the
      // registered default since r7 so the bound doesn't depend on the
      // upstream miner's df caps; identical output set to the id-oriented
      // Clusters.triangles (ClustersSpec property test), so the oracle is
      // unchanged
      graft.llm.Clusters.trianglesByDegree(pairs, "doc_a", "doc_b")
        .orderBy("a", "b", "c")
    },

    // ---- q48: text quality stats
    QueryDef.sql("q48_text_stats",
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9$ws]')) AS BIGINT) AS n_bpeish_tokens,
         |  CAST(length(regexp_replace(text, '$ws+', '', 'g')) AS DOUBLE) / len($toksSql) AS avg_token_len,
         |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct_count,
         |  CAST(len(list_filter($toksSql, t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS stopword_hits,
         |  CAST(len(list_filter($toksSql, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
         |    / len($toksSql) AS stopword_ratio
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextStats.stats(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")
    },

    // ---- q92: Gopher-style repetition metrics (template/boilerplate
    // detection): top-token fraction, distinct-token ratio, duplicate-
    // bigram fraction, and the resulting drop flag. All ratios are
    // long/long divisions in IEEE double — bit-identical across engines —
    // so the threshold flag agrees exactly too.
    QueryDef.sql("q92_repetition_stats",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |b AS (SELECT doc_id,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |        CAST(len(list_distinct(list_transform(
         |          generate_series(1, greatest(len(toks)-1, 0)),
         |          i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT) AS n_db
         |      FROM t),
         |tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |cnt AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
         |top AS (SELECT doc_id, MAX(tf) AS top_tf FROM cnt GROUP BY 1),
         |m AS (SELECT b.doc_id, n_tokens,
         |        CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
         |        CAST(top_tf AS DOUBLE) / n_tokens AS top_token_ratio,
         |        CASE WHEN n_tokens > 1
         |             THEN 1.0 - CAST(n_db AS DOUBLE) / (n_tokens - 1)
         |             ELSE 0.0 END AS dup_bigram_ratio
         |      FROM b JOIN top ON b.doc_id = top.doc_id)
         |SELECT doc_id, n_tokens, distinct_ratio, top_token_ratio, dup_bigram_ratio,
         |  (top_token_ratio >= 0.1 OR dup_bigram_ratio >= 0.1) AS is_repetitive
         |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextStats.repetitionStats(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // ---- q93: PII scrub — deterministic PII is synthesized into the text
    // IDENTICALLY in both engines (the fixture corpus carries none), so the
    // gate checks real detection+redaction work, not a vacuous zero. Emails
    // on doc_id%3, phones on %4, IPs on %5 — docs hit 0-3 rules each.
    QueryDef.sql("q93_pii_scrub", {
      val emailRe = graft.llm.Pii.email.pattern
      val phoneRe = graft.llm.Pii.phone.pattern
      val ipRe = graft.llm.Pii.ipv4.pattern
      s"""WITH p AS (SELECT doc_id, text
         |  || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
         |       || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ELSE '' END
         |  || CASE WHEN doc_id % 4 = 0 THEN ' call 555-'
         |       || lpad(CAST((doc_id * 37) % 1000 AS VARCHAR), 3, '0') || '-'
         |       || lpad(CAST((doc_id * 91) % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |  || CASE WHEN doc_id % 5 = 0 THEN ' from 10.'
         |       || CAST(doc_id % 256 AS VARCHAR) || '.0.'
         |       || CAST((doc_id * 3) % 256 AS VARCHAR) ELSE '' END AS pii_text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(pii_text, '$emailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(pii_text, '$phoneRe')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(pii_text, '$ipRe')) AS BIGINT) AS n_ip,
         |  regexp_replace(regexp_replace(regexp_replace(pii_text,
         |    '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g'),
         |    '$ipRe', '[IP]', 'g') AS redacted
         |FROM p ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val d = col("doc_id")
      val piiText = concat(col("text"),
        when(d % 3 === 0, concat(lit(" contact user"), d.cast("string"),
          lit("@mail"), (d % 7).cast("string"), lit(".example.com"))).otherwise(""),
        when(d % 4 === 0, concat(lit(" call 555-"),
          lpad(((d * 37) % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((d * 91) % 10000).cast("string"), 4, "0"))).otherwise(""),
        when(d % 5 === 0, concat(lit(" from 10."), (d % 256).cast("string"),
          lit(".0."), ((d * 3) % 256).cast("string"))).otherwise(""))
      graft.llm.Pii.scrub(
          Tables.documents(s, dir).select(d, piiText.as("pii_text")),
          "doc_id", "pii_text")
        .orderBy("doc_id")
    },

    // ---- q57: quality scoring (length/stopword/token-shape blend — the
    // curation filter signal; double arithmetic over exact integer inputs)
    QueryDef.sql("q57_quality_score",
      s"""WITH ${SqlFragments.qualityCtesSql("documents")}
         |SELECT doc_id, quality_score FROM q ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextStats.qualityScore(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("quality_score")).orderBy("doc_id")
    },

    // ---- q97: token-budget corpus selection — "take the best 15k tokens":
    // docs ranked by (quality desc, doc_id), kept while the running token
    // total fits the budget. Engine-side the running total is the
    // distributed two-pass cumsum (no global-sort window); the oracle IS
    // the naive window — bit-equal because accumulation is integral and
    // the quality scores are cross-engine exact (q57).
    QueryDef.sql("q97_token_budget_selection",
      s"""WITH ${SqlFragments.qualityCtesSql("documents")},
         |c AS (SELECT doc_id, n_tokens, quality_score,
         |    SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM q)
         |SELECT doc_id, n_tokens, quality_score, CAST(cum AS BIGINT) AS cum_tokens
         |FROM c WHERE cum <= 15000 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val scored = TextStats.qualityScore(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("quality_score"))
      graft.llm.Curation.selectTokenBudget(scored, "doc_id", "quality_score",
          "n_tokens", 15000)
        .select(col("doc_id"), col("n_tokens"), col("quality_score"),
          col("cum_tokens"))
        .orderBy("doc_id")
    },

    // ---- q100: corpus-wide vocabulary top-k — tokenizer-vocab candidate
    // mining: global frequency + document frequency of BPE-ish pre-tokens,
    // top 100 by (freq desc, term). TakeOrderedAndProject on the engine
    // side: the full vocabulary is aggregated but never globally sorted.
    QueryDef.sql("q100_vocab_topk",
      s"""WITH tok AS (SELECT doc_id,
         |  unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9$ws]')) AS term
         |  FROM documents)
         |SELECT term, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS df
         |FROM tok GROUP BY 1
         |ORDER BY freq DESC, term LIMIT 100""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(regexp_extract_all(lower(col("text")),
            lit(TextStats.bpeishPattern), lit(0))).as("term"))
        .groupBy("term")
        .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("df"))
        .orderBy(desc("freq"), asc("term")).limit(100)
    },

    // ---- q170: FROZEN VOCABULARY ENCODE — the deterministic
    // StringIndexer / tokenizer-vocab build-then-apply: ids are global
    // frequency ranks (count DESC, token ASC — engine-replayable where
    // MLlib's tie order is partition-dependent) computed by the
    // range-partitioned two-pass rank (a 1e8-token vocab under one
    // window is a one-task sort), then the corpus re-encodes against
    // the FROZEN table with id 0 = UNK. The gate re-encodes a corpus
    // slice against a vocab built from the OTHER slice, so real OOV
    // tokens exercise the UNK path; output is the per-doc (sum of ids,
    // token count, unk count) — id-assignment-sensitive, order-free.
    QueryDef.sql("q170_vocab_encode",
      s"""WITH tok AS (SELECT doc_id, unnest($bpeToksSql) AS term FROM documents),
         |ref AS (SELECT term, COUNT(*) AS n FROM tok
         |        WHERE doc_id % 2 = 0 GROUP BY 1),
         |v AS (SELECT term, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS id
         |      FROM ref),
         |enc AS (SELECT t.doc_id, COALESCE(v.id, 0) AS id
         |        FROM tok t LEFT JOIN v ON t.term = v.term
         |        WHERE t.doc_id % 2 = 1)
         |SELECT doc_id, CAST(SUM(id) AS BIGINT) AS id_sum,
         |  COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
         |FROM enc GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.llm.Vocab
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(regexp_extract_all(lower(col("text")),
            lit(TextStats.bpeishPattern), lit(0))).as("term"))
      val vocab = Vocab.build(tok.filter(col("doc_id") % 2 === 0), "term")
      Vocab.encodeTokens(tok.filter(col("doc_id") % 2 === 1), "term",
          vocab, "id")
        .groupBy("doc_id")
        .agg(sum(col("id")).as("id_sum"), count(lit(1)).as("n_tokens"),
          sum(when(col("id") === 0, 1).otherwise(0)).cast("long").as("n_unk"))
    },

    // ---- q101: incremental-ingestion dedup — the daily-batch shape:
    // docs < 250 are the already-curated corpus, the rest arrive as a new
    // batch; a batch doc survives iff its 64-char-fingerprint key (q41's
    // cheap near-dup key — the fixture has no EXACT dups at sf0.01, which
    // would make that gate vacuous) is absent from the corpus AND it is
    // the min-id holder of its key within the batch. Drops 12 cross-split
    // + intra-batch collisions at sf0.01.
    QueryDef.sql("q101_incremental_ingest",
      """WITH f AS (SELECT doc_id, length(text) AS text_len,
        |    md5(substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 64)) AS h
        |  FROM documents),
        |corpus AS (SELECT * FROM f WHERE doc_id < 250),
        |inc AS (SELECT * FROM f WHERE doc_id >= 250),
        |firsts AS (SELECT h, MIN(doc_id) AS keep FROM inc GROUP BY 1)
        |SELECT i.doc_id, CAST(i.text_len AS BIGINT) AS text_len
        |FROM inc i
        |JOIN firsts fs ON i.h = fs.h AND i.doc_id = fs.keep
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = i.h)
        |ORDER BY i.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      Dedup.incrementalDedupe(corpus, batch, "doc_id", "text", prefixLen = 64)
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .orderBy("doc_id")
    },

    // ---- q139: NEAR-dup incremental ingest (r9 verdict item 5 — the
    // near-dup extension of q101's exact/fingerprint gate): the corpus
    // (doc_id < 250) freezes into a MinHash-LSH bucket index, the batch
    // (doc_id >= 250) scores against it without rescanning corpus text,
    // and a batch doc drops when any colliding bucket member's estimated
    // Jaccard reaches 0.7. Gate shape is the q43a recall audit applied
    // to the ingest path: the Spark side semi-joins the live EXACT
    // cross-split Jaccard >= 0.8 batch-doc set (the capped-Jaccard twin)
    // against the set the live LSH gate actually dropped, and the oracle
    // re-derives the exact set unconditionally — the results hash-equal
    // IFF the frozen-index gate catches every exact cross-split near-dup
    // (100% measured at sf0.001/0.01/0.1); a recall regression drops a
    // row and fails rows_match. StreamingSpec adds the foreachBatch
    // parity case (stream of micro-batches == one-shot batch gate).
    QueryDef.sql("q139_incremental_near_ingest",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT DISTINCT doc_b AS doc_id
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8
         |  AND doc_a < 250 AND doc_b >= 250
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      val index = Dedup.minhashBucketIndex(corpus, "doc_id", "text")
      val survivors = Dedup.incrementalNearDedupe(index, batch,
        "doc_id", "text", threshold = 0.7)
      val dropped = batch
        .join(survivors.select("doc_id"), Seq("doc_id"), "left_anti")
        .select("doc_id")
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
        .filter(col("doc_a") < 250 && col("doc_b") >= 250)
        .select(col("doc_b").as("doc_id")).distinct()
      exact.join(dropped, Seq("doc_id"), "left_semi").orderBy("doc_id")
    },

    // ---- q139b: q139 with a FIXED-SIZE ingest batch (r11 verdict item
    // 3): q139 derives its batch as a corpus FRACTION (doc_id >= 250),
    // so the scale sweep measured a batch growing 32x with the corpus —
    // a shape production ingest never has (batches are bounded by the
    // arrival window, the corpus grows without bound). Here the batch is
    // the fixed 40-doc id slice [250, 290) at EVERY scale (ScaleData
    // copies shift ids by 1e8, so the slice stays 40 docs at 32x) and
    // the frozen index absorbs all growth — the honest 100-TB ingest
    // shape: index build ∝ corpus, per-batch gate cost ∝ batch. Same
    // recall-audit gate as q139, with membership by slice rather than
    // by order, since corpus ids now sit on both sides of the batch ids.
    QueryDef.sql("q139b_incremental_near_ingest_fixed",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT DISTINCT CASE WHEN doc_a >= 250 AND doc_a < 290
         |                     THEN doc_a ELSE doc_b END AS doc_id
         |FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8
         |  AND ((doc_a >= 250 AND doc_a < 290) <> (doc_b >= 250 AND doc_b < 290))
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val inBatch = (c: org.apache.spark.sql.Column) => c >= 250 && c < 290
      val corpus = docs.filter(!inBatch(col("doc_id")))
      val batch = docs.filter(inBatch(col("doc_id")))
      val index = Dedup.minhashBucketIndex(corpus, "doc_id", "text")
      val survivors = Dedup.incrementalNearDedupe(index, batch,
        "doc_id", "text", threshold = 0.7)
      val dropped = batch
        .join(survivors.select("doc_id"), Seq("doc_id"), "left_anti")
        .select("doc_id")
      val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
        .filter(inBatch(col("doc_a")) =!= inBatch(col("doc_b")))
        .select(when(inBatch(col("doc_a")), col("doc_a"))
          .otherwise(col("doc_b")).as("doc_id")).distinct()
      exact.join(dropped, Seq("doc_id"), "left_semi").orderBy("doc_id")
    },

    // ---- q141: corpus-snapshot drift — per-bin PSI over the token-count
    // distribution between two snapshots (here the doc_id-parity halves
    // standing in for month N / month N+1 crawls). Laplace-smoothed
    // shares over FIXED bins; psi_term rounded to 6 (the bigram-LM
    // convention for ln outputs).
    QueryDef.sql("q141_corpus_drift_psi", {
      val sm = DriftCfg.nBins * 0.5
      s"""WITH d AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |           FROM documents),
         |ca AS (SELECT LEAST(n_tokens // ${DriftCfg.binWidth}, ${DriftCfg.nBins - 1}) AS bin,
         |         COUNT(*) AS cnt_a FROM d WHERE doc_id % 2 = 0 GROUP BY 1),
         |cb AS (SELECT LEAST(n_tokens // ${DriftCfg.binWidth}, ${DriftCfg.nBins - 1}) AS bin,
         |         COUNT(*) AS cnt_b FROM d WHERE doc_id % 2 <> 0 GROUP BY 1),
         |sp AS (SELECT CAST(range AS INT) AS bin FROM range(${DriftCfg.nBins})),
         |j AS (SELECT sp.bin, COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
         |      FROM sp LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin)),
         |tt AS (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM j)
         |SELECT bin, CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
         |  round((cnt_a + 0.5) / (na + $sm), 6) AS share_a,
         |  round((cnt_b + 0.5) / (nb + $sm), 6) AS share_b,
         |  round(((cnt_a + 0.5) / (na + $sm) - (cnt_b + 0.5) / (nb + $sm))
         |    * ln(((cnt_a + 0.5) / (na + $sm)) / ((cnt_b + 0.5) / (nb + $sm))), 6)
         |    AS psi_term
         |FROM j, tt ORDER BY bin""".stripMargin
    }) { (s, dir) =>
      val (a, b) = DriftCfg.snapshots(s, dir)
      graft.llm.Drift.psiByBin(a, b, "n_tokens", DriftCfg.binWidth, DriftCfg.nBins)
        .orderBy("bin")
    },

    // ---- q141a: one-row drift summary — decimal-exact total PSI (sum of
    // the rounded q141 terms, order-independent) + distinct-token
    // vocabulary overlap between the snapshots.
    QueryDef.sql("q141a_corpus_drift_summary", {
      val sm = DriftCfg.nBins * 0.5
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks,
         |             CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |ca AS (SELECT LEAST(n_tokens // ${DriftCfg.binWidth}, ${DriftCfg.nBins - 1}) AS bin,
         |         COUNT(*) AS cnt_a FROM d WHERE doc_id % 2 = 0 GROUP BY 1),
         |cb AS (SELECT LEAST(n_tokens // ${DriftCfg.binWidth}, ${DriftCfg.nBins - 1}) AS bin,
         |         COUNT(*) AS cnt_b FROM d WHERE doc_id % 2 <> 0 GROUP BY 1),
         |sp AS (SELECT CAST(range AS INT) AS bin FROM range(${DriftCfg.nBins})),
         |j AS (SELECT sp.bin, COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
         |      FROM sp LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin)),
         |tt AS (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM j),
         |terms AS (SELECT round(((cnt_a + 0.5) / (na + $sm) - (cnt_b + 0.5) / (nb + $sm))
         |    * ln(((cnt_a + 0.5) / (na + $sm)) / ((cnt_b + 0.5) / (nb + $sm))), 6)
         |    AS psi_term FROM j, tt),
         |ta AS (SELECT DISTINCT unnest(toks) AS tok FROM d WHERE doc_id % 2 = 0),
         |tb AS (SELECT DISTINCT unnest(toks) AS tok FROM d WHERE doc_id % 2 <> 0),
         |vc AS (SELECT (SELECT COUNT(*) FROM ta) AS vocab_a,
         |              (SELECT COUNT(*) FROM tb) AS vocab_b,
         |              (SELECT COUNT(*) FROM ta JOIN tb USING (tok)) AS vocab_shared)
         |SELECT (SELECT CAST(SUM(cnt_a) AS BIGINT) FROM j) AS docs_a,
         |  (SELECT CAST(SUM(cnt_b) AS BIGINT) FROM j) AS docs_b,
         |  (SELECT CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE) FROM terms)
         |    AS total_psi,
         |  vocab_a, vocab_b, vocab_shared,
         |  round(CAST(vocab_shared AS DOUBLE) / (vocab_a + vocab_b - vocab_shared), 6)
         |    AS vocab_jaccard
         |FROM vc""".stripMargin
    }) { (s, dir) =>
      val (a, b) = DriftCfg.snapshots(s, dir)
      graft.llm.Drift.driftSummary(a, b, "n_tokens", DriftCfg.binWidth,
        DriftCfg.nBins, graft.functions.TextFns.tokens(col("text")))
    },

    // ---- q49: language-ID heuristic (stopword profiles, deterministic argmax)
    QueryDef.sql("q49_lang_id", {
      val scoreSql = TextStats.langProfiles.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter($toksSql, t -> t IN ($set))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val langs = TextStats.langProfiles.map(_._1)
      val maxExpr = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val caseExpr = langs.map(l => s"WHEN s_$l = $maxExpr AND $maxExpr > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'unknown' END")
      s"""WITH scored AS (SELECT doc_id, $scoreSql FROM documents)
         |SELECT *, $caseExpr AS predicted_lang FROM scored""".stripMargin
    }) { (s, dir) =>
      TextStats.langId(Tables.documents(s, dir), "doc_id", "text")
    },

    // ---- q50: token counting (whitespace + BPE-ish regex)
    QueryDef.sql("q50_token_count",
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9$ws]')) AS BIGINT) AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables.documents(s, dir)
      t.select(col("doc_id"),
          size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("ws_tokens"),
          size(regexp_extract_all(lower(col("text")), lit(TextStats.bpeishPattern), lit(0)))
            .cast("long").as("bpeish_tokens"))
        .orderBy("doc_id")
    },

    // ---- q51: multimodal binary-column plumbing (payload bytes + stub-decoded
    // metadata; octet_length is UTF-8 bytes in both engines)
    QueryDef.sql("q51_multimodal_meta",
      """SELECT doc_id AS id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS num_bytes,
        |  CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
        |  CAST((octet_length(encode(text)) // 640) % 480 + 1 AS BIGINT) AS height
        |FROM documents ORDER BY id""".stripMargin) { (s, dir) =>
      val bytes = octet_length(col("text")).cast("long")
      Tables.documents(s, dir).select(
          col("doc_id").as("id"),
          bytes.as("num_bytes"),
          (bytes % 640 + 1).as("width"),
          (floor(bytes / 640) % 480 + 1).as("height"))
        .orderBy("id")
    },

    // ---- q111: BPE merge training (tokenizer learning) — 12 rounds of
    // the Sennrich loop over the documents corpus. Iterative argmax over
    // hash-aggregated pair counts is not recursive-CTE-expressible in
    // DuckDB, so the gate is the golden snapshot; correctness evidence is
    // TextPipelineSpec's hand-computed classic corpus (es/est/lo/low) and
    // the cross-parallelism determinism the golden replay itself pins.
    QueryDef.golden("q111_bpe_merges") { (s, dir) =>
      graft.llm.Bpe.trainMerges(Tables.documents(s, dir), "text", rounds = 12)
    },

    // ---- q111a: INDEPENDENT audit for the golden-gated q111. The full
    // merge loop isn't SQL-expressible (each round's argmax depends on
    // the previous round's rewritten word table — recursive CTEs can't
    // aggregate over the recursive term), but ROUND ONE is: the rank-1
    // merge must be the corpus-wide argmax adjacent char pair
    // (count DESC, then lexicographic), which DuckDB derives from raw
    // text. This independently gates the whole per-round machinery —
    // tokenize → distinct-word freq table → weighted pair counts →
    // total-order argmax — on real data every round; the golden replay
    // pins rounds 2..12 on top.
    QueryDef.sql("q111a_bpe_first_merge_audit",
      s"""WITH w AS (SELECT unnest($toksSql) AS word FROM documents),
         |wc AS (SELECT word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY 1),
         |p AS (SELECT substring(word, CAST(i AS INTEGER), 1) AS l,
         |             substring(word, CAST(i AS INTEGER) + 1, 1) AS r, n
         |      FROM wc, unnest(generate_series(1, length(word) - 1)) AS t(i)),
         |agg AS (SELECT l, r, CAST(SUM(n) AS BIGINT) AS cnt FROM p GROUP BY 1, 2)
         |SELECT CAST(1 AS INTEGER) AS merge_rank, l AS "left", r AS "right",
         |  l || r AS merged, cnt AS pair_count
         |FROM agg ORDER BY cnt DESC, l, r LIMIT 1""".stripMargin) { (s, dir) =>
      graft.llm.Bpe.trainMerges(Tables.documents(s, dir), "text", rounds = 1)
    },

    // ---- q110: temperature-based corpus mixing — the multilingual
    // rebalancing recipe (kept_d ∝ n_d^α, α=0.5) realized as the
    // deterministic md5-threshold downsample (Mixing.temperatureSample).
    // Oracle recomputes the per-lang thresholds and the 4-hex-digit key
    // cut in DuckDB, then aggregates the KEPT rows — membership-sensitive,
    // not just rate-sensitive. `en` (largest) is cut hardest; the smallest
    // language keeps everything.
    QueryDef.sql("q110_temperature_mixing", {
      val hx = "instr('0123456789abcdef', substr(h,%d,1)) - 1"
      val hashInt = (1 to 4).map(i => s"(${hx.format(i)})*${1 << (4 * (4 - i))}")
        .mkString(" + ")
      s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
         |m AS (SELECT MIN(n) AS mn FROM c),
         |r AS (SELECT lang, n,
         |        CAST(FLOOR(ROUND(POWER(CAST(mn AS DOUBLE)/n, 0.5), 6)
         |             * 65536) AS BIGINT) AS thr
         |      FROM c, m),
         |k AS (SELECT d.lang, d.n_chars
         |      FROM (SELECT lang, n_chars,
         |              md5(CAST(doc_id AS VARCHAR)) AS h FROM documents) d
         |      JOIN r USING (lang)
         |      WHERE $hashInt < thr)
         |SELECT lang, COUNT(*) AS kept,
         |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
         |FROM k GROUP BY 1""".stripMargin
    }) { (s, dir) =>
      graft.llm.Mixing
        .temperatureSample(Tables.documents(s, dir), "lang", "doc_id", alpha = 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("kept_chars"))
    },

    // ---- q160: EXACT target-mixture resampling — the static
    // DoReMi/Pile-weights application step (q110 is the α-heuristic
    // cousin): the largest sub-corpus whose source proportions follow
    // the 0.5/0.3/0.2 target exactly (scale = min_d(n_d/s_d), quota_d =
    // floor(s_d·scale) — driver-side IEEE arithmetic on the bounded
    // per-domain counts, replayed bit-for-bit in SQL). Membership is the
    // md5-key order ranked by the skew-safe grouped rank; the oracle is
    // membership-sensitive (row set, not just per-domain counts).
    QueryDef.sql("q160_target_mix",
      """WITH c AS (SELECT source, COUNT(*) AS n FROM documents
        |           WHERE source IN ('src1', 'src2', 'src3') GROUP BY 1),
        |s AS (SELECT source, n,
        |        CASE source WHEN 'src1' THEN CAST(0.5 AS DOUBLE)
        |                    WHEN 'src2' THEN CAST(0.3 AS DOUBLE)
        |                    ELSE CAST(0.2 AS DOUBLE) END AS sh
        |      FROM c),
        |sc AS (SELECT MIN(n / sh) AS scale FROM s),
        |q AS (SELECT source, CAST(FLOOR(sh * scale) AS BIGINT) AS quota
        |      FROM s, sc),
        |r AS (SELECT doc_id, source,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |      FROM documents WHERE source IN ('src1', 'src2', 'src3'))
        |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
        |WHERE rnk <= quota""".stripMargin) { (s, dir) =>
      graft.llm.Mixing.matchTargetMix(Tables.documents(s, dir),
          "source", "doc_id",
          Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2))
        .select("doc_id", "source")
    },

    // ---- q82: TF-IDF top terms per document (sparse postings -> df join
    // -> rounded score -> per-doc top-5). round(_, 6) on the score because
    // ln is not bitwise-portable across engines (measured: Java Math.log
    // vs libm differ at 1 ulp on ~0.1% of this domain); ordering uses the
    // ROUNDED score + term tie-break so ranks are engine-independent.
    // Oracle parenthesization mirrors Spark's FP evaluation order exactly.
    QueryDef.sql("q82_tfidf_top_terms",
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |s AS (SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         |        round(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 6) AS tfidf
         |      FROM tf JOIN dfq USING (term) CROSS JOIN n),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM s)
         |SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INTEGER) AS rnk
         |FROM r WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      graft.llm.Relevance.topTerms(Tables.documents(s, dir), "doc_id", "text", 5)
    },

    // ---- q83: BM25 ranked retrieval for the fixed query
    // {hash, join, stream}. Postings are pruned to the query terms before
    // any join — cost is 3 posting lists, not the vocabulary. The per-doc
    // sum folds contributions in term order (sort_array + aggregate), and
    // the oracle pivots the same three terms and adds them left-to-right
    // in the same order — FP association identical by construction.
    QueryDef.sql("q83_bm25_retrieval",
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
         |       WHERE term IN ('hash', 'join', 'stream') GROUP BY 1, 2),
         |dl AS (SELECT doc_id, len($toksSql) AS dl FROM documents),
         |sc AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avg_dl FROM dl),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |c AS (SELECT tf.doc_id, tf.term,
         |        ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
         |          ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + (0.75 * dl) / avg_dl)))
         |          AS contrib
         |      FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN sc)
         |SELECT doc_id,
         |  round(coalesce(max(CASE WHEN term = 'hash' THEN contrib END), 0)
         |      + coalesce(max(CASE WHEN term = 'join' THEN contrib END), 0)
         |      + coalesce(max(CASE WHEN term = 'stream' THEN contrib END), 0), 6) AS bm25,
         |  COUNT(*) AS matched_terms
         |FROM c GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.llm.Relevance.bm25(Tables.documents(s, dir), "doc_id", "text",
        Seq("hash", "join", "stream"))
    },

    // ---- q77: per-language corpus length distribution — the length-cut
    // report a curation pipeline checks before truncation/filter decisions.
    // Exact interpolated percentiles (bit-parity with quantile_cont, as in
    // q68) over the language-ID partition.
    QueryDef.sql("q77_corpus_length_stats", {
      val scoreSql = TextStats.langProfiles.map { case (l, wsx) =>
        val set = wsx.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter($toksSql, t -> t IN ($set))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val langs = TextStats.langProfiles.map(_._1)
      val maxExpr = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val caseExpr = langs.map(l => s"WHEN s_$l = $maxExpr AND $maxExpr > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'unknown' END")
      s"""WITH scored AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len, $scoreSql
         |  FROM documents),
         |lng AS (SELECT len, $caseExpr AS lang FROM scored)
         |SELECT lang, COUNT(*) AS docs,
         |  MIN(len) AS min_len, MAX(len) AS max_len,
         |  quantile_cont(len, 0.5) AS p50_len,
         |  quantile_cont(len, 0.95) AS p95_len
         |FROM lng GROUP BY 1""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val lang = TextStats.langId(docs, "doc_id", "text")
        .select(col("doc_id"), col("predicted_lang"))
      docs.select(col("doc_id"), length(col("text")).cast("long").as("len"))
        .join(lang, "doc_id")
        .groupBy(col("predicted_lang").as("lang"))
        .agg(count(lit(1)).as("docs"),
          min(col("len")).as("min_len"), max(col("len")).as("max_len"),
          expr("percentile(len, 0.5)").as("p50_len"),
          expr("percentile(len, 0.95)").as("p95_len"))
    },

    // ---- q113: context-window chunking — each document split into
    // overlapping 64-token windows at stride 48 (25% overlap), the
    // retrieval/embedding prep for long documents. Engine side is a pure
    // flatMap (projection + explode, zero shuffles); the oracle replays
    // the identical position arithmetic with DuckDB list slices.
    QueryDef.sql("q113_doc_chunking",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         |s AS (SELECT doc_id, toks, n,
         |    unnest(generate_series(0, n - 1, 48)) AS start FROM n)
         |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
         |  CAST(start AS BIGINT) AS start_token,
         |  CAST(least(64, n - start) AS BIGINT) AS chunk_tokens,
         |  array_to_string(toks[start + 1 : least(start + 64, n)], ' ') AS chunk_text
         |FROM s ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      graft.llm.Chunking.chunkByTokens(
          Tables.documents(s, dir), "doc_id", "text", size = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- q117: bigram novelty vs a reference corpus — the exact
    // stand-in for n-gram-LM perplexity filtering: docs ≥ 250 are scored
    // by the fraction of their distinct bigrams unseen in the < 250
    // reference slice (high novelty ≈ off-distribution). Counts are
    // integral and the ratio is one IEEE division, so the gate is exact;
    // a log-prob perplexity would differ in ULPs across engines.
    QueryDef.sql("q117_bigram_novelty",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |b AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 2
         |    THEN list_transform(generate_series(1, len(toks)-1),
         |                        i -> toks[i] || ' ' || toks[i+1])
         |    ELSE CAST([] AS VARCHAR[]) END) AS bgs FROM t),
         |ref AS (SELECT DISTINCT unnest(bgs) AS bigram FROM b WHERE doc_id < 250),
         |d AS (SELECT doc_id, unnest(bgs) AS bigram FROM b WHERE doc_id >= 250),
         |agg AS (SELECT d.doc_id, COUNT(*) AS n,
         |    SUM(CASE WHEN r.bigram IS NULL THEN 1 ELSE 0 END) AS novel
         |  FROM d LEFT JOIN ref r USING (bigram) GROUP BY 1)
         |SELECT b.doc_id, CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_bigrams,
         |  CAST(COALESCE(agg.novel, 0) AS BIGINT) AS novel_bigrams,
         |  CASE WHEN agg.n > 0 THEN CAST(agg.novel AS DOUBLE) / agg.n END
         |    AS novelty_ratio
         |FROM b LEFT JOIN agg ON b.doc_id = agg.doc_id
         |WHERE b.doc_id >= 250 ORDER BY 1""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      TextStats.bigramNovelty(
          docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250),
          "doc_id", "text")
        .orderBy("doc_id")
    },

    // ---- q120: bigram-LM average log-probability — the real CCNet-style
    // LM quality filter (q117's bigram novelty is its exact-arithmetic
    // stand-in): add-one-smoothed bigram model fit on docs < 250, docs
    // >= 250 scored by mean per-occurrence ln P(w2|w1). Cross-engine FP
    // determinism via the q82/q83 recipe — contributions folded in
    // bigram-lexicographic order on BOTH engines, final score rounded to
    // 6 dp (absorbs <= 1-ulp ln drift; sort order makes association
    // identical by construction).
    QueryDef.sql("q120_bigram_logprob",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |rt AS (SELECT toks FROM t WHERE doc_id < 250),
         |runi AS (SELECT w1, COUNT(*) AS cu FROM
         |           (SELECT unnest(toks) AS w1 FROM rt) GROUP BY 1),
         |rbi AS (SELECT b, COUNT(*) AS cb FROM
         |          (SELECT unnest(list_transform(generate_series(1, greatest(len(toks)-1, 0)),
         |             i -> toks[i] || ' ' || toks[i+1])) AS b FROM rt) GROUP BY 1),
         |v AS (SELECT COUNT(*) AS v FROM runi),
         |d AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks)-1, 0)),
         |        i -> {'b': toks[i] || ' ' || toks[i+1], 'w1': toks[i]})) AS bw
         |      FROM t WHERE doc_id >= 250),
         |db AS (SELECT doc_id, bw.b AS b, bw.w1 AS w1, COUNT(*) AS tf FROM d GROUP BY 1, 2, 3),
         |c AS (SELECT doc_id, b,
         |        tf * ln((COALESCE(cb, 0) + 1.0) / (COALESCE(cu, 0) + v)) AS contrib, tf
         |      FROM db LEFT JOIN rbi USING (b) LEFT JOIN runi USING (w1) CROSS JOIN v),
         |s AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
         |        round(list_reduce(list(contrib ORDER BY b), (acc, x) -> acc + x)
         |          / SUM(tf), 6) AS avg_logprob
         |      FROM c GROUP BY 1)
         |SELECT t.doc_id, CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams, s.avg_logprob
         |FROM t LEFT JOIN s ON t.doc_id = s.doc_id
         |WHERE t.doc_id >= 250 ORDER BY 1""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      TextStats.bigramLogProb(
          docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250),
          "doc_id", "text")
        .orderBy("doc_id")
    },

    // ---- q122: cross-document duplicated-span coverage — the
    // substring-level dedup diagnostic (Lee et al. 2021 shape) that
    // doc-level q40-q44 and line-level q95 miss: per doc, the token
    // positions covered by 8-grams occurring in >= 2 distinct documents,
    // as exact BIGINT interval-union counts plus one IEEE division (no
    // rounding needed — integer inputs, single op). The oracle re-derives
    // the same interval union with a lag() window; the Spark side uses a
    // sorted per-doc fold instead (no window node at scale).
    QueryDef.sql("q122_dup_span_coverage",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |occ AS (SELECT doc_id, pg.pos AS pos, pg.g AS g FROM
         |  (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks)-7, 0)),
         |     i -> {'pos': i, 'g': ${(0 until 8).map(j => if (j == 0) "toks[i]" else s"toks[i+$j]").mkString(" || ' ' || ")}})) AS pg
         |   FROM t)),
         |dup AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd
         |                       FROM occ GROUP BY 1) WHERE nd >= 2),
         |dp AS (SELECT doc_id, pos,
         |         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |       FROM occ JOIN dup USING (g)),
         |cov AS (SELECT doc_id, SUM(LEAST(8, pos - COALESCE(prev, pos - 8))) AS covered
         |        FROM dp GROUP BY 1)
         |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered_tokens,
         |  CASE WHEN len(toks) > 0
         |    THEN CAST(COALESCE(cov.covered, 0) AS DOUBLE) / len(toks)
         |  END AS dup_span_ratio
         |FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id ORDER BY 1""".stripMargin) { (s, dir) =>
      TextStats.dupSpanCoverage(Tables.documents(s, dir), "doc_id", "text",
          n = 8, minDocs = 2)
        .orderBy("doc_id")
    },

    // ---- q132: the Gopher rule-based quality filter (Rae et al. 2021,
    // Appendix A shape) — the published composite PRE-FILTER: length,
    // mean word length, symbol ratio, alphabetic-word ratio, stopword
    // floor, and the repetition thresholds, each as an exact-arithmetic
    // boolean column plus the all-rules verdict. minTokens lowered to 20
    // at these SFs so the gate is non-vacuous (the synthetic docs are
    // short; the production default is 50).
    QueryDef.sql("q132_gopher_rules",
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |b AS (SELECT doc_id, toks,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(length(regexp_replace(text, '$ws+', '', 'g')) AS DOUBLE) / len(toks) AS avg_token_len,
         |        CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT) AS n_symbols,
         |        CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
         |        CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop
         |      FROM t),
         |db AS (SELECT doc_id,
         |         CAST(len(list_distinct(list_transform(
         |           generate_series(1, greatest(len(toks)-1, 0)),
         |           i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT) AS n_db
         |       FROM t),
         |tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |cnt AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
         |top AS (SELECT doc_id, MAX(tf) AS top_tf FROM cnt GROUP BY 1),
         |r AS (SELECT b.doc_id, n_tokens,
         |        n_tokens >= 20 AND n_tokens <= 100000 AS r_length,
         |        avg_token_len BETWEEN 3.0 AND 10.0 AS r_word_len,
         |        CAST(n_symbols AS DOUBLE) / n_tokens <= 0.1 AS r_symbol,
         |        CAST(n_alpha AS DOUBLE) / n_tokens >= 0.8 AS r_alpha,
         |        n_stop >= 2 AS r_stopwords,
         |        (CAST(top_tf AS DOUBLE) / n_tokens < 0.1 AND
         |         CASE WHEN n_tokens > 1
         |              THEN 1.0 - CAST(n_db AS DOUBLE) / (n_tokens - 1)
         |              ELSE 0.0 END < 0.1) AS r_repetition
         |      FROM b JOIN db ON b.doc_id = db.doc_id
         |             JOIN top ON b.doc_id = top.doc_id)
         |SELECT doc_id, n_tokens, r_length, r_word_len, r_symbol, r_alpha,
         |  r_stopwords, r_repetition,
         |  (r_length AND r_word_len AND r_symbol AND r_alpha AND r_stopwords
         |   AND r_repetition) AS kept
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextStats.gopherRules(Tables.documents(s, dir), "doc_id", "text",
          minTokens = 20)
        .orderBy("doc_id")
    },

    // ---- q130: CCNet-style per-language quality tiers — the published
    // CCNet bucketing: language-ID the corpus, LM-score it against the
    // reference slice, and split EACH LANGUAGE into head/middle/tail
    // terciles by perplexity rank (NTILE over a PARTITIONED window —
    // per-language, never global). Composes q49's langID and q120's
    // bigram LM; the oracle replays both plus the NTILE. Docs with no
    // bigrams (unscorable) are dropped, as CCNet drops them.
    QueryDef.sql("q130_ccnet_quality_tiers", {
      val scoreSql = TextStats.langProfiles.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(toks, t -> t IN ($set))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val langs = TextStats.langProfiles.map(_._1)
      val maxExpr = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val caseExpr = langs.map(l => s"WHEN s_$l = $maxExpr AND $maxExpr > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'unknown' END")
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |lng AS (SELECT doc_id, $caseExpr AS lang FROM
         |          (SELECT doc_id, toks, $scoreSql FROM t)),
         |rt AS (SELECT toks FROM t WHERE doc_id < 250),
         |runi AS (SELECT w1, COUNT(*) AS cu FROM
         |           (SELECT unnest(toks) AS w1 FROM rt) GROUP BY 1),
         |rbi AS (SELECT b, COUNT(*) AS cb FROM
         |          (SELECT unnest(list_transform(generate_series(1, greatest(len(toks)-1, 0)),
         |             i -> toks[i] || ' ' || toks[i+1])) AS b FROM rt) GROUP BY 1),
         |v AS (SELECT COUNT(*) AS v FROM runi),
         |d2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks)-1, 0)),
         |         i -> {'b': toks[i] || ' ' || toks[i+1], 'w1': toks[i]})) AS bw FROM t),
         |db AS (SELECT doc_id, bw.b AS b, bw.w1 AS w1, COUNT(*) AS tf FROM d2 GROUP BY 1, 2, 3),
         |c2 AS (SELECT doc_id, b,
         |         tf * ln((COALESCE(cb, 0) + 1.0) / (COALESCE(cu, 0) + v)) AS contrib, tf
         |       FROM db LEFT JOIN rbi USING (b) LEFT JOIN runi USING (w1) CROSS JOIN v),
         |lm AS (SELECT doc_id,
         |         round(list_reduce(list(contrib ORDER BY b), (acc, x) -> acc + x)
         |           / SUM(tf), 6) AS avg_logprob
         |       FROM c2 GROUP BY 1),
         |j AS (SELECT lng.doc_id, lng.lang, lm.avg_logprob
         |      FROM lng JOIN lm USING (doc_id))
         |SELECT doc_id, lang, avg_logprob,
         |  CAST(NTILE(3) OVER (PARTITION BY lang ORDER BY avg_logprob DESC, doc_id) AS INTEGER)
         |    AS bucket,
         |  CASE NTILE(3) OVER (PARTITION BY lang ORDER BY avg_logprob DESC, doc_id)
         |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
         |FROM j ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val lang = TextStats.langId(docs, "doc_id", "text")
        .select(col("doc_id"), col("predicted_lang").as("lang"))
      val lm = TextStats.bigramLogProb(docs.filter(col("doc_id") < 250),
          docs, "doc_id", "text")
        .filter(col("avg_logprob").isNotNull)
        .select(col("doc_id"), col("avg_logprob"))
      // per-language NTILE via the range-partitioned two-pass rank — a
      // language key is exactly the skewed-partition case a
      // PARTITION BY lang window would serialize at scale (one language
      // dominates any real corpus); groupedNtile is bit-equal to the
      // oracle's window NTILE with no single-group task
      graft.operators.Ranks.groupedNtile(
          lang.join(lm, Seq("doc_id")), Seq("lang"),
          Seq(desc("avg_logprob"), asc("doc_id")), 3, "bucket")
        .withColumn("tier", when(col("bucket") === 1, "head")
          .when(col("bucket") === 2, "middle").otherwise("tail"))
        .select(col("doc_id"), col("lang"), col("avg_logprob"),
          col("bucket"), col("tier"))
        .orderBy("doc_id")
    },

    // ---- q128: exact-substring span REMOVAL (Lee et al. 2021) — the
    // dedup artifact q122 only measures: tokens covered by any 8-gram
    // shared by ≥2 docs are cut and the text rebuilt from survivors.
    // The oracle replays every stage with string grams (no hash needed
    // in SQL), an ANTI JOIN for the survivor set, and an ordered
    // string_agg rebuild.
    QueryDef.sql("q128_dup_span_removal",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |occ AS (SELECT doc_id, pg.pos AS pos, pg.g AS g FROM
         |  (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks)-7, 0)),
         |     i -> {'pos': i, 'g': ${(0 until 8).map(j => if (j == 0) "toks[i]" else s"toks[i+$j]").mkString(" || ' ' || ")}})) AS pg
         |   FROM t)),
         |dup AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd
         |                       FROM occ GROUP BY 1) WHERE nd >= 2),
         |cp AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS p
         |       FROM occ JOIN dup USING (g)),
         |tk AS (SELECT doc_id, pt.p AS p, pt.tok AS tok FROM
         |  (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)),
         |     i -> {'p': i, 'tok': toks[i]})) AS pt FROM t)),
         |kept AS (SELECT doc_id, COUNT(*) AS kc,
         |           string_agg(tok, ' ' ORDER BY p) AS txt
         |         FROM tk ANTI JOIN cp USING (doc_id, p) GROUP BY 1)
         |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(kept.kc, 0) AS BIGINT) AS kept_tokens,
         |  CAST(len(toks) - COALESCE(kept.kc, 0) AS BIGINT) AS removed_tokens,
         |  COALESCE(kept.txt, '') AS deduped_text
         |FROM t LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextStats.removeDuplicatedSpans(Tables.documents(s, dir),
          "doc_id", "text", n = 8, minDocs = 2)
        .orderBy("doc_id")
    },

    // ---- q123: hashed linear classifier scoring — the fastText-shape
    // quality-filter serving path (hashing trick: unigram+bigram features
    // into 1024 md5-derived weight slots; frozen md5-derived weights in
    // [-1000,1000] stand in for a broadcast trained vector). Pure
    // projection — per-row HOFs, zero shuffles — the ideal 100 TB scoring
    // plan. Score is an exact BIGINT sum (order-free); mean is one IEEE
    // division of exact integers; verdict an integer compare.
    QueryDef.sql("q123_hashed_classifier",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |f AS (SELECT doc_id, list_concat(toks,
         |        list_transform(generate_series(1, greatest(len(toks)-1, 0)),
         |          i -> toks[i] || ' ' || toks[i+1])) AS feats FROM t),
         |s AS (SELECT doc_id, CAST(len(feats) AS BIGINT) AS n_feats,
         |        CAST(list_reduce(list_transform(feats, x ->
         |          CAST('0x' || substr(md5(CAST(CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 1024 AS VARCHAR)), 1, 4) AS BIGINT) % 2001 - 1000),
         |          (a, b) -> a + b) AS BIGINT) AS score
         |      FROM f)
         |SELECT doc_id, n_feats, score,
         |  CAST(score AS DOUBLE) / n_feats AS avg_weight,
         |  score > 0 AS is_quality
         |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.llm.Scoring.hashedLinearScore(Tables.documents(s, dir),
          "doc_id", "text", buckets = 1024)
        .orderBy("doc_id")
    },

    // ---- q187: SCORE CALIBRATION DECILES — the model-diagnostics table
    // for the q123 classifier: docs cut into 10 score deciles (the
    // distributed exact NTILE — no one-task global sort), per-decile
    // doc counts and mean score/feature-count. The "is the quality
    // classifier just picking long documents" check an ML-ops review
    // reads before trusting a filter.
    QueryDef.sql("q187_score_calibration",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |f AS (SELECT doc_id, list_concat(toks,
         |        list_transform(generate_series(1, greatest(len(toks)-1, 0)),
         |          i -> toks[i] || ' ' || toks[i+1])) AS feats FROM t),
         |s AS (SELECT doc_id, CAST(len(feats) AS BIGINT) AS n_feats,
         |        CAST(list_reduce(list_transform(feats, x ->
         |          CAST('0x' || substr(md5(CAST(CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 1024 AS VARCHAR)), 1, 4) AS BIGINT) % 2001 - 1000),
         |          (a, b) -> a + b) AS BIGINT) AS score
         |      FROM f),
         |r AS (SELECT doc_id, score, n_feats,
         |        CAST(NTILE(10) OVER (ORDER BY score, doc_id) AS INTEGER) AS decile
         |      FROM s)
         |SELECT decile, COUNT(*) AS n_docs,
         |  CAST(SUM(score) AS BIGINT) AS sum_score,
         |  CAST(SUM(n_feats) AS BIGINT) AS sum_feats,
         |  ROUND(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) AS mean_score,
         |  ROUND(CAST(SUM(n_feats) AS DOUBLE) / COUNT(*), 6) AS mean_feats
         |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Ranks
      val scored = graft.llm.Scoring.hashedLinearScore(
          Tables.documents(s, dir), "doc_id", "text", buckets = 1024)
        .select("doc_id", "score", "n_feats")
      Ranks.distributedNtile(scored,
          Seq(col("score").asc, col("doc_id").asc), 10, "decile")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("score")).as("sum_score"),
          sum(col("n_feats")).as("sum_feats"),
          round(sum(col("score")).cast("double") / count(lit(1)), 6)
            .as("mean_score"),
          round(sum(col("n_feats")).cast("double") / count(lit(1)), 6)
            .as("mean_feats"))
    },

    // ---- q124: DSIR importance log-ratio (Xie et al. 2023) — hashed-
    // n-gram bag-of-words likelihood ratio between the target split
    // (doc_id < 250, the q117/q120 convention) and the raw split. The
    // fitted models are bucket-keyed count tables (≤ 1024 rows,
    // broadcast); per-doc contributions fold in bucket-id order and
    // round to 6 dp — the q120 cross-engine ln recipe.
    QueryDef.sql("q124_dsir_importance",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |fe AS (SELECT doc_id, unnest(list_concat(toks,
         |         list_transform(generate_series(1, greatest(len(toks)-1, 0)),
         |           i -> toks[i] || ' ' || toks[i+1]))) AS f FROM t),
         |bo AS (SELECT doc_id, CAST('0x' || substr(md5(f), 1, 8) AS BIGINT) % 1024 AS b FROM fe),
         |tc AS (SELECT b, COUNT(*) AS ct FROM bo WHERE doc_id < 250 GROUP BY 1),
         |rc AS (SELECT b, COUNT(*) AS cr FROM bo WHERE doc_id >= 250 GROUP BY 1),
         |tot AS (SELECT COALESCE((SELECT SUM(ct) FROM tc), 0) AS nt,
         |               COALESCE((SELECT SUM(cr) FROM rc), 0) AS nr),
         |db AS (SELECT doc_id, b, COUNT(*) AS tf FROM bo WHERE doc_id >= 250 GROUP BY 1, 2),
         |c AS (SELECT doc_id, b, tf,
         |        tf * (ln((COALESCE(ct, 0) + 1.0) / (nt + 1024)) -
         |              ln((COALESCE(cr, 0) + 1.0) / (nr + 1024))) AS contrib
         |      FROM db LEFT JOIN tc USING (b) LEFT JOIN rc USING (b) CROSS JOIN tot)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_feats,
         |  round(list_reduce(list(contrib ORDER BY b), (acc, x) -> acc + x), 6) AS log_ratio
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      graft.llm.Scoring.dsirLogRatio(
          docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250),
          "doc_id", "text", buckets = 1024)
        .orderBy("doc_id")
    },

    // ---- q125: fixed-point integer PageRank over the capped near-dup
    // graph (q94's pair source) — graph centrality for canonical-doc
    // choice and boilerplate-hub ranking. BIGINT fixed point at scale
    // 1e9, 5 rounds, d=0.85: integer sums and floor divisions make the
    // result bit-identical across engines and partitionings (float
    // PageRank would drift). The oracle re-derives the capped pair set
    // independently and unrolls the same 5 integer rounds as CTEs
    // (DuckDB `//` = Spark `div` on non-negative values).
    QueryDef.sql("q125_dedup_pagerank", {
      val prIters = 5
      val unrolled = (1 to prIters).map { k =>
        s"""c$k AS (SELECT e.dst AS id, SUM((85 * r${k - 1}.r) // (100 * e.deg)) AS s
           |  FROM e JOIN r${k - 1} ON e.src = r${k - 1}.id GROUP BY 1),
           |r$k AS (SELECT d.doc_id AS id, 150000000 + COALESCE(CAST(c$k.s AS BIGINT), 0) AS r
           |  FROM documents d LEFT JOIN c$k ON d.doc_id = c$k.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 16 GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b
         |          FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8),
         |se AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |       UNION SELECT doc_b, doc_a FROM pairs),
         |dg AS (SELECT src, COUNT(*) AS deg FROM se GROUP BY 1),
         |e AS (SELECT se.src, se.dst, dg.deg FROM se JOIN dg USING (src)),
         |r0 AS (SELECT doc_id AS id, CAST(1000000000 AS BIGINT) AS r FROM documents),
         |$unrolled
         |SELECT r$prIters.id AS doc_id, r$prIters.r AS rank_fp
         |FROM r$prIters ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
        maxDocFreq = 16)
      graft.llm.Clusters.pageRankFixedPoint(
          docs.select("doc_id"), "doc_id", pairs, "doc_a", "doc_b", iters = 5)
        .orderBy("doc_id")
    },

    // ---- q126: canonical-doc selection by PageRank — the upgrade over
    // q94's min-id convention: each near-dup cluster keeps its MOST
    // CENTRAL member (max fixed-point rank, doc_id tie-break), the pick
    // a curation pipeline actually wants (the hub of a near-dup
    // neighborhood is the canonical page; its satellites are the
    // variants). Pure-integer composition of q94's components and
    // q125's ranks over ONE pinned pair set (two consumers — unpinned,
    // the mining pipeline would run twice); the argmax is a struct MAX,
    // no window. The oracle re-derives everything: capped pairs,
    // recursive-CTE closure, 5 unrolled integer PR rounds, struct argmax.
    QueryDef.sql("q126_canonical_by_pagerank", {
      val prIters = 5
      val unrolled = (1 to prIters).map { k =>
        s"""c$k AS (SELECT e.dst AS id, SUM((85 * r${k - 1}.r) // (100 * e.deg)) AS s
           |  FROM e JOIN r${k - 1} ON e.src = r${k - 1}.id GROUP BY 1),
           |r$k AS (SELECT d.doc_id AS id, 150000000 + COALESCE(CAST(c$k.s AS BIGINT), 0) AS r
           |  FROM documents d LEFT JOIN c$k ON d.doc_id = c$k.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(${shinglesSql("toks")}) AS s FROM t),
         |dfq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
         |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |          JOIN dfq ON dfq.s = a.s AND dfq.df <= 16 GROUP BY 1, 2),
         |pairs AS (SELECT doc_a, doc_b
         |          FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
         |          WHERE CAST(i AS DOUBLE)/(sa.n + sb.n - i) >= 0.8),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id),
         |se AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |       UNION SELECT doc_b, doc_a FROM pairs),
         |dg AS (SELECT src, COUNT(*) AS deg FROM se GROUP BY 1),
         |e AS (SELECT se.src, se.dst, dg.deg FROM se JOIN dg USING (src)),
         |r0 AS (SELECT doc_id AS id, CAST(1000000000 AS BIGINT) AS r FROM documents),
         |$unrolled,
         |j AS (SELECT comp.id AS doc_id, comp.lbl AS cluster_rep, r$prIters.r AS rank_fp
         |      FROM comp JOIN r$prIters ON comp.id = r$prIters.id),
         |cx AS (SELECT cluster_rep, MAX({'r': rank_fp, 'i': doc_id}) AS m
         |       FROM j GROUP BY 1)
         |SELECT j.doc_id, cx.m.i AS canonical_id, cx.m.r AS canonical_rank,
         |  j.doc_id = cx.m.i AS kept
         |FROM j JOIN cx USING (cluster_rep) ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val pairs = graft.Checkpoints.pin(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, maxDocFreq = 16)
          .select("doc_a", "doc_b"))
      val ids = docs.select("doc_id")
      val cc = graft.llm.Clusters.connectedComponents(
        ids, "doc_id", pairs, "doc_a", "doc_b")
      val pr = graft.llm.Clusters.pageRankFixedPoint(
        ids, "doc_id", pairs, "doc_a", "doc_b", iters = 5)
      val j = cc.join(pr, "doc_id")
      val cx = j.groupBy(col("cluster_rep"))
        .agg(max(struct(col("rank_fp").as("r"), col("doc_id").as("i"))).as("m"))
      j.join(cx, "cluster_rep")
        .select(col("doc_id"),
          col("m.i").as("canonical_id"),
          col("m.r").as("canonical_rank"),
          (col("doc_id") === col("m.i")).as("kept"))
        .orderBy("doc_id")
    },

    // ---- q115: count-min-sketch heavy hitters — the frequency twin of
    // q112's HLL rollup: one 64 KB mergeable sketch over all corpus terms
    // (counters are sums → bit-identical under any partitioning), probed
    // for the exact top-20 terms so the snapshot documents the one-sided
    // error (cms_freq ≥ exact_freq always; equal at this scale). Not
    // SQL-oracle-able (xxhash64 family) → golden gate; SqlFunctionsSpec
    // pins mergeability, partitioning-independence, and one-sidedness.
    // ---- q115a: INDEPENDENT error audit for the golden-gated q115 (the
    // q112a pattern for the frequency sketch): Spark keeps only the
    // top-20 terms whose CMS estimate honors BOTH bounds — one-sided
    // (cms >= exact always, by construction) and the width guarantee
    // (overcount <= 0.5% of total token mass; measured overcount on this
    // corpus: exactly 0 at every shipped scale) — and emits
    // (term, exact_freq); the oracle recomputes the exact top-20 in SQL.
    // A sketch bug in either direction drops a row and fails the gate.
    QueryDef.sql("q115a_cms_error_audit",
      s"""WITH tok AS (SELECT unnest(regexp_extract_all(lower(text),
         |    '[a-z]+|[0-9]+|[^a-z0-9$ws]')) AS term FROM documents)
         |SELECT term, COUNT(*) AS exact_freq FROM tok GROUP BY 1
         |ORDER BY exact_freq DESC, term LIMIT 20""".stripMargin) { (s, dir) =>
      import graft.operators.Cms
      // pinned: total/sketch/top-20 all read the vocabulary, and three
      // unmaterialized references would re-run the corpus tokenize pass
      // three times (the triangles multi-reference lesson)
      val counts = graft.Checkpoints.pin(Tables.documents(s, dir).select(
          explode(regexp_extract_all(lower(col("text")),
            lit(TextStats.bpeishPattern), lit(0))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("exact_freq")))
      val total = counts.agg(sum(col("exact_freq")).as("__total"))
      val sk = counts.agg(Cms.sketchWeighted(col("term"), col("exact_freq")).as("sk"))
      val top = counts.orderBy(desc("exact_freq"), asc("term")).limit(20)
      val est = Cms.estimate(col("sk"), col("term"))
      top.crossJoin(broadcast(sk)).crossJoin(broadcast(total))
        .filter(est >= col("exact_freq") &&
          est - col("exact_freq") <=
            greatest(lit(1L), (lit(0.005) * col("__total")).cast("long")))
        .select(col("term"), col("exact_freq"))
        .orderBy(desc("exact_freq"), asc("term"))
    },

    QueryDef.golden("q115_cms_heavy_hitters") { (s, dir) =>
      import graft.operators.Cms
      // One codegen'd token pass: exact (term, count) vocabulary first;
      // the sketch is then built WEIGHTED over vocab-cardinality rows
      // (bit-identical counters — sums commute), so the object-path
      // aggregator cost is per distinct term, not per corpus token.
      // Pinned: the sketch and the top-20 both read it.
      val counts = graft.Checkpoints.pin(Tables.documents(s, dir).select(
          explode(regexp_extract_all(lower(col("text")),
            lit(TextStats.bpeishPattern), lit(0))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("exact_freq")))
      val sk = counts.agg(
        Cms.sketchWeighted(col("term"), col("exact_freq")).as("sk"))
      val top = counts.orderBy(desc("exact_freq"), asc("term")).limit(20)
      top.crossJoin(broadcast(sk))   // 1-row sketch, bounded by construction
        .select(col("term"), col("exact_freq"),
          Cms.estimate(col("sk"), col("term")).as("cms_freq"))
        .withColumn("overcount", col("cms_freq") - col("exact_freq"))
        .orderBy("term")
    },

    // ---- q149: C4's line/page cleaning rules (Raffel 2020 §2.2 — the
    // published pipeline behind the C4 corpus). The synthetic documents
    // carry no newlines/braces/boilerplate, so the page is SYNTHESIZED
    // deterministically from (doc_id, text) in BOTH engines (the q135
    // fixture-synthesis pattern): a well-formed first line, a too-short
    // line, a javascript line on doc_id%7, an unterminated line on %5,
    // a lorem-ipsum page on %13, a brace page on %11 — every rule
    // discriminates. The line rules run inside ONE codegen'd array
    // filter HOF (no explode, no shuffle — at 100 TB the line filter is
    // a projection, not a per-line row explosion); the oracle replays
    // page synthesis + list_filter + the rebuilt text byte-for-byte.
    QueryDef.sql("q149_c4_line_filters",
      """WITH p AS (SELECT doc_id,
        |  substr(text, 1, 60) || ' end of line.' || chr(10) ||
        |  'too short' || chr(10) ||
        |  CASE WHEN doc_id % 7 = 0 THEN 'please enable javascript to view this page.'
        |       ELSE 'this is a second well formed line.' END || chr(10) ||
        |  CASE WHEN doc_id % 5 = 0 THEN 'this line has no terminal punctuation'
        |       ELSE 'does this line end with a question mark?' END ||
        |  CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'function() { return 1; }' ELSE '' END
        |  AS page FROM documents),
        |f AS (SELECT doc_id, page,
        |  string_split(page, chr(10)) AS ls,
        |  list_filter(string_split(page, chr(10)), l ->
        |    regexp_matches(trim(l), '[.!?"]$')
        |    AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
        |    AND NOT contains(lower(trim(l)), 'javascript')) AS ks
        |  FROM p)
        |SELECT doc_id,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(ks) AS BIGINT) AS n_lines_kept,
        |  NOT contains(lower(page), 'lorem ipsum') AS r_no_lorem,
        |  NOT contains(page, '{') AS r_no_brace,
        |  len(ks) >= 1 AS r_min_lines,
        |  (NOT contains(lower(page), 'lorem ipsum')) AND (NOT contains(page, '{'))
        |    AND len(ks) >= 1 AS kept,
        |  CASE WHEN (NOT contains(lower(page), 'lorem ipsum'))
        |         AND (NOT contains(page, '{')) AND len(ks) >= 1
        |       THEN array_to_string(ks, chr(10)) END AS clean_text
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val page = concat(
        substring(col("text"), 1, 60), lit(" end of line.\ntoo short\n"),
        when(col("doc_id") % 7 === 0, lit("please enable javascript to view this page."))
          .otherwise(lit("this is a second well formed line.")),
        lit("\n"),
        when(col("doc_id") % 5 === 0, lit("this line has no terminal punctuation"))
          .otherwise(lit("does this line end with a question mark?")),
        when(col("doc_id") % 13 === 0, lit("\nlorem ipsum dolor sit amet."))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("\nfunction() { return 1; }"))
          .otherwise(lit("")))
      TextStats.c4LineFilter(
          Tables.documents(s, dir).select(col("doc_id"), page.as("text")),
          "doc_id", "text")
        .orderBy("doc_id")
    }
  )
}
