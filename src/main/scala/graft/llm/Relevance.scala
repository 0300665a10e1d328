package graft.llm

import graft.functions.TextFns
import graft.operators.Windows
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: sparse TF-IDF and BM25 ranked retrieval.
  *
  * Shape at scale: both build on the sparse posting representation
  * (doc, term, tf) — ONE explode + groupBy shuffle — then join per-term
  * document frequencies back on the term key (second shuffle, or a
  * pruned one: BM25 filters postings to the query's terms BEFORE any
  * stats join, so a 3-term query touches 3 posting lists, not the
  * vocabulary). Corpus scalars (N, avg doc length) ride along as 1-row
  * broadcast crossJoins — the repo's standard bounded-scalar pattern, no
  * driver-side collect in the plan.
  *
  * Determinism across engines: ln is NOT bitwise-portable (measured:
  * Java Math.log disagrees with libm in ~0.1% of this domain at 1 ulp),
  * so every transcendental score is `round(_, 6)` in BOTH engines —
  * a 1-ulp input wobble only matters if the true value sits within
  * ~1e-10 of a rounding boundary. Ranking windows order by the ROUNDED
  * score with a lexicographic term/doc tie-break, so order is total and
  * engine-independent.
  */
object Relevance {

  /** Sparse (doc, term, tf) postings from whitespace tokens. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** TF-IDF scores, sklearn smooth-idf variant:
    * `tfidf = tf * (ln((1+N)/(1+df)) + 1)`, rounded to 6 dp. */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // pinned: the posting build (the corpus explode + groupBy — the
    // dominant subtree) feeds both the df aggregate and the score join;
    // unpinned it executed twice (measured as most of q82's 13× wall at
    // 32× data)
    val p = graft.Checkpoints.pin(postings(docs, idCol, textCol))
    val dfStats = p.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    p.join(dfStats, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(
        col("tf") * (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1.0), 6))
      .select("doc_id", "term", "tf", "df", "tfidf")
  }

  /** Top-k terms per document by TF-IDF (rounded-score order, term
    * tie-break — total, engine-independent). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    Windows.topKPerGroup(tfIdf(docs, idCol, textCol),
        Seq(col("doc_id")), Seq(col("tfidf").desc, col("term").asc), k)
      .withColumnRenamed("rn", "rnk")

  /** BM25 ranked retrieval for a bag-of-terms query.
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avglen))`
    * with `idf = ln(1 + (N-df+0.5)/(df+0.5))` (Robertson-Sparck Jones).
    * Postings are filtered to `terms` FIRST — the plan's cost is the
    * query terms' posting lists, not the corpus vocabulary. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // pinned: the query-term posting slice feeds both its own df
    // aggregate and the score join (the full posting build runs ONCE,
    // inside this pin); docLen feeds the corpus scalars and the length
    // join — the same twice-referenced shapes as tfIdf's
    val qf = graft.Checkpoints.pin(
      postings(docs, idCol, textCol).filter(col("term").isin(terms: _*)))
    val docLen = graft.Checkpoints.pin(docs.select(col(idCol).as("doc_id"),
      size(TextFns.tokens(col(textCol))).cast("long").as("dl")))
    val scalars = docLen.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avg_dl"))   // exact: integer sum / count, one row
    val qp = qf.join(qf.groupBy("term").agg(count(lit(1)).as("df")), "term")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avg_dl")))
    qp.join(docLen, "doc_id")
      .crossJoin(broadcast(scalars))
      .withColumn("contrib", idf * tfNorm)
      .groupBy("doc_id")
      // sum of per-term doubles: ≤ |terms| addends, summed in a fixed
      // (term-ordered) sequence via sort_array to keep FP association
      // identical across partitionings and engines
      .agg(round(aggregate(sort_array(collect_list(struct(col("term"), col("contrib")))),
          lit(0.0), (acc, x) => acc + x.getField("contrib")), 6).as("bm25"),
        count(lit(1)).cast("long").as("matched_terms"))
  }
}
