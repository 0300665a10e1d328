package graft

import graft.llm.Relevance
import org.apache.spark.sql.functions._

/** TF-IDF / BM25 semantics: idf monotonicity, rank determinism across
  * partitionings, query-term pruning, FP-sum order independence. */
class RelevanceSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "rare gem among common words common words"),
    (2L, "common words again and again"),
    (3L, "common words and more common words"),
    (4L, "gem and words")
  ).toDF("doc_id", "text")

  test("tfIdf: rarer term scores higher than a common term at equal tf") {
    val s = Relevance.tfIdf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (_, dfRare, rare) = s((1L, "rare"))
    val (_, dfCommon, common) = s((1L, "common"))
    assert(dfRare == 1 && dfCommon == 3)
    assert(rare > common / 2)   // tf(common)=2 in doc 1; per-occurrence idf dominates
    // identical (tf, df) => identical score regardless of doc
    assert(s((1L, "gem"))._3 == s((4L, "gem"))._3)
  }

  test("topTerms ranks are stable across partitionings (rounded-score + term tiebreak)") {
    def ranks(parts: Int) =
      Relevance.topTerms(docs.repartition(parts), "doc_id", "text", 3)
        .collect().map(r => (r.getLong(0), r.getInt(5)) -> r.getString(1)).toMap
    assert(ranks(1) == ranks(7))
  }

  test("bm25: doc with more query terms and higher tf outranks; sum order-independent") {
    def run(parts: Int) =
      Relevance.bm25(docs.repartition(parts), "doc_id", "text", Seq("gem", "rare"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val m = run(1)
    assert(m.keySet == Set(1L, 4L))          // only docs containing a query term
    assert(m(1L)._2 == 2 && m(4L)._2 == 1)   // matched_terms
    assert(m(1L)._1 > m(4L)._1)              // two matches beat one
    assert(run(5) == m)                      // bitwise-stable across partitionings
  }
}
