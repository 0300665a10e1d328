package graft.queries

import graft.{QueryDef, Tables}
import graft.llm.{Clusters, Similarity}
import org.apache.spark.sql.functions._

/** Training-data-curation queries beyond pairwise dedup: duplicate-cluster
  * resolution (pairs → connected components → one representative) and
  * deterministic content-hash sampling — the operations a corpus pipeline
  * runs after near-dup mining and before training-set cuts.
  */
object CurationQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- q62: duplicate clusters — connected components over the exact
    // embedding near-dup pairs (q52's edge set), one row per multi-doc
    // cluster. Oracle: transitive closure via recursive CTE; Spark:
    // distributed min-label propagation (Clusters.connectedComponents).
    QueryDef.sql("q62_dedup_clusters",
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${VectorQueries.cosSql("a.embedding", "b.embedding")} >= 0.4),
         |edges AS (
         |  SELECT va AS s, vb AS d FROM pairs
         |  UNION SELECT vb, va FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id)
         |SELECT lbl AS cluster_rep, COUNT(*) AS cluster_size,
         |  MAX(id) AS max_member
         |FROM comp GROUP BY 1 HAVING COUNT(*) >= 2""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val pairs = Similarity.nearDuplicatePairs(emb, "label", 0.4)
      Clusters.duplicateClusters(emb.select("vec_id"), "vec_id",
        pairs, "vec_a", "vec_b")
    },

    // ---- q63: deterministic content-hash sample — the reproducible
    // "take 1/8 of the corpus" cut (hash of the CONTENT, not an RNG, so the
    // same document always lands on the same side across runs and engines).
    QueryDef.sql("q63_hash_sample",
      """SELECT doc_id, length(text) AS text_len
        |FROM documents
        |WHERE substr(md5(text), 1, 1) IN ('0', '1')
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .filter(substring(md5(col("text").cast("binary")), 1, 1).isin("0", "1"))
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .orderBy("doc_id")
    }
  )
}
