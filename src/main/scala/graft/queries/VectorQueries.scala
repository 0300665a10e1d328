package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.VectorFns
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search queries over the `embeddings` table (ARRAY<FLOAT>, 64
  * dims). Dot products accumulate in DECIMAL (VectorFns) so the Spark plan
  * and the DuckDB oracle produce bit-identical doubles.
  */
object VectorQueries {

  /** DuckDB exact dot product of two FLOAT[] columns (decimal accumulation,
    * mirrors VectorFns.dot). */
  private[queries] def dotSql(a: String, b: String) =
    s"""CAST(list_sum(list_transform(generate_series(1, 64),
       |  i -> CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(20,15)))) AS DOUBLE)""".stripMargin
  // DuckDB's decimal->double conversion can differ from the JVM's by 1 ULP
  // (it is not correctly rounded), so final metrics are rounded to 9 digits
  // on both sides.
  private[queries] def cosSql(a: String, b: String) =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 9)"

  val defs: Seq[QueryDef] = Seq(

    // ---- q45: vector norms (HOF plumbing check — exact against DuckDB)
    QueryDef.sql("q45_embedding_norms",
      s"""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
         |  round(sqrt(${dotSql("embedding", "embedding")}), 9) AS l2_norm
         |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir).select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(VectorFns.norm(col("embedding")), 9).as("l2_norm"))
        .orderBy("vec_id")
    },

    // ---- q98: per-label embedding centroids (mean pooling) — the class-
    // centroid report an embedding-space monitor computes per source/label.
    // Decimal-exact sums (order-independent), double division on exact
    // operands, round(9) on both engines (decimal→double is 1-ulp engine-
    // dependent, same note as cosSql).
    QueryDef.sql("q98_embedding_centroids",
      """WITH x AS (
        |  SELECT label,
        |    unnest(generate_series(1, 64)) AS dim,
        |    unnest(list_transform(embedding,
        |      v -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,15)))) AS dv
        |  FROM embeddings)
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  round(CAST(SUM(dv) AS DOUBLE) / COUNT(*), 9) AS centroid,
        |  COUNT(*) AS n
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Similarity.centroidRows(Tables.embeddings(s, dir), "label")
        .orderBy("label", "dim")
    },

    // ---- q99: per-label embedding OUTLIERS — farthest-from-own-centroid
    // vectors (anomaly/contamination scan over embedding space). Squared
    // distance accumulates per-dim squared diffs in DECIMAL (the diffs
    // themselves are identical doubles on both engines: exact float→double
    // v, round(9) centroid), ranked by the rounded distance + vec_id so
    // ranks are engine-independent; window is partitioned by label.
    QueryDef.sql("q99_embedding_outliers",
      """WITH x AS (
        |  SELECT vec_id, label,
        |    unnest(generate_series(1, 64)) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, dim,
        |    round(CAST(SUM(CAST(v AS DECIMAL(20,15))) AS DOUBLE) / COUNT(*), 9) AS centroid
        |  FROM x GROUP BY 1, 2),
        |d AS (
        |  SELECT vec_id, x.label,
        |    round(CAST(SUM(CAST((v - centroid) * (v - centroid) AS DECIMAL(20,15))) AS DOUBLE), 9) AS dist_sq
        |  FROM x JOIN cent ON x.label = cent.label AND x.dim = cent.dim
        |  GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |        (PARTITION BY label ORDER BY dist_sq DESC, vec_id) AS rnk FROM d)
        |SELECT label, vec_id, dist_sq, CAST(rnk AS INTEGER) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY label, rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      val x = emb
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("label"),
          (col("pos") + 1).cast("long").as("dim"), col("v").cast("double").as("v"))
      val cent = Similarity.centroidRows(emb, "label")
        .select(col("label"), col("dim"), col("centroid"))
      val sq = ((col("v") - col("centroid")) * (col("v") - col("centroid")))
        .cast(org.apache.spark.sql.types.DecimalType(20, 15))
      val d = x.join(cent, Seq("label", "dim"))
        .select(col("vec_id"), col("label"), sq.as("sq"))
        .groupBy("vec_id", "label")
        .agg(round(sum(col("sq")).cast("double"), 9).as("dist_sq"))
      val w = Window.partitionBy(col("label"))
        .orderBy(desc("dist_sq"), asc("vec_id"))
      d.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("label"), col("vec_id"), col("dist_sq"), col("rnk"))
        .orderBy("label", "rnk")
    },

    // ---- q46: brute-force cosine top-k ANN baseline (query = vec_id 0)
    QueryDef.sql("q46_ann_brute_topk",
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.qe")} AS cosine
         |FROM embeddings e, q
         |ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      Similarity.bruteTopK(emb, query, 20)
    },

    // ---- q47: IVF-probed ANN (scale path; recall vs q46 asserted in
    // SimilaritySpec — oracle omitted, centroid floats are plan-internal)
    QueryDef.golden("q47_ann_ivf_topk") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      Similarity.ivfTopK(emb, query, "label", k = 20, nProbe = 3)
    },

    // ---- q59: IVF with self-trained k-means coarse quantizer (no natural
    // blocking key needed; float-iterative centroids — rows-only, recall
    // asserted in SimilaritySpec)
    QueryDef.golden("q59_ann_ivf_kmeans") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cells = Similarity.kmeansCells(emb, k = 8, iters = 2)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      Similarity.ivfTopK(cells, query, "cell", k = 20, nProbe = 3)
    },

    // ---- q91: product-quantization ANN (the faiss-style memory-scale
    // path): 8 subspaces × 16 codewords trained by the deterministic
    // Lloyd loop, vectors compressed to 8 small ints, query answered by
    // ADC table lookups over CODES only — no float vector is read at
    // query time. Codebooks are float-iterative → golden-gated; recall
    // vs brute force asserted in SimilaritySpec.
    QueryDef.golden("q91_ann_pq") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val books = Similarity.pqTrain(emb, m = 8, k = 16, iters = 2)
      val codes = Similarity.pqEncode(emb, books)
      val queryVec = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      Similarity.pqSearch(emb, codes, queryVec, books, k = 20, rerank = 100)
    },

    // ---- q52: embedding near-duplicate pairs (blocked by cluster label)
    QueryDef.sql("q52_embedding_near_dups",
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4""".stripMargin) { (s, dir) =>
      Similarity.nearDuplicatePairs(Tables.embeddings(s, dir), "label", 0.4)
    },

    // ---- q53: LSH bucket histogram (random-hyperplane bucketing — the
    // bucket ids depend on the plane family, so rows-only + SimilaritySpec)
    QueryDef.golden("q53_ann_lsh_buckets") { (s, dir) =>
      Similarity.lshBuckets(Tables.embeddings(s, dir), nBits = 12)
        .groupBy("bucket").agg(count(lit(1)).as("vectors"))
        .orderBy(desc("vectors"), asc("bucket"))
    },

    // ---- q121: SemDeDup-shape semantic dedup, end-to-end — the
    // embedding-modality twin of the q94 text verdict: label-blocked
    // exact cosine pairs (q52) → connected components → keep each
    // cluster's min-id representative → the SURVIVING corpus. The oracle
    // re-derives the full chain (SQL cosine pairs + DuckDB's own
    // recursive-CTE closure) and returns the same survivor set.
    QueryDef.sql("q121_semantic_dedup",
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4),
         |edges AS (SELECT va AS s, vb AS d FROM pairs
         |          UNION SELECT vb, va FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id),
         |comp AS (SELECT id, MIN(lbl) AS lbl FROM reach GROUP BY id)
         |SELECT e.vec_id, e.label
         |FROM embeddings e JOIN comp ON e.vec_id = comp.id
         |WHERE comp.id = comp.lbl ORDER BY e.vec_id""".stripMargin) { (s, dir) =>
      Similarity.semanticDedupe(Tables.embeddings(s, dir), "label", 0.4)
        .select(col("vec_id"), col("label"))
        .orderBy("vec_id")
    }
  )
}
