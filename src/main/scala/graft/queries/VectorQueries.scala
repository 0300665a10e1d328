package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.VectorFns
import graft.llm.{Similarity, VectorIndex}
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

  /** DuckDB replica of the codegen'd [[graft.plans.FloatArrayDot]] /
    * PqKernel double dot: a LEFT-FOLD double sum of elementwise products
    * (`list_reduce` folds left from the first element, and IEEE
    * `0.0 + x₁ == x₁`, so the association matches the kernels'
    * `s += a[i]*b[i]` loop exactly). ORDER-DEPENDENT like the kernels —
    * only valid where the Spark side uses the same sequential fold. */
  private def ddotSql(a: String, b: String, dim: Int = 64) =
    s"""list_reduce(list_transform(generate_series(1, $dim),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  /** Decimal-exact per-group mean of float components, cast to FLOAT —
    * mirrors Similarity.exactMean (decimal(38,18) sum) followed by the
    * float cast. The oracle divides the exact sum in DOUBLE where Spark
    * divides in decimal; empirically float-identical at every (group,
    * dim) at all shipped SFs (the q47 seam, re-verified for q59/q91). */
  private val exactMeanFloatSql =
    "CAST(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS FLOAT)"

  /** The q47 label-IVF CTEs — per-label decimal-exact float centroids
    * (`cent`), the query vector (`qv`), and the top-`nProbe` probe cells
    * (`probe`, ranked by unrounded centroid cosine with label tie-break)
    * — shared by q47 and the stored-index search q144, whose persisted
    * centroids are the same [[Similarity.centroids]] output. */
  private def labelIvfCtes(nProbe: Int): String =
    s"""x AS (
       |  SELECT label, unnest(generate_series(1, 64)) AS dim,
       |    unnest(list_transform(embedding,
       |      v -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,15)))) AS dv
       |  FROM embeddings),
       |cm AS (SELECT label, dim,
       |         CAST(CAST(SUM(dv) AS DOUBLE) / COUNT(*) AS FLOAT) AS m
       |       FROM x GROUP BY 1, 2),
       |cent AS (SELECT label, list(m ORDER BY dim) AS centroid FROM cm GROUP BY 1),
       |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT label FROM cent, qv
       |          ORDER BY ${dotSql("centroid", "qe")} /
       |            (sqrt(${dotSql("centroid", "centroid")}) * sqrt(${dotSql("qe", "qe")}))
       |            DESC, label LIMIT $nProbe)""".stripMargin

  /** The SQ8 per-dim bounds trained over the FULL embeddings table, as
    * CTEs ending in `b` (mnA/mxA lists) — shared by q137 and q144. */
  private val sq8BoundsCtes: String =
    """x8 AS (SELECT unnest(generate_series(1, 64)) AS dim,
      |        unnest(embedding) AS v FROM embeddings),
      |mm AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM x8 GROUP BY 1),
      |b AS (SELECT list(mn ORDER BY dim) AS mnA, list(mx ORDER BY dim) AS mxA FROM mm)""".stripMargin

  /** The SQ8 ADC score (encode + midpoint decode + query dot, left-fold in
    * dim order, round 9) over aliases `e` (embedding), `b` (bounds), `qv`
    * (query) — the exact replay of [[Similarity.sq8CodesCol]] +
    * [[Similarity.sq8ScoreCol]], shared by q137 and q144. */
  private val sq8ScoreExprSql: String =
    """round(list_reduce(list_transform(generate_series(1, 64), i ->
      |  CAST(qv.qe[i] AS DOUBLE) * (CAST(b.mnA[i] AS DOUBLE) +
      |    (CASE WHEN b.mxA[i] > b.mnA[i]
      |       THEN least(255.0, greatest(0.0, floor((CAST(e.embedding[i] AS DOUBLE) - CAST(b.mnA[i] AS DOUBLE)) * 255.0
      |              / (CAST(b.mxA[i] AS DOUBLE) - CAST(b.mnA[i] AS DOUBLE)))))
      |       ELSE 0.0 END + 0.5) *
      |    (CASE WHEN b.mxA[i] > b.mnA[i]
      |       THEN (CAST(b.mxA[i] AS DOUBLE) - CAST(b.mnA[i] AS DOUBLE)) / 255.0
      |       ELSE 0.0 END))), (x, y) -> x + y), 9)""".stripMargin

  /** The q59 k-means(k=8, iters=2) + IVF chain as WITH-clause CTEs ending
    * in `a2` (vec_id, embedding, cell), `cent2` (per-cell centroids) and
    * `probe` (top-3 cells by centroid cosine) — the exact replay of
    * [[Similarity.kmeansCells]] + [[Similarity.ivfTopK]]: init = the k
    * lowest vec_ids; assignment = argmax dot/|c| with ties to the HIGHER
    * cell (`greatest` over (sim, cell) structs); means decimal-exact;
    * cells re-indexed by collect position (row_number over cell). The
    * loop runs assign→update twice but returns the SECOND assignment
    * (the final update is discarded), so the chain needs two assignment
    * rounds and ONE mean round. */
  private def kmeansIvfCtes(k: Int): String =
    s"""c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS c
       |       FROM embeddings ORDER BY vec_id LIMIT $k),
       |a1 AS (SELECT vec_id, embedding, cell FROM (
       |         SELECT e.vec_id, e.embedding, c0.cell,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${ddotSql("e.embedding", "c0.c")} / sqrt(${ddotSql("c0.c", "c0.c")}) DESC,
       |                      c0.cell DESC) AS rn
       |         FROM embeddings e CROSS JOIN c0) WHERE rn = 1),
       |m1 AS (SELECT cell, dim, $exactMeanFloatSql AS m
       |       FROM (SELECT cell, unnest(generate_series(1, 64)) AS dim,
       |                    unnest(embedding) AS v FROM a1)
       |       GROUP BY 1, 2),
       |c1 AS (SELECT ROW_NUMBER() OVER (ORDER BY cell) - 1 AS cell, c FROM
       |         (SELECT cell, list(m ORDER BY dim) AS c FROM m1 GROUP BY cell)),
       |a2 AS (SELECT vec_id, embedding, cell FROM (
       |         SELECT e.vec_id, e.embedding, c1.cell,
       |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${ddotSql("e.embedding", "c1.c")} / sqrt(${ddotSql("c1.c", "c1.c")}) DESC,
       |                      c1.cell DESC) AS rn
       |         FROM embeddings e CROSS JOIN c1) WHERE rn = 1),
       |cm2 AS (SELECT cell, dim, $exactMeanFloatSql AS m
       |        FROM (SELECT cell, unnest(generate_series(1, 64)) AS dim,
       |                     unnest(embedding) AS v FROM a2)
       |        GROUP BY 1, 2),
       |cent2 AS (SELECT cell, list(m ORDER BY dim) AS centroid FROM cm2 GROUP BY cell),
       |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |probe AS (SELECT cell FROM cent2, qv
       |          ORDER BY ${dotSql("centroid", "qe")} /
       |            (sqrt(${dotSql("centroid", "centroid")}) * sqrt(${dotSql("qe", "qe")})) DESC, cell
       |          LIMIT 3)""".stripMargin

  /** The q91 PQ chain (m=8 subspaces × k=16 codewords, 2 Lloyd iters) as
    * CTEs ending in `short` (the ADC rerank shortlist) and `qv` — the
    * exact replay of [[Similarity.pqTrain]]/[[Similarity.pqEncode]]/
    * [[Similarity.pqSearch]] incl. the PqKernel tie rule (score ties →
    * HIGHEST codeword: `>=` update in the kernel), empty-cell carry
    * (COALESCE against the previous books), the driver's left-fold
    * half-norms and query·codeword table, and the sub-ordered score fold. */
  /** The [[Similarity.annScale]] policy as CTEs `pol0`/`pol` over
    * `embeddings` — the SAME integer ladder / bit-length arithmetic the
    * Scala side computes, so the scaled audit (q91b) cross-checks the
    * policy itself, not just the chain it parameterizes. Integer-only on
    * purpose: log2/round float boundaries would let the two engines pick
    * different capacities at a breakpoint and silently diverge. */
  private val annPolicyCtes: String = {
    val ladder = "CASE WHEN n < 512 THEN 16 WHEN n < 2048 THEN 32 " +
      "WHEN n < 8192 THEN 64 WHEN n < 32768 THEN 128 ELSE 256 END"
    s"""pol0 AS (SELECT COUNT(*) AS n FROM embeddings),
       |pol AS (SELECT n,
       |  CAST(LEAST(n, $ladder) AS INT) AS pq_k,
       |  LEAST(n, GREATEST(100, LEAST(n, $ladder) * length(bin(n - 1)))) AS rerank
       |  FROM pol0)""".stripMargin
  }

  private def pqCtes(m: Int, k: Int, subDim: Int, rerank: Int): String =
    pqCtesDyn(m, k.toString, subDim, rerank.toString)

  /** [[pqCtes]] with the codeword count and rerank size as SQL
    * EXPRESSIONS (e.g. `(SELECT pq_k FROM pol)`) so the q91b scaled
    * audit can replay the chain under [[Similarity.annScale]]'s
    * corpus-size-derived capacities — DuckDB accepts scalar subqueries
    * in LIMIT, which is everywhere the two parameters appear. */
  private def pqCtesDyn(m: Int, kSql: String, subDim: Int, rerankSql: String): String = {
    val halfSql = (c: String) =>
      s"""(list_reduce(list_transform($c, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
         |  (x, y) -> x + y) / 2.0)""".stripMargin
    def asg(src: String, books: String, name: String) =
      s"""$name AS (SELECT vec_id, sub, subvec, cw FROM (
         |  SELECT r.vec_id, r.sub, r.subvec, b.cw,
         |    ROW_NUMBER() OVER (PARTITION BY r.vec_id, r.sub
         |      ORDER BY (${ddotSql("r.subvec", "b.cvec", subDim)} - ${halfSql("b.cvec")}) DESC,
         |               b.cw DESC) AS rn
         |  FROM $src r JOIN $books b USING (sub)) WHERE rn = 1)""".stripMargin
    def update(a: String, prev: String, mn: String, nb: String, bn: String) =
      s"""$mn AS (SELECT sub, cw, dim, $exactMeanFloatSql AS mv
         |  FROM (SELECT sub, cw, unnest(generate_series(1, $subDim)) AS dim,
         |               unnest(subvec) AS v FROM $a)
         |  GROUP BY 1, 2, 3),
         |$nb AS (SELECT sub, cw, list(mv ORDER BY dim) AS cvec FROM $mn GROUP BY 1, 2),
         |$bn AS (SELECT p.sub, p.cw, COALESCE(n.cvec, p.cvec) AS cvec
         |  FROM $prev p LEFT JOIN $nb n USING (sub, cw))""".stripMargin
    s"""subs AS (SELECT unnest(generate_series(0, ${m - 1})) AS sub),
       |b0 AS (SELECT s.sub, i.c AS cw,
       |         list_slice(i.embedding, s.sub * $subDim + 1, s.sub * $subDim + $subDim) AS cvec
       |       FROM (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, embedding
       |             FROM embeddings ORDER BY vec_id LIMIT $kSql) i
       |       CROSS JOIN subs s),
       |subrows AS (SELECT vec_id, sub,
       |              list_slice(embedding, sub * $subDim + 1, sub * $subDim + $subDim) AS subvec
       |            FROM embeddings CROSS JOIN subs),
       |${asg("subrows", "b0", "asg1")},
       |${update("asg1", "b0", "m1", "nb1", "b1")},
       |${asg("subrows", "b1", "asg2")},
       |${update("asg2", "b1", "m2", "nb2", "b2")},
       |enc AS (SELECT vec_id, sub, cw FROM (
       |  SELECT r.vec_id, r.sub, b.cw,
       |    ROW_NUMBER() OVER (PARTITION BY r.vec_id, r.sub
       |      ORDER BY (${ddotSql("r.subvec", "b.cvec", subDim)} - ${halfSql("b.cvec")}) DESC,
       |               b.cw DESC) AS rn
       |  FROM subrows r JOIN b2 b USING (sub)) WHERE rn = 1),
       |qsub AS (SELECT sub, list_slice(embedding, sub * $subDim + 1, sub * $subDim + $subDim) AS qs
       |         FROM embeddings CROSS JOIN subs WHERE vec_id = 0),
       |tbl AS (SELECT b.sub, b.cw, ${ddotSql("q.qs", "b.cvec", subDim)} AS qd
       |        FROM b2 b JOIN qsub q USING (sub)),
       |sc AS (SELECT e.vec_id,
       |         round(list_reduce(list(t.qd ORDER BY t.sub), (x, y) -> x + y), 9) AS pq_score
       |       FROM enc e JOIN tbl t ON t.sub = e.sub AND t.cw = e.cw GROUP BY e.vec_id),
       |short AS (SELECT vec_id FROM sc ORDER BY pq_score DESC, vec_id LIMIT $rerankSql),
       |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)""".stripMargin
  }

  /** DuckDB replay of [[Similarity.lshBuckets]]: one CASE per sign bit,
    * plane components inlined as double literals from the SAME
    * `Similarity.lshPlane` the Spark plan evaluates (Double.toString
    * round-trips, so the parsed literal is bit-identical). The per-bit
    * dot sums left-to-right, matching the Spark side's `.reduce(_ + _)`
    * association, so the sign test sees the identical IEEE double. */
  private def lshBucketSql(nBits: Int, dim: Int): String = {
    val bits = (0 until nBits).map { b =>
      val terms = (0 until dim)
        .map(d => s"(CAST(embedding[${d + 1}] AS DOUBLE)*${Similarity.lshPlane(b, d)})")
        .mkString("+")
      s"CASE WHEN ($terms)>0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    s"(${bits.mkString("+")})"
  }

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

    // ---- q184: DOMAIN-CENTROID SIMILARITY — the pairwise cosine matrix
    // of class/source centroids (q98's centroid rows), the embedding-
    // space "which domains look alike" report mixture design reads
    // before re-weighting. Centroid values are round-9 doubles identical
    // cross-engine; per-pair dot and per-label norm accumulate as
    // DECIMAL(22,18) exact sums over the 64 dims (double summation order
    // would be partition-dependent), one IEEE division + round-6 at the
    // end. Everything after the centroid agg is label-count-sized.
    QueryDef.sql("q184_domain_similarity",
      """WITH x AS (
        |  SELECT label,
        |    unnest(generate_series(1, 64)) AS dim,
        |    unnest(list_transform(embedding,
        |      v -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,15)))) AS dv
        |  FROM embeddings),
        |cent AS (SELECT label, dim,
        |    round(CAST(SUM(dv) AS DOUBLE) / COUNT(*), 9) AS c
        |  FROM x GROUP BY 1, 2),
        |nrm AS (SELECT label,
        |    CAST(SUM(CAST(c * c AS DECIMAL(22,18))) AS DOUBLE) AS n2
        |  FROM cent GROUP BY 1),
        |dots AS (SELECT a.label AS label_a, b.label AS label_b,
        |    CAST(SUM(CAST(a.c * b.c AS DECIMAL(22,18))) AS DOUBLE) AS dp
        |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |  ROUND(dp / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cosine
        |FROM dots JOIN nrm na ON na.label = label_a
        |          JOIN nrm nb ON nb.label = label_b""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val cent = Similarity.centroidRows(Tables.embeddings(s, dir), "label")
        .select(col("label"), col("dim"), col("centroid").as("c"))
      val nrm = cent.groupBy("label")
        .agg(sum((col("c") * col("c")).cast(DecimalType(22, 18)))
          .cast("double").as("n2"))
      val a = cent.select(col("label").as("label_a"), col("dim"), col("c").as("ca"))
      val b = cent.select(col("label").as("label_b"), col("dim"), col("c").as("cb"))
      val dots = a.join(b, Seq("dim")).filter(col("label_a") < col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(sum((col("ca") * col("cb")).cast(DecimalType(22, 18)))
          .cast("double").as("dp"))
      dots
        .join(broadcast(nrm.toDF("label_a", "na")), Seq("label_a"))
        .join(broadcast(nrm.toDF("label_b", "nb")), Seq("label_b"))
        .select(col("label_a"), col("label_b"),
          round(col("dp") / (sqrt(col("na")) * sqrt(col("nb"))), 6).as("cosine"))
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

    // ---- q47: IVF-probed ANN (scale path), FULL DuckDB oracle: the whole
    // IVF chain is SQL-expressible — per-label decimal-exact centroids
    // cast to float, cells ranked by centroid cosine (unrounded, label
    // tie-break), top-nProbe cells scanned with the exact decimal cosine.
    // Converted from golden in r7 (verified 0-diff vs the r6 goldens at
    // sf0.001/0.01/0.1). One documented seam: Spark divides the decimal
    // sum by the count in decimal then casts float, the oracle divides in
    // double then casts — empirically float-identical on every (label,
    // dim) at all three SFs, and centroids only steer the probe-cell
    // ranking (unrounded ccos, ties broken by label), so a 1-ulp cast
    // divergence would need a near-exact centroid-cosine tie to matter.
    QueryDef.sql("q47_ann_ivf_topk",
      s"""WITH ${labelIvfCtes(3)}
         |SELECT e.vec_id, ${cosSql("e.embedding", "qv.qe")} AS cosine
         |FROM embeddings e JOIN probe USING (label), qv
         |ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      Similarity.ivfTopK(emb, query, "label", k = 20, nProbe = 3)
    },

    // ---- q59: IVF with self-trained k-means coarse quantizer (no natural
    // blocking key needed). FULL DuckDB oracle (converted from golden in
    // r9, verified 0-diff vs the committed goldens at sf0.001/0.01/0.1):
    // the Lloyd loop is deterministic by construction — lowest-vec_id
    // init, per-row LEFT-FOLD double dots (FloatArrayDot ≡ list_reduce),
    // decimal-exact means — so the whole 2-iteration chain unrolls into
    // CTEs (see kmeansIvfCtes).
    QueryDef.sql("q59_ann_ivf_kmeans",
      s"""WITH ${kmeansIvfCtes(8)}
         |SELECT e.vec_id, ${cosSql("e.embedding", "qv.qe")} AS cosine
         |FROM a2 e JOIN probe USING (cell), qv
         |ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cells = Similarity.kmeansCells(emb, k = 8, iters = 2)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      Similarity.ivfTopK(cells, query, "cell", k = 20, nProbe = 3)
    },

    // ---- q59a: INDEPENDENT recall audit for q59. ASYMMETRIC bound gate:
    // the Spark side measures |live exact top-20 ∩ live k-means-IVF
    // top-20| and emits the (k, hits) row ONLY when hits ≥ 17; the oracle
    // re-derives BOTH sides in SQL (the kmeans-IVF chain + DuckDB's own
    // exact top-20) and emits its row unconditionally. A recall
    // regression drops the Spark row → rows_match fails; a cross-engine
    // divergence → hash fails. Measured hits = 19/20 at sf0.001, sf0.01
    // AND sf0.1 — bound 17 has margin. (Pre-r9 this compared the
    // committed golden; now golden-free.)
    QueryDef.sql("q59a_kmeans_recall_audit",
      s"""WITH ${kmeansIvfCtes(8)},
         |ap AS (SELECT e.vec_id, ${cosSql("e.embedding", "qv.qe")} AS cosine
         |       FROM a2 e JOIN probe USING (cell), qv
         |       ORDER BY cosine DESC, e.vec_id LIMIT 20),
         |ex AS (SELECT e.vec_id FROM embeddings e, qv
         |       ORDER BY ${cosSql("e.embedding", "qv.qe")} DESC, e.vec_id LIMIT 20)
         |SELECT CAST(20 AS BIGINT) AS k,
         |  (SELECT COUNT(*) FROM ex JOIN ap USING (vec_id)) AS hits""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val exact = Similarity.bruteTopK(emb, query, 20).select("vec_id")
      val cells = Similarity.kmeansCells(emb, k = 8, iters = 2)
      val approx = Similarity.ivfTopK(cells, query, "cell", k = 20, nProbe = 3)
        .select("vec_id")
      exact.join(approx, Seq("vec_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(20L).as("k"), col("hits"))
        .filter(col("hits") >= 17)
    },

    // ---- q91: product-quantization ANN (the faiss-style memory-scale
    // path): 8 subspaces × 16 codewords trained by the deterministic
    // Lloyd loop, vectors compressed to 8 small ints, query answered by
    // ADC table lookups over CODES only — no float vector is read at
    // query time. FULL DuckDB oracle (converted from golden in r9,
    // verified 0-diff vs the committed goldens at sf0.001/0.01/0.1): the
    // PqKernel math is a left-fold double dot minus a left-fold
    // half-norm with ties to the highest codeword, all replayable in SQL
    // (see pqCtes), and means are decimal-exact.
    QueryDef.sql("q91_ann_pq",
      s"""WITH ${pqCtes(m = 8, k = 16, subDim = 8, rerank = 100)}
         |SELECT e.vec_id, ${cosSql("e.embedding", "qv.qe")} AS cosine
         |FROM embeddings e JOIN short USING (vec_id), qv
         |ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val books = Similarity.pqTrain(emb, m = 8, k = 16, iters = 2)
      val codes = Similarity.pqEncode(emb, books)
      val queryVec = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      Similarity.pqSearch(emb, codes, queryVec, books, k = 20, rerank = 100)
    },

    // ---- q137: SQ8 scalar-quantization ANN — the OTHER faiss
    // compression family beside PQ: per-dimension [min,max] bounds
    // (exact — float MIN/MAX commute, no iteration), floats encoded to
    // one byte each, candidates scored on CODES via midpoint decode,
    // exact cosine rerank of the top-100. Loop-free, so unlike q59/q91
    // this never needed a golden: the WHOLE chain is a first-class
    // DuckDB oracle (bounds re-derived in SQL, the same left-fold
    // score, the q91 rerank tail).
    QueryDef.sql("q137_ann_sq8",
      s"""WITH $sq8BoundsCtes,
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |sc AS (SELECT e.vec_id, $sq8ScoreExprSql AS sq_score
         |       FROM embeddings e CROSS JOIN b CROSS JOIN qv),
         |short AS (SELECT vec_id FROM sc ORDER BY sq_score DESC, vec_id LIMIT 100)
         |SELECT e.vec_id, ${cosSql("e.embedding", "qv.qe")} AS cosine
         |FROM embeddings e JOIN short USING (vec_id), qv
         |ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val queryVec = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val bounds = Similarity.sq8Bounds(emb)
      Similarity.sq8Search(emb, Similarity.sq8Encode(emb, bounds), bounds,
        queryVec, k = 20, rerank = 100)
    },

    // ---- q91a: FIXED-CAPACITY recall audit for q91 (renamed from
    // q91a_pq_recall_audit in r10 per the r9 verdict), same asymmetric
    // bound-gate shape as q59a: Spark emits (k, hits) only when the live
    // PQ+rerank top-20 recovers ≥ 12 of the live exact top-20; the
    // oracle re-derives both sides in SQL unconditionally. Measured
    // hits = 17/16/14 at sf0.001/0.01/0.1. This row is the
    // fixed-capacity WITNESS: its m=8/k=16/rerank=100 codebooks are
    // deliberately frozen, so at ≥ 8x scale it goes red BY DESIGN
    // (8/20 at 8x sf0.1 — quantizer capacity must track N, Jégou 2011),
    // demonstrating exactly the failure the q91b scale-adaptive policy
    // exists to close. Green at every shipped SF.
    QueryDef.sql("q91a_pq_fixed_capacity_audit",
      s"""WITH ${pqCtes(m = 8, k = 16, subDim = 8, rerank = 100)},
         |ap AS (SELECT e.vec_id, ${cosSql("e.embedding", "qv.qe")} AS cosine
         |       FROM embeddings e JOIN short USING (vec_id), qv
         |       ORDER BY cosine DESC, e.vec_id LIMIT 20),
         |ex AS (SELECT e.vec_id FROM embeddings e, qv
         |       ORDER BY ${cosSql("e.embedding", "qv.qe")} DESC, e.vec_id LIMIT 20)
         |SELECT CAST(20 AS BIGINT) AS k,
         |  (SELECT COUNT(*) FROM ex JOIN ap USING (vec_id)) AS hits""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val exact = Similarity.bruteTopK(emb, query, 20).select("vec_id")
      val books = Similarity.pqTrain(emb, m = 8, k = 16, iters = 2)
      val codes = Similarity.pqEncode(emb, books)
      val queryVec = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val approx = Similarity.pqSearch(emb, codes, queryVec, books, k = 20, rerank = 100)
        .select("vec_id")
      exact.join(approx, Seq("vec_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(20L).as("k"), col("hits"))
        .filter(col("hits") >= 12)
    },

    // ---- q91b: the SCALE-ADAPTIVE PQ recall audit — q91a's chain under
    // Similarity.annScale(n): codeword count ~ sqrt(N) (integer power-of-
    // two ladder) and rerank = max(100, k·ceil(log2 N)), both derived
    // from COUNT(*) by BOTH engines (the pol CTEs replay the identical
    // integer arithmetic, so a policy drift fails the gate, not just a
    // recall drift). The emitted row carries the derived capacities
    // (n_vectors, pq_k, rerank) alongside the q91a-style bound-gated
    // hits, and the Spark side emits it only when the scaled config
    // recovers ≥ 12 of the exact top-20. At 8x sf0.1 — where the
    // fixed-capacity q91a is red by design — this holds green
    // (PLANS_r10.md records the sweep).
    QueryDef.sql("q91b_pq_recall_scaled",
      s"""WITH $annPolicyCtes,
         |${pqCtesDyn(m = 8, kSql = "(SELECT pq_k FROM pol)", subDim = 8,
                      rerankSql = "(SELECT rerank FROM pol)")},
         |ap AS (SELECT e.vec_id, ${cosSql("e.embedding", "qv.qe")} AS cosine
         |       FROM embeddings e JOIN short USING (vec_id), qv
         |       ORDER BY cosine DESC, e.vec_id LIMIT 20),
         |ex AS (SELECT e.vec_id FROM embeddings e, qv
         |       ORDER BY ${cosSql("e.embedding", "qv.qe")} DESC, e.vec_id LIMIT 20)
         |SELECT (SELECT n FROM pol) AS n_vectors,
         |  (SELECT pq_k FROM pol) AS pq_k,
         |  (SELECT rerank FROM pol) AS rerank,
         |  CAST(20 AS BIGINT) AS k,
         |  (SELECT COUNT(*) FROM ex JOIN ap USING (vec_id)) AS hits""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val n = emb.count()
      val p = Similarity.annScale(n)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val exact = Similarity.bruteTopK(emb, query, 20).select("vec_id")
      val books = Similarity.pqTrain(emb, m = 8, k = p.pqK, iters = 2)
      val codes = Similarity.pqEncode(emb, books)
      val queryVec = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      val approx = Similarity.pqSearch(emb, codes, queryVec, books,
          k = 20, rerank = p.rerank)
        .select("vec_id")
      exact.join(approx, Seq("vec_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(n).as("n_vectors"), lit(p.pqK).as("pq_k"),
          lit(p.rerank.toLong).as("rerank"), lit(20L).as("k"), col("hits"))
        .filter(col("hits") >= 12)
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

    // ---- q53: LSH bucket histogram, FULL DuckDB oracle (converted from
    // golden in r7): the hyperplanes are deterministic arithmetic
    // (Similarity.lshPlane), so the oracle embeds the exact plane doubles
    // as SQL literals — generated from the SAME Scala function the Spark
    // plan uses — and replays every sign bit. The dot is a left-fold
    // double sum on both engines (identical association order → identical
    // IEEE result), verified 0-diff vs the r6 goldens at sf0.001/0.01/0.1.
    QueryDef.sql("q53_ann_lsh_buckets",
      s"""WITH bk AS (SELECT ${lshBucketSql(nBits = 12, dim = 64)} AS bucket
         |           FROM embeddings)
         |SELECT bucket, COUNT(*) AS vectors FROM bk GROUP BY 1
         |ORDER BY vectors DESC, bucket""".stripMargin) { (s, dir) =>
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
    },

    // ---- q143: cross-corpus SEMANTIC contamination — the embedding-space
    // twin of the q84 8-gram decontamination: every train-split vector
    // scored against the (broadcast-small) eval split, one report row per
    // train vector with any eval cosine ≥ 0.4. Catches paraphrased eval
    // leakage that shares no 8-gram. Spark prefilters with the codegen'd
    // double dot (1e-6 margin) and confirms on the exact decimal dot —
    // the q52 two-stage gate — so MAX of the rounded cosines is
    // engine-stable.
    QueryDef.sql("q143_semantic_contamination",
      s"""WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
         |tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
         |sc AS (SELECT t.vec_id AS vec_id,
         |         ${cosSql("t.embedding", "e.embedding")} AS c
         |       FROM tr t CROSS JOIN ev e)
         |SELECT vec_id, COUNT(*) AS n_eval_hits, MAX(c) AS max_eval_cos
         |FROM sc WHERE c >= 0.4 GROUP BY 1 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticContamination(
          emb.filter(col("vec_id") % 10 =!= 0),
          emb.filter(col("vec_id") % 10 === 0), threshold = 0.4)
        .orderBy("vec_id")
    },

    // ---- q143b: q143 with a FIXED-SIZE eval split (r11 verdict item
    // 3): q143 derives the broadcast eval side as a corpus FRACTION
    // (vec_id % 10 = 0), so the scale sweep grew the broadcast side 32x
    // with the corpus — production eval suites are fixed-size. Here the
    // eval split is the fixed 40-vector id slice [0, 40) at EVERY scale
    // (ScaleData copies shift vec_ids by 1e8), so the sweep measures the
    // honest shape: train-side scan grows, broadcast stays constant,
    // wall ∝ corpus.
    QueryDef.sql("q143b_semantic_contamination_fixed",
      s"""WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40),
         |tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 40),
         |sc AS (SELECT t.vec_id AS vec_id,
         |         ${cosSql("t.embedding", "e.embedding")} AS c
         |       FROM tr t CROSS JOIN ev e)
         |SELECT vec_id, COUNT(*) AS n_eval_hits, MAX(c) AS max_eval_cos
         |FROM sc WHERE c >= 0.4 GROUP BY 1 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticContamination(
          emb.filter(col("vec_id") >= 40),
          emb.filter(col("vec_id") < 40), threshold = 0.4)
        .orderBy("vec_id")
    },

    // ---- q144: PERSISTED vector index, searched THROUGH storage — the
    // IVF + SQ8 artifacts (cell-partitioned vectors+codes, centroids
    // table, bounds table) written to the warehouse, then the query
    // answered from the STORED layout: probe 3 cells from stored
    // centroids → static partition filter lists only those directories
    // (PartitionFilters, spec-gated in SimilaritySpec) → ADC over stored
    // CODES only (column pruning drops the floats) → exact rerank. At
    // 100 TB you search a stored index, not a re-encoded scan; this gate
    // proves the artifacts survive the layout round trip. The oracle
    // composes the q47 probe (cells = label) with the q137 SQ8 scoring
    // restricted to probed cells, bounds trained on the full corpus as
    // at write time.
    QueryDef.sql("q144_stored_vector_index",
      s"""WITH ${labelIvfCtes(3)},
         |$sq8BoundsCtes,
         |sub AS (SELECT e.vec_id, e.embedding
         |        FROM embeddings e JOIN probe USING (label)),
         |sc AS (SELECT e.vec_id, $sq8ScoreExprSql AS sq_score
         |       FROM sub e CROSS JOIN b CROSS JOIN qv),
         |short AS (SELECT vec_id FROM sc ORDER BY sq_score DESC, vec_id LIMIT 100)
         |SELECT e.vec_id, ${cosSql("e.embedding", "qv.qe")} AS cosine
         |FROM sub e JOIN short USING (vec_id), qv
         |ORDER BY cosine DESC, e.vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorIndex.write(emb, "label", "graft_wh.vecidx")
      val queryVec = emb.filter(col("vec_id") === 0)
        .select("embedding").head.getSeq[Float](0).toArray
      VectorIndex.search(s, "graft_wh.vecidx", queryVec,
        k = 20, nProbe = 3, rerank = 100)
    },

    // ---- q145: INCREMENTAL ingest into the frozen stored index — the
    // vector twin of q139's frozen-LSH text ingest: the index is built
    // on the resident 80% split, then the arriving 20% is assigned to
    // its nearest FROZEN centroid (the kmeansCells assignment kernel:
    // codegen'd left-fold double dot over driver-literal centroids,
    // argmax dot/|c| ≡ argmax cosine since |e| is constant per row, ties
    // to the highest cell — arriving data has no label), encoded with
    // the FROZEN bounds (out-of-range values clamp on both ends), and
    // APPENDED into the existing cell directories — no rebuild, resident
    // rows untouched. The gate reads the post-ingest table back and
    // emits per-cell resident/ingested counts; the oracle re-derives
    // the frozen centroids from the base split and replays the argmax
    // assignment in SQL.
    QueryDef.sql("q145_vector_index_ingest",
      s"""WITH base AS (SELECT * FROM embeddings WHERE vec_id % 10 < 8),
         |inc AS (SELECT * FROM embeddings WHERE vec_id % 10 >= 8),
         |x AS (
         |  SELECT label, unnest(generate_series(1, 64)) AS dim,
         |    unnest(list_transform(embedding,
         |      v -> CAST(CAST(v AS DOUBLE) AS DECIMAL(20,15)))) AS dv
         |  FROM base),
         |cm AS (SELECT label, dim,
         |         CAST(CAST(SUM(dv) AS DOUBLE) / COUNT(*) AS FLOAT) AS m
         |       FROM x GROUP BY 1, 2),
         |cent AS (SELECT label AS cell, list(m ORDER BY dim) AS centroid
         |         FROM cm GROUP BY 1),
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT i.vec_id, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY i.vec_id
         |      ORDER BY ${ddotSql("i.embedding", "c.centroid")} /
         |        sqrt(${ddotSql("c.centroid", "c.centroid")}) DESC,
         |        c.cell DESC) AS rn
         |  FROM inc i CROSS JOIN cent c) WHERE rn = 1),
         |bc AS (SELECT CAST(label AS INTEGER) AS cell, COUNT(*) AS n_base
         |       FROM base GROUP BY 1),
         |ic AS (SELECT CAST(cell AS INTEGER) AS cell, COUNT(*) AS n_ingested
         |       FROM asg GROUP BY 1)
         |SELECT COALESCE(bc.cell, ic.cell) AS cell,
         |  COALESCE(n_base, 0) AS n_base,
         |  COALESCE(n_ingested, 0) AS n_ingested
         |FROM bc FULL JOIN ic USING (cell) ORDER BY cell""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorIndex.write(emb.filter(col("vec_id") % 10 < 8),
        "label", "graft_wh.vecidx_inc")
      VectorIndex.ingest(emb.filter(col("vec_id") % 10 >= 8),
        "graft_wh.vecidx_inc")
      s.table("graft_wh.vecidx_inc_vectors")
        .groupBy(col("cell"))
        .agg(count(when(col("vec_id") % 10 < 8, 1)).as("n_base"),
          count(when(col("vec_id") % 10 >= 8, 1)).as("n_ingested"))
        .orderBy("cell")
    },

    // ---- q151: BATCHED multi-query ANN — production search is N queries
    // per pass, not one: the 8-query batch broadcasts, the corpus scans
    // ONCE, and per-query top-5 comes from the k-bounded TopK AGGREGATE
    // (map-side partial per (partition, query) — shuffle volume is
    // O(queries × k × partitions), independent of corpus rows; no window,
    // no per-query sort). Exact decimal cosine rounded 9 + vec_id
    // tie-break keeps ranks engine-independent; the oracle replays with
    // ROW_NUMBER per query.
    QueryDef.sql("q151_ann_batch_search",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |           FROM embeddings WHERE vec_id < 8),
         |sc AS (SELECT q.query_id, e.vec_id,
         |         ${cosSql("e.embedding", "q.qe")} AS cosine
         |       FROM embeddings e CROSS JOIN q),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, vec_id) AS rank FROM sc)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      import graft.operators.TopK
      val emb = Tables.embeddings(s, dir)
      // norms hoisted OUT of the join (the nearDuplicatePairs idiom):
      // each side's exact decimal norm computes once per ROW, so the
      // per-pair work is the single dot fold — same IEEE values as
      // cosine() per pair (identical expression, evaluated earlier),
      // measured 3.4x at sf0.1
      val e = emb.select(col("vec_id"), col("embedding"))
        .withColumn("nrm", VectorFns.norm(col("embedding")))
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .withColumn("qnrm", VectorFns.norm(col("qe")))
      val scored = e.crossJoin(broadcast(queries))
        .select(col("query_id"), col("vec_id"),
          round(VectorFns.dot(col("embedding"), col("qe")) /
            (col("nrm") * col("qnrm")), 9).as("cosine"))
      TopK.perGroupTopK(scored, Seq("query_id"), "cosine", "vec_id", 5)
        .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
        .orderBy("query_id", "rank")
    }
  )
}
