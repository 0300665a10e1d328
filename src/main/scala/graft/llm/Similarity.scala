package graft.llm

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an ARRAY<FLOAT> embedding column.
  *
  *  - [[bruteTopK]]: exact cosine top-k — one scan + TakeOrdered, the
  *    correctness baseline.
  *  - [[ivfTopK]]: IVF-style scale path — partition vectors by a coarse
  *    centroid assignment, probe only the closest `nProbe` cells. Centroids
  *    here come from the dataset's own cluster labels (deterministic); on a
  *    real corpus they'd come from a k-means pass. The probe prunes the scan
  *    to nProbe/nCells of the data — the property that matters at 100 TB.
  *  - [[nearDuplicatePairs]]: blocked near-dup join — candidate pairs only
  *    within a cell, never the full cross product.
  */
object Similarity {

  /** Scale-adaptive ANN capacity parameters derived from corpus size `n`
    * — the policy the r9 8x sweep showed is needed: FIXED PQ codebooks
    * (m=8, k=16, rerank=100) lose recall as the corpus grows (8/20
    * against the >= 12 audit bound at 8x sf0.1), exactly as published
    * (Jégou et al. 2011 — quantizer capacity must track N; faiss tunes
    * cells ~ sqrt(N)).
    *
    *  - `pqK` (codewords per subspace) ~ sqrt(N) quantized to powers of
    *    two via INTEGER thresholds (N in [2^(2j-1), 2^(2j+1)) -> 2^j),
    *    clamped to [16, 256] and to N itself: a pure integer ladder both
    *    engines replay with zero float-boundary risk (log2/round ulp
    *    divergence at breakpoints would silently diverge an oracle).
    *  - `rerank` (exact-rescore shortlist) = max(100, pqK * ceil(log2
    *    N)), capped at N; ceil(log2 N) computed as the bit length of
    *    N-1 (exact integers on both engines).
    *  - `ivfCells` = max(8, pqK/8) (~ sqrt(N)/8 cells), `nProbe` =
    *    max(3, cells/8): the probed fraction stays ~1/8 of cells as the
    *    cell count grows.
    *
    * The policy is oracle-gated end-to-end by q91b (the scaled PQ recall
    * audit, green at 8x where the fixed-capacity q91a audit is red by
    * design); COVERAGE.md records the deployment rule. */
  final case class AnnScale(n: Long, pqK: Int, rerank: Int,
                            ivfCells: Int, nProbe: Int)

  def annScale(n: Long): AnnScale = {
    require(n > 0, "annScale needs a positive corpus size")
    val ladder =
      if (n < 512L) 16 else if (n < 2048L) 32 else if (n < 8192L) 64
      else if (n < 32768L) 128 else 256
    val pqK = math.min(ladder.toLong, n).toInt
    val bits = if (n <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    val rerank = math.min(n, math.max(100L, pqK.toLong * bits)).toInt
    val cells = math.max(8, pqK / 8)
    AnnScale(n, pqK, rerank, cells, math.max(3, cells / 8))
  }

  /** Exact top-k by cosine against one query vector (given as a 1-row df
    * with column `qe`). Broadcast the query; TakeOrderedAndProject does the
    * global top-k without a full sort. */
  def bruteTopK(emb: DataFrame, query: DataFrame, k: Int): DataFrame =
    emb.crossJoin(broadcast(query))
      .withColumn("cosine", round(VectorFns.cosine(col("embedding"), col("qe")), 9))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
      .select("vec_id", "cosine")

  /** Exact order-independent per-group mean: a double `avg` accumulates in
    * partition order, so centroid values drift at the ulp level with the
    * partitioning (CPU count, AQE coalescing) — enough to flip a near-tied
    * probe choice between runs. Decimal sums are associative-exact, making
    * centroids (and so IVF probe sets and the q47/q59/q61 golden oracles)
    * bit-stable across any parallelism. */
  private def exactMean(c: org.apache.spark.sql.Column) =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 18))) / count(lit(1))

  /** Per-cell mean centroids, computed distributedly (posexplode → avg per
    * (cell, dim) → re-assembled array). */
  def centroids(emb: DataFrame, cellCol: String): DataFrame =
    emb.select(col(cellCol).as("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cell", "dim").agg(exactMean(col("v")).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cell"), transform(col("dm"), x => x.getField("m").cast("float")).as("centroid"))

  /** Mean pooling as an oracle-able surface: one row per (label, dim)
    * with the group's decimal-exact mean as a rounded double — class/
    * source centroid computation for embedding-space monitoring (drift,
    * per-source structure), cross-engine comparable unlike the
    * float-array form of [[centroids]]. The sum is exact decimal (order-
    * independent); the division happens in DOUBLE on the already-exact
    * operands so both engines perform the identical IEEE op; round(9)
    * absorbs the engines' 1-ulp decimal→double conversion differences. */
  def centroidRows(emb: DataFrame, labelCol: String,
                   embCol: String = "embedding"): DataFrame =
    emb.select(col(labelCol), posexplode(col(embCol)).as(Seq("pos", "v")))
      .select(col(labelCol), (col("pos") + 1).cast("long").as("dim"),
        col("v").cast("double")
          .cast(org.apache.spark.sql.types.DecimalType(20, 15)).as("dv"))
      .groupBy(col(labelCol), col("dim"))
      .agg(
        round(sum(col("dv")).cast("double") / count(lit(1)), 9).as("centroid"),
        count(lit(1)).as("n"))

  /** Distributed Lloyd k-means over the embedding column — builds the IVF
    * cell assignment when no natural blocking key exists. Deterministic:
    * centroids init from the k lowest vec_ids; each iteration is one
    * broadcast (centroids to every task) + one shuffle (mean per cell).
    * At 100 TB this is the standard coarse-quantizer training loop: k and
    * iters are small constants, the data is scanned iters+1 times. */
  /** The nearest-centroid assignment kernel shared by [[kmeansCells]] and
    * the stored-index ingest ([[VectorIndex.assignCells]]): argmax_c
    * cos(e, c) as ONE codegen'd projection — |e| is constant per row, so
    * rank by dot/|c| with centroid norms folded to driver-side constants
    * (left-fold double dot + Scala-sum norm, both replayed by the
    * q59/q145 oracles via `list_reduce`); exact ties go to the HIGHEST
    * cell id on every partitioning (`greatest` over (sim, cell) structs).
    * ONE definition on purpose: the tie rule and fold order are
    * oracle-pinned in two query families, so a change here must move
    * both, never one. */
  def nearestCellCol(embCol: org.apache.spark.sql.Column,
                     centroids: Seq[(Int, Array[Float])]): org.apache.spark.sql.Column = {
    require(centroids.sizeIs >= 2, "nearestCellCol needs at least two cells")
    val dists = centroids.map { case (cell, cvec) =>
      val cnorm = math.sqrt(cvec.map(v => v.toDouble * v).sum)
      val cent = array(cvec.map(v => lit(v)): _*)
      struct((VectorFns.dotDouble(embCol, cent) / lit(cnorm)).as("sim"),
        lit(cell).as("cell"))
    }
    greatest(dists: _*).getField("cell")
  }

  def kmeansCells(emb: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    require(iters >= 0, "kmeansCells: negative iteration count")
    var cents: Array[Array[Float]] = emb
      .orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    // k = 1 is trivially valid (every vector in cell 0 — no distance
    // comparison needed); distinguish it from the genuinely broken
    // small-CORPUS case so the error names the real problem (r11 advice)
    if (k == 1) return emb.withColumn("cell", lit(0))
    require(cents.length >= 2,
      s"kmeansCells: k=$k cells requested but the corpus seeded only " +
        s"${cents.length} vector(s) — a multi-cell quantizer needs at " +
        "least 2 seed vectors")
    def assign(cs: Array[Array[Float]]) = emb.withColumn("cell",
      nearestCellCol(col("embedding"),
        cs.zipWithIndex.map { case (c, i) => (i, c) }.toSeq))
    // iters-1 update rounds then one final assignment: the original
    // assign-then-update order recomputed (and discarded) centroids on the
    // last round — one whole-corpus aggregation wasted per training call.
    // iters = 0 degenerates to assign-only against the seed centroids.
    for (_ <- 0 until math.max(0, iters - 1)) {
      // keyed update through the ONE centroids() definition (probe-time
      // math must match training bit-for-bit); an empty cell keeps its
      // previous centroid (standard Lloyd, same as pqTrain) instead of
      // silently shrinking and renumbering every later cell
      val updated = cents.map(_.clone())
      centroids(assign(cents), "cell")
        .collect().foreach(r => updated(r.getInt(0)) = r.getSeq[Float](1).toArray)
      cents = updated
    }
    assign(cents).select(col("vec_id"), col("cell"), col("embedding"))
  }

  /** IVF probe: rank cells by centroid cosine to the query, scan the top
    * `nProbe` cells only, exact cosine within them. */
  /** @param cents pre-trained centroid artifact ((cell, centroid) rows,
    *   the [[centroids]] shape) — pass it when running N queries against
    *   one corpus so the full-corpus centroid aggregation is paid once,
    *   not N times (the same trained-artifact contract as [[pqSearch]]'s
    *   `books` and [[sq8Search]]'s `bounds`). Default recomputes from
    *   `emb` for self-contained one-shot calls. */
  def ivfTopK(emb: DataFrame, query: DataFrame, cellCol: String,
              k: Int, nProbe: Int = 2,
              cents: Option[DataFrame] = None): DataFrame = {
    val probed = cents.getOrElse(centroids(emb, cellCol)).crossJoin(broadcast(query))
      .withColumn("ccos", VectorFns.cosine(col("centroid"), col("qe")))
      // cell id tie-break: an exact ccos tie must not make the probe set
      // run-dependent (the golden oracle hashes the result)
      .orderBy(desc("ccos"), asc("cell")).limit(nProbe)
      .select(col("cell").as("__probe_cell"))
    emb.join(broadcast(probed), col(cellCol) === col("__probe_cell"))
      .drop("__probe_cell")
      .crossJoin(broadcast(query))
      .withColumn("cosine", round(VectorFns.cosine(col("embedding"), col("qe")), 9))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
      .select("vec_id", "cosine")
  }

  /** Product-quantization codebooks (the faiss-style memory-scale ANN
    * path): the `dim`-dim space splits into `m` contiguous subspaces and
    * each learns `k` codewords by the same deterministic Lloyd loop as
    * [[kmeansCells]] (lowest-vec_id init, decimal-exact means, tie-broken
    * assignment). Vectors then compress to `m` small ints
    * ([[pqEncode]]) — at 100 TB the float vectors (256 B each at dim 64)
    * become m bytes each, and [[pqTopK]] scans CODES, not floats.
    * Returns codebooks(sub)(codeword)(subdim) — m·k·(dim/m) floats, the
    * bounded-by-construction driver artifact every PQ system ships to
    * its searchers. All subspaces train in the SAME per-iteration jobs
    * (subspace is just another grouping key), so the loop costs
    * iters+1 scans total, not per-subspace. */
  def pqTrain(emb: DataFrame, m: Int, k: Int,
              iters: Int = 3): Array[Array[Array[Float]]] = {
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    // (vec_id, sub, subvec) — one exploded row per subspace, reused
    // every iteration; checkpoint once so iterations re-read, not re-slice
    val subRows = emb.select(col("vec_id"),
        posexplode(array((0 until m).map(s =>
          slice(col("embedding"), s * subDim + 1, subDim)): _*)).as(Seq("sub", "subvec")))
      .transform(graft.Checkpoints.pinCompact(_))
    val init: Array[Array[Float]] = emb.orderBy("vec_id").limit(k)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    require(init.length >= k,
      s"pqTrain: corpus has ${init.length} vectors but k=$k codewords " +
        "requested per subspace — clamp k to the corpus size (annScale does)")
    var books: Array[Array[Array[Float]]] =
      Array.tabulate(m, k)((s, c) => init(c).slice(s * subDim, (s + 1) * subDim))
    for (_ <- 0 until iters) {
      // assign: argmax_c (e_s·c - |c|²/2) == argmin_c L2²(e_s, c), exact
      // ties to the highest codeword id on every partitioning — one
      // codegen'd kernel call per row (plans/PqKernel; the declarative
      // greatest-over-structs form allocated m·k arrays+structs per row
      // and dominated the 32× wall)
      books = subRows.withColumn("cw",
          graft.plans.PqExprs.nearestCodeword(col("subvec"), col("sub"), books))
        .select(col("sub"), col("cw"), posexplode(col("subvec")).as(Seq("dim", "v")))
        .groupBy("sub", "cw", "dim").agg(exactMean(col("v")).as("mv"))
        .groupBy("sub", "cw")
        .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("dm"))
        .select(col("sub"), col("cw"),
          transform(col("dm"), x => x.getField("mv").cast("float")).as("cvec"))
        .collect()
        .foldLeft(books.map(_.clone())) { (acc, r) =>
          // empty cells keep their previous codeword (standard Lloyd)
          acc(r.getInt(0))(r.getInt(1)) = r.getSeq[Float](2).toArray; acc
        }
    }
    books
  }

  /** PQ encoding: each vector becomes its `m` nearest-codeword ids —
    * one codegen'd kernel pass per row (plans/PqKernel), bit-identical
    * to the declarative greatest-over-structs form (SimilaritySpec). */
  def pqEncode(emb: DataFrame, books: Array[Array[Array[Float]]]): DataFrame =
    emb.select(col("vec_id"),
      graft.plans.PqExprs.encodeCodes(col("embedding"), books).as("codes"))

  /** ADC (asymmetric distance computation) top-k: the query stays a full
    * float vector; per subspace its dot with every codeword precomputes
    * into an m×k table (driver math, bounded), and each candidate's score
    * is `Σ_s table[s][codes[s]]` — a fixed-order fold over the code array
    * against a broadcast literal table. No float vectors are read at
    * query time; the scan touches m-byte codes only. */
  def pqTopK(codes: DataFrame, queryVec: Array[Float],
             books: Array[Array[Array[Float]]], k: Int): DataFrame = {
    val m = books.length
    val kCw = books(0).length
    val subDim = books(0)(0).length
    // flat[s*kCw + c] = q_s · codebook[s][c]
    val flat = (0 until m).flatMap { s =>
      val qs = queryVec.slice(s * subDim, (s + 1) * subDim)
      books(s).map(cw => qs.zip(cw).map { case (a, b) => a.toDouble * b.toDouble }.sum)
    }
    val table = array(flat.map(lit): _*)
    val score = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(table, s * kCw + element_at(col("codes"), s + 1) + 1))
    codes.withColumn("pq_score", round(score, 9))
      .orderBy(desc("pq_score"), asc("vec_id"))
      .limit(k)
      .select("vec_id", "pq_score")
  }

  /** Full PQ pipeline with the standard rerank stage: ADC over codes
    * shortlists `rerank` candidates (compressed-domain scan), then ONLY
    * those rows' float vectors are read back for an exact cosine top-k.
    * This is the faiss recipe: the bulk scan never touches floats, and
    * the exact pass is bounded by `rerank`, not the corpus. The
    * candidate set broadcast is rerank ids — bounded by construction. */
  def pqSearch(emb: DataFrame, codes: DataFrame, queryVec: Array[Float],
               books: Array[Array[Array[Float]]], k: Int,
               rerank: Int = 100): DataFrame =
    exactRerank(emb, pqTopK(codes, queryVec, books, rerank).select("vec_id"),
      queryVec, k)

  /** The faiss exact-rescore tail shared by every compressed-domain search
    * path ([[pqSearch]], [[sq8Search]], `VectorIndex.search`): read back
    * ONLY the shortlist rows' float vectors (broadcast semi-side, bounded
    * by `rerank`), exact cosine, top-k with the oracle-pinned round(9) and
    * vec_id tie-break. ONE definition on purpose — the rounding precision
    * and tie rule are pinned by three query families. */
  def exactRerank(emb: DataFrame, shortlist: DataFrame,
                  queryVec: Array[Float], k: Int): DataFrame = {
    val qe = array(queryVec.map(lit): _*)
    emb.join(broadcast(shortlist), "vec_id")
      .withColumn("cosine", round(VectorFns.cosine(col("embedding"), qe), 9))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
      .select("vec_id", "cosine")
  }

  /** Per-dimension SQ8 bounds — (min, max) per dimension over the corpus,
    * an exact order-independent training artifact (float MIN/MAX commute,
    * unlike float sums), `dim` rows to the driver — the bounded-artifact
    * pattern of the k-means centroids and PQ codebooks, minus their
    * iteration. */
  def sq8Bounds(emb: DataFrame, embCol: String = "embedding"): Array[(Float, Float)] =
    emb.select(posexplode(col(embCol)).as(Seq("dim", "v")))
      .groupBy("dim").agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy("dim")
      .collect().map(r => (r.getFloat(1), r.getFloat(2)))

  /** SQ8 (scalar-quantization) encode: each float compresses to one byte
    * — `floor((v − mn_d) · 255 / (mx_d − mn_d))`, clamped to [0, 255]
    * on BOTH ends (bounds are a frozen training artifact, so a later
    * batch can carry values outside them — the lower clamp keeps such
    * rows valid bytes instead of negative codes), constant dimensions
    * to 0. 4 B/dim → 1 B/dim; with PQ this is the other faiss
    * compression family, and unlike PQ the whole chain is loop-free, so
    * q137 gets a FULL DuckDB oracle rather than a golden. */
  def sq8Encode(emb: DataFrame, bounds: Array[(Float, Float)],
                embCol: String = "embedding"): DataFrame =
    emb.select(col("vec_id"), sq8CodesCol(col(embCol), bounds).as("codes"))

  /** The SQ8 code array as a Column — shared by [[sq8Encode]] and the
    * stored-index write ([[VectorIndex]]). One codegen'd kernel call per
    * row (plans/Sq8Kernel) — bit-identical to the declarative
    * zip_with-over-literal-bounds form it replaced in the r19
    * optimization round (SimilaritySpec asserts it; the interpreted HOF
    * was the dominant cost of the q137 chain). */
  def sq8CodesCol(emb: org.apache.spark.sql.Column,
                  bounds: Array[(Float, Float)]): org.apache.spark.sql.Column =
    graft.plans.Sq8Exprs.encode(emb, bounds)

  /** SQ8 ADC top-k with the standard rerank: candidates scored on CODES
    * only via midpoint decode — `Σ_d q_d · (mn_d + (code_d + 0.5) ·
    * step_d)` folded in dimension order (deterministic like the PQ score
    * fold) — then the `rerank` shortlist's float vectors are read back
    * for an exact cosine top-k, exactly [[pqSearch]]'s recipe. Like
    * pqSearch, the trained artifacts (`bounds`, `codes`) are parameters:
    * N queries against one corpus pay the bounds aggregation and the
    * encode pass once, not N times. */
  def sq8Search(emb: DataFrame, codes: DataFrame,
                bounds: Array[(Float, Float)], queryVec: Array[Float],
                k: Int, rerank: Int = 100): DataFrame = {
    val shortlist = codes.withColumn("sq_score",
        round(sq8ScoreCol(col("codes"), bounds, queryVec), 9))
      .orderBy(desc("sq_score"), asc("vec_id"))
      .limit(rerank)
      .select("vec_id")
    exactRerank(emb, shortlist, queryVec, k)
  }

  /** The SQ8 ADC (midpoint-decode) score as a Column — `Σ_d q_d · (mn_d +
    * (code_d + 0.5) · step_d)` folded in dimension order, the
    * per-dimension factors precomputed on the driver. Shared by
    * [[sq8Search]] and the stored-index search ([[VectorIndex]]);
    * UNROUNDED — callers round(9) where the value is oracle-compared. */
  def sq8ScoreCol(codes: org.apache.spark.sql.Column,
                  bounds: Array[(Float, Float)],
                  queryVec: Array[Float]): org.apache.spark.sql.Column =
    // one codegen'd kernel call per row (plans/Sq8Kernel) — the identical
    // dimension-order left fold the aggregate-HOF form ran interpreted
    // (bit-identity asserted in SimilaritySpec, r19 optimization round)
    graft.plans.Sq8Exprs.score(codes, bounds, queryVec)

  /** Embedding near-duplicate pairs: within-cell blocked self-join (the
    * cell is the blocking key), cosine ≥ threshold.
    *
    * Two-phase evaluation: exact decimal norms are computed ONCE per vector
    * before the join; each candidate pair is prefiltered with a cheap
    * double dot (margin 1e-6), and only survivors — a vanishing fraction —
    * get the exact order-independent decimal dot that the oracle compares.
    * Cuts per-pair work ~9x (3 decimal HOFs -> 1 double HOF) without
    * changing a single output bit.
    *
    * The exact-confirm gate lives INSIDE a per-pair aggregation (the
    * q143/semanticContamination recipe): as a plain filter it would
    * predicate-push into the join condition, where optimizer AND-order
    * decides whether the interpreted decimal fold runs on every
    * candidate pair or only on prefilter survivors (a reversed order
    * measured 20× on q143's shape). The Aggregate is a pushdown
    * barrier, so ONLY the codegen'd double prefilter ever joins —
    * structural, not AND-order luck (PlanShapeSpec asserts no decimal
    * fold in any join condition). Pairs are unique per (vec_a, vec_b),
    * so the max() is the identity and the output is bit-unchanged; the
    * added shuffle moves prefilter SURVIVORS only — the vanishing
    * near-dup fraction, map-side-combined. */
  def nearDuplicatePairs(emb: DataFrame, cellCol: String, threshold: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col(cellCol).as("cell"), col("embedding"))
      .withColumn("nrm", VectorFns.norm(col("embedding")))  // exact, per vector
    val denom = col("a.nrm") * col("b.nrm")
    e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id") &&
        VectorFns.dotDouble(col("a.embedding"), col("b.embedding")) / denom
          >= threshold - 1e-6)
      .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .agg(max(round(VectorFns.dot(col("a.embedding"), col("b.embedding"))
        / denom, 9)).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** SemDeDup-shape semantic dedup, end-to-end: block on `cellCol`
    * (a label, an LSH bucket, or a k-means cell id — any blocking that
    * bounds the within-block join), mine exact cosine near-dup pairs at
    * `threshold` ([[nearDuplicatePairs]]), resolve them into connected
    * components ([[Clusters.connectedComponents]]), and keep each
    * cluster's min-`vec_id` representative. Returns the SURVIVING rows
    * of `emb` (the deduplicated embedding corpus), the artifact a
    * training pipeline feeds downstream.
    *
    * 100 TB shape: the pair mine is block-bounded (never all-pairs), the
    * component loop's working set is the near-dup fringe only, and the
    * final keep is one semi-join — the same chain as the text-side
    * q94 verdict, so the two modalities dedup with one posture. */
  def semanticDedupe(emb: DataFrame, cellCol: String,
                     threshold: Double): DataFrame = {
    val pairs = nearDuplicatePairs(emb, cellCol, threshold)
      .select("vec_a", "vec_b")
    val comps = Clusters.connectedComponents(
      emb.select(col("vec_id")), "vec_id", pairs, "vec_a", "vec_b")
    emb.join(
      comps.filter(col("vec_id") === col("cluster_rep")).select("vec_id"),
      Seq("vec_id"), "left_semi")
  }

  /** Cross-corpus SEMANTIC contamination report: for every training
    * vector with cosine ≥ `threshold` against ANY eval-corpus vector,
    * one row (vec_id, n_eval_hits, max_eval_cos) — the embedding-space
    * counterpart of the 8-gram decontamination
    * ([[Dedup.crossCorpusContamination]]): paraphrased eval leakage that
    * shares no 8-gram still collides here.
    *
    * Scale contract: the eval corpus is the SMALL side by construction
    * (a benchmark suite — thousands of vectors vs a 100 TB train side),
    * so it is broadcast and the scan of the train side is
    * shuffle-free; the per-train-id aggregation is map-side-combining
    * on already-hash-partitioned tiny hit rows. The double-precision
    * dot prefilters (codegen'd loop) with a 1e-6 margin and the exact
    * decimal dot confirms — the q52 two-stage gate, so the rounded
    * cosine is bit-stable across engines. */
  def semanticContamination(train: DataFrame, eval: DataFrame,
                            threshold: Double): DataFrame = {
    val t = train.select(col("vec_id"), col("embedding"))
      .withColumn("__tn", VectorFns.norm(col("embedding")))
    val e = broadcast(eval.select(col("vec_id").as("__ev"),
      col("embedding").as("__ee"))
      .withColumn("__en", VectorFns.norm(col("__ee"))))
    // The exact-confirm gate lives INSIDE the aggregation (count/max of a
    // `when`), not in a filter: a filter on the exact cosine gets
    // predicate-pushed into the BNLJ condition, where optimizer AND-order
    // decides whether the interpreted decimal fold runs on every
    // candidate pair or only on prefilter survivors (measured 16.5 s vs
    // 0.6 s at sf0.1 — the decimal dot landed FIRST in the AND). An
    // aggregate is a pushdown barrier, so only the codegen'd
    // float_array_dot prefilter ever joins, and the decimal confirm is
    // a projection over its survivors — guaranteed, not AND-order luck.
    t.join(e,
        VectorFns.dotDouble(col("embedding"), col("__ee")) / (col("__tn") * col("__en"))
          >= threshold - 1e-6)
      .withColumn("cosine",
        round(VectorFns.dot(col("embedding"), col("__ee")) / (col("__tn") * col("__en")), 9))
      .groupBy("vec_id")
      .agg(count(when(col("cosine") >= threshold, 1)).as("n_eval_hits"),
        max(when(col("cosine") >= threshold, col("cosine"))).as("max_eval_cos"))
      .filter(col("n_eval_hits") > 0)
  }

  /** The decontaminated training corpus: `train` minus every vector
    * [[semanticContamination]] flags — one broadcast-scored scan + one
    * anti-join, the artifact the pipeline actually trains on. */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame,
                            threshold: Double): DataFrame =
    train.join(semanticContamination(train, eval, threshold).select("vec_id"),
      Seq("vec_id"), "left_anti")

  /** Deterministic "random" hyperplane component for (bit b, dim d): a
    * seeded linear-congruential value in [-1, 1) — no RNG state, so the
    * plane family is pure arithmetic any engine can recompute. The q53
    * DuckDB oracle embeds these exact doubles as SQL literals
    * (VectorQueries.lshBucketSql), which keeps the two derivations in
    * lockstep through this single definition. */
  def lshPlane(b: Int, d: Int): Double = {
    val x = (b.toLong * 2654435761L + d.toLong * 40503L + 12345L) & 0xffffffffL
    (x.toDouble / 0xffffffffL.toDouble) * 2.0 - 1.0
  }

  /** Random-hyperplane LSH bucket assignment: `nBits` sign bits from
    * deterministic pseudo-random hyperplanes ([[lshPlane]]).
    * Vectors in the same bucket are ANN candidates. */
  def lshBuckets(emb: DataFrame, nBits: Int = 12, dim: Int = 64): DataFrame = {
    val bitCols = (0 until nBits).map { b =>
      val dotP = (0 until dim)
        .map(d => element_at(col("embedding"), d + 1).cast("double") * lit(lshPlane(b, d)))
        .reduce(_ + _)
      when(dotP > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    // with ANSI off, element_at past the array end returns null, which
    // nulls every dot product and silently sends ALL vectors to bucket 0 —
    // degenerating LSH blocking into one O(N^2) bucket; fail loudly instead
    val guarded = when(size(col("embedding")) < lit(dim),
      raise_error(concat(
        lit(s"lshBuckets: embedding has fewer than dim=$dim elements: "),
        size(col("embedding")).cast("string"))))
      .otherwise(bitCols.reduce((a, b) => a.bitwiseOR(b)))
    emb.withColumn("bucket", guarded)
  }
}
