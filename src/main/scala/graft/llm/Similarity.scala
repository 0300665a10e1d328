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

  /** Distributed Lloyd k-means over the embedding column — builds the IVF
    * cell assignment when no natural blocking key exists. Deterministic:
    * centroids init from the k lowest vec_ids; each iteration is one
    * broadcast (centroids to every task) + one shuffle (mean per cell).
    * At 100 TB this is the standard coarse-quantizer training loop: k and
    * iters are small constants, the data is scanned iters+1 times. */
  def kmeansCells(emb: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    var centroids: Array[Array[Float]] = emb
      .orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      // argmax_c cos(e, c): |e| is constant per row, so rank by dot/|c| —
      // centroid norms fold to driver-side constants in the plan
      val dists = centroids.zipWithIndex.map { case (cvec, c) =>
        val cnorm = math.sqrt(cvec.map(v => v.toDouble * v).sum)
        val cent = array(cvec.map(v => lit(v)): _*)
        struct((VectorFns.dotDouble(col("embedding"), cent) / lit(cnorm)).as("sim"),
          lit(c).as("cell"))
      }
      assigned = emb.withColumn("cell",
        greatest(dists: _*).getField("cell"))
      centroids = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("cell", "dim").agg(exactMean(col("v")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .orderBy("cell")
        .select(transform(col("dm"), x => x.getField("m").cast("float")).as("centroid"))
        .collect().map(_.getSeq[Float](0).toArray)
    }
    assigned.select(col("vec_id"), col("cell"), col("embedding"))
  }

  /** IVF probe: rank cells by centroid cosine to the query, scan the top
    * `nProbe` cells only, exact cosine within them. */
  def ivfTopK(emb: DataFrame, query: DataFrame, cellCol: String,
              k: Int, nProbe: Int = 2): DataFrame = {
    val cents = centroids(emb, cellCol)
    val probed = cents.crossJoin(broadcast(query))
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

  /** Embedding near-duplicate pairs: within-cell blocked self-join (the
    * cell is the blocking key), cosine ≥ threshold.
    *
    * Two-phase evaluation: exact decimal norms are computed ONCE per vector
    * before the join; each candidate pair is prefiltered with a cheap
    * double dot (margin 1e-6), and only survivors — a vanishing fraction —
    * get the exact order-independent decimal dot that the oracle compares.
    * Cuts per-pair work ~9x (3 decimal HOFs -> 1 double HOF) without
    * changing a single output bit. */
  def nearDuplicatePairs(emb: DataFrame, cellCol: String, threshold: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col(cellCol).as("cell"), col("embedding"))
      .withColumn("nrm", VectorFns.norm(col("embedding")))  // exact, per vector
    val denom = col("a.nrm") * col("b.nrm")
    e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(VectorFns.dotDouble(col("a.embedding"), col("b.embedding")) / denom
        >= threshold - 1e-6)
      .withColumn("cosine",
        round(VectorFns.dot(col("a.embedding"), col("b.embedding")) / denom, 9))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
  }

  /** Random-hyperplane LSH bucket assignment: `nBits` sign bits from
    * deterministic pseudo-random hyperplanes (seeded linear congruential
    * values per (bit, dim) — no RNG state, reproducible across runs).
    * Vectors in the same bucket are ANN candidates. */
  def lshBuckets(emb: DataFrame, nBits: Int = 12, dim: Int = 64): DataFrame = {
    // deterministic "random" plane component for (bit b, dim d)
    def plane(b: Int): Seq[Double] = (0 until dim).map { d =>
      val x = (b.toLong * 2654435761L + d.toLong * 40503L + 12345L) & 0xffffffffL
      (x.toDouble / 0xffffffffL.toDouble) * 2.0 - 1.0
    }
    val bitCols = (0 until nBits).map { b =>
      val dotP = (0 until dim)
        .map(d => element_at(col("embedding"), d + 1).cast("double") * lit(plane(b)(d)))
        .reduce(_ + _)
      when(dotP > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    emb.withColumn("bucket", bitCols.reduce((a, b) => a.bitwiseOR(b)))
  }
}
