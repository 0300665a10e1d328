package graft

import graft.functions.VectorFns
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Vector math + ANN guarantees (brute-force = ground truth; IVF/LSH are
  * approximate and asserted by recall / structural properties). */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("VectorFns.dot/norm/cosine on known values") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      VectorFns.dot($"a", $"b").as("d"),
      VectorFns.norm($"a").as("na"),
      VectorFns.cosine($"a", $"a").as("self")).head
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
  }

  test("FloatArrayDot: codegen and interpreted paths agree with the HOF form") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0.5f, -0.25f, 8f), Array(-2f, 4f, 0.125f))).toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(VectorFns.dotDouble($"a", $"b").as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // interpreted path (eval outside codegen): constant-folded literals
    val litDot = spark.range(1).select(VectorFns.dotDouble(
      array(lit(1f), lit(2f)), array(lit(3f), lit(4f))).as("d")).head.getDouble(0)
    assert(litDot == 11.0)
  }

  test("FloatArrayDot: unequal-length arrays yield null (truncated embedding guard)") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f))).toDF("a", "b")
    assert(df.select(VectorFns.dotDouble($"a", $"b")).head.isNullAt(0))
    // literal (interpreted) path too
    assert(spark.range(1).select(VectorFns.dotDouble(
      array(lit(1f), lit(2f)), array(lit(3f)))).head.isNullAt(0))
  }

  test("FloatArrayDot: null array and null element both yield null") {
    val df = Seq(
      (Some(Array(1f, 2f)), Array(3f, 4f)),
      (None: Option[Array[Float]], Array(3f, 4f))).toDF("a", "b")
    val vals = df.select(VectorFns.dotDouble($"a", $"b").as("d")).collect()
    assert(!vals(0).isNullAt(0) && vals(1).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT CAST(array(1.0, NULL) AS array<float>) a, CAST(array(2.0, 3.0) AS array<float>) b")
    assert(withNullElem.select(VectorFns.dotDouble($"a", $"b")).head.isNullAt(0))
  }

  test("bruteTopK: query vector itself ranks first with cosine 1") {
    val emb = Tables.embeddings(spark, sf)
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val top = Similarity.bruteTopK(emb, query, 5).collect()
    assert(top.head.getAs[Long]("vec_id") == 0L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
    // scores non-increasing
    val scores = top.map(_.getAs[Double]("cosine")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("sq8Search: bounds exact, codes in byte range, strong recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val bounds = Similarity.sq8Bounds(emb)
    assert(bounds.length == 64 && bounds.forall { case (lo, hi) => lo <= hi })
    val codes = Similarity.sq8Encode(emb, bounds).collect()
    assert(codes.forall(_.getAs[Seq[Int]]("codes").forall(c => c >= 0 && c <= 255)))
    val queryVec = emb.filter($"vec_id" === 0)
      .select("embedding").head.getSeq[Float](0).toArray
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val exact = Similarity.bruteTopK(emb, query, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val approx = Similarity.sq8Search(emb, Similarity.sq8Encode(emb, bounds),
        bounds, queryVec, k = 10, rerank = 100)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // 8-bit quantization + rerank-100 keeps most of the true top-10
    assert((exact & approx).size >= 7, s"SQ8 recall ${(exact & approx).size}/10")
  }

  test("SQ8 kernels are bit-identical to the declarative HOF forms they replaced") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val bounds = Similarity.sq8Bounds(emb)
    val queryVec = emb.filter($"vec_id" === 0)
      .select("embedding").head.getSeq[Float](0).toArray
    // the pre-r19opt declarative encode: zip_with over literal bounds
    val mnA = array(bounds.map(b => lit(b._1)): _*)
    val mxA = array(bounds.map(b => lit(b._2)): _*)
    val declCodes = emb.select($"vec_id",
      zip_with($"embedding", sequence(lit(1), lit(bounds.length)),
        (v, i) => {
          val mn = element_at(mnA, i).cast("double")
          val mx = element_at(mxA, i).cast("double")
          when(mx > mn,
            least(lit(255.0), greatest(lit(0.0),
              floor((v.cast("double") - mn) * 255.0 / (mx - mn)).cast("double")))
              .cast("int"))
            .otherwise(lit(0))
        }).as("codes"))
    val kernCodes = Similarity.sq8Encode(emb, bounds)
    assert(kernCodes.orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq ==
      declCodes.orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq)
    // the pre-r19opt declarative ADC score: aggregate over literal factors
    val qA = array(queryVec.map(v => lit(v.toDouble)): _*)
    val mnD = array(bounds.map(b => lit(b._1.toDouble)): _*)
    val stepA = array(bounds.map { case (lo, hi) =>
      lit(if (hi > lo) (hi.toDouble - lo.toDouble) / 255.0 else 0.0) }: _*)
    val declScore = kernCodes.select($"vec_id",
      aggregate(sequence(lit(1), lit(bounds.length)), lit(0.0),
        (acc, i) => acc + element_at(qA, i) *
          (element_at(mnD, i) +
            (element_at($"codes", i).cast("double") + 0.5) * element_at(stepA, i)))
        .as("s"))
    val kernScore = kernCodes.select($"vec_id",
      Similarity.sq8ScoreCol($"codes", bounds, queryVec).as("s"))
    // exact double equality — the kernel must replay the identical fold
    assert(kernScore.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq ==
      declScore.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq)
    // ragged/short codes null the score exactly like an out-of-range element_at
    val short = spark.createDataFrame(Seq((1L, Seq(1, 2, 3)))).toDF("vec_id", "codes")
    assert(short.select(Similarity.sq8ScoreCol($"codes", bounds, queryVec))
      .head.isNullAt(0))
  }

  test("ivfTopK achieves high recall vs brute force at nProbe=3") {
    val emb = Tables.embeddings(spark, sf)
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val exact = Similarity.bruteTopK(emb, query, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val approx = Similarity.ivfTopK(emb, query, "label", k = 10, nProbe = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("lshBuckets is deterministic and assigns every vector") {
    val emb = Tables.embeddings(spark, sf)
    val b1 = Similarity.lshBuckets(emb, nBits = 12).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.lshBuckets(emb, nBits = 12).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.size == emb.count())
    assert(b1.values.forall(b => b >= 0 && b < (1L << 12)))
  }

  test("kmeansCells: every vector assigned, k cells, IVF over trained cells recalls") {
    val emb = Tables.embeddings(spark, sf)
    val cells = Similarity.kmeansCells(emb, k = 5, iters = 2)
    assert(cells.count() == emb.count())
    val cellIds = cells.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cellIds.subsetOf((0 until 5).toSet) && cellIds.size >= 2)
    // IVF over the trained assignment still finds most of the brute top-k
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val exact = Similarity.bruteTopK(emb, query, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val approx = Similarity.ivfTopK(cells, query, "cell", k = 10, nProbe = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((exact & approx).size >= 5)
  }

  test("PQ: codes shape, partitioning-stable codebooks, rerank recall over ADC-only") {
    val emb = Tables.embeddings(spark, sf)
    val books = Similarity.pqTrain(emb, m = 8, k = 16, iters = 2)
    assert(books.length == 8 && books.forall(_.length == 16)
      && books.flatten.forall(_.length == 8))
    // codebooks are bit-stable across input partitionings (decimal means)
    val books2 = Similarity.pqTrain(emb.repartition(5), m = 8, k = 16, iters = 2)
    assert(books.flatten.flatten.toSeq == books2.flatten.flatten.toSeq)
    val codes = Similarity.pqEncode(emb, books)
    assert(codes.count() == emb.count())
    // the codegen'd assignment kernel (plans/PqKernel) is bit-identical
    // to the declarative greatest-over-structs form it replaced in r7
    val subDim = books(0)(0).length
    val declarative = emb.select($"vec_id", org.apache.spark.sql.functions.array(
      (0 until 8).map { s =>
        val sub = slice($"embedding", s * subDim + 1, subDim)
        val cands = books(s).zipWithIndex.map { case (cw, c) =>
          val half = cw.map(v => v.toDouble * v).sum / 2.0
          struct((graft.functions.VectorFns.dotDouble(sub,
            org.apache.spark.sql.functions.array(cw.map(lit): _*)) - lit(half))
            .as("score"), lit(c).as("cw"))
        }
        greatest(cands: _*).getField("cw")
      }: _*).as("codes"))
    assert(codes.orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq ==
      declarative.orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq)
    val bad = codes.select(explode($"codes").as("c"))
      .filter($"c" < 0 || $"c" >= 16).count()
    assert(bad == 0)
    val qv = emb.filter($"vec_id" === 0).select("embedding").head.getSeq[Float](0).toArray
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val exact = Similarity.bruteTopK(emb, query, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val adcOnly = Similarity.pqTopK(codes, qv, books, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val reranked = Similarity.pqSearch(emb, codes, qv, books, k = 10, rerank = 100)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // rerank must not lose ground vs compressed-domain scores alone, and
    // must recall a solid majority of the exact top-k
    assert((exact & reranked).size >= (exact & adcOnly).size)
    assert((exact & reranked).size >= 6, s"recall ${(exact & reranked).size}/10")
    // the query vector itself survives compression + rerank at rank 1
    assert(Similarity.pqSearch(emb, codes, qv, books, k = 1, rerank = 50)
      .head.getAs[Long]("vec_id") == 0L)
  }

  test("MLlib BucketedRandomProjectionLSH recalls most of the exact cosine top-k") {
    // cross-validate against the library quantizer the survey proposed:
    // on UNIT-normalized vectors euclidean distance is monotone in cosine,
    // so BRP-LSH's euclidean ANN should recover most of bruteTopK's answer
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(spark, sf)
    val unit = emb.withColumn("features", array_to_vector(
      transform($"embedding", x =>
        (x / VectorFns.norm($"embedding")).cast("float"))))
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("lshv")
      .setBucketLength(1.0).setNumHashTables(6).setSeed(42L)
      .fit(unit)
    val queryVec = unit.filter($"vec_id" === 0)
      .select("features").head.getAs[org.apache.spark.ml.linalg.Vector](0)
    val approx = model.approxNearestNeighbors(unit, queryVec, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteTopK(emb,
        emb.filter($"vec_id" === 0).select($"embedding".as("qe")), 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((exact & approx).size >= 6, s"BRP recall too low: ${(exact & approx).size}/10")
  }

  test("nearDuplicatePairs only emits within-cell canonical pairs over threshold") {
    val pairs = Similarity.nearDuplicatePairs(Tables.embeddings(spark, sf), "label", 0.4)
      .collect()
    assert(pairs.forall(r => r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
    assert(pairs.forall(r => r.getAs[Double]("cosine") >= 0.4))
  }

  test("semanticDedupe keeps one representative per near-dup cluster") {
    // label 0: vecs 1,2 parallel (cos 1.0) and vec 3 orthogonal;
    // label 1: vec 4 parallel to 1 but in another block -> survives
    val emb = Seq(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(2f, 0f)), (3L, 0, Seq(0f, 1f)),
      (4L, 1, Seq(1f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val kept = Similarity.semanticDedupe(emb, "label", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
    // survivors are pairwise below threshold within every block
    val residual = Similarity.nearDuplicatePairs(
      Similarity.semanticDedupe(emb, "label", 0.9), "label", 0.9).count()
    assert(residual == 0)
  }

  test("semanticContamination flags eval-similar train vectors; decontaminate drops exactly those") {
    val evalC = Seq((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Seq(2f, 0f)),   // parallel to eval 100: cos 1.0
      (2L, Seq(1f, 1f)),   // cos ~0.707 to BOTH eval vectors
      (3L, Seq(-1f, 1f))   // cos -0.707 to 100, 0.707 to 101
    ).toDF("vec_id", "embedding")
    val rep = Similarity.semanticContamination(train, evalC, 0.5).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_eval_hits"), r.getAs[Double]("max_eval_cos")))).toMap
    assert(rep.keySet == Set(1L, 2L, 3L))
    assert(rep(1L)._1 == 1L && math.abs(rep(1L)._2 - 1.0) < 1e-9)
    assert(rep(2L)._1 == 2L)   // hit count, not just the max
    assert(rep(3L)._1 == 1L)   // the negative cosine never counts
    // decontaminate == train minus the flagged set, at any threshold
    assert(Similarity.semanticDecontaminate(train, evalC, 0.5)
      .select("vec_id").collect().isEmpty)
    assert(Similarity.semanticDecontaminate(train, evalC, 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("annScale: capacities track corpus size and never exceed it") {
    import Similarity.{annScale, AnnScale}
    // the shipped-fixture and sweep sizes, pinned exactly (these are the
    // values the q91b pol CTE must reproduce in SQL)
    assert(annScale(500) == AnnScale(500, 16, 144, 8, 3))
    assert(annScale(2000) == AnnScale(2000, 32, 352, 8, 3))
    assert(annScale(16000) == AnnScale(16000, 128, 1792, 16, 3))   // 8x sweep
    assert(annScale(64000) == AnnScale(64000, 256, 4096, 32, 4))   // 32x sweep
    // tiny corpora: every capacity is capped at N (pqTrain inits from
    // the k lowest vec_ids, so k > N would be out of bounds)
    assert(annScale(10) == AnnScale(10, 10, 10, 8, 3))
    // ladder breakpoints are exact integers on both engines
    assert(annScale(511).pqK == 16 && annScale(512).pqK == 32)
    assert(annScale(32767).pqK == 128 && annScale(32768).pqK == 256)
    // monotone: growing corpora never shrink a capacity
    val ns = Seq(1L, 10L, 100L, 511L, 512L, 5000L, 16000L, 40000L, 1000000L)
    val ps = ns.map(annScale)
    assert(ps.sliding(2).forall { case Seq(a, b) =>
      b.pqK >= a.pqK && b.rerank >= a.rerank && b.ivfCells >= a.ivfCells })
  }

  test("VectorIndex: stored search == live SQ8 chain; probe scan prunes " +
      "partitions and reads codes only") {
    import graft.llm.VectorIndex
    graft.sources.Warehouse.ensureDatabase(spark, "graft_test")
    val emb = Tables.embeddings(spark, sf)
    VectorIndex.write(emb, "label", "graft_test.vidx")
    val queryVec = emb.filter($"vec_id" === 0)
      .select("embedding").head.getSeq[Float](0).toArray
    val cells = VectorIndex.probeCells(spark, "graft_test.vidx", queryVec, 3)
    assert(cells.length == 3 && cells.distinct.length == 3)
    // parity: the stored-layout search equals the live chain restricted to
    // the same probed cells with the same full-corpus bounds
    val bounds = Similarity.sq8Bounds(emb)
    val probedEmb = emb.filter($"label".isin(cells.map(Integer.valueOf): _*))
    val live = Similarity.sq8Search(probedEmb,
        Similarity.sq8Encode(probedEmb, bounds), bounds, queryVec,
        k = 10, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val stored = VectorIndex.search(spark, "graft_test.vidx", queryVec,
        k = 10, nProbe = 3, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stored == live)
    // plan shape of the ADC stage: the cell filter is a STATIC partition
    // filter (only probed directories are listed) and column pruning
    // drops the float vectors — the scan reads 1 B/dim codes
    val plan = VectorIndex.adcScan(spark, "graft_test.vidx", queryVec,
      cells, bounds).queryExecution.executedPlan.toString
    assert(raw"PartitionFilters: \[[^\]]*cell".r.findFirstIn(plan).nonEmpty,
      plan.take(800))
    val readSchema = raw"ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("embedding"), readSchema)
  }

  test("VectorIndex.ingest: frozen-centroid assignment appends without " +
      "touching residents; frozen bounds clamp out-of-range batches") {
    import graft.llm.VectorIndex
    graft.sources.Warehouse.ensureDatabase(spark, "graft_test")
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter($"vec_id" % 10 < 8)
    val incoming = emb.filter($"vec_id" % 10 >= 8)
      // one synthetic vector far outside the frozen per-dim bounds: the
      // both-end clamp must keep its codes valid bytes
      .unionByName(spark.range(1).select(
        lit(900000L).as("vec_id"),
        array((0 until 64).map(i => lit(if (i % 2 == 0) 99f else -99f)): _*)
          .as("embedding"),
        lit(0).as("label")))
    VectorIndex.write(base, "label", "graft_test.vidx_inc")
    val beforeCodes = spark.table("graft_test.vidx_inc_vectors")
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    VectorIndex.ingest(incoming, "graft_test.vidx_inc")
    val after = spark.table("graft_test.vidx_inc_vectors")
    // residents unchanged, every ingested id present exactly once
    val afterRows = after.select("vec_id", "codes", "cell").collect()
    val afterMap = afterRows.map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(beforeCodes.forall { case (id, c) => afterMap(id) == c })
    assert(afterRows.length == beforeCodes.size + incoming.count())
    // codes stay bytes even where the batch exceeds the frozen bounds
    assert(afterRows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c <= 255)))
    val outlier = afterRows.filter(_.getLong(0) == 900000L)
    assert(outlier.length == 1)
    // assignment parity vs an independently computed argmax over the
    // STORED centroids: the kmeansCells kernel math replayed driver-side
    // (left-fold double dot, Scala-sum centroid norm, ties to the
    // HIGHEST cell)
    val cents = spark.table("graft_test.vidx_inc_centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    def score(vec: Array[Float], c: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < vec.length) { s += vec(i).toDouble * c(i).toDouble; i += 1 }
      s / math.sqrt(c.map(v => v.toDouble * v).sum)
    }
    val incRows = incoming.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val assignedCells = afterRows
      .filter(r => incRows.contains(r.getLong(0)))
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    incRows.foreach { case (id, vec) =>
      val want = cents.toSeq
        .map { case (cell, c) => (cell, score(vec, c)) }
        .sortBy { case (cell, s) => (-s, -cell) }.head._1
      assert(assignedCells(id) == want, s"vec $id")
    }
  }

  test("kmeansCells: an empty cell keeps its id (no silent shrink/renumber)") {
    // two identical seed vectors: ties go to the HIGHEST cell id, so the
    // lower duplicate cell starves to zero members in iteration 1 — the
    // old inline update dropped it and renumbered every later cell
    val dup = Array.fill(4)(1f)
    val far = Array(-1f, 2f, -3f, 4f)
    val emb = Seq((0L, dup), (1L, dup.clone()), (2L, far), (3L, far.clone()))
      .toDF("vec_id", "embedding")
    val cells = Similarity.kmeansCells(emb, k = 3, iters = 3)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // all four vectors keep valid, non-renumbered assignments: the dup
    // pair lands on cell 1 (tie -> highest of the duplicate seeds 0/1)
    // and the far pair on cell 2 — cell 2 must NOT have shifted to 1
    assert(cells(0L) == 1 && cells(1L) == 1)
    assert(cells(2L) == 2 && cells(3L) == 2)
  }

  test("kmeansCells iters=0 is assign-only against the seed centroids (no NPE)") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val cells = Similarity.kmeansCells(emb, k = 2, iters = 0)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(0L) == 0 && cells(1L) == 1 && cells(2L) == 0)
  }

  test("pqTrain refuses k larger than the corpus instead of an opaque AIOOBE") {
    val emb = Seq((0L, Array(1f, 2f)), (1L, Array(3f, 4f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTrain(emb, m = 1, k = 16)
    }
    assert(e.getMessage.contains("codewords"))
  }

  test("lshBuckets fails loudly on embeddings shorter than dim (no silent bucket-0 collapse)") {
    val emb = Seq((0L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.lshBuckets(emb, nBits = 4, dim = 64).collect()
    }
    assert(e.getMessage.contains("fewer than dim"))
  }

  test("ivfTopK with a pre-trained centroid artifact equals the self-contained form") {
    val emb = Tables.embeddings(spark, sf)
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val cents = Similarity.centroids(emb, "label")
    val viaArtifact = Similarity.ivfTopK(emb, query, "label", k = 10, nProbe = 3,
      cents = Some(cents)).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val selfContained = Similarity.ivfTopK(emb, query, "label", k = 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaArtifact == selfContained)
  }
}
