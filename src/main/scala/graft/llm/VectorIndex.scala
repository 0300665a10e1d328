package graft.llm

import graft.functions.VectorFns
import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED vector index: the IVF + SQ8 artifacts ([[Similarity]]'s
  * centroids, per-dim bounds, byte codes) written as a warehouse layout and
  * searched through storage — at 100 TB you search a stored index, not a
  * re-encoded scan. Reference behavior: the reference has no vector store;
  * this is part of the training-data-pipeline surface the build brief adds
  * as first-class (ANN scale path).
  *
  * Layout (three managed parquet tables under `prefix`):
  *
  *   - `{prefix}_vectors` — (vec_id, embedding, codes, cell), PARTITIONED
  *     BY cell: a probe of `nProbe` cells reads only those partition
  *     directories (PartitionFilters, spec-gated), i.e. nProbe/nCells of
  *     the corpus, and the ADC stage's column pruning reads CODES only
  *     (1 B/dim) — floats are touched for the rerank shortlist alone.
  *   - `{prefix}_centroids` — (cell, centroid): the coarse quantizer,
  *     nCells rows.
  *   - `{prefix}_bounds` — (dim, mn, mx): the SQ8 scalar-quantizer
  *     training artifact, dim rows.
  *
  * Freeze-then-use: search and ingest read the STORED artifacts — the
  * dsirModels/dupSpanModel split the repo uses for every trained model —
  * so N queries (and every ingest batch) pay the k-means/bounds training
  * zero times.
  */
object VectorIndex {

  /** Build and persist the index: assign cells from `cellCol`, train SQ8
    * bounds on the corpus, encode, write the three tables. One pass over
    * the data for the bounds agg + one for the partitioned write. */
  def write(emb: DataFrame, cellCol: String, prefix: String): Unit = {
    val spark = emb.sparkSession
    prefix.split("\\.") match {
      case Array(db, _) => Warehouse.ensureDatabase(spark, db)
      case _            => ()
    }
    val bounds = Similarity.sq8Bounds(emb)
    Warehouse.overwriteTable(boundsDf(spark, bounds), s"${prefix}_bounds")
    Warehouse.overwriteTable(
      Similarity.centroids(emb, cellCol), s"${prefix}_centroids")
    Warehouse.overwritePartitioned(
      emb.select(col("vec_id"), col("embedding"),
        Similarity.sq8CodesCol(col("embedding"), bounds).as("codes"),
        col(cellCol).cast("int").as("cell")),
      s"${prefix}_vectors", "cell")
  }

  private def boundsDf(spark: SparkSession,
                       bounds: Array[(Float, Float)]): DataFrame = {
    import spark.implicits._
    bounds.zipWithIndex
      .map { case ((mn, mx), i) => (i + 1, mn, mx) }.toSeq
      .toDF("dim", "mn", "mx")
  }

  /** Read the stored bounds back as the driver-side artifact (dim rows —
    * bounded like every trained model here). */
  def readBounds(spark: SparkSession, prefix: String): Array[(Float, Float)] =
    spark.table(s"${prefix}_bounds").orderBy("dim")
      .collect().map(r => (r.getFloat(1), r.getFloat(2)))

  /** Probe-cell selection against the STORED centroids: exact decimal
    * cosine (the q47 ranking — unrounded, cell tie-break), top `nProbe`
    * cell ids collected to the driver — nProbe ints, the literal values
    * that make the partition filter STATIC (pruning decided at plan time,
    * not runtime). */
  def probeCells(spark: SparkSession, prefix: String, queryVec: Array[Float],
                 nProbe: Int): Array[Int] = {
    val qe = array(queryVec.map(lit): _*)
    spark.table(s"${prefix}_centroids")
      .withColumn("ccos", VectorFns.cosine(col("centroid"), qe))
      .orderBy(desc("ccos"), asc("cell")).limit(nProbe)
      .select("cell").collect().map(_.getInt(0))
  }

  /** Search THROUGH the stored layout: probe `nProbe` cells from the
    * stored centroids, ADC-score the probed cells' CODES with the stored
    * bounds ([[Similarity]]'s midpoint-decode fold), exact-cosine rerank
    * of the `rerank` shortlist. The cell filter is a static partition
    * filter (only probed directories are listed); the ADC scan's column
    * pruning drops `embedding`, so the bulk read is 1 B/dim codes. */
  def search(spark: SparkSession, prefix: String, queryVec: Array[Float],
             k: Int, nProbe: Int, rerank: Int = 100): DataFrame = {
    val cells = probeCells(spark, prefix, queryVec, nProbe)
    val bounds = readBounds(spark, prefix)
    val probed = spark.table(s"${prefix}_vectors")
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
    val shortlist = probed
      .select(col("vec_id"),
        round(Similarity.sq8ScoreCol(col("codes"), bounds, queryVec), 9)
          .as("sq_score"))
      .orderBy(desc("sq_score"), asc("vec_id"))
      .limit(rerank)
      .select("vec_id")
    Similarity.exactRerank(probed, shortlist, queryVec, k)
  }

  /** The ADC scan alone (shortlist stage) — exposed so the spec can
    * assert its plan shape: PartitionFilters on `cell`, ReadSchema
    * without `embedding`. */
  def adcScan(spark: SparkSession, prefix: String, queryVec: Array[Float],
              cells: Array[Int], bounds: Array[(Float, Float)]): DataFrame =
    spark.table(s"${prefix}_vectors")
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col("vec_id"),
        round(Similarity.sq8ScoreCol(col("codes"), bounds, queryVec), 9)
          .as("sq_score"))

  /** Stored centroids back as the bounded driver artifact (nCells rows),
    * sorted by cell. */
  def readCentroids(spark: SparkSession, prefix: String): Array[(Int, Array[Float])] =
    spark.table(s"${prefix}_centroids").orderBy("cell")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))

  /** Cell assignment for NEW vectors against the FROZEN stored centroids —
    * what ingest does when arriving data has no blocking label: the
    * SHARED [[Similarity.nearestCellCol]] kernel (one codegen'd
    * projection, zero shuffle, zero join — the 100 TB-shaped scoring
    * scan), here over the stored cell ids instead of 0..k−1. */
  def assignCells(incoming: DataFrame,
                  centroids: Array[(Int, Array[Float])]): DataFrame =
    incoming.withColumn("cell",
      Similarity.nearestCellCol(col("embedding"), centroids.toSeq))

  /** Incremental ingest: assign each incoming vector to its nearest FROZEN
    * centroid, encode with the FROZEN stored bounds (values outside them
    * clamp on both ends — the reason sq8Encode clamps low as well as
    * high), and APPEND into the partitioned vectors table — new rows land
    * in existing cell directories; no rebuild, no touch of resident rows.
    * The vector twin of `Dedup.incrementalDedupe`'s frozen-index ingest
    * (q139). */
  def ingest(incoming: DataFrame, prefix: String): Unit = {
    val spark = incoming.sparkSession
    val bounds = readBounds(spark, prefix)
    val assigned = assignCells(
        incoming.select(col("vec_id"), col("embedding")),
        readCentroids(spark, prefix))
      .select(col("vec_id"), col("embedding"),
        Similarity.sq8CodesCol(col("embedding"), bounds).as("codes"),
        col("cell").cast("int").as("cell"))
    Warehouse.appendToTable(assigned, s"${prefix}_vectors")
  }
}
