package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index — the Delta/Iceberg data-skipping
  * pattern expressed over plain parquet: after a CLUSTERED write
  * ([[Warehouse.writeZOrdered]] / `repartitionByRange` + local sort makes
  * per-file value ranges tight and disjoint), one scan derives per-file
  * [min, max] for the skip columns; a range read then consults the stats
  * table and lists ONLY files whose range intersects the predicate.
  *
  * Partition pruning skips directories; this skips FILES within them on
  * non-partition columns — the second pruning tier a 100 TB table needs
  * (a day's partition is still thousands of files). The matched file
  * list is collected on the driver — bounded by file count, exactly how
  * Delta consults its transaction-log stats driver-side before listing.
  * The stats scan pays one pass at index-build time; every subsequent
  * range read pays only the matched files.
  */
object DataSkipping {

  /** Documented cap on driver-side file listings (same contract as
    * [[Warehouse.MaxDriverPartitions]]): ~10⁶ file names is ~100 MB of
    * driver strings — past that the index must be sharded by partition,
    * not collected whole. Delta's log-replay has the same driver-side
    * shape and the same practical bound. */
  val MaxDriverFiles = 1000000

  /** One row per parquet file under `path`: (file, rows, min_<c>/max_<c>
    * per skip column). Persist the result as a warehouse table and
    * refresh it incrementally on append with [[refreshStats]] (new files
    * only — stats of existing files never change). */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(path), cols)

  private def statsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one skip column")
    val aggs = count(lit(1)).as("rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental index refresh after an append: a parquet file is
    * immutable, so only files absent from `prev` are scanned (set
    * difference of the driver-side listings — the same bounded artifact
    * as the prune itself) and their stats union onto the prior index:
    * refreshStats == fileStats over the whole directory, at the cost of
    * the new files only. `cols` must match the columns `prev` was built
    * with (the union is by name and fails loudly otherwise). */
  def refreshStats(spark: SparkSession, path: String, prev: DataFrame,
                   cols: Seq[String],
                   maxFiles: Int = MaxDriverFiles): DataFrame = {
    // `prev.file` comes from input_file_name() (statsOf) — the
    // URL-ENCODED SparkPath rendering — while `inputFiles` renders
    // plain Path.toString; comparing raw strings would treat every
    // file with an encodable char (space, unicode) as fresh and
    // duplicate its stats row (r10 advice). Each side's rendering is
    // KNOWN, so decode exactly the encoded one — no guessing, which
    // would mis-decode a plain name containing a literal %XX.
    val known = prev.select("file").collect()
      .map(r => org.apache.spark.paths.SparkPath
        .fromUrlString(r.getString(0)).toPath.toString).toSet
    require(known.size <= maxFiles,
      s"refreshStats: stats index lists ${known.size} files, above the " +
        s"$maxFiles driver-side bound — compact the table or shard " +
        "the index by partition")
    // the plain side still needs Path's SLASH normalization (file:/// vs
    // file:/) — Path(String) applies it without any percent-decoding
    val current = spark.read.parquet(path).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).toString)
    // fail loudly if indexed files VANISHED from the directory (compaction
    // / vacuum): stale rows would double-count in the interim and crash a
    // later prunedRead on the deleted file — this index is append-only by
    // contract; rebuild with fileStats after any rewrite
    val vanished = known -- current
    require(vanished.isEmpty,
      s"refreshStats: ${vanished.size} indexed file(s) no longer exist " +
        s"(e.g. ${vanished.head}) — the directory was compacted/vacuumed; " +
        "rebuild the index with fileStats instead of refreshing")
    val fresh = current.filterNot(known)
    require(known.size + fresh.length <= maxFiles,
      s"refreshStats: refreshed index would list ${known.size + fresh.length} " +
        s"files, above the $maxFiles driver-side bound — compact the table " +
        "or shard the index by partition")
    if (fresh.isEmpty) prev
    else prev.unionByName(statsOf(spark.read.parquet(fresh.toIndexedSeq: _*), cols))
  }

  /** Read only the files whose [min_c, max_c] intersects [lo, hi], then
    * apply the EXACT predicate (the stats prune admits a superset — a
    * file straddling the bound contributes its in-range rows only).
    * Stats rows with a NULL min/max (all-null file) can hold no passing
    * row and are skipped. No file matches → empty frame, full schema. */
  def prunedRead(spark: SparkSession, path: String, stats: DataFrame,
                 column: String, lo: Any, hi: Any,
                 maxFiles: Int = MaxDriverFiles): DataFrame = {
    // stats.file carries input_file_name()'s URL-ENCODED rendering, but
    // spark.read.parquet does NOT percent-decode: a path with a space
    // would be looked up as the literal 'my%20table' and fail (and a
    // literal % could silently resolve to the WRONG file) — decode the
    // known-encoded rendering before handing the list to the reader
    val files = stats
      .filter(col(s"max_$column") >= lit(lo) && col(s"min_$column") <= lit(hi))
      .select("file").collect().map(_.getString(0)).distinct
      .map(f => org.apache.spark.paths.SparkPath.fromUrlString(f).toPath.toString)
    require(files.length <= maxFiles,
      s"prunedRead: predicate matches ${files.length} files, above the " +
        s"$maxFiles driver-side bound — narrow the range or read " +
        "the directory with a plain pushed-down filter instead")
    val exact = col(column).between(lit(lo), lit(hi))
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*).filter(exact)
  }
}
