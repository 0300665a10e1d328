package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level snapshot diff: compare two keyed snapshots of a table and
  * emit one row per differing key — `added` / `removed` / `changed`, with
  * the comma-joined list of attributes that differ (null-safe compare).
  * The audit primitive behind "what did last night's load change": the
  * reference rewrites whole warehouse tables blind
  * (`to_sql(if_exists='replace')`, customer_analytics_dag.py:145-151);
  * this makes the delta observable instead.
  *
  * Plan shape: one FULL OUTER join on the key — both snapshots shuffle
  * once; at warehouse scale write snapshots bucketed on the key
  * ([[graft.sources.Warehouse]] bucketed layouts) and the exchanges
  * disappear. Presence flags (not attribute nulls) distinguish a missing
  * row from a null attribute; unchanged keys are dropped before anything
  * rides the output, so rows-out = |delta|, not |table|.
  */
object Diff {

  /** md5-ticket bucket id for a key — engine-portable (the shared
    * [[graft.llm.Scoring.md5Int]] hex-prefix recipe), uniform, and
    * independent of any value column. */
  def bucketOf(key: Column, buckets: Int): Column =
    (graft.llm.Scoring.md5Int(concat(lit("bk:"), key.cast("string")), 4)
      % buckets).cast("int")

  /** Merkle-style per-bucket fingerprints: (bucket, n, sig) with sig the
    * ORDER-INDEPENDENT sum of a 32-bit md5 prefix over each row's
    * representation. The representation hashes every field SEPARATELY
    * to a fixed-width digest before the row digest — a joined-string
    * form would let shifted field boundaries collide ("x|y","z" vs
    * "x","y|z"); fixed-width field digests make the row representation
    * prefix-free by construction. NULL attrs coalesce to a NUL sentinel
    * (distinct from empty). Two snapshots' signature tables are the
    * CHEAP pass of an rsync/merkle incremental sync: at 100 TB the
    * signature scan is one map-side-combining aggregation per side, and
    * the row-level diff then touches ONLY buckets whose fingerprints
    * differ ([[changedBuckets]]) instead of full-outer-joining the
    * whole table. */
  def bucketSignatures(df: DataFrame, keyCol: String, attrCols: Seq[String],
                       buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val fieldDigests = (col(keyCol).cast("string") +:
      attrCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))))
      .map(f => md5(f.cast("binary")))
    df.select(bucketOf(col(keyCol), buckets).as("bucket"),
        graft.llm.Scoring.md5Int(concat(fieldDigests: _*), 8).as("__sig"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("__sig")).as("sig"))
  }

  /** Buckets whose fingerprints differ between the snapshots (count OR
    * signature, null-safe — a bucket present on one side only counts).
    * Formatting of the row representation only needs to be
    * self-consistent within one engine: a representation difference
    * between engines shifts BOTH sides' signatures identically and
    * cancels in this comparison. */
  def changedBuckets(a: DataFrame, b: DataFrame, keyCol: String,
                     attrCols: Seq[String], buckets: Int): DataFrame = {
    val sa = bucketSignatures(a, keyCol, attrCols, buckets)
      .withColumnRenamed("n", "__na").withColumnRenamed("sig", "__sa")
    val sb = bucketSignatures(b, keyCol, attrCols, buckets)
      .withColumnRenamed("n", "__nb").withColumnRenamed("sig", "__sb")
    sa.join(sb, Seq("bucket"), "full_outer")
      .filter(!(col("__na") <=> col("__nb")) || !(col("__sa") <=> col("__sb")))
      .select("bucket")
  }

  def snapshotDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                   attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    // presence flags live outside the "__a_<attr>"/"__b_<attr>" namespace
    // (an attr literally named "p" must not collide with them — the spec
    // pins it); attrs may not start with "__" so the reverse is true too.
    require(attrCols.forall(!_.startsWith("__")), "attr names may not start with __")
    val la = a.select(keyCols.map(col) ++
      attrCols.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__present_a"): _*)
    val lb = b.select(keyCols.map(col) ++
      attrCols.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__present_b"): _*)
    val j = la.join(lb, keyCols, "full_outer")
    val aP = coalesce(col("__present_a"), lit(false))
    val bP = coalesce(col("__present_b"), lit(false))
    // concat_ws skips nulls, so this is the ordered list of attrs whose
    // old/new values are NOT null-safe-equal ("" when none differ).
    val changed = concat_ws(",",
      attrCols.map(c => when(!(col(s"__a_$c") <=> col(s"__b_$c")), lit(c))): _*)
    j.withColumn("change_type",
        when(aP && !bP, lit("removed"))
          .when(bP && !aP, lit("added"))
          .when(changed =!= lit(""), lit("changed")))
      .filter(col("change_type").isNotNull)
      .withColumn("changed_cols",
        when(col("change_type") === lit("changed"), changed))
      .select(keyCols.map(col) :+ col("change_type") :+ col("changed_cols"): _*)
  }
}
