package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Explicit bloom-filter semi-join reduction — the manual form of Spark's
  * own runtime row-level filtering (`InjectRuntimeFilter`), for when the
  * optimizer declines to inject one (thresholds, reused exchanges, or a
  * filter that must survive into a DIFFERENT job, e.g. a fact scan feeding
  * several downstream plans).
  *
  * Shape: aggregate the dim side's join keys into one bloom sketch
  * (`BloomFilterAggregate` — partial per partition, merged once; the
  * driver sees ONE sketch of `numBits/8` bytes, ~1.2 MB for 1 M keys at
  * 1% fpp, never the key set), then filter the fact with the codegen'd
  * `BloomFilterMightContain` BEFORE the join shuffle. At 100 TB this is
  * the difference between shuffling the whole fact table and shuffling
  * only rows that can possibly match: false positives (fpp of the
  * non-matching rows) still shuffle, but the join drops them, so the
  * final result is EXACTLY the plain join — one-sided error in the
  * pre-filter, zero error in the output.
  *
  * Both sides hash with `xxhash64`, matching what `InjectRuntimeFilter`
  * feeds the same expressions. Dropping fact rows is only sound when
  * unmatched fact rows don't reach the output, so inner/semi joins only.
  */
object RuntimeFilters {

  /** Build the serialized bloom sketch of `keys` (one aggregate job). */
  def bloomOfKeys(df: DataFrame, key: String, expectedKeys: Long,
                  fpp: Double = 0.01): Array[Byte] = {
    val numBits = BloomFilter.create(expectedKeys, fpp).bitSize()
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(key))),
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    df.select(ColumnBridge.column(agg)).head.getAs[Array[Byte]](0)
  }

  /** The probe predicate: `might_contain(bloom, xxhash64(key))`. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloom), ColumnBridge.expression(xxhash64(key))))

  /** Persist a bloom sketch as a warehouse artifact — the CROSS-JOB
    * runtime filter: tonight's dim-build job publishes the sketch
    * (~1.2 MB for 1 M keys), tomorrow's fact jobs prune their scans
    * with it WITHOUT touching the dim table at all (the "join index"
    * move; Delta calls a cousin of this a bloom filter index). The
    * sketch is one binary row; correctness is unchanged because the
    * probe is a superset pre-filter and the exact join still runs. */
  def saveBloom(spark: org.apache.spark.sql.SparkSession, bloom: Array[Byte],
                table: String): Unit = {
    import spark.implicits._
    graft.sources.Warehouse.overwriteTable(
      Seq(Tuple1(bloom)).toDF("bloom"), table)
  }

  /** Load a [[saveBloom]] artifact (one tiny driver read). */
  def loadBloom(spark: org.apache.spark.sql.SparkSession,
                table: String): Array[Byte] =
    spark.table(table).head.getAs[Array[Byte]](0)

  /** `fact ⋈ dim` with the fact side bloom-pruned before the shuffle.
    * `expectedDimKeys` sizes the sketch (overestimating costs bits, not
    * correctness). Result is exactly the plain join. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String, expectedDimKeys: Long,
                      fpp: Double = 0.01, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "semi")(joinType),
      s"bloom-pruning the fact side is only exact for inner/semi joins, got $joinType")
    val bloom = bloomOfKeys(dim, dimKey, expectedDimKeys, fpp)
    val pruned = fact.filter(mightContain(bloom, fact(factKey)))
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }
}
