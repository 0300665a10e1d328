package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §7.4.11 / build brief: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join splitting handles joins automatically; what it does NOT
  * fix is a hash aggregation with one hot key, where a single reducer gets
  * the whole group. [[saltedAgg]] runs the classic two-phase shape: shuffle
  * on (key, salt) — spreading one hot key over `salts` reducers — partially
  * aggregate, then re-aggregate per key. Correct for any algebraic
  * aggregate you can express as (partial, merge) pairs.
  */
object Skew {

  /** Two-phase salted aggregation: `aggs` maps output column name to
    * (partialAgg(inputCol), mergeAgg(partialCol)); e.g.
    * `"total" -> (sum(col("x")), sum(col("total")))`. The key column keeps
    * its name in the output.
    *
    * The salt is a hash of the ROW'S CONTENT, never of a nondeterministic
    * id: monotonically_increasing_id-style salts re-randomize when a stage
    * retry recomputes rows, splitting one attempt's partials across
    * different reducers than the original's (the SPARK-23207 failure
    * class). Content-hashing is retry-stable; heavy exact-duplicate rows
    * reduce salt uniformity but never correctness. */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
                aggs: Map[String, (Column, Column)]): DataFrame = {
    val keyName = df.select(key).columns.head
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(salts)))
    val partial = salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    partial
      .groupBy(col("__key"))
      .agg(aggs.head._2._2.as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m.as(n) }.toSeq: _*)
      .withColumnRenamed("__key", keyName)
  }
}
