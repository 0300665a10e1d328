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

  /** Salted equi-join for a skewed FACT side: the fact's hot keys would
    * hash every row of one key to a single reducer; salting spreads each
    * fact key over `salts` reducers and REPLICATES the (small-relative-to-
    * fact, but too big to broadcast) dimension side `salts`× so every
    * salted bucket still finds its match. This is the manual fallback for
    * the cases AQE skew-split cannot rescue — e.g. when the skewed join
    * feeds directly into a same-key aggregation (AQE won't split a
    * partition that a downstream stage requires whole) or under
    * `storePartitionedJoin`-style co-partitioning requirements.
    *
    * The fact salt is content-hashed (retry-stable, see [[saltedAgg]]);
    * the dimension replication is an explode over a literal range — pure
    * plan, no RNG anywhere. Inner and left-outer semantics are preserved
    * exactly: each fact row carries exactly one salt, so multiplicity is
    * unchanged; each dim row appears once per salt, so every fact row
    * still meets every matching dim row exactly once. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "left_outer")(joinType),
      s"saltedJoin preserves multiplicity only for inner/left joins, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(salts)))
    val repDim = dim.withColumn("__dsalt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim,
        saltedFact("__salt") === repDim("__dsalt") &&
          saltedFact(factKey) === repDim(dimKey),
        joinType)
      .drop("__salt", "__dsalt")
  }
}
