package graft

import org.apache.spark.sql.functions._

/** The custom kernels registered through SparkSessionExtensions must be
  * callable from plain SQL and agree with the Column API. */
class SqlFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("simhash64 / minhash_signature / ngram_hashes callable from SQL == Column API") {
    Seq((1L, Seq(11L, 22L, 33L, 44L))).toDF("id", "hs").createOrReplaceTempView("t_hashes")
    val sql = spark.sql(
      """SELECT simhash64(hs) AS sh, minhash_signature(hs, 8) AS mh,
        |       ngram_hashes(hs, 2) AS ng FROM t_hashes""".stripMargin).head
    val api = spark.table("t_hashes").select(
      graft.plans.TextExprs.simhash64($"hs").as("sh"),
      graft.plans.TextExprs.minhashSignature($"hs", 8).as("mh"),
      graft.plans.TextExprs.ngramHashes($"hs", 2).as("ng")).head
    assert(sql.getLong(0) == api.getLong(0))
    assert(sql.getSeq[Long](1) == api.getSeq[Long](1))
    assert(sql.getSeq[Long](2) == api.getSeq[Long](2))
  }

  test("float_array_dot and pair_array callable from SQL") {
    val r = spark.sql(
      """SELECT float_array_dot(CAST(array(1.0, 2.0) AS array<float>),
        |                       CAST(array(3.0, 4.0) AS array<float>)) AS d,
        |       pair_array(array(3L, 1L, 2L, 1L)) AS p""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    val pairs = r.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("rolling_fingerprints callable from SQL; non-literal k rejected at analysis") {
    val ok = spark.sql("SELECT rolling_fingerprints('abcdefgh abcdefgh', 8, 4) AS f").head
    assert(ok.getSeq[Long](0).nonEmpty)
    val err = intercept[Exception] {
      spark.sql("SELECT rolling_fingerprints('abc', CAST(id AS INT), 4) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }

  test("Hll: re-aggregation == one-shot; partitioning-independent; error bounded") {
    import graft.operators.Hll
    val n = 20000L
    // 7507 distinct users spread over 10 "days"
    val ev = spark.range(n).select(
      (col("id") % 10).as("day"), (col("id") % 7507).as("user_id"))
    val oneShot = ev.agg(Hll.estimate(Hll.sketch(col("user_id")))).head.getLong(0)
    // daily partial sketches merged == one-shot sketch, bit-for-bit
    val merged = ev.groupBy("day").agg(Hll.sketch(col("user_id")).as("sk"))
      .agg(Hll.estimate(Hll.union(col("sk")))).head.getLong(0)
    assert(merged == oneShot, "partial sketches must merge losslessly")
    // classic HLL state is register-max only: any partitioning, same result
    // (this is exactly what Spark's DataSketches hll_sketch_agg does NOT
    // guarantee — its HIP estimate drifts with partition layout)
    for (parts <- Seq(1, 7, 32)) {
      val est = ev.repartition(parts)
        .agg(Hll.estimate(Hll.sketch(col("user_id")))).head.getLong(0)
      assert(est == oneShot, s"sketch must be partitioning-independent (parts=$parts)")
    }
    assert(math.abs(oneShot - 7507.0) / 7507.0 < 0.03,
      s"estimate $oneShot too far from exact 7507")
    // small-range path: linear counting is exact-ish at tiny cardinalities
    val small = spark.range(5).agg(Hll.estimate(Hll.sketch(col("id")))).head.getLong(0)
    assert(small == 5L, s"small-range correction should be exact here, got $small")
  }
}
