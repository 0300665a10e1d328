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

  test("zorder2 callable from SQL == Column API") {
    assert(spark.sql("SELECT zorder2(3, 5) AS z").head.getLong(0) == 39L)
    val viaCol = Seq((3, 5)).toDF("a", "b")
      .select(graft.plans.ZOrder2($"a", $"b")).head.getLong(0)
    assert(viaCol == 39L)
  }

  test("Cms: one-sided, re-aggregation == one-shot, partitioning-independent") {
    import graft.operators.Cms
    // zipf-ish: item i appears (2000/i) times for i in 1..50 -> known counts
    val ev = spark.range(20000).select(
      (col("id") % 10).as("day"), (col("id") % 50 + 1).as("item"))
    val exact = ev.groupBy("item").agg(count(lit(1)).as("n"))
    val oneShot = ev.agg(Cms.sketch(col("item")).as("sk"))
    // estimates never under-count, and at 50 distinct items are exact
    val probed = exact.crossJoin(broadcast(oneShot))
      .select(col("item"), col("n"), Cms.estimate(col("sk"), col("item")).as("est"))
    assert(probed.filter(col("est") < col("n")).count() == 0, "CMS must never under-count")
    assert(probed.filter(col("est") =!= col("n")).count() == 0,
      "50 keys in 4x2048 counters should not collide")
    // daily partials merged == one-shot, bit-for-bit (counters are sums)
    val skOne = oneShot.head.getAs[Array[Byte]]("sk")
    val skMerged = ev.groupBy("day").agg(Cms.sketch(col("item")).as("sk"))
      .agg(Cms.union(col("sk")).as("sk")).head.getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(skOne, skMerged), "partial sketches must merge losslessly")
    for (parts <- Seq(1, 7, 32)) {
      val sk = ev.repartition(parts).agg(Cms.sketch(col("item")).as("sk"))
        .head.getAs[Array[Byte]]("sk")
      assert(java.util.Arrays.equals(sk, skOne),
        s"sketch must be partitioning-independent (parts=$parts)")
    }
    // weighted build over the pre-counted table == per-row build, bit-for-bit
    val skW = exact.agg(Cms.sketchWeighted(col("item"), col("n")).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(skW, skOne),
      "weighted sketch over (item,count) must equal per-row sketch")
  }

  test("Hist: merge == one-shot, partition-independent, quantiles within a bucket") {
    import graft.operators.Hist
    val (lo, hi, nb) = (0.0, 1000.0, 100)   // width 10
    val ev = spark.range(10000).select(
      (col("id") % 7).as("day"), (col("id") % 1000).cast("double").as("v"))
    val oneShot = ev.agg(Hist.sketch(col("v"), lo, hi, nb).as("h"))
      .head.getSeq[Long](0)
    val merged = ev.groupBy("day").agg(Hist.sketch(col("v"), lo, hi, nb).as("h"))
      .agg(Hist.union(col("h"), nb).as("h")).head.getSeq[Long](0)
    assert(oneShot == merged, "daily partials must merge to the one-shot histogram")
    for (parts <- Seq(1, 13)) {
      val h = ev.repartition(parts).agg(Hist.sketch(col("v"), lo, hi, nb).as("h"))
        .head.getSeq[Long](0)
      assert(h == oneShot, s"histogram must be partitioning-independent (parts=$parts)")
    }
    // v is uniform over [0, 1000): p50 bucket lower bound is 490 or 500
    val p50 = Hist.quantileLowerBoundOf(oneShot, 0.5, lo, 10.0)
    val exactP50 = 499.0   // 5000th of 10000 sorted values = 499
    assert(math.abs(p50 - exactP50) <= 10.0, s"p50 lower bound $p50 not within a bucket")
    // out-of-range values clamp to edge buckets, nothing dropped
    val clamped = Seq(-5.0, 1e9).toDF("v")
      .agg(Hist.sketch(col("v"), lo, hi, nb).as("h")).head.getSeq[Long](0)
    assert(clamped.head == 1L && clamped.last == 1L && clamped.sum == 2L)
  }

  test("Hist edge contracts: NaN dropped, empty histogram -> lo, null sketch -> null") {
    import graft.operators.Hist
    // NaN must NOT silently land in bucket 0 (NaN.toInt == 0 trap)
    val h = Seq(Double.NaN, 5.0, Double.NaN).toDF("v")
      .agg(Hist.sketch(col("v"), 0.0, 100.0, 10).as("h")).head.getSeq[Long](0)
    assert(h.sum == 1L && h.head == 1L, s"NaN rows must be dropped, got $h")
    // zero-length and all-zero counts obey the documented empty -> lo
    assert(Hist.quantileLowerBoundOf(Seq.empty, 0.5, 10.0, 5.0) == 10.0)
    assert(Hist.quantileLowerBoundOf(Seq(0L, 0L), 0.5, 10.0, 5.0) == 10.0)
    // null sketch (outer-join shape) -> null, not an NPE
    val nullQ = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("h")
      .select(Hist.quantileLowerBound(col("h"), 0.5, 0.0, 100.0, 10).as("q"))
      .head
    assert(nullQ.isNullAt(0))
  }

  test("Cms.estimate on a null sketch -> null, not an NPE") {
    import graft.operators.Cms
    val r = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("sk")
      .select(Cms.estimate(col("sk"), lit("x")).as("est")).head
    assert(r.isNullAt(0))
  }
}
