package graft

/** Scale-degradation guarantees: results must not depend on the physical
  * join strategy AQE picks. At test SF the fact-fact join broadcasts by
  * runtime stats; at cluster scale the same plan must fall back to
  * sort-merge — forcing the fallback here proves both the plan shape and
  * result stability. */
class ScalePlanSpec extends SparkSpecBase {

  test("q01 scan: filter pushed to parquet, unused columns pruned") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val exec = df.queryExecution.executedPlan
    exec.execute().count()
    val plan = exec.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n${plan.take(1500)}")
    // projection pruning: the scan schema must not carry unused wide columns
    assert(!plan.contains("l_comment") && !plan.contains("l_partkey"),
      "scan reads columns the query never uses")
  }

  test("q127 composed pipeline is strategy-independent: same rows with broadcast disabled") {
    // the composition chains semi-joins, broadcast model joins, and two
    // pinned cumsums; forcing every join to sort-merge must not change a
    // row (the pins freeze partitioning, the folds are order-pinned)
    val q = SparkEntry.queries("q127_curation_pipeline")
    val withBroadcast = q(spark, sf).collect().toSeq
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "-1")
      spark.conf.set(aqeKey, "-1")
      assert(q(spark, sf).collect().toSeq == withBroadcast)
    } finally {
      spark.conf.unset(aqeKey)
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("q14 fact-fact join degrades to sort-merge with broadcast disabled, same result") {
    val q = SparkEntry.queries("q14_customer_behavior")
    val withBroadcast = q(spark, sf).collect().toSet

    val key = "spark.sql.autoBroadcastJoinThreshold"
    val aqeKey = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "-1")
      spark.conf.set(aqeKey, "-1")
      val df = q(spark, sf)
      val exec = df.queryExecution.executedPlan
      exec.execute().count()
      val plan = exec.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected sort-merge fallback, got:\n${plan.take(2000)}")
      assert(!plan.contains("BroadcastHashJoin"))
      assert(df.collect().toSet == withBroadcast)
    } finally {
      spark.conf.unset(aqeKey)
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}
