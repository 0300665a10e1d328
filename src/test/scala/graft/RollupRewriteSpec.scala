package graft

import graft.operators.Ivm
import graft.plans.RollupRewrite
import graft.sources.Warehouse
import org.apache.spark.sql.functions._

/** The materialized-rollup query-rewrite rule: matching aggregations over
  * the fact scan re-aggregate the registered summary instead; anything not
  * derivable is left untouched; results are bit-identical either way. */
class RollupRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private val keys = Seq("o_orderpriority", "o_orderstatus")
  private val sums = Seq("o_totalprice")
  private val dates = Seq("o_orderdate")

  private def setup(): Unit = {
    Warehouse.ensureDatabase(spark, "graft_test")
    // refresh protocol: never rebuild a summary while it is registered
    // (the rebuild itself is translatable — RollupRewrite.unregister doc)
    RollupRewrite.clear()
    Warehouse.overwriteTable(
      Ivm.rollupState(Tables.orders(spark, sf), keys, sums, dates, dates),
      "graft_test.orders_rollup")
    RollupRewrite.register(spark, s"$sf/orders.parquet",
      "graft_test.orders_rollup", keys, sums, dates, dates)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrites a derivable aggregate to the summary, bit-identically") {
    setup()
    try {
      def query() = Tables.orders(spark, sf)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("orders"),
          graft.operators.Aggregates.dsum(col("o_totalprice")).as("revenue"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"))
        .orderBy("o_orderpriority")
      val rewritten = query()
      val plan = planOf(rewritten)
      assert(plan.contains("orders_rollup"), plan.take(800))
      assert(!plan.contains("orders.parquet"), plan.take(800))
      val got = rewritten.collect().toSeq
      RollupRewrite.clear()
      val direct = query()
      assert(planOf(direct).contains("orders.parquet"))
      assert(got == direct.collect().toSeq)
      // schema fidelity: the decimal-sum cast chain must not widen
      assert(rewritten.schema == direct.schema)
    } finally RollupRewrite.clear()
  }

  test("key-only filters rewrite; non-key filters and alien aggregates do not") {
    setup()
    try {
      // filter on a registered key: answered from the summary
      def keyFiltered() = Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("orders"))
        .orderBy("o_orderpriority")
      val kf = keyFiltered()
      assert(planOf(kf).contains("orders_rollup"), planOf(kf).take(800))
      val got = kf.collect().toSeq
      // filter on a NON-key column: untouched
      val nk = Tables.orders(spark, sf)
        .filter(col("o_custkey") > 100)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("orders"))
      assert(planOf(nk).contains("orders.parquet"))
      // a NON-DETERMINISTIC filter: per-row sampling that a group-level
      // summary filter cannot express — untouched (review finding, r10)
      val nd = Tables.orders(spark, sf)
        .filter(rand(7) < 0.5)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("orders"))
      assert(planOf(nd).contains("orders.parquet"))
      // a key filter matching NOTHING: COUNT must come back 0, not the
      // NULL a bare SUM(cnt) over an empty summary yields
      val empty = Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "ZZ")
        .agg(count(lit(1)).as("orders"))
      assert(planOf(empty).contains("orders_rollup"))
      val r = empty.collect()
      assert(r.length == 1 && !r.head.isNullAt(0) && r.head.getLong(0) == 0L)
      // an aggregate the summary can't answer: untouched
      val alien = Tables.orders(spark, sf)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("custs"))
      assert(planOf(alien).contains("orders.parquet"))
      // a plain double SUM (not the decimal idiom): untouched
      val dbl = Tables.orders(spark, sf)
        .groupBy("o_orderpriority")
        .agg(sum(col("o_totalprice")).as("rev"))
      assert(planOf(dbl).contains("orders.parquet"))
      RollupRewrite.clear()
      assert(got == keyFiltered().collect().toSeq)
    } finally RollupRewrite.clear()
  }

  test("key-subset and global aggregations re-aggregate the summary") {
    setup()
    try {
      // subset: group by the OTHER key
      def byStatus() = Tables.orders(spark, sf)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("orders"),
          graft.operators.Aggregates.dsum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderstatus")
      // global: no grouping at all
      def global() = Tables.orders(spark, sf)
        .agg(count(lit(1)).as("orders"),
          min(col("o_orderdate")).as("first_order"))
      val (s1, g1) = (byStatus(), global())
      assert(planOf(s1).contains("orders_rollup"))
      assert(planOf(g1).contains("orders_rollup"))
      val (sGot, gGot) = (s1.collect().toSeq, g1.collect().toSeq)
      RollupRewrite.clear()
      assert(sGot == byStatus().collect().toSeq)
      assert(gGot == global().collect().toSeq)
    } finally RollupRewrite.clear()
  }

  test("refresh cycle: unregister -> rebuild -> register survives repetition") {
    // regression: without deregistering first, the REBUILD aggregation is
    // itself translatable and gets rewritten to read the summary being
    // replaced — FILE_NOT_EXIST on the second cycle once the overwrite
    // has deleted the old files
    try {
      for (_ <- 1 to 3) {
        Warehouse.ensureDatabase(spark, "graft_test")
        RollupRewrite.unregister("graft_test.orders_rollup")
        Warehouse.overwriteTable(
          Ivm.rollupState(Tables.orders(spark, sf), keys, sums, dates, dates),
          "graft_test.orders_rollup")
        RollupRewrite.register(spark, s"$sf/orders.parquet",
          "graft_test.orders_rollup", keys, sums, dates, dates)
        val df = Tables.orders(spark, sf).groupBy("o_orderpriority")
          .agg(count(lit(1)).as("orders"))
        assert(planOf(df).contains("orders_rollup"))
        assert(df.count() == 5)
      }
    } finally RollupRewrite.clear()
  }
}
