package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Aggregates._
import graft.operators.{Baskets, Bins, Windows}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product-analytics queries (reference product_analytics_dag.py →
  * part/lineitem per FIXTURES.md §B: part ≈ product, exploded
  * product_metadata ≈ lineitem rows).
  */
object ProductQueries {

  private val dsumSql = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** Shared J1 shape: part ⟕ per-part sales agg, unsold parts filled with 0
    * (product_analytics_dag.py:68-84). Keeps the value sum as DECIMAL so
    * downstream re-aggregation stays exact. The agg side is part-cardinality
    * (bounded dim) — Catalyst/AQE broadcasts it. */
  private def productSales(s: SparkSession, dir: String): DataFrame = {
    val sales = Tables.lineitem(s, dir).groupBy("l_partkey").agg(
      sum("l_quantity").as("q"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("v"),
      davg(col("l_extendedprice")).as("ap"))
    Tables.part(s, dir)
      .join(sales, col("p_partkey") === col("l_partkey"), "left")
      .withColumn("total_quantity", coalesce(col("q"), lit(0).cast("double")))
      .withColumn("total_value_dec", coalesce(col("v"), lit(0).cast(DecimalType(28, 2))))
      .withColumn("avg_item_price", coalesce(col("ap"), lit(0).cast("double")))
      .drop("l_partkey", "q", "v", "ap")
  }

  private val productSalesSql =
    """SELECT p.*,
      |  COALESCE(s.q, 0) AS total_quantity,
      |  COALESCE(s.v, 0) AS total_value_dec,
      |  COALESCE(s.ap, 0) AS avg_item_price
      |FROM part p LEFT JOIN (
      |  SELECT l_partkey, SUM(l_quantity) AS q,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS v,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS ap
      |  FROM lineitem GROUP BY l_partkey) s
      |ON p.p_partkey = s.l_partkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- q06: product performance (U1+A3+J1+P6)
    QueryDef.sql("q06_product_performance",
      s"""WITH ps AS ($productSalesSql)
         |SELECT p_partkey, p_name, total_quantity,
         |  CAST(total_value_dec AS DOUBLE) AS total_value, avg_item_price
         |FROM ps""".stripMargin) { (s, dir) =>
      productSales(s, dir).select(
        col("p_partkey"), col("p_name"), col("total_quantity"),
        col("total_value_dec").cast("double").as("total_value"), col("avg_item_price"))
    },

    // ---- q07: category performance (A4 on p_brand; count includes unsold)
    QueryDef.sql("q07_category_performance",
      s"""WITH ps AS ($productSalesSql)
         |SELECT p_brand AS category,
         |  COUNT(p_partkey) AS product_count,
         |  SUM(total_quantity) AS total_quantity,
         |  CAST(SUM(total_value_dec) AS DOUBLE) AS total_value
         |FROM ps GROUP BY 1""".stripMargin) { (s, dir) =>
      productSales(s, dir)
        .groupBy(col("p_brand").as("category"))
        .agg(
          count(col("p_partkey")).as("product_count"),
          sum(col("total_quantity")).as("total_quantity"),
          sum(col("total_value_dec")).cast("double").as("total_value"))
    },

    // ---- q08: seasonal performance (A5 — two group keys)
    QueryDef.sql("q08_seasonal_performance",
      s"""WITH ps AS ($productSalesSql)
         |SELECT p_type AS season, p_brand AS category,
         |  SUM(total_quantity) AS total_quantity,
         |  CAST(SUM(total_value_dec) AS DOUBLE) AS total_value
         |FROM ps GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      productSales(s, dir)
        .groupBy(col("p_type").as("season"), col("p_brand").as("category"))
        .agg(
          sum(col("total_quantity")).as("total_quantity"),
          sum(col("total_value_dec")).cast("double").as("total_value"))
    },

    // ---- q09: price-band performance (A6 over P13 quantile bins)
    QueryDef.sql("q09_price_band_performance",
      s"""WITH ps AS ($productSalesSql),
         |t AS (SELECT *, NTILE(4) OVER (ORDER BY p_retailprice, p_partkey) AS tile FROM ps)
         |SELECT CASE tile WHEN 1 THEN 'Budget' WHEN 2 THEN 'Medium'
         |                 WHEN 3 THEN 'Premium' ELSE 'Luxury' END AS price_range,
         |  COUNT(p_partkey) AS product_count,
         |  SUM(total_quantity) AS total_quantity,
         |  CAST(SUM(total_value_dec) AS DOUBLE) AS total_value
         |FROM t GROUP BY 1""".stripMargin) { (s, dir) =>
      // part-dimension input is still 10^8 rows at 100 TB — use the
      // distributed NTILE (no single-task window), same oracle semantics
      Bins.distributedNtileBins(productSales(s, dir), col("p_retailprice"), col("p_partkey"), 4,
          Seq("Budget", "Medium", "Premium", "Luxury"), "price_range")
        .groupBy("price_range")
        .agg(
          count(col("p_partkey")).as("product_count"),
          sum(col("total_quantity")).as("total_quantity"),
          sum(col("total_value_dec")).cast("double").as("total_value"))
    },

    // ---- q10: top-100 products by value (T1 — TakeOrderedAndProject)
    QueryDef.sql("q10_top_products",
      s"""WITH ps AS ($productSalesSql)
         |SELECT p_partkey, p_name, CAST(total_value_dec AS DOUBLE) AS total_value,
         |  total_quantity
         |FROM ps ORDER BY total_value_dec DESC, p_partkey LIMIT 100""".stripMargin) { (s, dir) =>
      productSales(s, dir)
        .orderBy(desc("total_value_dec"), asc("p_partkey"))
        .limit(100)
        .select(col("p_partkey"), col("p_name"),
          col("total_value_dec").cast("double").as("total_value"), col("total_quantity"))
    },

    // ---- q11: market-basket pair mining (U2+A7+J2+T1)
    QueryDef.sql("q11_basket_pairs",
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pr AS (SELECT a.l_partkey AS product_1, b.l_partkey AS product_2
        |       FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |f AS (SELECT product_1, product_2, COUNT(*) AS frequency FROM pr GROUP BY 1, 2)
        |SELECT f.product_1, f.product_2, p1.p_name AS product_1_name,
        |       p2.p_name AS product_2_name, f.frequency
        |FROM f LEFT JOIN part p1 ON f.product_1 = p1.p_partkey
        |       LEFT JOIN part p2 ON f.product_2 = p2.p_partkey
        |ORDER BY f.frequency DESC, f.product_1, f.product_2 LIMIT 100""".stripMargin) { (s, dir) =>
      // custom PairCombinations Generator: one shuffle (groupBy order),
      // local pair explosion — no self-join (see graft.plans)
      val freq = Baskets.pairFrequencies(
        Baskets.pairsViaGenerator(Tables.lineitem(s, dir), "l_orderkey", "l_partkey"))
      val part = Tables.part(s, dir)
      freq
        .join(broadcast(part.select(col("p_partkey"), col("p_name").as("product_1_name"))),
          col("product_1") === col("p_partkey"), "left").drop("p_partkey")
        .join(broadcast(part.select(col("p_partkey"), col("p_name").as("product_2_name"))),
          col("product_2") === col("p_partkey"), "left").drop("p_partkey")
        .orderBy(desc("frequency"), asc("product_1"), asc("product_2"))
        .limit(100)
        .select("product_1", "product_2", "product_1_name", "product_2_name", "frequency")
    },

    // ---- q74: association-rule metrics over the basket pairs — the step
    // after raw pair frequency (q11): support per item, confidence, lift.
    // Item-order counts are part-cardinality (bounded) -> broadcast joins.
    QueryDef.sql("q74_basket_lift",
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT l_orderkey) AS total_orders FROM lineitem),
        |ic AS (SELECT l_partkey, COUNT(*) AS item_orders FROM d GROUP BY 1),
        |pr AS (SELECT a.l_partkey AS product_1, b.l_partkey AS product_2
        |       FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |pc AS (SELECT product_1, product_2, COUNT(*) AS pair_orders FROM pr GROUP BY 1, 2)
        |SELECT product_1, product_2, pair_orders,
        |  CAST(pair_orders AS DOUBLE) / ia.item_orders AS confidence,
        |  CAST(pair_orders AS DOUBLE) * n.total_orders
        |    / (ia.item_orders * ib.item_orders) AS lift
        |FROM pc JOIN ic ia ON product_1 = ia.l_partkey
        |        JOIN ic ib ON product_2 = ib.l_partkey, n
        |WHERE pair_orders >= 3
        |ORDER BY lift DESC, product_1, product_2 LIMIT 100""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val pairCounts = Baskets.pairFrequencies(
          Baskets.pairsViaGenerator(li, "l_orderkey", "l_partkey"))
        .withColumnRenamed("frequency", "pair_orders")
        .filter(col("pair_orders") >= 3)
      // deliberately UNPINNED: both broadcast sides reference this, but
      // the two references are byte-identical subtrees in ONE job, so
      // ReuseExchange already dedupes the shuffle — a pin was measured
      // strictly slower at 1× AND 32× (the pin rule targets references
      // that cross jobs/actions or non-identical subtrees, where reuse
      // can't fire; r7 sweep note in PLANS_r7.md)
      val itemCounts = li.select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_partkey").agg(count(lit(1)).as("item_orders"))
      val totalOrders = li.agg(countDistinct(col("l_orderkey")).as("total_orders"))
      pairCounts
        .join(broadcast(itemCounts.select(col("l_partkey"),
          col("item_orders").as("ia"))), col("product_1") === col("l_partkey"))
        .drop("l_partkey")
        .join(broadcast(itemCounts.select(col("l_partkey"),
          col("item_orders").as("ib"))), col("product_2") === col("l_partkey"))
        .drop("l_partkey")
        .crossJoin(broadcast(totalOrders))
        .select(col("product_1"), col("product_2"), col("pair_orders"),
          (col("pair_orders").cast("double") / col("ia")).as("confidence"),
          (col("pair_orders").cast("double") * col("total_orders")
            / (col("ia") * col("ib"))).as("lift"))
        .orderBy(desc("lift"), asc("product_1"), asc("product_2"))
        .limit(100)
    },

    // ---- q78: supplier revenue by region — the 3-hop star join
    // (fact ⋈ supplier ⋈ nation ⋈ region) over the one fixture table no
    // other query exercises. All three dims are bounded -> broadcast chain,
    // one shuffle for the final aggregate.
    QueryDef.sql("q78_supplier_region_revenue",
      s"""SELECT r.r_name AS region, n.n_name AS nation,
         |  COUNT(DISTINCT s.s_suppkey) AS suppliers,
         |  COUNT(*) AS line_count,
         |  ${dsumSql("l.l_extendedprice")} AS revenue
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(countDistinct(col("s_suppkey")).as("suppliers"),
          count(lit(1)).as("line_count"),
          dsum(col("l_extendedprice")).as("revenue"))
    },

    // ---- q17: sorted distribution (T3 — value_counts().sort_index())
    QueryDef.sql("q17_size_distribution",
      """SELECT p_size, COUNT(*) AS cnt FROM part GROUP BY p_size ORDER BY p_size""".stripMargin) { (s, dir) =>
      Tables.part(s, dir).groupBy("p_size").agg(count(lit(1)).as("cnt")).orderBy("p_size")
    },

    // ---- q21: competitor price stats + market position
    // (A12 avg/min/max/stddev_samp + J5 left join + P16 3-way label).
    // stddev from exact decimal power sums — order-independent (Aggregates).
    QueryDef.sql("q21_price_stats",
      """WITH s AS (
        |  SELECT l_partkey, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sx2,
        |    MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
        |  FROM lineitem GROUP BY 1)
        |SELECT p.p_partkey, p.p_name,
        |  s.sx/s.n AS avg_price, s.min_price, s.max_price,
        |  CASE WHEN s.n >= 2 THEN sqrt(greatest((s.sx2 - s.sx*s.sx/s.n)/(s.n-1), 0)) END AS std_price,
        |  p.p_retailprice - s.sx/s.n AS price_difference,
        |  (p.p_retailprice - s.sx/s.n) / (s.sx/s.n) * 100 AS price_difference_pct,
        |  CASE WHEN p.p_retailprice - s.sx/s.n > 0 THEN 'Above Market'
        |       WHEN p.p_retailprice - s.sx/s.n < 0 THEN 'Below Market'
        |       ELSE 'At Market' END AS price_position
        |FROM part p JOIN s ON p.p_partkey = s.l_partkey""".stripMargin) { (s, dir) =>
      val stats = Tables.lineitem(s, dir).groupBy("l_partkey").agg(
        davg(col("l_extendedprice")).as("avg_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        dstddev(col("l_extendedprice")).as("std_price"))
      val diff = col("p_retailprice") - col("avg_price")
      Tables.part(s, dir)
        .join(stats, col("p_partkey") === col("l_partkey"))
        .withColumn("price_difference", diff)
        .withColumn("price_difference_pct", diff / col("avg_price") * 100)
        .withColumn("price_position",
          when(diff > 0, "Above Market").when(diff < 0, "Below Market").otherwise("At Market"))
        .select("p_partkey", "p_name", "avg_price", "min_price", "max_price",
          "std_price", "price_difference", "price_difference_pct", "price_position")
    },

    // ---- q22: scalar-function suite (P1/P5/P7/P11/P18/P19, §2.9)
    QueryDef.sql("q22_scalar_functions",
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  regexp_replace(p_name || ' ' || p_type, ' ', '%20', 'g') AS search_query,
        |  'Rp' || CAST(CAST(round(p_retailprice*100, 0) AS BIGINT) AS VARCHAR) AS price_str,
        |  CAST(regexp_replace('Rp' || CAST(CAST(round(p_retailprice*100, 0) AS BIGINT) AS VARCHAR),
        |       '[^0-9]', '', 'g') AS BIGINT) AS parsed_price,
        |  lower(p_type) = 'promo' AS is_promo,
        |  TRY_CAST(p_name AS BIGINT) AS coerced_int
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val priceStr = concat(lit("Rp"),
        round(col("p_retailprice") * 100, 0).cast("long").cast("string"))
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lower"),
          regexp_replace(concat_ws(" ", col("p_name"), col("p_type")), " ", "%20").as("search_query"),
          priceStr.as("price_str"),
          regexp_replace(priceStr, "[^0-9]", "").cast("long").as("parsed_price"),
          (lower(col("p_type")) === "promo").as("is_promo"),
          expr("try_cast(p_name AS BIGINT)").as("coerced_int"))
        .orderBy("p_partkey")
    },

    // ---- q26: per-group top-k (T4 — row_number over partitioned window)
    QueryDef.sql("q26_topk_per_group",
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 5""".stripMargin) { (s, dir) =>
      Windows.topKPerGroup(Tables.part(s, dir),
          Seq(col("p_brand")), Seq(desc("p_retailprice"), asc("p_partkey")), 5)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rn").cast("long").as("rn"))
    },

    // ---- q27: window-function suite (W1: rank/dense_rank/ntile/running sum)
    QueryDef.sql("q27_window_suite",
      """SELECT p_partkey, p_brand, p_size,
        |  CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS size_rank,
        |  CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS BIGINT) AS size_dense_rank,
        |  CAST(NTILE(3) OVER (PARTITION BY p_brand ORDER BY p_partkey) AS BIGINT) AS tercile,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY p_brand ORDER BY p_partkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM part""".stripMargin) { (s, dir) =>
      val byBrand = Window.partitionBy("p_brand")
      val wSize = byBrand.orderBy(desc("p_size"))
      val wKey  = byBrand.orderBy(asc("p_partkey"))
      Tables.part(s, dir).select(
        col("p_partkey"), col("p_brand"), col("p_size"),
        rank().over(wSize).cast("long").as("size_rank"),
        dense_rank().over(wSize).cast("long").as("size_dense_rank"),
        ntile(3).over(wKey).cast("long").as("tercile"),
        sum(col("p_retailprice").cast(DecimalType(18, 2)))
          .over(wKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_value"))
    },

    // ---- q28: union + distinct count (SO1/SO2)
    QueryDef.sql("q28_union_entities",
      """SELECT src, COUNT(*) AS cnt, COUNT(DISTINCT name) AS distinct_names FROM (
        |  SELECT c_name AS name, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, 'supplier' AS src FROM supplier)
        |GROUP BY src""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir).select(col("c_name").as("name"), lit("customer").as("src"))
      val p = Tables.supplier(s, dir).select(col("s_name").as("name"), lit("supplier").as("src"))
      c.unionByName(p).groupBy("src")
        .agg(count(lit(1)).as("cnt"), countDistinct(col("name")).as("distinct_names"))
    }
  )
}
