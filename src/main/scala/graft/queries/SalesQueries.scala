package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Aggregates._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sales-analytics queries (reference sales_analytics_dag.py →
  * orders/lineitem per FIXTURES.md §B mapping). Money aggregates go through
  * exact decimals (see [[graft.operators.Aggregates]]) so results are
  * bit-identical to the DuckDB oracle regardless of partitioning.
  */
object SalesQueries {

  /** Exact decimal sum fragments for oracle SQL. */
  private val dsumSql  = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private val dsum6Sql = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"

  val defs: Seq[QueryDef] = Seq(

    // ---- q01: pricing summary (A-class flagship aggregation; TPC-H Q1 shape)
    // Covers: S1 scan, P2 filter, A-aggs (sum/avg/count), multi-key groupBy.
    QueryDef.sql("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsum6Sql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_quantity")}/COUNT(l_quantity) AS avg_qty,
         |  ${dsumSql("l_extendedprice")}/COUNT(l_extendedprice) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    },

    // ---- q106: calendar date spine — gap-filled daily reporting: the
    // spine is every day of the observed [min, max] range (sequence over
    // a 1-row bounds aggregate, bounded by calendar span), left-joined
    // onto the daily agg with zero-fill. 6 missing days at sf0.01 make
    // the gate non-vacuous.
    QueryDef.sql("q106_date_spine",
      s"""WITH d AS (SELECT o_orderdate AS day, COUNT(*) AS orders,
         |             ${dsumSql("o_totalprice")} AS revenue
         |           FROM orders GROUP BY 1),
         |r AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
         |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
         |            CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM r)
         |SELECT spine.day, COALESCE(orders, 0) AS orders,
         |  COALESCE(revenue, 0.0) AS revenue
         |FROM spine LEFT JOIN d ON spine.day = d.day
         |ORDER BY spine.day""".stripMargin) { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("orders"), dsum(col("o_totalprice")).as("revenue"))
      val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("orders"), lit(0L)).as("orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy("day")
    },

    // ---- q107: bounded top-k per group via a typed Aggregator — the
    // 100 TB replacement for the T4 window shape: the map side reduces each
    // partition to ≤3 rows per customer before the shuffle (partial
    // ObjectHashAggregate), so no reducer ever sorts a whole group. The
    // (value DESC, id ASC) total order makes it bit-equal to the oracle's
    // ROW_NUMBER window.
    QueryDef.sql("q107_topk_agg",
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders)
        |WHERE rank <= 3""".stripMargin) { (s, dir) =>
      graft.operators.TopK.perGroupTopK(
        Tables.orders(s, dir), Seq("o_custkey"), "o_totalprice", "o_orderkey", k = 3)
    },

    // ---- q116: cross-source reconciliation via FULL OUTER join — the
    // audit shape for two ledgers that should cover the same calendar:
    // days present in only one source surface with presence flags instead
    // of silently dropping (orders and events cover disjoint eras in the
    // fixture, so BOTH unmatched sides are non-vacuous). Both inputs are
    // pre-aggregated to day grain before the join, so the full-outer
    // shuffle is day-cardinality, not fact-cardinality.
    QueryDef.sql("q116_full_outer_reconcile",
      """WITH o AS (SELECT o_orderdate AS day, COUNT(*) AS orders
        |           FROM orders GROUP BY 1),
        |e AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS events
        |      FROM events GROUP BY 1)
        |SELECT COALESCE(o.day, e.day) AS day,
        |  COALESCE(orders, 0) AS orders, COALESCE(events, 0) AS events,
        |  (o.day IS NOT NULL) AS has_orders, (e.day IS NOT NULL) AS has_events
        |FROM o FULL OUTER JOIN e ON o.day = e.day
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("o_day")).agg(count(lit(1)).as("orders"))
      val e = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("e_day")).agg(count(lit(1)).as("events"))
      o.join(e, col("o_day") === col("e_day"), "full_outer")
        .select(coalesce(col("o_day"), col("e_day")).as("day"),
          coalesce(col("orders"), lit(0L)).as("orders"),
          coalesce(col("events"), lit(0L)).as("events"),
          col("o_day").isNotNull.as("has_orders"),
          col("e_day").isNotNull.as("has_events"))
        .orderBy("day")
    },

    // ---- q119: histogram-sketch quantile rollup — the QUANTILE member
    // of the mergeable-sketch trio (q112 HLL distinct, q115 CMS
    // frequency): daily 600-bucket count histograms of o_totalprice, the
    // incrementally-maintained sketch table, merged for corpus p50/p90/
    // p99 to bucket resolution ($1000) without re-touching the facts.
    // Counting histograms over a FIXED bucketing are pure functions of
    // the value multiset (unlike t-digest/KLL), so the gate is a plain
    // DuckDB oracle replaying floor-bucket + cumulative counts.
    QueryDef.sql("q119_histogram_quantiles",
      """WITH c AS (SELECT least(greatest(CAST(floor(o_totalprice / 1000) AS BIGINT), 0), 599) AS bk,
        |             COUNT(*) AS n
        |           FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
        |cum AS (SELECT bk, SUM(n) OVER (ORDER BY bk) AS cum FROM c)
        |SELECT t.total AS orders,
        |  1000.0 * (SELECT MIN(bk) FROM cum WHERE cum >= ceil(0.5 * t.total)) AS p50_lb,
        |  1000.0 * (SELECT MIN(bk) FROM cum WHERE cum >= ceil(0.9 * t.total)) AS p90_lb,
        |  1000.0 * (SELECT MIN(bk) FROM cum WHERE cum >= ceil(0.99 * t.total)) AS p99_lb
        |FROM t""".stripMargin) { (s, dir) =>
      import graft.operators.Hist
      val (lo, hi, nb) = (0.0, 600000.0, 600)
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate"))
        .agg(Hist.sketch(col("o_totalprice"), lo, hi, nb).as("h"),
          count(lit(1)).as("n"))
      daily.agg(Hist.union(col("h"), nb).as("h"), sum(col("n")).as("orders"))
        .select(col("orders"),
          Hist.quantileLowerBound(col("h"), 0.5, lo, hi, nb).as("p50_lb"),
          Hist.quantileLowerBound(col("h"), 0.9, lo, hi, nb).as("p90_lb"),
          Hist.quantileLowerBound(col("h"), 0.99, lo, hi, nb).as("p99_lb"))
    },

    // ---- q02: daily sales (A8, P15, P17-equivalent per-order totals)
    // sales_analytics_dag.py:102-109 semantics on orders+lineitem.
    QueryDef.sql("q02_daily_sales",
      s"""WITH per_order AS (
         |  SELECT l_orderkey, SUM(l_quantity) AS items,
         |         SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))) AS promo
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT CAST(o.o_orderdate AS DATE) AS sale_date,
         |  COUNT(o.o_orderkey) AS total_transactions,
         |  ${dsumSql("o.o_totalprice")} AS total_sales,
         |  SUM(COALESCE(p.items, 0)) AS total_items,
         |  CAST(SUM(COALESCE(p.promo, 0)) AS DOUBLE) AS total_promo
         |FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      val perOrder = Tables.lineitem(s, dir).groupBy("l_orderkey").agg(
        sum("l_quantity").as("items"),
        sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(18, 6))).as("promo"))
      Tables.orders(s, dir)
        .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(to_date(col("o_orderdate")).as("sale_date"))
        .agg(
          count(col("o_orderkey")).as("total_transactions"),
          dsum(col("o_totalprice")).as("total_sales"),
          sum(coalesce(col("items"), lit(0))).as("total_items"),
          sum(coalesce(col("promo"), lit(0).cast(DecimalType(18, 6)))).cast("double").as("total_promo"))
    },

    // ---- q03: payment-method analysis (A9) keyed on o_orderpriority
    QueryDef.sql("q03_payment_analysis",
      s"""WITH per_order AS (
         |  SELECT l_orderkey, SUM(l_quantity) AS items FROM lineitem GROUP BY l_orderkey)
         |SELECT o.o_orderpriority AS payment_method,
         |  COUNT(o.o_orderkey) AS transaction_count,
         |  ${dsumSql("o.o_totalprice")} AS total_amount,
         |  SUM(COALESCE(p.items, 0)) AS total_items
         |FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      val perOrder = Tables.lineitem(s, dir).groupBy("l_orderkey")
        .agg(sum("l_quantity").as("items"))
      Tables.orders(s, dir)
        .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_orderpriority").as("payment_method"))
        .agg(
          count(col("o_orderkey")).as("transaction_count"),
          dsum(col("o_totalprice")).as("total_amount"),
          sum(coalesce(col("items"), lit(0))).as("total_items"))
    },

    // ---- q04: promo effectiveness (A10: notna filter + agg + post-agg ratio)
    QueryDef.sql("q04_promo_effectiveness",
      s"""SELECT l_returnflag AS promo_code,
         |  COUNT(*) AS usage_count,
         |  ${dsum6Sql("l_extendedprice*l_discount")} AS total_promo_amount,
         |  ${dsumSql("l_extendedprice")} AS total_sales,
         |  ${dsum6Sql("l_extendedprice*l_discount")} / ${dsumSql("l_extendedprice")} * 100
         |    AS avg_discount_ratio
         |FROM lineitem WHERE l_discount > 0
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_discount") > 0)
        .groupBy(col("l_returnflag").as("promo_code"))
        .agg(
          count(lit(1)).as("usage_count"),
          dsum6(col("l_extendedprice") * col("l_discount")).as("total_promo_amount"),
          dsum(col("l_extendedprice")).as("total_sales"))
        .withColumn("avg_discount_ratio",
          col("total_promo_amount") / col("total_sales") * 100)
    },

    // ---- q05: customer LTV (A11 multi-agg + Q-ltv derived metrics,
    // incl. the lifetime==0 -> 1 divisor, sales_analytics_dag.py:188-191)
    QueryDef.sql("q05_customer_ltv",
      s"""WITH base AS (
         |  SELECT o_custkey AS customer_id,
         |    COUNT(o_orderkey) AS frequency,
         |    ${dsumSql("o_totalprice")} AS total_spent,
         |    ${dsumSql("o_totalprice")}/COUNT(o_totalprice) AS avg_order_value,
         |    CAST(MIN(o_orderdate) AS DATE) AS first_purchase,
         |    CAST(MAX(o_orderdate) AS DATE) AS last_purchase
         |  FROM orders GROUP BY 1)
         |SELECT *,
         |  CAST(date_diff('day', first_purchase, last_purchase) AS BIGINT) AS customer_lifetime_days,
         |  frequency / (CASE WHEN date_diff('day', first_purchase, last_purchase) = 0 THEN 1
         |               ELSE date_diff('day', first_purchase, last_purchase) END) AS purchase_rate,
         |  avg_order_value * (frequency / (CASE WHEN date_diff('day', first_purchase, last_purchase) = 0
         |    THEN 1 ELSE date_diff('day', first_purchase, last_purchase) END)) * 365 AS customer_ltv
         |FROM base""".stripMargin) { (s, dir) =>
      val base = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("customer_id"))
        .agg(
          count(col("o_orderkey")).as("frequency"),
          dsum(col("o_totalprice")).as("total_spent"),
          davg(col("o_totalprice")).as("avg_order_value"),
          to_date(min(col("o_orderdate"))).as("first_purchase"),
          to_date(max(col("o_orderdate"))).as("last_purchase"))
      val lifetime = datediff(col("last_purchase"), col("first_purchase"))
      val divisor  = when(lifetime === 0, 1).otherwise(lifetime)
      base
        .withColumn("customer_lifetime_days", lifetime.cast("long"))
        .withColumn("purchase_rate", col("frequency") / divisor)
        .withColumn("customer_ltv",
          col("avg_order_value") * (col("frequency") / divisor) * 365)
    },

    // ---- q18: temporal feature extraction (P14 hour/dayname/month/year)
    QueryDef.sql("q18_temporal_features",
      """SELECT CAST(year(ts) AS BIGINT) AS event_year,
        |  CAST(month(ts) AS BIGINT) AS event_month,
        |  dayname(ts) AS event_day,
        |  CAST(hour(ts) AS BIGINT) AS event_hour,
        |  COUNT(*) AS event_count
        |FROM events GROUP BY 1, 2, 3, 4""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          year(col("ts")).cast("long").as("event_year"),
          month(col("ts")).cast("long").as("event_month"),
          date_format(col("ts"), "EEEE").as("event_day"),
          hour(col("ts")).cast("long").as("event_hour"))
        .agg(count(lit(1)).as("event_count"))
    },

    // ---- q19: transaction-size quantile bins (P13, pd.qcut-alike via ntile)
    QueryDef.sql("q19_txn_size_bins",
      s"""WITH t AS (
         |  SELECT o_totalprice,
         |         NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
         |  FROM orders)
         |SELECT CASE tile WHEN 1 THEN 'Small' WHEN 2 THEN 'Medium'
         |                 WHEN 3 THEN 'Large' ELSE 'Extra Large' END AS transaction_size,
         |  COUNT(*) AS txn_count,
         |  ${dsumSql("o_totalprice")} AS total_amount
         |FROM t GROUP BY 1""".stripMargin) { (s, dir) =>
      // distributed NTILE: orders is the fact table, so the single-window
      // form (Bins.ntileBins) would be a one-task global sort at scale
      val binned = graft.operators.Bins.distributedNtileBins(
        Tables.orders(s, dir), col("o_totalprice"), col("o_orderkey"), 4,
        Seq("Small", "Medium", "Large", "Extra Large"), "transaction_size")
      binned.groupBy("transaction_size")
        .agg(count(lit(1)).as("txn_count"), dsum(col("o_totalprice")).as("total_amount"))
    },

    // ---- q68: transaction-size bins with EXACT pd.qcut semantics (P13's
    // reference behavior: right-closed bins at linear-interpolated quartile
    // edges — q19's ntile equalizes counts instead; both shapes are useful,
    // this one is the reference-parity one)
    QueryDef.sql("q68_qcut_bins",
      s"""WITH e AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1,
         |                  quantile_cont(o_totalprice, 0.5) AS q2,
         |                  quantile_cont(o_totalprice, 0.75) AS q3 FROM orders)
         |SELECT CASE WHEN o_totalprice <= e.q1 THEN 'Small'
         |            WHEN o_totalprice <= e.q2 THEN 'Medium'
         |            WHEN o_totalprice <= e.q3 THEN 'Large'
         |            ELSE 'Extra Large' END AS transaction_size,
         |  COUNT(*) AS txn_count,
         |  ${dsumSql("o_totalprice")} AS total_amount
         |FROM orders, e GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.operators.Bins.qcutBins(Tables.orders(s, dir), "o_totalprice", 4,
          Seq("Small", "Medium", "Large", "Extra Large"), "transaction_size")
        .groupBy("transaction_size")
        .agg(count(lit(1)).as("txn_count"), dsum(col("o_totalprice")).as("total_amount"))
    },

    // ---- q69: full CUBE lattice (q64's rollup sibling — all 2^k grouping
    // combinations in one Expand pass; the cross-tab report shape)
    QueryDef.sql("q69_cube_sales",
      s"""SELECT
         |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
         |       ELSE o_orderpriority END AS priority,
         |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
         |       ELSE o_orderstatus END AS status,
         |  COUNT(*) AS orders,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders
         |GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("orders"), dsum(col("o_totalprice")).as("revenue"),
          grouping(col("o_orderpriority")).as("gp"),
          grouping(col("o_orderstatus")).as("gs"))
        .select(
          when(col("gp") === 1, "ALL").otherwise(col("o_orderpriority")).as("priority"),
          when(col("gs") === 1, "ALL").otherwise(col("o_orderstatus")).as("status"),
          col("orders"), col("revenue"))
    },

    // ---- q79: discount-band effectiveness — fixed-boundary bins (P12) on
    // the FACT table (scale-safe: a CASE projection, no sort/shuffle
    // beyond the final agg), measuring revenue give-back per band.
    QueryDef.sql("q79_discount_bands",
      s"""SELECT CASE WHEN l_discount <= 0.02 THEN 'none'
         |            WHEN l_discount <= 0.05 THEN 'low'
         |            WHEN l_discount <= 0.08 THEN 'mid'
         |            ELSE 'high' END AS discount_band,
         |  COUNT(*) AS line_count,
         |  ${dsumSql("l_extendedprice")} AS gross_revenue,
         |  ${dsum6Sql("l_extendedprice*l_discount")} AS discount_given
         |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("discount_band",
          graft.operators.Bins.fixedBins(col("l_discount"),
            Seq(0.02, 0.05, 0.08), Seq("none", "low", "mid", "high")))
        .groupBy("discount_band")
        .agg(count(lit(1)).as("line_count"),
          dsum(col("l_extendedprice")).as("gross_revenue"),
          dsum6(col("l_extendedprice") * col("l_discount")).as("discount_given"))
    },

    // ---- q23: datetime <-> string round-trip (P20/P7 serialization edges)
    QueryDef.sql("q23_date_roundtrip",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date_str,
        |  strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS order_date_rt
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_date_str"))
        .withColumn("order_date_rt", to_timestamp(col("order_date_str"), "yyyy-MM-dd HH:mm:ss"))
        .orderBy("o_orderkey").limit(1000)
    },

    // ---- q25: semi-join filter (P4/J6 — keep facts of qualifying keys only)
    QueryDef.sql("q25_semi_join_filter",
      """SELECT COUNT(*) AS line_count, SUM(l_quantity) AS total_qty
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l_orderkey AND o_totalprice > 400000)""".stripMargin) { (s, dir) =>
      val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      Tables.lineitem(s, dir)
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("line_count"), sum("l_quantity").as("total_qty"))
    },

    // ---- q81: interval-overlap range join — same-part line items whose
    // transit windows [shipdate, shipdate + derived transit days] overlap
    // (simultaneous-shipment congestion per part). The fixture carries no
    // receipt date, so transit is derived deterministically from the line
    // key — identically in both engines. Spark side goes through
    // graft.operators.RangeJoin (banded equi-join, pairs emitted exactly
    // once, no cross-product per part); the oracle is DuckDB's plain
    // inequality self-join — independent plan, same semantics.
    QueryDef.sql("q81_transit_overlap_pairs",
      """WITH t AS (SELECT l_partkey AS pk, l_orderkey*10 + l_linenumber AS id,
        |  CAST(datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS s,
        |  CAST(datediff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE))
        |       + 1 + (l_orderkey*7 + l_linenumber) % 28 AS BIGINT) AS e
        |  FROM lineitem),
        |p AS (SELECT a.pk, least(a.e, b.e) - greatest(a.s, b.s) + 1 AS ov
        |      FROM t a JOIN t b
        |        ON a.pk = b.pk AND a.id < b.id AND a.s <= b.e AND b.s <= a.e)
        |SELECT pk AS l_partkey, COUNT(*) AS n_pairs,
        |       CAST(SUM(ov) AS BIGINT) AS total_overlap_days
        |FROM p GROUP BY 1""".stripMargin) { (s, dir) =>
      val t = Tables.lineitem(s, dir).select(
          col("l_partkey"),
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("line_id"),
          datediff(to_date(col("l_shipdate")), lit("1990-01-01").cast("date"))
            .cast("long").as("s_day"),
          (lit(1) + (col("l_orderkey") * 7 + col("l_linenumber")) % 28)
            .cast("long").as("transit"))
        .withColumn("e_day", col("s_day") + col("transit"))
      graft.operators.RangeJoin
        .selfOverlapPairs(t, "l_partkey", "line_id", "s_day", "e_day", bandWidth = 16)
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_pairs"),
          sum("overlap_len").cast("long").as("total_overlap_days"))
    },

    // ---- q85: pivot table — revenue by order year (rows) × order status
    // (columns), the pandas pivot_table / SQL conditional-aggregation
    // reshape. Pivot values are DECLARED (no value-discovery job, stable
    // column order); each cell is an exact decimal sum. A status absent in
    // a year yields NULL in both engines.
    QueryDef.sql("q85_status_pivot",
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'O'
         |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
         |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
         |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
         |  CAST(SUM(CASE WHEN o_orderstatus = 'P'
         |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
         |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(dsum(col("o_totalprice")))
    },

    // ---- q86: deterministic stratified sample — per-priority keep rates
    // (URGENT 8/16, HIGH 4/16, rest 2/16) keyed on md5(o_orderkey), the
    // RNG-free class-rebalancing cut. Verified via per-stratum aggregates
    // of the SAMPLED rows, so the oracle checks membership, not just rates.
    QueryDef.sql("q86_stratified_sample",
      s"""SELECT o_orderpriority, COUNT(*) AS kept,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders
         |WHERE instr('0123456789abcdef',
         |    substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1 <
         |  CASE WHEN o_orderpriority = '1-URGENT' THEN 8
         |       WHEN o_orderpriority = '2-HIGH' THEN 4
         |       ELSE 2 END
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.sources.Sampling.stratifiedHashSample(Tables.orders(s, dir),
          col("o_orderpriority"), col("o_orderkey"),
          Map("1-URGENT" -> 8, "2-HIGH" -> 4), defaultSixteenths = 2)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("kept"), dsum(col("o_totalprice")).as("revenue"))
    },

    // ---- q90: set operations beyond union (SO-family completion):
    // EXCEPT = customers who ordered in 1995 but not 1996 (churned),
    // INTERSECT = both years (retained). Both are distinct-set semantics
    // in both engines; one aggregation-style shuffle each.
    QueryDef.sql("q90_set_ops",
      """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE year(o_orderdate) = 1995),
        |y96 AS (SELECT DISTINCT o_custkey FROM orders
        |        WHERE year(o_orderdate) = 1996)
        |SELECT 'churned' AS tag, o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
        |UNION ALL
        |SELECT 'retained' AS tag, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)""".stripMargin) {
      (s, dir) =>
      val orders = Tables.orders(s, dir)
      def inYear(y: Int) = orders.filter(year(col("o_orderdate")) === y)
        .select("o_custkey").distinct()
      val (y95, y96) = (inYear(1995), inYear(1996))
      y95.except(y96).select(lit("churned").as("tag"), col("o_custkey"))
        .unionByName(
          y95.intersect(y96).select(lit("retained").as("tag"), col("o_custkey")))
    },

    // ---- q89: arbitrary GROUPING SETS — the lattice rollup/cube can't
    // express: per-priority totals, per-status totals, and the grand
    // total, WITHOUT the (priority, status) cross cells. One Expand +
    // one aggregation exchange, same single-pass shape as q64/q69.
    QueryDef.sql("q89_grouping_sets",
      s"""SELECT
         |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
         |       ELSE o_orderpriority END AS priority,
         |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
         |       ELSE o_orderstatus END AS status,
         |  COUNT(*) AS orders,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin) {
      (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("__orders_gs")
      s.sql(s"""
        |SELECT
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |       ELSE o_orderpriority END AS priority,
        |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
        |       ELSE o_orderstatus END AS status,
        |  COUNT(*) AS orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM __orders_gs
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin)
    },

    // ---- q64: multi-level rollup (A-family superset: per-(priority,status),
    // per-priority subtotal, and grand total in ONE pass — the reporting
    // shape the reference assembles with three separate pandas groupbys).
    // grouping() disambiguates real NULL keys from rollup subtotal rows.
    QueryDef.sql("q64_rollup_sales",
      s"""SELECT
         |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
         |       ELSE o_orderpriority END AS priority,
         |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
         |       ELSE o_orderstatus END AS status,
         |  COUNT(*) AS orders,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders
         |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("orders"), dsum(col("o_totalprice")).as("revenue"),
          grouping(col("o_orderpriority")).as("gp"),
          grouping(col("o_orderstatus")).as("gs"))
        .select(
          when(col("gp") === 1, "ALL").otherwise(col("o_orderpriority")).as("priority"),
          when(col("gs") === 1, "ALL").otherwise(col("o_orderstatus")).as("status"),
          col("orders"), col("revenue"))
    },

    // ---- q171: PER-GROUP REGRESSION/CORRELATION — the SQL REGR_SLOPE/
    // REGR_INTERCEPT/CORR family as ONE map-side-combining pass of EXACT
    // decimal sums (n, Σx, Σy, Σxy, Σx², Σy² — associative, partition-
    // order-free) with the IEEE closed form applied per group at
    // finalize (round-6 seam). Revenue trend per priority: y =
    // o_totalprice on x = days since 1995-01-01. The oracle mirrors the
    // sums AND the exact double-formula association.
    QueryDef.sql("q171_revenue_trend", {
      val cov = "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))"
      val varx = "(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))"
      val vary = "(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))"
      val slope = s"($cov / $varx)"
      s"""WITH b AS (SELECT o_orderpriority AS g,
         |    CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS DECIMAL(12,2)) AS x,
         |    CAST(o_totalprice AS DECIMAL(18,2)) AS y
         |  FROM orders
         |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
         |s AS (SELECT g, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         |        SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
         |      FROM b GROUP BY 1)
         |SELECT g AS o_orderpriority, n,
         |  ROUND($slope, 6) AS slope,
         |  ROUND((CAST(sy AS DOUBLE) - $slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
         |  ROUND($cov / (sqrt($varx) * sqrt($vary)), 6) AS corr
         |FROM s""".stripMargin
    }) { (s, dir) =>
      graft.operators.Stats.regression(
        Tables.orders(s, dir)
          .withColumn("days", datediff(col("o_orderdate"), lit("1995-01-01"))),
        Seq("o_orderpriority"), "days", "o_totalprice")
    },

    // ---- q172: TWO-SAMPLE KOLMOGOROV–SMIRNOV — the unbinned numeric
    // drift test (PSI sees only its fixed bins): pre- vs post-1997
    // o_totalprice distributions. The sup runs over INTEGER-scaled
    // deviations |cumA·nB − cumB·nA| (exact longs, partition-order-free
    // argmax; ONE double division at the end); cumulative counts come
    // from the range-partitioned two-pass running sum — no single-task
    // global window at full value resolution.
    QueryDef.sql("q172_ks_drift",
      """WITH pts AS (SELECT o_totalprice AS v,
        |    CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END AS ia
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |g AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS an,
        |        CAST(SUM(1 - ia) AS BIGINT) AS bn FROM pts GROUP BY 1),
        |t AS (SELECT CAST(SUM(an) AS BIGINT) AS na,
        |        CAST(SUM(bn) AS BIGINT) AS nb FROM g),
        |c AS (SELECT v, CAST(SUM(an) OVER (ORDER BY v) AS BIGINT) AS ca,
        |        CAST(SUM(bn) OVER (ORDER BY v) AS BIGINT) AS cb FROM g),
        |d AS (SELECT v, ABS(ca * t.nb - cb * t.na) AS dd FROM c, t),
        |m AS (SELECT CAST(MAX(dd) AS BIGINT) AS mx FROM d)
        |SELECT t.na AS n_a, t.nb AS n_b,
        |  ROUND(CAST(m.mx AS DOUBLE) /
        |    (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)), 6) AS ks_stat,
        |  (SELECT MIN(v) FROM d WHERE dd = m.mx) AS at_value
        |FROM t, m""".stripMargin) { (s, dir) =>
      graft.llm.Drift.ks2Sample(Tables.orders(s, dir), "o_totalprice",
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    },

    // ---- q174: EXACT PER-GROUP MEDIAN — the order statistic at rank
    // (n+1) div 2 (lower median, total order via the key tie-break),
    // complementing q158's bucket-resolution sketch median with the
    // exact answer: skew-safe grouped rank + a broadcast count join —
    // no per-group sort window, no percentile_approx.
    QueryDef.sql("q174_group_median",
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS rnk,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
        |  o_totalprice AS median_price
        |FROM r WHERE rnk = (n + 1) // 2""".stripMargin) { (s, dir) =>
      import graft.operators.Ranks
      val o = Tables.orders(s, dir)
        .select("o_orderpriority", "o_totalprice", "o_orderkey")
      val ranked = Ranks.groupedRowNumber(o, Seq("o_orderpriority"),
        Seq(col("o_totalprice").asc, col("o_orderkey").asc), "rnk")
      val counts = o.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      ranked.join(broadcast(counts), Seq("o_orderpriority"))
        .filter(col("rnk") === ((col("n") + 1) / 2).cast("int"))
        .select(col("o_orderpriority"), col("n"),
          col("o_totalprice").as("median_price"))
    },

    // ---- q175: STRAIGHT-LINE PRORATION — each order's revenue spread
    // over 3 months in INTEGER CENTS (per = cents div 3, the last month
    // carries the remainder — conservation is exact by construction and
    // the arithmetic is engine-portable where decimal division is not).
    // The deferred-revenue / subscription-recognition allocation shape:
    // one posexplode (×3 fan-out, no shuffle before the agg).
    QueryDef.sql("q175_revenue_proration",
      """WITH b AS (SELECT o_orderkey, o_orderdate,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) // 3 AS per
        |  FROM orders),
        |a AS (SELECT o_orderkey,
        |    strftime(o_orderdate + i * INTERVAL 1 MONTH, '%Y-%m') AS month,
        |    CASE WHEN i < 2 THEN per ELSE cents - 2 * per END AS alloc
        |  FROM b, unnest([0, 1, 2]) AS t(i))
        |SELECT month, COUNT(*) AS allocations,
        |  CAST(SUM(alloc) AS DOUBLE) / 100.0 AS amount
        |FROM a GROUP BY 1""".stripMargin) { (s, dir) =>
      val b = Tables.orders(s, dir)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("per", expr("cents div 3"))
      b.select(col("o_orderkey"), col("o_orderdate"),
          posexplode(array(col("per"), col("per"),
            col("cents") - lit(2) * col("per"))).as(Seq("i", "alloc")))
        .groupBy(date_format(add_months(col("o_orderdate"), col("i")), "yyyy-MM")
          .as("month"))
        .agg(count(lit(1)).as("allocations"),
          (sum(col("alloc")).cast("double") / 100.0).as("amount"))
    },

    // ---- q179: IQR ANOMALY DAYS — the metrics-observability gate: daily
    // revenue outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR], with the quartiles
    // taken as EXACT order statistics at ceil(q·n) over the bounded
    // daily aggregate via the range-partitioned global rank (no
    // single-task window even though the day table is small — the same
    // plan works when "daily" becomes "per key-minute"). Bounds ride as
    // pinned scalar columns so the verdict is self-describing.
    QueryDef.sql("q179_revenue_anomalies",
      s"""WITH d AS (SELECT o_orderdate AS day, ${dsumSql("o_totalprice")} AS revenue
         |           FROM orders GROUP BY 1),
         |r AS (SELECT day, revenue,
         |        ROW_NUMBER() OVER (ORDER BY revenue, day) AS rnk,
         |        COUNT(*) OVER () AS n
         |      FROM d),
         |q AS (SELECT
         |        (SELECT revenue FROM r WHERE rnk = CAST(ceil(0.25 * n) AS BIGINT) LIMIT 1) AS q1,
         |        (SELECT revenue FROM r WHERE rnk = CAST(ceil(0.75 * n) AS BIGINT) LIMIT 1) AS q3
         |      FROM (SELECT DISTINCT n FROM r))
         |SELECT d.day, d.revenue, q.q1, q.q3,
         |  q.q1 - 1.5 * (q.q3 - q.q1) AS lo_bound,
         |  q.q3 + 1.5 * (q.q3 - q.q1) AS hi_bound
         |FROM d, q
         |WHERE d.revenue < q.q1 - 1.5 * (q.q3 - q.q1)
         |   OR d.revenue > q.q3 + 1.5 * (q.q3 - q.q1)""".stripMargin) { (s, dir) =>
      import graft.operators.Ranks
      val d = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("day"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
      val ranked = Ranks.globalRowNumber(d,
        Seq(col("revenue").asc, col("day").asc), "rnk")
      val n = d.agg(count(lit(1)).as("n"))
      val withN = ranked.crossJoin(broadcast(n))
      def statAt(q: Double, name: String) = withN
        .filter(col("rnk") === ceil(lit(q) * col("n")).cast("long"))
        .agg(min(col("revenue")).as(name)) // exactly one row matches
      val bounds = broadcast(statAt(0.25, "q1"))
        .crossJoin(broadcast(statAt(0.75, "q3")))
      d.crossJoin(broadcast(bounds))
        .withColumn("lo_bound", col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .withColumn("hi_bound", col("q3") + lit(1.5) * (col("q3") - col("q1")))
        .filter(col("revenue") < col("lo_bound") ||
          col("revenue") > col("hi_bound"))
        .select("day", "revenue", "q1", "q3", "lo_bound", "hi_bound")
    },

    // ---- q180: PERCENT-RANK TRANSFORM — the feature-engineering
    // normalization (value → rank percentile in [0,1]) computed with the
    // distributed global rank instead of a one-task PERCENT_RANK window;
    // the (price, key) total order makes rank == row_number, so the SQL
    // PERCENT_RANK replay is bit-equal. Round-6 on the one division.
    QueryDef.sql("q180_percent_rank",
      """SELECT o_orderkey,
        |  ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6)
        |    AS price_pctl
        |FROM orders""".stripMargin) { (s, dir) =>
      import graft.operators.Ranks
      val o = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
      val ranked = Ranks.globalRowNumber(o,
        Seq(col("o_totalprice").asc, col("o_orderkey").asc), "rnk")
      // single-row input pins to 0 (SQL PERCENT_RANK semantics) instead
      // of the NULL a 0/0 division would yield — the q183 guard idiom
      ranked.crossJoin(broadcast(o.agg(count(lit(1)).as("n"))))
        .select(col("o_orderkey"),
          when(col("n") === 1, 0.0).otherwise(
            round((col("rnk") - 1).cast("double") /
              (col("n") - 1).cast("double"), 6)).as("price_pctl"))
    },

    // ---- q181: CORRELATION MATRIX — pairwise Pearson over three
    // lineitem measures in ONE aggregation pass of exact DECIMAL(18,6)
    // sums (listwise-complete n; the profiling "which measures move
    // together" panel). Oracle mirrors the sums and the exact double-
    // formula association.
    QueryDef.sql("q181_corr_matrix", {
      // width 24 (> 18) forces DuckDB's hugeint decimal path — the
      // int64 path overflows on the squared products; values are
      // identical, so the double casts still match Spark's DECIMAL(18,6)
      // sums exactly
      def dc(c: String) = s"CAST($c AS DECIMAL(24,6))"
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val sums = (Seq("COUNT(*) AS n") ++
        cs.flatMap(c => Seq(s"SUM(${dc(c)}) AS s_$c",
          s"SUM(${dc(c)} * ${dc(c)}) AS ss_$c")) ++
        (for { i <- cs.indices; j <- (i + 1) until cs.size }
          yield s"SUM(${dc(cs(i))} * ${dc(cs(j))}) AS sp_${cs(i)}__${cs(j)}"))
        .mkString(",\n|        ")
      val rows = (for { i <- cs.indices; j <- (i + 1) until cs.size } yield {
        val (a, b) = (cs(i), cs(j))
        val cov = s"(CAST(n AS DOUBLE)*CAST(sp_${a}__$b AS DOUBLE) - CAST(s_$a AS DOUBLE)*CAST(s_$b AS DOUBLE))"
        val va = s"(CAST(n AS DOUBLE)*CAST(ss_$a AS DOUBLE) - CAST(s_$a AS DOUBLE)*CAST(s_$a AS DOUBLE))"
        val vb = s"(CAST(n AS DOUBLE)*CAST(ss_$b AS DOUBLE) - CAST(s_$b AS DOUBLE)*CAST(s_$b AS DOUBLE))"
        s"SELECT '$a' AS col_a, '$b' AS col_b, n,\n|  ROUND($cov / (sqrt($va) * sqrt($vb)), 6) AS corr FROM s"
      }).mkString("\n|UNION ALL ")
      s"""WITH s AS (SELECT
         |        $sums
         |      FROM lineitem
         |      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
         |        AND l_discount IS NOT NULL)
         |$rows""".stripMargin
    }) { (s, dir) =>
      graft.operators.Stats.correlationMatrix(Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
    }
  )
}
