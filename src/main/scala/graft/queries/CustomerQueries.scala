package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Aggregates._
import graft.operators.{Bins, Temporal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Customer-analytics queries (reference customer_analytics_dag.py →
  * customer/orders/events per FIXTURES.md §B). All "today"-relative logic is
  * pinned to `asOf = 2002-01-01` (SURVEY §7.4.2 — the reference's `now()` is
  * nondeterministic by construction).
  */
object CustomerQueries {

  private val asOf = "2002-01-01"
  private val dsumSql = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** Customer dim: first purchase, tenure, P12 segment bins, P9 age formula
    * (on first purchase date — the fixture schema has no birthdate). */
  private def customerDim(s: SparkSession, dir: String): DataFrame = {
    val firstOrder = Tables.orders(s, dir).groupBy("o_custkey")
      .agg(to_date(min(col("o_orderdate"))).as("first_join_date"))
    val asOfCol = lit(asOf).cast("date")
    Tables.customer(s, dir)
      .join(firstOrder, col("c_custkey") === col("o_custkey"), "left")
      .drop("o_custkey")
      .withColumn("customer_tenure_days",
        Temporal.tenureDays(col("first_join_date"), asOfCol).cast("long"))
      .withColumn("customer_segment",
        Bins.fixedBins(col("customer_tenure_days"), Seq(365d, 730d, 1825d),
          Seq("New", "Regular", "Loyal", "VIP")))
      .withColumn("age_years",
        Temporal.ageAt(col("first_join_date"), asOfCol).cast("long"))
  }

  private val customerDimSql =
    s"""SELECT c.*, f.first_join_date,
       |  CAST(date_diff('day', f.first_join_date, DATE '$asOf') AS BIGINT) AS customer_tenure_days,
       |  CASE WHEN f.first_join_date IS NULL THEN NULL
       |       WHEN date_diff('day', f.first_join_date, DATE '$asOf') <= 365 THEN 'New'
       |       WHEN date_diff('day', f.first_join_date, DATE '$asOf') <= 730 THEN 'Regular'
       |       WHEN date_diff('day', f.first_join_date, DATE '$asOf') <= 1825 THEN 'Loyal'
       |       ELSE 'VIP' END AS customer_segment,
       |  CAST(year(DATE '$asOf') - year(f.first_join_date) -
       |    (CASE WHEN month(DATE '$asOf') < month(f.first_join_date)
       |            OR (month(DATE '$asOf') = month(f.first_join_date)
       |                AND day(DATE '$asOf') < day(f.first_join_date))
       |          THEN 1 ELSE 0 END) AS BIGINT) AS age_years
       |FROM customer c LEFT JOIN (
       |  SELECT o_custkey, CAST(MIN(o_orderdate) AS DATE) AS first_join_date
       |  FROM orders GROUP BY 1) f
       |ON c.c_custkey = f.o_custkey""".stripMargin

  /** J3+A2 behavior: events ⋈ orders on the customer key (inner — the
    * reference's IS NOT NULL post-filter makes its left join effectively
    * inner), keeping the row multiplicity a customer's k orders induce
    * (SURVEY §7.4.6), then per-customer distinct/count aggs. */
  private def behavior(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("user_id") === col("o_custkey"))
      .groupBy("user_id")
      .agg(
        countDistinct(col("o_orderkey")).as("total_sessions"),
        count(col("event_id")).as("total_events"))
      .withColumn("events_per_session", col("total_events") / col("total_sessions"))

  private val behaviorSql =
    """SELECT e.user_id,
      |  COUNT(DISTINCT o.o_orderkey) AS total_sessions,
      |  COUNT(e.event_id) AS total_events,
      |  COUNT(e.event_id) / COUNT(DISTINCT o.o_orderkey) AS events_per_session
      |FROM events e JOIN orders o ON e.user_id = o.o_custkey
      |GROUP BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- q12: customer dimension build (P9 age, P10 tenure, P12 bins)
    QueryDef.sql("q12_customer_dim",
      s"""WITH d AS ($customerDimSql)
         |SELECT c_custkey, c_name, c_nationkey, first_join_date,
         |       customer_tenure_days, customer_segment, age_years
         |FROM d""".stripMargin) { (s, dir) =>
      customerDim(s, dir).select("c_custkey", "c_name", "c_nationkey",
        "first_join_date", "customer_tenure_days", "customer_segment", "age_years")
    },

    // ---- q13: per-location rollup (A1: count + avg age + avg tenure)
    QueryDef.sql("q13_location_agg",
      s"""WITH d AS ($customerDimSql)
         |SELECT c_nationkey AS home_location,
         |  COUNT(c_custkey) AS customer_count,
         |  ${dsumSql("c_acctbal")}/COUNT(c_acctbal) AS avg_acctbal,
         |  CAST(SUM(customer_tenure_days) AS DOUBLE)/COUNT(customer_tenure_days) AS avg_tenure_days
         |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
      customerDim(s, dir)
        .groupBy(col("c_nationkey").as("home_location"))
        .agg(
          count(col("c_custkey")).as("customer_count"),
          davg(col("c_acctbal")).as("avg_acctbal"),
          (sum(col("customer_tenure_days")).cast("double") /
            count(col("customer_tenure_days"))).as("avg_tenure_days"))
    },

    // ---- q14: clickstream behavior (J3 big join + A2 countDistinct + P8 ratio)
    QueryDef.sql("q14_customer_behavior", behaviorSql) { (s, dir) => behavior(s, dir) },

    // ---- q15: behavior x segment rollup (J4 + segment-level means)
    QueryDef.sql("q15_behavior_by_segment",
      s"""WITH d AS ($customerDimSql), b AS ($behaviorSql)
         |SELECT d.customer_segment,
         |  COUNT(*) AS users,
         |  CAST(SUM(b.total_events) AS DOUBLE)/COUNT(b.total_events) AS avg_events,
         |  CAST(SUM(CAST(b.events_per_session AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(b.events_per_session) AS avg_events_per_session
         |FROM b LEFT JOIN d ON b.user_id = d.c_custkey
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      behavior(s, dir)
        .join(customerDim(s, dir).select(col("c_custkey"), col("customer_segment")),
          col("user_id") === col("c_custkey"), "left")
        .groupBy("customer_segment")
        .agg(
          count(lit(1)).as("users"),
          (sum(col("total_events")).cast("double") / count(col("total_events"))).as("avg_events"),
          (sum(col("events_per_session").cast(DecimalType(18, 6))).cast("double") /
            count(col("events_per_session"))).as("avg_events_per_session"))
    },

    // ---- q16: value counts (A14/T2 — top-10 event types)
    QueryDef.sql("q16_event_type_counts",
      """SELECT event_type, COUNT(*) AS cnt FROM events
        |GROUP BY 1 ORDER BY cnt DESC, event_type LIMIT 10""".stripMargin) { (s, dir) =>
      valueCounts(Tables.events(s, dir), "event_type", 10)
    },

    // ---- q20: fixed-boundary bins (P12 standalone, pd.cut semantics)
    QueryDef.sql("q20_fixed_bins",
      s"""SELECT CASE WHEN c_acctbal IS NULL THEN NULL
         |            WHEN c_acctbal <= 2500 THEN 'Low'
         |            WHEN c_acctbal <= 5000 THEN 'Mid'
         |            WHEN c_acctbal <= 7500 THEN 'High'
         |            ELSE 'Top' END AS balance_band,
         |  COUNT(*) AS customers,
         |  ${dsumSql("c_acctbal")} AS total_balance
         |FROM customer GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .withColumn("balance_band",
          Bins.fixedBins(col("c_acctbal"), Seq(2500d, 5000d, 7500d), Seq("Low", "Mid", "High", "Top")))
        .groupBy("balance_band")
        .agg(count(lit(1)).as("customers"), dsum(col("c_acctbal")).as("total_balance"))
    },

    // ---- q24: JSON field extraction (S5 — event_metadata equivalent)
    QueryDef.sql("q24_json_extract",
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS BIGINT) AS k_val
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*([0-9]+)", 1).cast("long").as("k_val"))
        .orderBy("event_id").limit(1000)
    },

    // ---- q29: dataset profiling (A13 — complete_analyzer.py parity)
    QueryDef.sql("q29_profile_orders",
      s"""SELECT COUNT(*) AS total_rows,
         |  COUNT(DISTINCT o_custkey) AS distinct_customers,
         |  COUNT(DISTINCT o_orderstatus) AS distinct_statuses,
         |  COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS null_dates,
         |  CAST(MIN(o_orderdate) AS DATE) AS min_date,
         |  CAST(MAX(o_orderdate) AS DATE) AS max_date,
         |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).agg(
        count(lit(1)).as("total_rows"),
        countDistinct(col("o_custkey")).as("distinct_customers"),
        countDistinct(col("o_orderstatus")).as("distinct_statuses"),
        count(when(col("o_orderdate").isNull, 1)).as("null_dates"),
        to_date(min(col("o_orderdate"))).as("min_date"),
        to_date(max(col("o_orderdate"))).as("max_date"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        dsum(col("o_totalprice")).as("sum_price"))
    },

    // ---- q58: gap-based sessionization (session_window — ST1; identical
    // plan runs on the stream, StreamingSpec asserts stream==batch). Oracle
    // chains events via lag + cumulative sum; compared on (user, start,
    // events) — the end-time convention (last+gap) is Spark-specific.
    QueryDef.sql("q58_session_windows",
      """WITH d AS (
        |  SELECT user_id, ts,
        |    -- >= (not >): session_window merges only strictly-overlapping
        |    -- [ts, ts+gap) windows, so a gap of exactly 30 min splits
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts,
        |        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM d)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS events
        |FROM s GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      graft.streaming.Sessionize.sessionWindows(
          Tables.events(s, dir).select("user_id", "ts"), "30 minutes")
        .select(col("user_id"), col("session_start"), col("events"))
    },

    // ---- q30: event-time tumbling windows (ST1 batch parity; the streaming
    // variant over the same agg is covered in streaming/Events + tests)
    QueryDef.sql("q70_rfm_segmentation",
      s"""WITH c AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '$asOf') AS BIGINT)
         |      AS recency_days,
         |    COUNT(*) AS frequency,
         |    ${dsumSql("o_totalprice")} AS monetary
         |  FROM orders GROUP BY 1)
         |SELECT o_custkey, recency_days, frequency, monetary,
         |  CAST(NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey) * 100
         |    + NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) * 10
         |    + NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT)
         |    AS rfm_score
         |FROM c""".stripMargin) { (s, dir) =>
      // RFM segmentation: the classic e-commerce customer scoring the
      // reference's LTV table approximates. recency ranks ascending (most
      // recent buyers first), frequency/monetary descending; customer key
      // breaks ties so each ordering is total. Per-customer aggregate input
      // is billions of rows at 100 TB, so each of the three NTILEs uses the
      // distributed two-pass rank (Ranks.distributedNtile) instead of an
      // un-partitioned window — NTILE-exact, no single-task sort.
      import graft.operators.Ranks.distributedNtile
      val base = Tables.orders(s, dir).groupBy(col("o_custkey")).agg(
        datediff(lit(asOf).cast("date"), to_date(max(col("o_orderdate"))))
          .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        dsum(col("o_totalprice")).as("monetary"))
      val scored = distributedNtile(
        distributedNtile(
          distributedNtile(base,
            Seq(col("recency_days").asc, col("o_custkey").asc), 5, "__r"),
          Seq(col("frequency").desc, col("o_custkey").asc), 5, "__f"),
        Seq(col("monetary").desc, col("o_custkey").asc), 5, "__m")
      scored.select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"),
        (col("__r") * 100 + col("__f") * 10 + col("__m"))
          .cast("long").as("rfm_score"))
    },

    QueryDef.sql("q71_cohort_retention",
      """WITH first AS (
        |  SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
        |  FROM orders GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS m
        |  FROM orders)
        |SELECT CAST(f.cohort AS DATE) AS cohort_month,
        |  CAST(date_diff('month', f.cohort, a.m) AS BIGINT) AS months_since,
        |  COUNT(DISTINCT a.o_custkey) AS active_customers
        |FROM first f JOIN act a ON f.o_custkey = a.o_custkey
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      // cohort retention matrix: customers bucketed by first-order month,
      // counted in each subsequent active month. Two aggs + one key join —
      // no windows, shuffles only on o_custkey and the output keys.
      val orders = Tables.orders(s, dir)
      val first = orders.groupBy(col("o_custkey"))
        .agg(date_trunc("month", min(col("o_orderdate"))).as("cohort"))
      val act = orders
        .select(col("o_custkey").as("a_custkey"),
          date_trunc("month", col("o_orderdate")).as("m"))
        .distinct()
      first.join(act, col("o_custkey") === col("a_custkey"))
        .groupBy(to_date(col("cohort")).as("cohort_month"),
          months_between(col("m"), col("cohort")).cast("long").as("months_since"))
        .agg(countDistinct(col("a_custkey")).as("active_customers"))
    },

    QueryDef.sql("q72_moving_average",
      s"""WITH d AS (
         |  SELECT CAST(o_orderdate AS DATE) AS sale_date,
         |    ${dsumSql("o_totalprice")} AS daily_total
         |  FROM orders GROUP BY 1)
         |SELECT sale_date, daily_total,
         |  CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) OVER (ORDER BY sale_date
         |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    / COUNT(*) OVER (ORDER BY sale_date
         |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7,
         |  CAST(SUM(CAST(daily_total AS DECIMAL(18,2))) OVER (ORDER BY sale_date
         |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
         |FROM d""".stripMargin) { (s, dir) =>
      // moving/running window aggregates over the daily series — the frame
      // clause family (ROWS BETWEEN) q27's ranking suite doesn't cover.
      // Ordered window over date-cardinality rows (dimension-scale).
      // Frame sums accumulate in DECIMAL: engines are free to reassociate
      // windowed double sums (DuckDB uses a segment tree), so only exact
      // decimal partials are order-independent and oracle-comparable.
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("sale_date"))
        .agg(dsum(col("o_totalprice")).as("daily_total"))
      val byDate = Window.orderBy(col("sale_date"))
      val week = byDate.rowsBetween(-6, 0)
      val dec = col("daily_total").cast(DecimalType(18, 2))
      daily.select(col("sale_date"), col("daily_total"),
        (sum(dec).over(week).cast("double") / count(lit(1)).over(week)).as("ma7"),
        sum(dec).over(byDate.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_total"))
    },

    QueryDef.sql("q73_yoy_growth",
      s"""WITH y AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |    ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1)
         |SELECT yr, revenue,
         |  LAG(revenue) OVER (ORDER BY yr) AS prev_revenue,
         |  (revenue - LAG(revenue) OVER (ORDER BY yr))
         |    / LAG(revenue) OVER (ORDER BY yr) * 100 AS yoy_pct
         |FROM y""".stripMargin) { (s, dir) =>
      // year-over-year growth via LAG — the offset window function the
      // ranking suite (q27) doesn't cover. revenue is already an exact
      // decimal-summed double, so the ratio arithmetic is deterministic.
      import org.apache.spark.sql.expressions.Window
      val byYear = Window.orderBy(col("yr"))
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .select(col("yr"), col("revenue"),
          lag(col("revenue"), 1).over(byYear).as("prev_revenue"),
          ((col("revenue") - lag(col("revenue"), 1).over(byYear))
            / lag(col("revenue"), 1).over(byYear) * 100).as("yoy_pct"))
    },

    QueryDef.sql("q75_conversion_funnel",
      """WITH u AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        |  FROM events GROUP BY 1)
        |SELECT COUNT(*) AS users,
        |  COUNT(t_signup) AS signed_up,
        |  CAST(SUM(CASE WHEN t_view >= t_signup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS viewed_after_signup,
        |  CAST(SUM(CASE WHEN t_click >= t_view AND t_view >= t_signup
        |           THEN 1 ELSE 0 END) AS BIGINT) AS clicked_in_order,
        |  CAST(SUM(CASE WHEN t_buy >= t_click AND t_click >= t_view
        |                AND t_view >= t_signup
        |           THEN 1 ELSE 0 END) AS BIGINT) AS purchased_in_order
        |FROM u""".stripMargin) { (s, dir) =>
      // order-sensitive conversion funnel: each user's FIRST touch per
      // stage must be monotonic through signup -> view -> click ->
      // purchase. One per-user aggregation + one global fold; null stage
      // timestamps fail the comparisons on both engines identically.
      def firstTs(t: String) = min(when(col("event_type") === t, col("ts")))
      val u = Tables.events(s, dir).groupBy(col("user_id")).agg(
        firstTs("signup").as("t_signup"), firstTs("view").as("t_view"),
        firstTs("click").as("t_click"), firstTs("purchase").as("t_buy"))
      def inOrder(c: org.apache.spark.sql.Column) =
        sum(when(c, 1).otherwise(0)).cast("long")
      u.agg(count(lit(1)).as("users"),
        count(col("t_signup")).as("signed_up"),
        inOrder(col("t_view") >= col("t_signup")).as("viewed_after_signup"),
        inOrder(col("t_click") >= col("t_view")
          && col("t_view") >= col("t_signup")).as("clicked_in_order"),
        inOrder(col("t_buy") >= col("t_click") && col("t_click") >= col("t_view")
          && col("t_view") >= col("t_signup")).as("purchased_in_order"))
    },

    // ---- q80: as-of join — each purchase attributed to the same user's
    // most recent prior marketing touch (click/view), pandas merge_asof /
    // kdb aj semantics. graft.operators.AsofJoin is the union-and-carry-
    // forward form: ONE shuffle on user_id, no pair explosion (the range-
    // join-then-argmax form is O(|purchases|·|touches|) per user). DuckDB
    // expresses the same operator natively as ASOF JOIN, which makes the
    // oracle an independent engine's implementation, not a re-derivation.
    // ts is cast to microsecond precision on the DuckDB side (its parquet
    // reader keeps the nanos the fixture writes; Spark-side Tables.events
    // truncates to micros). Gap is exact integer epoch-micro arithmetic.
    QueryDef.sql("q80_asof_attribution",
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS touch_event_id,
        |             event_type AS touch_type, CAST(ts AS TIMESTAMP) AS touch_ts
        |      FROM events WHERE event_type IN ('click', 'view'))
        |SELECT p.event_id, p.user_id, p.ts,
        |       t.touch_ts AS asof_ts, t.touch_event_id, t.touch_type,
        |       epoch_us(p.ts) - epoch_us(t.touch_ts) AS gap_us
        |FROM p ASOF LEFT JOIN t
        |  ON p.user_id = t.user_id AND p.ts >= t.touch_ts""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_user"), col("ts").as("touch_ts"),
          col("event_id").as("touch_event_id"), col("event_type").as("touch_type"))
      // tieBreak makes the carried touch deterministic if the fixture ever
      // gains two touches at identical (user_id, ts); DuckDB's ASOF picks
      // arbitrarily among exact ties too, so the oracle stays comparable
      // only while such ties are absent — determinism here keeps a future
      // mismatch stable and diagnosable rather than partition-order flaky.
      graft.operators.AsofJoin.asof(purchases, touches,
          leftKey = "user_id", rightKey = "t_user",
          leftTs = "ts", rightTs = "touch_ts",
          payload = Seq("touch_event_id", "touch_type"),
          tieBreak = Seq("touch_event_id"))
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("asof_ts")))
    },

    // ---- q112: HLL sketch rollup — count-distinct made ALGEBRAIC: daily
    // per-type 4 KB sketches (the pre-aggregated table a 100 TB warehouse
    // maintains incrementally), merged for the all-time estimate. Uses
    // graft.operators.Hll (classic register-max HLL) rather than Spark's
    // hll_sketch_agg because the DataSketches estimate is partition-layout
    // -dependent (measured ±1% drift 1 vs 32 partitions) and so cannot
    // back a deterministic gate — ours is a pure function of the item set.
    // The exact countDistinct rides along so the snapshot documents the
    // sketch error. Not SQL-oracle-able (DuckDB has no matching sketch) →
    // golden gate; SqlFunctionsSpec pins re-aggregation == one-shot,
    // partitioning-independence, and the error bound.
    QueryDef.golden("q112_hll_sketch_rollup") { (s, dir) =>
      import graft.operators.Hll
      val ev = Tables.events(s, dir)
      val daily = ev
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(Hll.sketch(col("user_id")).as("sk"), count(lit(1)).as("n"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      daily.groupBy("event_type")
        .agg(Hll.estimate(Hll.union(col("sk"))).as("approx_users"),
          sum(col("n")).as("events"))
        .join(exact, Seq("event_type"))
    },

    // ---- q112a: INDEPENDENT error audit for the golden-gated q112, the
    // q43a trick applied to the sketch: the HLL hash family isn't
    // SQL-expressible, but its ERROR BOUND against exact distincts is.
    // Spark keeps only the groups whose merged-sketch estimate lands
    // within 5% of the exact count (measured worst: 0.4% at sf0.1, 0 at
    // sf0.01 — the bound is ~3x headroom on the 4 KB sketch's theoretical
    // 1.6% sigma) and emits (event_type, exact_users); the oracle is the
    // full exact-distinct SQL. A sketch whose estimate drifts out of
    // bound drops its group and fails the row/hash gate — every round,
    // independently of the golden snapshot's determinism replay.
    QueryDef.sql("q112a_hll_error_audit",
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Hll
      val ev = Tables.events(s, dir)
      val daily = ev
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(Hll.sketch(col("user_id")).as("sk"))
      val merged = daily.groupBy("event_type")
        .agg(Hll.estimate(Hll.union(col("sk"))).as("approx_users"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.join(exact, Seq("event_type"))
        .filter(abs(col("approx_users") - col("exact_users"))
          <= lit(0.05) * col("exact_users"))
        .select(col("event_type"), col("exact_users"))
        .orderBy("event_type")
    },

    // ---- q109: bloom-pruned fact join — the explicit runtime-filter
    // shape: dim keys (qualifying customers) fold into one bloom sketch,
    // the orders fact is might_contain-filtered BEFORE its join shuffle,
    // and the join drops the false positives, so the result is exactly the
    // plain join (which is what the oracle runs). SourcesSpec pins the
    // plan (might_contain probe present, pruning ≤ exact-match superset).
    QueryDef.sql("q109_bloom_pruned_join",
      s"""SELECT c_mktsegment, COUNT(*) AS orders,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_acctbal > 5000 GROUP BY 1""".stripMargin) { (s, dir) =>
      val dim = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
      graft.operators.RuntimeFilters.bloomPrunedJoin(
          Tables.orders(s, dir), dim, "o_custkey", "c_custkey",
          expectedDimKeys = 1000000L)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("orders"), dsum(col("o_totalprice")).as("revenue"))
    },

    // ---- q138: the skew toolkit under an oracle gate (r9 verdict item 4;
    // §2.12's last spec-only row graduates). A deliberately 90%-skewed
    // fact — every lineitem with l_orderkey % 10 < 9 collapses onto
    // skew key 0 — joins nation through Skew.saltedJoin (fact salted by
    // content hash, dim replicated via explode(sequence) so every salted
    // bucket still finds its match) and aggregates through Skew.saltedAgg
    // (partial per (key, salt), merge per key). The oracle is the PLAIN
    // join + GROUP BY: per-nation COUNT(*) makes the gate
    // multiplicity-exact (any duplicated or dropped fact row under
    // salting shifts a count), and the decimal revenue sum stays exact
    // through partial→merge (decimals all the way; one double cast at the
    // end). PlanShapeSpec pins the salted shape itself: dim side carries
    // Generate(explode(sequence)), and the hot key's rows really spread
    // across multiple reducers.
    QueryDef.sql("q138_salted_skew_join",
      s"""WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
         |                       ELSE l_partkey % 25 END AS skew_key,
         |                  l_extendedprice
         |           FROM lineitem)
         |SELECT n.n_name AS nation, COUNT(*) AS line_count,
         |  ${dsumSql("f.l_extendedprice")} AS revenue
         |FROM f JOIN nation n ON f.skew_key = n.n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // cold branch keys off l_partkey (dense) — l_orderkey's sparse key
      // pattern reaches only 6 of 25 nations at sf0.01
      val fact = Tables.lineitem(s, dir).select(
        when(col("l_orderkey") % 10 < 9, lit(0L))
          .otherwise(col("l_partkey") % 25).as("skew_key"),
        col("l_extendedprice"))
      val dim = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      val joined = graft.operators.Skew.saltedJoin(
        fact, dim, "skew_key", "n_nationkey", salts = 8)
      graft.operators.Skew.saltedAgg(joined, col("n_name").as("nation"),
          salts = 8, Map(
            "line_count" -> (count(lit(1)), sum(col("line_count"))),
            "revenue" -> (sum(col("l_extendedprice").cast(DecimalType(18, 2))),
              sum(col("revenue")).cast("double"))))
        .orderBy("nation")
    },

    QueryDef.sql("q30_event_windows",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS window_day, event_type,
        |  COUNT(*) AS events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          to_date(date_trunc("DAY", col("ts"))).as("window_day"),
          col("event_type"))
        .agg(count(lit(1)).as("events"), dsum(col("value")).as("total_value"))
    },

    // ---- q169: ROLLING 7-DAY DISTINCT USERS via HLL sketch merges —
    // the sliding count-distinct a 100 TB event table cannot afford
    // exactly (every window would rescan 7 days of raw events): daily
    // user sketches are built ONCE, each day's window unions 7 of the
    // 4 KB sketches. Join-free: each daily sketch EXPLODES to the ≤7
    // window days it serves (sequence+explode — an equi-shaped plan, no
    // range join), windows clamped to days present in data. Gate uses
    // the q152 audit idiom: Spark emits the DuckDB-derivable
    // (day, exact users_7d) row only where the merged-sketch estimate is
    // within 5% of the exact windowed count — a merge or accuracy bug
    // drops rows and fails rows_match.
    QueryDef.sql("q169_rolling_distinct",
      """WITH p AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |d AS (SELECT DISTINCT day FROM p),
        |w AS (SELECT d.day, p.user_id
        |      FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day)
        |SELECT day, COUNT(DISTINCT user_id) AS users_7d
        |FROM w GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.Hll
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val days = ev.select("day").distinct()
      def windowed(df: DataFrame) = df
        .withColumn("d", explode(sequence(col("day"), date_add(col("day"), 6))))
        .join(broadcast(days.withColumnRenamed("day", "d")), Seq("d"), "left_semi")
      val est = windowed(ev.groupBy("day").agg(Hll.sketch(col("user_id")).as("h")))
        .groupBy("d").agg(Hll.union(col("h")).as("h"))
        .select(col("d"), Hll.estimate(col("h")).as("est"))
      val exact = windowed(ev.distinct())
        .groupBy("d").agg(countDistinct(col("user_id")).as("users_7d"))
      exact.join(est, Seq("d"))
        .filter(abs(col("est") - col("users_7d")) <= lit(0.05) * col("users_7d"))
        .select(col("d").as("day"), col("users_7d"))
    },

    // ---- q173: CHI-SQUARE CATEGORICAL DRIFT — event-type mix, first
    // vs second half of the month (the categorical companion to q172's
    // KS and q141's PSI): per-category round-6 terms Σ(O−E)²/E with
    // margin-product expectations, TOTAL as the DECIMAL(18,6) sum of
    // rounded terms (partition-order-free — the PSI total recipe). The
    // oracle mirrors the double-formula association exactly.
    QueryDef.sql("q173_chi_square_drift", {
      val ea = "(CAST(n_a + n_b AS DOUBLE) * CAST(t.ta AS DOUBLE) / CAST(t.ta + t.tb AS DOUBLE))"
      val eb = "(CAST(n_a + n_b AS DOUBLE) * CAST(t.tb AS DOUBLE) / CAST(t.ta + t.tb AS DOUBLE))"
      val ta = s"((CAST(n_a AS DOUBLE) - $ea) * (CAST(n_a AS DOUBLE) - $ea) / $ea)"
      val tb = s"((CAST(n_b AS DOUBLE) - $eb) * (CAST(n_b AS DOUBLE) - $eb) / $eb)"
      s"""WITH e AS (SELECT event_type AS category,
         |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS ia
         |  FROM events),
         |g AS (SELECT category, CAST(SUM(ia) AS BIGINT) AS n_a,
         |        CAST(SUM(1 - ia) AS BIGINT) AS n_b FROM e GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
         |        CAST(SUM(n_b) AS BIGINT) AS tb FROM g),
         |p AS (SELECT category, n_a, n_b, ROUND($ta + $tb, 6) AS chi2_term
         |      FROM g, t)
         |SELECT category, n_a, n_b, chi2_term FROM p
         |UNION ALL
         |SELECT 'TOTAL', CAST(SUM(n_a) AS BIGINT), CAST(SUM(n_b) AS BIGINT),
         |  CAST(SUM(CAST(chi2_term AS DECIMAL(18,6))) AS DOUBLE)
         |FROM p""".stripMargin
    }) { (s, dir) =>
      graft.llm.Drift.chiSquare(Tables.events(s, dir), "event_type",
        col("ts") < lit("2024-01-16").cast("timestamp"))
    },

    // ---- q178: STRICT-ORDER 3-STEP FUNNEL — view → click → purchase,
    // each step's earliest qualifying time must FOLLOW the previous
    // step's (the product-analytics funnel q75's 2-step attribution
    // doesn't cover): three per-user min-aggregations chained by
    // ts-after filters — equi-joins on the user key, no window, no
    // sessionization machinery. One summary row with per-step user
    // counts and round-6 conversion rates.
    QueryDef.sql("q178_funnel_3step",
      """WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS tc
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS tp
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1),
        |n AS (SELECT (SELECT COUNT(*) FROM v) AS users_viewed,
        |             (SELECT COUNT(*) FROM c) AS users_clicked,
        |             (SELECT COUNT(*) FROM p) AS users_purchased)
        |SELECT users_viewed, users_clicked, users_purchased,
        |  ROUND(CAST(users_clicked AS DOUBLE) / users_viewed, 6) AS click_rate,
        |  ROUND(CAST(users_purchased AS DOUBLE) / users_clicked, 6) AS purchase_rate
        |FROM n""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("tv"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("tv"))
        .groupBy("user_id").agg(min(col("ts")).as("tc"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("tc"))
        .groupBy("user_id").agg(min(col("ts")).as("tp"))
      v.agg(count(lit(1)).as("users_viewed"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("users_clicked"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("users_purchased"))))
        .select(col("users_viewed"), col("users_clicked"), col("users_purchased"),
          round(col("users_clicked").cast("double") / col("users_viewed"), 6)
            .as("click_rate"),
          round(col("users_purchased").cast("double") / col("users_clicked"), 6)
            .as("purchase_rate"))
    },

    // ---- q186: BURST / BOT DETECTION — users whose peak per-minute
    // event rate crosses the rate-limit threshold (the crawler/abuse
    // screen every event-sourced corpus runs before treating activity as
    // human): two map-side-combining aggregations — (user, minute)
    // counts, then per-user MAX via one argmax-by-struct (earliest
    // peaking minute as the deterministic witness).
    QueryDef.sql("q186_burst_users",
      """WITH m AS (SELECT user_id, date_trunc('minute', ts) AS mi, COUNT(*) AS n
        |           FROM events GROUP BY 1, 2),
        |t AS (SELECT user_id, COUNT(*) AS active_minutes,
        |        CAST(SUM(n) AS BIGINT) AS total_events FROM m GROUP BY 1),
        |p AS (SELECT user_id, MAX(n) AS peak,
        |        MIN(CASE WHEN n = (SELECT MAX(n) FROM m m2
        |                           WHERE m2.user_id = m.user_id)
        |                 THEN mi END) AS peak_minute
        |      FROM m GROUP BY 1)
        |SELECT p.user_id, CAST(p.peak AS BIGINT) AS peak_per_minute,
        |  p.peak_minute, t.total_events
        |FROM p JOIN t ON p.user_id = t.user_id
        |WHERE p.peak >= 2""".stripMargin) { (s, dir) =>
      val m = Tables.events(s, dir)
        .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("mi"))
        .agg(count(lit(1)).as("n"))
      // argmax-by-struct: (peak, earliest minute at peak) in ONE agg —
      // negate the epoch so MAX picks the smallest minute among ties
      val p = m.groupBy("user_id")
        .agg(max(struct(col("n"),
          (-unix_timestamp(col("mi"))).as("negm"))).as("mx"),
          count(lit(1)).as("active_minutes"),
          sum(col("n")).as("total_events"))
        .select(col("user_id"), col("mx.n").as("peak_per_minute"),
          (-col("mx.negm")).cast("timestamp").as("peak_minute"),
          col("total_events"))
      p.filter(col("peak_per_minute") >= 2)
    },

    // ---- q197: DETERMINISTIC PSEUDONYMIZATION — the GDPR middle path
    // between raw ids and q154's deletion: the user key is replaced by a
    // salted md5 token (a pure projection — no lookup table to leak),
    // JOINABILITY PRESERVED because the mapping is injective-in-practice
    // and deterministic: per-pseudonym aggregates equal per-user
    // aggregates. The gate aggregates BY pseudonym; the oracle derives
    // the same tokens, so a mapping drift fails membership.
    QueryDef.sql("q197_pseudonymize",
      """SELECT md5('salt1:' || CAST(user_id AS VARCHAR)) AS pseudonym,
        |  COUNT(*) AS events,
        |  COUNT(DISTINCT event_type) AS types,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(md5(concat(lit("salt1:"), col("user_id").cast("string")))
          .as("pseudonym"))
        .agg(count(lit(1)).as("events"),
          countDistinct(col("event_type")).as("types"),
          dsum(col("value")).as("total_value"))
    },

    // ---- q198: NEW vs RETURNING USERS — the daily acquisition split:
    // each user's first-seen day from one min-aggregation, then daily
    // counts by first-time/returning (no window, no self-join on the
    // fact — the first-seen table is user-sized and joins back on the
    // key).
    QueryDef.sql("q198_new_vs_returning",
      """WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        |           FROM events GROUP BY 1),
        |d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
        |SELECT d.day,
        |  CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |  CAST(SUM(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val first = ev.groupBy("user_id").agg(min(col("day")).as("first_day"))
      ev.distinct().join(first, "user_id")
        .groupBy("day")
        .agg(sum(when(col("day") === col("first_day"), 1).otherwise(0))
          .as("new_users"),
          sum(when(col("day") > col("first_day"), 1).otherwise(0))
            .as("returning_users"))
    }
  )
}
