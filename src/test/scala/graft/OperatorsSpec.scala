package graft

import graft.operators.{AsofJoin, Baskets, Bins, Cleaning, RangeJoin, Ranks, Temporal}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit tests for the core operator library (SURVEY §2.2/§2.3 semantics,
  * including the §7.4 traps: right-closed bins, null handling, array-length
  * "unique" counts, age boundary at the birthday). */
class OperatorsSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- Bins (P12 fixed, P13 quantile) ----------------------------------

  test("fixedBins: right-closed edges partition the domain; null -> null") {
    val df = Seq[java.lang.Double](0.0, 90.0, 90.5, 180.0, 181.0, 365.0, 400.0, null)
      .toDF("v")
      .withColumn("bin", Bins.fixedBins(col("v"), Seq(90d, 180d, 365d),
        Seq("New", "Regular", "Loyal", "VIP")))
    val got = df.collect().map(r => Option(r.getString(1)).orNull).toSeq
    assert(got == Seq("New", "New", "Regular", "Regular", "Loyal", "Loyal", "VIP", null))
  }

  test("ntileBins: 4-tiles are balanced and ordered by the bin column") {
    val df = spark.range(100).toDF("k").withColumn("v", col("k").cast("double"))
    val binned = Bins.ntileBins(df, col("v"), col("k"), 4,
      Seq("a", "b", "c", "d"), "bin")
    val sizes = binned.groupBy("bin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("a" -> 25L, "b" -> 25L, "c" -> 25L, "d" -> 25L))
    // ordering: every value in 'a' < every value in 'd'
    val maxA = binned.filter($"bin" === "a").agg(max("v")).head.getDouble(0)
    val minD = binned.filter($"bin" === "d").agg(min("v")).head.getDouble(0)
    assert(maxA < minD)
  }

  test("distributedNtile: bit-equal to the single-window ntile, incl. N%k and desc orders") {
    import org.apache.spark.sql.expressions.Window
    // 103 % 4 != 0 exercises the uneven-tile formula; duplicated values
    // (v = k/3) exercise tie-breaking via the unique key
    val df = spark.range(103).toDF("k")
      .withColumn("v", (col("k") / 3).cast("long"))
    for (orderBy <- Seq(Seq(col("v").asc, col("k").asc), Seq(col("v").desc, col("k").asc));
         k <- Seq(1, 4, 7, 200)) {
      val expected = df.withColumn("t", ntile(k).over(Window.orderBy(orderBy: _*)))
        .select("k", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranks.distributedNtile(df, orderBy, k, "t", partitions = 5)
        .select("k", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"k=$k order=$orderBy")
    }
  }

  test("groupedNtile: bit-equal to the partitioned-window ntile on skewed groups") {
    import org.apache.spark.sql.expressions.Window
    // group 'big' holds 90% of rows (the skew a PARTITION BY window
    // serializes); 'tiny' has fewer rows than k (n < k branch); sizes
    // chosen so n % k != 0 exercises the uneven-tile formula
    val df = spark.range(107).toDF("k")
      .withColumn("g", when(col("k") < 97, "big")
        .when(col("k") < 105, "mid").otherwise("tiny"))
      .withColumn("v", (col("k") * 37 % 50).cast("long"))
    for (k <- Seq(1, 3, 4, 200)) {
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("k").asc)
      val expected = df.withColumn("t", ntile(k).over(w))
        .select("k", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranks.groupedNtile(df, Seq("g"),
          Seq(col("v").desc, col("k").asc), k, "t", partitions = 5)
        .select("k", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"k=$k")
    }
    // NULL is a valid partition to NTILE's PARTITION BY — the null-safe
    // group join must keep those rows, not drop them
    val withNull = df.withColumn("g", when(col("k") % 10 === 0, null)
      .otherwise(col("g")))
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("k").asc)
    val expected = withNull.withColumn("t", ntile(3).over(w))
      .select("k", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ranks.groupedNtile(withNull, Seq("g"),
        Seq(col("v").desc, col("k").asc), 3, "t", partitions = 5)
      .select("k", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected && got.size == 107, "null group dropped or mis-tiled")
  }

  test("groupedRowNumber: bit-equal to the partitioned-window row_number on skewed groups") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(107).toDF("k")
      .withColumn("g", when(col("k") < 97, "big")
        .when(col("k") < 105, "mid").otherwise("tiny"))
      .withColumn("v", (col("k") * 37 % 50).cast("long"))
    // NULL group included from the start — a valid partition to
    // PARTITION BY, kept by the null-safe group join
    val withNull = df.withColumn("g", when(col("k") % 10 === 0, null)
      .otherwise(col("g")))
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("k").asc)
    // no cast on either side: groupedRowNumber emits INT exactly like
    // row_number(), schema included
    val expected = withNull
      .withColumn("r", row_number().over(w))
      .select("k", "r").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ranks.groupedRowNumber(withNull, Seq("g"),
        Seq(col("v").desc, col("k").asc), "r", partitions = 5)
      .select("k", "r").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected && got.size == 107)
  }

  test("sourceCappedCorpus: groups under the cap keep all docs; over, exactly cap best") {
    import spark.implicits._
    val docs = (
      (1L to 12L).map(i => (i, s"the quick brown fox and dog number$i jumps over things", "hot")) ++
      (21L to 23L).map(i => (i, s"the slow green turtle and frog number$i walks under things", "cold"))
    ).toDF("doc_id", "text", "source")
    val kept = graft.llm.SourceCuration.sourceCappedCorpus(
      docs, "doc_id", "text", "source", cap = 8).collect()
    val bySrc = kept.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(bySrc == Map("hot" -> 8, "cold" -> 3))   // capped vs under-cap
    assert(kept.forall(_.getAs[Int]("src_rank") <= 8))
  }

  test("distributedNtileBins == ntileBins on the same input") {
    val df = spark.range(50).toDF("k").withColumn("v", (col("k") % 10).cast("double"))
    val a = Bins.ntileBins(df, col("v"), col("k"), 4, Seq("a", "b", "c", "d"), "bin")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Bins.distributedNtileBins(df, col("v"), col("k"), 4, Seq("a", "b", "c", "d"), "bin")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
  }

  test("globalRowNumber: exact dense 1..N global ranks, no single-partition window") {
    val df = spark.range(200).toDF("k").withColumn("v", col("k") * 7 % 200)
    val ranked = Ranks.globalRowNumber(df, Seq(col("v").asc, col("k").asc), "rn", partitions = 8)
    val rows = ranked.select("v", "rn").collect().sortBy(_.getLong(1))
    assert(rows.map(_.getLong(1)).toSeq == (1L to 200L))
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
    assert(graft.tools.PlanCheck.unpartitionedWindows(ranked).isEmpty)
  }

  test("approxQuantileBins: labels cover all rows, roughly balanced") {
    val df = spark.range(1000).toDF("k").withColumn("v", col("k").cast("double"))
    val binned = Bins.approxQuantileBins(df, "v", 4, Seq("q1", "q2", "q3", "q4"), "bin")
    val sizes = binned.groupBy("bin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("q1", "q2", "q3", "q4"))
    assert(sizes.values.sum == 1000L)
    assert(sizes.values.forall(n => n > 200 && n < 300))
  }

  // ---- Baskets (U1/U2/P17) ---------------------------------------------

  private val itemsJson = Seq(
    (1L, """[{"product_id":1,"quantity":2,"item_price":100},{"product_id":2,"quantity":1,"item_price":50}]"""),
    (2L, """[{"product_id":3,"quantity":5,"item_price":10}]"""),
    (3L, """[{"product_id":1,"quantity":1,"item_price":100},{"product_id":1,"quantity":3,"item_price":100}]""")
  ).toDF("order_id", "product_metadata")

  test("explodeItems preserves total quantity and computes item totals") {
    val exploded = Baskets.explodeItems(
      itemsJson.withColumn("items", Baskets.parseItems(col("product_metadata"))),
      col("items"), Seq(col("order_id")))
    assert(exploded.agg(sum("quantity")).head.getLong(0) == 12L)
    val r = exploded.filter($"order_id" === 1 && $"product_id" === 1).head
    assert(r.getAs[Long]("total_value") == 200L)
  }

  test("basketTotals: num_unique_products is array LENGTH (reference trap 7.4.5)") {
    val withItems = itemsJson.withColumn("items", Baskets.parseItems(col("product_metadata")))
    val totals = Baskets.basketTotals(col("items")).foldLeft(withItems) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
    val o3 = totals.filter($"order_id" === 3).head()
    assert(o3.getAs[Int]("total_items") == 4)
    assert(o3.getAs[Long]("total_product_value") == 400L)
    // two entries of the same product: length 2, NOT distinct 1
    assert(o3.getAs[Int]("num_unique_products") == 2)
  }

  test("pairs: C(n,2) canonical pairs per order, duplicates collapsed") {
    val items = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),      // 3 distinct -> 3 pairs
      (20L, 5L),                             // single item -> 0 pairs
      (30L, 7L), (30L, 7L), (30L, 9L)        // dup product -> 1 pair
    ).toDF("order_id", "product_id")
    val got = Baskets.pairs(items, "order_id", "product_id")
      .select("product_1", "product_2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (7L, 9L)))
    assert(got.forall { case (a, b) => a < b })
  }

  test("pairsViaGenerator (codegen'd PairArray) == Generator form == self-join pairs") {
    val items = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val viaJoin = Baskets.pairs(items, "l_orderkey", "l_partkey")
      .select("l_orderkey", "product_1", "product_2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaGen = Baskets.pairsViaGenerator(items, "l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaGenerator = items
      .groupBy($"l_orderkey")
      .agg(collect_set($"l_partkey".cast("long")).as("basket"))
      .select($"l_orderkey",
        graft.plans.PairCombinations.pairCombinations($"basket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaGen == viaJoin)
    assert(viaGen == viaGenerator)
    assert(viaGen.nonEmpty)
    assert(viaGen.forall { case (_, a, b) => a < b })
  }

  test("asof: most-recent-at-or-before match, strict mode, tolerance, no-match null") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq( // (key, ts, px)
      ("a", ts("2024-01-01 10:00:00"), 1.0),
      ("a", ts("2024-01-01 10:05:00"), 2.0),
      ("a", ts("2024-01-01 10:30:00"), 3.0),
      ("b", ts("2024-01-01 09:00:00"), 9.0)
    ).toDF("qk", "qts", "px")
    val trades = Seq(
      ("a", ts("2024-01-01 10:05:00"), 1L),  // == quote ts: inclusive takes 2.0
      ("a", ts("2024-01-01 10:29:59"), 2L),  // between: takes 2.0
      ("a", ts("2024-01-01 09:59:59"), 3L),  // before all: null
      ("b", ts("2024-01-01 12:00:00"), 4L),  // long gap: tolerance nulls it
      ("c", ts("2024-01-01 10:00:00"), 5L)   // key with no quotes: null
    ).toDF("k", "t", "trade_id")

    def run(strict: Boolean, tol: Option[String] = None) =
      AsofJoin.asof(trades, quotes, "k", "qk", "t", "qts", Seq("px"),
          strict = strict, tolerance = tol)
        .collect().map(r => r.getAs[Long]("trade_id") ->
          Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap

    val incl = run(strict = false)
    assert(incl == Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> None,
      4L -> Some(9.0), 5L -> None))
    val str = run(strict = true)
    assert(str(1L) == Some(1.0))             // equal-ts quote excluded
    assert(str(2L) == Some(2.0) && str(3L) == None)
    val tol = run(strict = false, tol = Some("1 hour"))
    assert(tol(4L) == None)                  // 3h-old quote beyond tolerance
    assert(tol(1L) == Some(2.0))             // in-tolerance match survives
    // left columns survive untouched and asof_ts carries the matched ts
    val row = AsofJoin.asof(trades, quotes, "k", "qk", "t", "qts", Seq("px"))
      .filter($"trade_id" === 2L).head
    assert(row.getAs[java.sql.Timestamp]("t") == ts("2024-01-01 10:29:59"))
    assert(row.getAs[java.sql.Timestamp]("asof_ts") == ts("2024-01-01 10:05:00"))
    // a null-ts quote is never "most recent" — must not leak into matches
    val nullQuote = Seq(("a", null.asInstanceOf[java.sql.Timestamp], 99.0))
      .toDF("qk", "qts", "px")
    val withNull = AsofJoin.asof(trades, quotes.unionByName(nullQuote),
        "k", "qk", "t", "qts", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    assert(withNull == incl)
  }

  test("asof plan: one shuffle on the key, no join node, no pair explosion") {
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val t = ev.filter($"event_type" === "click")
      .select($"user_id".as("tu"), $"ts".as("tts"), $"event_id".as("te"))
    val plan = AsofJoin.asof(p, t, "user_id", "tu", "ts", "tts", Seq("te"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof must not materialize a join:\n${plan.take(600)}")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle:\n${plan.take(600)}")
  }

  test("rangeJoin: parity with naive overlap join; emit-once across bands; width-invariant") {
    // deterministic intervals with lengths straddling several band widths
    val rows = (0L until 200L).map { i =>
      val s = (i * 37) % 500
      (i % 5, i, s, s + 1 + (i * 13) % 60)   // (key, id, start, end)
    }
    val df = rows.toDF("k", "id", "s", "e")
    val naive = {
      val b = df.select($"k".as("k2"), $"id".as("id_b"), $"s".as("s2"), $"e".as("e2"))
      df.join(b, $"k" === $"k2" && $"id" < $"id_b" && $"s" <= $"e2" && $"s2" <= $"e")
        .select($"k", $"id".as("id_a"), $"id_b",
          (least($"e", $"e2") - greatest($"s", $"s2") + 1).as("overlap_len"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 7L, 16L, 1000L)) {   // incl. degenerate 1 and one-band-fits-all
      val banded = RangeJoin.selfOverlapPairs(df, "k", "id", "s", "e", bandWidth = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(banded == naive, s"bandWidth=$w diverged")
    }
  }

  test("qcutBins: pd.qcut parity — right-closed interpolated edges, null -> null") {
    val vals = (1 to 8).map(_.toDouble)  // quartile edges 2.75, 4.5, 6.25
    val df = (vals.map(Option(_)) :+ None).toDF("v")
    val out = graft.operators.Bins.qcutBins(df, "v", 4,
        Seq("a", "b", "c", "d"), "bin")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)))
        -> r.getAs[String]("bin")).toMap
    assert(out(Some(1.0)) == "a" && out(Some(2.0)) == "a")
    assert(out(Some(3.0)) == "b" && out(Some(4.0)) == "b")
    assert(out(Some(5.0)) == "c" && out(Some(6.0)) == "c")
    assert(out(Some(7.0)) == "d" && out(Some(8.0)) == "d")
    assert(out(None) == null)
  }

  // ---- Temporal (P9/P10) -----------------------------------------------

  test("ageAt: exact integer age flips on the birthday itself") {
    val df = Seq("1990-06-15").toDF("b").select(to_date($"b").as("birth"))
    def age(asOf: String): Int =
      df.select(Temporal.ageAt(col("birth"), lit(asOf).cast("date"))).head.getInt(0)
    assert(age("2020-06-14") == 29)  // day before 30th birthday
    assert(age("2020-06-15") == 30)  // on the birthday
    assert(age("2020-06-16") == 30)
  }

  test("tenureDays matches calendar day difference") {
    val df = Seq("2020-01-01").toDF("s").select(to_date($"s").as("since"))
    val t = df.select(Temporal.tenureDays(col("since"), lit("2020-03-01").cast("date")))
      .head.getInt(0)
    assert(t == 60)
  }

  test("rankingSuite: row_number/rank/dense_rank/running sum over one window") {
    import graft.operators.Windows
    val df = Seq(("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 20.0), ("b", 4, 5.0))
      .toDF("g", "k", "v")
    val out = Windows.rankingSuite(df, col("g"), Seq(desc("v"), asc("k")), col("v"))
      .filter($"g" === "a").orderBy("rn").collect()
    assert(out.map(_.getAs[Int]("rn")).toSeq == Seq(1, 2, 3))
    // v=20 first; the two v=10 rows tie on value order only via key
    assert(out.map(_.getAs[Double]("v")).toSeq == Seq(20.0, 10.0, 10.0))
    assert(out.last.getAs[Double]("running_value") == 40.0)
  }

  // ---- Cleaning (P3/P6/P7) ---------------------------------------------

  test("coerce: invalid strings become null; validId drops out-of-range") {
    val df = Seq("42", "abc", "99999999999").toDF("raw")
      .withColumn("id", Cleaning.coerce(col("raw"), "bigint"))
    assert(df.filter(col("id").isNull).count() == 1)
    assert(df.filter(Cleaning.validId(col("id"))).count() == 1)  // only 42
  }

  test("fillDefaults replaces nulls with per-column defaults") {
    val df = Seq((1, null: String), (2, "blue")).toDF("id", "colour")
    val filled = Cleaning.fillDefaults(df, Map("colour" -> "Unknown"))
    assert(filled.filter($"colour" === "Unknown").count() == 1)
  }

  // ---- TopK (bounded per-group top-k aggregate) ------------------------

  test("perGroupTopK: bit-equal to the window top-k across parallelisms; small groups; ties") {
    import graft.operators.{TopK, Windows}
    // group 1: 5 rows incl. a value tie (ids 11,12 both 9.0); group 2: 2 rows (< k)
    val rows = Seq(
      (1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 9.0), (1L, 13L, 1.0), (1L, 14L, 7.0),
      (2L, 20L, 3.0), (2L, 21L, 3.0))
    val expect = Windows
      .topKPerGroup(rows.toDF("g", "id", "v"), Seq($"g"), Seq($"v".desc, $"id"), 3)
      .select($"g", $"rn".cast("long").as("rank"), $"id", $"v")
      .orderBy("g", "rank").collect().toSeq
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "id", "v").repartition(parts)
      val got = TopK.perGroupTopK(df, Seq("g"), "v", "id", 3)
        .orderBy("g", "rank").collect().toSeq
      assert(got == expect, s"parts=$parts")
    }
  }

  test("perGroupTopK: aggregates partially before the exchange (no Window node)") {
    import graft.operators.TopK
    val df = spark.range(1000).select(
      (col("id") % 10).as("g"), col("id").as("id"), rand(7).as("v"))
    val plan = TopK.perGroupTopK(df, Seq("g"), "v", "id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "must not fall back to a window sort")
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(plan.toLowerCase.contains("partial_topkagg"),
      "map-side partial aggregation missing:\n" + plan.take(800))
  }

  test("Ivm: merge of any slicing equals the full recompute, bit-exactly") {
    import graft.operators.Ivm
    val o = Tables.orders(spark, sf)
    val keys = Seq("o_orderpriority")
    val sums = Seq("o_totalprice")
    val mins = Seq("o_orderdate")
    val maxs = Seq("o_orderdate")
    def fin(st: org.apache.spark.sql.DataFrame) =
      Ivm.finalizeState(st, keys, sums, mins, maxs, avgCols = Seq("o_totalprice"))
        .orderBy("o_orderpriority").collect().toSeq
    val full = fin(Ivm.rollupState(o, keys, sums, mins, maxs))
    // two-way slice by date (the q148 refresh), three-way by key hash,
    // and a slicing with an EMPTY slice — merge must equal recompute in
    // every case because counts/decimal sums are associative and
    // min/max are semilattice ops
    val byDate = Seq(
      o.filter($"o_orderdate" < "1997-01-01"),
      o.filter($"o_orderdate" >= "1997-01-01"))
    val byHash = (0 until 3).map(i => o.filter(abs(hash($"o_orderkey")) % 3 === i))
    val withEmpty = Seq(o, o.filter(lit(false)))
    for ((slices, tag) <- Seq((byDate, "date"), (byHash, "hash"), (withEmpty, "empty"))) {
      val merged = fin(Ivm.mergeStates(
        slices.map(s => Ivm.rollupState(s, keys, sums, mins, maxs)),
        keys, sums, mins, maxs))
      assert(merged == full, s"slicing=$tag")
    }
    // a group born entirely in the delta (absent from prev) survives the merge
    val pri = o.select("o_orderpriority").distinct().limit(1).head.getString(0)
    val without = o.filter($"o_orderpriority" =!= pri)
    val only = o.filter($"o_orderpriority" === pri)
    val merged2 = fin(Ivm.mergeStates(
      Seq(Ivm.rollupState(without, keys, sums, mins, maxs),
        Ivm.rollupState(only, keys, sums, mins, maxs)),
      keys, sums, mins, maxs))
    assert(merged2 == full)
  }

  test("Ivm: HLL distinct state merges bit-identically to one-shot, within 5% of exact") {
    import graft.operators.Ivm
    val o = Tables.orders(spark, sf)
    val keys = Seq("o_orderpriority")
    val dc = Seq("o_custkey")
    def est(st: org.apache.spark.sql.DataFrame) =
      Ivm.finalizeState(st, keys, Nil, Nil, Nil, Nil, dc)
        .orderBy("o_orderpriority").collect()
        .map(r => r.getString(0) -> r.getAs[Long]("approx_distinct_o_custkey")).toSeq
    val oneShot = est(Ivm.rollupState(o, keys, Nil, Nil, Nil, dc))
    // three different slicings all merge to the SAME registers (classic
    // HLL state is register max only — slicing cannot change it)
    for (n <- Seq(2, 3, 5)) {
      val slices = (0 until n).map(i =>
        Ivm.rollupState(o.filter(abs(hash($"o_orderkey")) % n === i),
          keys, Nil, Nil, Nil, dc))
      assert(est(Ivm.mergeStates(slices, keys, Nil, Nil, Nil, dc)) == oneShot,
        s"slices=$n")
    }
    val exact = o.groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    oneShot.foreach { case (k, e) =>
      assert(math.abs(e - exact(k)) <= 0.05 * exact(k), s"$k: $e vs ${exact(k)}")
    }
  }

  test("Ivm: histogram quantile state merges bit-identically to one-shot, " +
      "within bucket resolution of exact") {
    import graft.operators.Ivm
    val o = Tables.orders(spark, sf)
    val keys = Seq("o_orderpriority")
    val hc = Seq(Ivm.HistCol("o_totalprice", 0.0, 600000.0, 600))
    def fin(st: org.apache.spark.sql.DataFrame) =
      Ivm.finalizeState(st, keys, Nil, histCols = hc,
          histQuantiles = Seq(0.5, 0.9))
        .orderBy("o_orderpriority").collect()
        .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3))).toSeq
    val oneShot = fin(Ivm.rollupState(o, keys, Nil, histCols = hc))
    // counting histograms over a FIXED bucketing are pure functions of
    // the value multiset — any slicing merges to the same bucket arrays
    for (n <- Seq(2, 3, 5)) {
      val slices = (0 until n).map(i =>
        Ivm.rollupState(o.filter(abs(hash($"o_orderkey")) % n === i),
          keys, Nil, histCols = hc))
      assert(fin(Ivm.mergeStates(slices, keys, Nil, histCols = hc)) == oneShot,
        s"slices=$n")
    }
    // the sketch quantile is EXACTLY the bucket lower bound of the
    // ceil(q·n)-th order statistic (the Hist contract) — assert equality
    // against a driver-side replay, not a tolerance
    val vals = o.select($"o_orderpriority", $"o_totalprice").collect()
      .groupBy(_.getString(0)).map { case (k, rs) =>
        k -> rs.map(_.getDouble(1)).sorted.toIndexedSeq
      }
    def statFloor(xs: IndexedSeq[Double], q: Double) = {
      val stat = xs(math.ceil(q * xs.size).toInt - 1)
      math.min(math.max(math.floor(stat / 1000.0), 0), 599) * 1000.0
    }
    oneShot.foreach { case (k, p50, p90) =>
      assert(p50 == statFloor(vals(k), 0.5), s"$k p50")
      assert(p90 == statFloor(vals(k), 0.9), s"$k p90")
    }
  }

  test("Stats.regression: hand-checked OLS; partition-order-free; " +
      "zero-variance groups yield NULL; NULL rows excluded") {
    import graft.operators.Stats
    // y = 2x + 1 exactly -> slope 2, intercept 1, corr 1
    val exactFit = (1 to 5).map(i => ("a", i.toDouble, 2.0 * i + 1))
    // a zero-variance-x group and a NULL row (must be excluded)
    val rows = exactFit ++ Seq(("z", 3.0, 7.0), ("z", 3.0, 9.0)) :+
      ("a", Double.NaN, 0.0)
    val df = rows.toDF("g", "x", "y")
      .withColumn("x", when(isnan($"x"), lit(null)).otherwise($"x"))
    val got = Stats.regression(df, Seq("g"), "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got("a") == ((5L, Some(2.0), Some(1.0), Some(1.0))))
    assert(got("z") == ((2L, None, None, None)))
    // the sums are decimal-exact: any repartitioning gives the same bits
    val again = Stats.regression(df.repartition(7), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r.get(2)).toMap
    assert(again("a") == 2.0)
  }

  test("globalCumSums: one-pass multi-column == chained globalCumSum, " +
      "bit-exactly, at any parallelism") {
    val df = spark.range(500).toDF("k")
      .withColumn("v", col("k") * 7 % 500)
      .withColumn("a", col("k") % 3)
      .withColumn("b", col("k") % 5)
    for (p <- Seq(1, 4, 9)) {
      val fused = Ranks.globalCumSums(df, Seq(col("v").asc),
          Seq("ca" -> col("a"), "cb" -> col("b")), partitions = p)
        .select("k", "ca", "cb").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val chained = Ranks.globalCumSum(
          Ranks.globalCumSum(df, Seq(col("v").asc), col("a"), "ca", p),
          Seq(col("v").asc), col("b"), "cb", p)
        .select("k", "ca", "cb").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(fused == chained, s"partitions=$p")
    }
  }

  test("Stats.correlationMatrix: perfect/anti/zero correlations exact; " +
      "listwise NULL exclusion; repartition-stable") {
    import graft.operators.Stats
    val df = Seq(
      (1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0)
    ).toDF("a", "b", "c")
    val m = Stats.correlationMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(m == Map(("a","b") -> 1.0, ("a","c") -> -1.0, ("b","c") -> -1.0))
    // a NULL in any column drops the whole row for every pair (same n)
    val withNull = df.unionByName(Seq((9.0, Double.NaN, 0.0)).toDF("a","b","c")
      .withColumn("b", when(isnan($"b"), lit(null)).otherwise($"b")))
    val n2 = Stats.correlationMatrix(withNull, Seq("a","b","c"))
      .select("n").distinct().collect().map(_.getLong(0)).toSeq
    assert(n2 == Seq(4L))
    val again = Stats.correlationMatrix(df.repartition(5), Seq("a","b","c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(again == m)
  }
}
