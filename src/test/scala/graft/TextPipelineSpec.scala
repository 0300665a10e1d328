package graft

import graft.llm.{Clusters, Dedup, Pii, TextStats}
import org.apache.spark.sql.functions._

/** Round-5 curation additions: repetition metrics (Gopher rules), PII
  * scrub, and the end-to-end dedup verdict composition. */
class TextPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- repetitionStats ------------------------------------------------

  test("weight_sum kernel is bit-identical to the aggregate-HOF margin it replaced") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(200)
    val buckets = 1024
    val rng = new scala.util.Random(7)
    // adversarial weights: big magnitudes so Long wraparound paths match too
    val w = Array.fill(buckets)(rng.nextLong() / (buckets * 4))
    val bks = docs
      .select($"doc_id", graft.functions.TextFns.tokens($"text").as("toks"))
      .select($"doc_id",
        graft.plans.ScoringExprs.featureBuckets($"toks", buckets).as("bks"))
    val wl = lit(w)
    val hof = bks.select($"doc_id",
      aggregate($"bks", lit(0L),
        (acc, b) => acc + element_at(wl, (b + 1).cast("int"))).as("s"))
    val kern = bks.select($"doc_id",
      graft.plans.ScoringExprs.weightSumCol($"bks", w).as("s"))
    assert(kern.orderBy("doc_id").collect().map(r => (r.get(0), r.get(1))).toSeq ==
      hof.orderBy("doc_id").collect().map(r => (r.get(0), r.get(1))).toSeq)
    // out-of-range bucket ids null the margin exactly like element_at
    val weird = spark.createDataFrame(
      Seq((1L, Seq(0L, 5000L)), (2L, Seq(3L))))
      .toDF("doc_id", "bks")
    val hofW = weird.select(aggregate($"bks", lit(0L),
      (acc, b) => acc + element_at(wl, (b + 1).cast("int"))))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val kernW = weird.select(
        graft.plans.ScoringExprs.weightSumCol($"bks", w))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(hofW.toSeq == kernW.toSeq)
  }

  test("repetitionStats: hand-computed metrics on a tiny corpus") {
    val docs = Seq(
      (1L, "a a a a"),            // max repetition
      (2L, "w1 w2 w3 w4"),        // all distinct
      (3L, "solo"),               // single token: bigram ratio 0 by definition
      (4L, "x y x y x y")         // repeated bigram phrase
    ).toDF("doc_id", "text")
    val m = TextStats.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    val r1 = m(0)
    assert(r1.getAs[Long]("n_tokens") == 4)
    assert(r1.getAs[Double]("distinct_ratio") == 0.25)
    assert(r1.getAs[Double]("top_token_ratio") == 1.0)
    // bigrams: "a a" x3, 1 distinct -> 1 - 1/3
    assert(math.abs(r1.getAs[Double]("dup_bigram_ratio") - (1.0 - 1.0 / 3)) < 1e-15)
    assert(r1.getAs[Boolean]("is_repetitive"))

    val r2 = m(1)
    assert(r2.getAs[Double]("distinct_ratio") == 1.0)
    assert(r2.getAs[Double]("top_token_ratio") == 0.25)
    assert(r2.getAs[Double]("dup_bigram_ratio") == 0.0)
    assert(r2.getAs[Boolean]("is_repetitive")) // 0.25 >= default 0.1 top-token cut

    val r3 = m(2)
    assert(r3.getAs[Long]("n_tokens") == 1)
    assert(r3.getAs[Double]("dup_bigram_ratio") == 0.0)

    val r4 = m(3)
    // "x y" x3 + "y x" x2 = 5 bigrams, 2 distinct -> 1 - 2/5
    assert(math.abs(r4.getAs[Double]("dup_bigram_ratio") - 0.6) < 1e-15)
    assert(r4.getAs[Boolean]("is_repetitive"))
  }

  test("repetitionStats: thresholds are configurable") {
    val docs = Seq((1L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val strict = TextStats.repetitionStats(docs, "doc_id", "text",
      topTokenThreshold = 0.5, dupBigramThreshold = 0.5).collect().head
    assert(!strict.getAs[Boolean]("is_repetitive"))
  }

  // ---- Pii.scrub ------------------------------------------------------

  test("Pii.scrub redacts emails, phones, IPs and counts on the original text") {
    val docs = Seq(
      (1L, "reach me at jo.doe+x@corp.example.org or 555-123-4567 via 192.168.0.1"),
      (2L, "no pii here, just words and 42 numbers"),
      (3L, "two mails: a@b.co and c.d@e-f.io")
    ).toDF("doc_id", "text")
    val out = Pii.scrub(docs, "doc_id", "text").orderBy("doc_id").collect()

    assert(out(0).getAs[Long]("n_email") == 1)
    assert(out(0).getAs[Long]("n_phone") == 1)
    assert(out(0).getAs[Long]("n_ip") == 1)
    assert(out(0).getAs[String]("redacted") ==
      "reach me at [EMAIL] or [PHONE] via [IP]")

    assert(out(1).getAs[Long]("n_email") == 0)
    assert(out(1).getAs[Long]("n_phone") == 0)
    assert(out(1).getAs[Long]("n_ip") == 0)
    assert(out(1).getAs[String]("redacted") ==
      "no pii here, just words and 42 numbers")

    assert(out(2).getAs[Long]("n_email") == 2)
    assert(out(2).getAs[String]("redacted") == "two mails: [EMAIL] and [EMAIL]")
  }

  test("Pii.scrub is idempotent: scrubbing redacted text changes nothing") {
    val docs = Seq((1L, "mail x@y.zz phone 555-000-1111 ip 8.8.8.8")).toDF("doc_id", "text")
    val once = Pii.scrub(docs, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("text"))
    val twice = Pii.scrub(once, "doc_id", "text").collect().head
    assert(twice.getAs[Long]("n_email") == 0)
    assert(twice.getAs[Long]("n_phone") == 0)
    assert(twice.getAs[Long]("n_ip") == 0)
    assert(twice.getAs[String]("redacted") == "mail [EMAIL] phone [PHONE] ip [IP]")
  }

  // ---- lineDedup ------------------------------------------------------

  test("lineDedup keeps each line only at its first (doc, idx) occurrence") {
    val lines = Seq(
      (1L, 1, "alpha beta"), (1L, 2, "gamma delta"),
      (2L, 1, "gamma delta"), (2L, 2, "epsilon zeta"),
      (3L, 1, "alpha beta") // doc 3 is all-boilerplate: loses every line
    ).toDF("doc_id", "line_idx", "line")
    val kept = Dedup.lineDedup(lines, "doc_id", "line_idx", "line")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("line_idx"),
        r.getAs[String]("line"))).toSet
    assert(kept == Set(
      (1L, 1, "alpha beta"), (1L, 2, "gamma delta"), (2L, 2, "epsilon zeta")))
  }

  test("lineDedup treats a null line as its own group (first occurrence kept, not dropped)") {
    // an upstream splitter may emit null for unparseable segments; the
    // null-safe join must keep the first null occurrence like any value
    val lines = Seq(
      (1L, 1, "alpha"), (1L, 2, null.asInstanceOf[String]),
      (2L, 1, null.asInstanceOf[String]), (2L, 2, "alpha")
    ).toDF("doc_id", "line_idx", "line")
    val kept = Dedup.lineDedup(lines, "doc_id", "line_idx", "line")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("line_idx"))).toSet
    assert(kept == Set((1L, 1), (1L, 2)))
  }

  test("lineDedup first-occurrence tie-break is (doc, idx) lexicographic") {
    // same line twice within ONE doc: the earlier index wins
    val lines = Seq((5L, 3, "dup line"), (5L, 1, "dup line"), (6L, 1, "dup line"))
      .toDF("doc_id", "line_idx", "line")
    val kept = Dedup.lineDedup(lines, "doc_id", "line_idx", "line").collect()
    assert(kept.length == 1)
    assert(kept.head.getAs[Long]("doc_id") == 5L)
    assert(kept.head.getAs[Int]("line_idx") == 1)
  }

  // ---- globalCumSum + sequence packing --------------------------------

  test("globalCumSum is bit-equal to the un-partitioned window at any parallelism") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 257L).map(i => (i, (i * 7 % 13) + 1)).toDF("id", "v")
    val expected = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- Seq(1, 3, 16)) {
      val got = graft.operators.Ranks.globalCumSum(
          df, Seq(col("id")), col("v"), "cum", partitions = p)
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"mismatch at partitions=$p")
    }
  }

  test("packSequences: hand-computed chunk layout") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L)).toDF("doc_id", "n_tokens")
    // starts: 0, 3, 7, 9 at budget 5 -> seq 0,0,1,1; offsets 0,3,2,4
    val out = graft.llm.Packing.packSequences(docs, "doc_id", "n_tokens", 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_offset")))
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 3L), (3L, 1L, 2L), (4L, 1L, 4L)))
  }

  test("gopherRules: each rule trips on its planted violation") {
    // mostly-unique words (top-token ratio must stay under 0.1) with a
    // couple of stopwords for the stopword floor
    val good = (1 to 50).map(i => s"token$i").mkString(" ") + " the cat of note"
    val docs = Seq(
      (1L, good),                                        // passes everything
      (2L, "too short of the and"),                      // r_length (< 20 tokens)
      (3L, (1 to 40).map(_ => "xy").mkString(" ") + " the of and to in"), // r_word_len (mean 2.x)
      (4L, (1 to 25).map(i => s"### #w$i# ...").mkString(" ") + " the of and"), // r_symbol
      (5L, (1 to 30).map(i => s"42 17 99 word$i").mkString(" ")),  // r_alpha < 0.8? 3/4 digits
      (6L, (1 to 15).map(i => s"alpha beta gamma$i").mkString(" ")), // r_stopwords (none)
      (7L, (1 to 30).map(_ => "spam spam the of and").mkString(" "))  // r_repetition
    ).toDF("doc_id", "text")
    val out = graft.llm.TextStats.gopherRules(docs, "doc_id", "text", minTokens = 20)
      .orderBy("doc_id").collect()
    def rule(i: Int, c: String) = out(i).getAs[Boolean](c)
    assert(out(0).getAs[Boolean]("kept"))
    assert(!rule(1, "r_length"))
    assert(!rule(2, "r_word_len"))
    assert(!rule(3, "r_symbol"))
    assert(!rule(4, "r_alpha"))
    assert(!rule(5, "r_stopwords"))
    assert(!rule(6, "r_repetition"))
    assert(out.drop(1).forall(!_.getAs[Boolean]("kept")))
  }

  test("shardShuffle: deterministic permutation, dense per-shard ranks") {
    val docs = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    val out = graft.llm.Packing.shardShuffle(docs, "doc_id", 8)
      .collect()
    // every doc exactly once; shards in range
    assert(out.length == 200 && out.map(_.getAs[Long]("doc_id")).toSet.size == 200)
    assert(out.forall(r => (0 until 8).contains(r.getAs[Int]("shard"))))
    // per-shard positions are dense 1..count (a true permutation layout)
    out.groupBy(_.getAs[Int]("shard")).values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("shard_pos")).sorted.toSeq ==
        (1L to rows.length).toSeq)
    }
    // reproducible across runs and partitionings — the whole point
    val again = graft.llm.Packing.shardShuffle(docs.repartition(32), "doc_id", 8)
      .collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // and the order actually shuffles: doc_id order != shard_pos order
    val inShard0 = out.filter(_.getAs[Int]("shard") == 0)
      .sortBy(_.getAs[Long]("shard_pos")).map(_.getAs[Long]("doc_id"))
    assert(inShard0.toSeq != inShard0.sorted.toSeq)
  }

  test("selectTokenBudget keeps best-score docs and cuts at the budget line") {
    val docs = Seq(
      (1L, 0.9, 100L), (2L, 0.8, 100L), (3L, 0.7, 100L), (4L, 0.6, 100L)
    ).toDF("doc_id", "score", "n_tokens")
    // budget 250: docs 1 (cum 100) and 2 (cum 200) fit; doc 3 would hit 300
    val kept = graft.llm.Curation.selectTokenBudget(
        docs, "doc_id", "score", "n_tokens", 250)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept.toSeq == Seq(1L, 2L))
    // ties on score fall back to doc_id order
    val tied = Seq((10L, 0.5, 60L), (11L, 0.5, 60L), (12L, 0.5, 60L))
      .toDF("doc_id", "score", "n_tokens")
    val keptTied = graft.llm.Curation.selectTokenBudget(
        tied, "doc_id", "score", "n_tokens", 120)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(keptTied.toSeq == Seq(10L, 11L))
  }

  test("centroidRows: hand-computed means, stable across repartitioning") {
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.0f, 1.0f)),
      (3L, 1, Array(0.5f, 0.5f))
    ).toDF("vec_id", "label", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Similarity.centroidRows(df, "label")
        .orderBy("label", "dim")
        .collect().map(r => (r.getAs[Int]("label"), r.getAs[Long]("dim"),
          r.getAs[Double]("centroid"), r.getAs[Long]("n"))).toSeq
    val expected = Seq((0, 1L, 0.5, 2L), (0, 2L, 0.5, 2L),
      (1, 1L, 0.5, 1L), (1, 2L, 0.5, 1L))
    assert(rows(emb) == expected)
    assert(rows(emb.repartition(7)) == expected)
  }

  test("incrementalDedupe drops corpus collisions and intra-batch dups") {
    val corpus = Seq((1L, "existing document alpha"), (2L, "existing document beta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "existing document alpha"),  // collides with corpus -> dropped
      (11L, "fresh document one"),
      (12L, "fresh document one"),       // intra-batch dup -> min id 11 kept
      (13L, "fresh document two")
    ).toDF("doc_id", "text")
    val kept = graft.llm.Dedup.incrementalDedupe(corpus, batch, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept.toSeq == Seq(11L, 13L))
    // fingerprint mode: same-prefix near-dups collapse too
    val nearBatch = Seq(
      (20L, "existing document alpha WITH A TRAILING CHANGE beyond prefix"),
      (21L, "completely different content here")
    ).toDF("doc_id", "text")
    val keptFp = graft.llm.Dedup.incrementalDedupe(
        corpus, nearBatch, "doc_id", "text", prefixLen = 16)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(keptFp.toSeq == Seq(21L))
  }

  test("incrementalDedupe keeps a null-text representative instead of deleting the rows") {
    // md5(null) = null: the plain equi-join form silently DELETED every
    // null-text incoming row; the null-safe form keeps the min-id
    // representative and dedupes it against a null-text corpus doc
    val corpus = Seq((1L, "existing document alpha")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, null.asInstanceOf[String]),
      (11L, null.asInstanceOf[String]),   // intra-batch null dup -> 10 kept
      (12L, "fresh document")
    ).toDF("doc_id", "text")
    val kept = graft.llm.Dedup.incrementalDedupe(corpus, batch, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept.toSeq == Seq(10L, 12L))
    // a null-text corpus doc collides with the null group, like exactGroups
    val nullCorpus = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val kept2 = graft.llm.Dedup.incrementalDedupe(nullCorpus, batch, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept2.toSeq == Seq(12L))
  }

  test("scd2Apply closes changed rows, opens versions, passes no-ops through") {
    import java.sql.Date
    val cur = Seq(
      (1L, "A", Date.valueOf("2024-01-01"), null.asInstanceOf[Date], true),
      (2L, "B", Date.valueOf("2024-01-01"), null.asInstanceOf[Date], true),
      (3L, "C", Date.valueOf("2024-01-01"), null.asInstanceOf[Date], true),
      // a pre-existing historical row must pass through untouched
      (1L, "OLD", Date.valueOf("2023-01-01"), Date.valueOf("2024-01-01"), false)
    ).toDF("id", "seg", "valid_from", "valid_to", "is_current")
    val upd = Seq((1L, "A2"), (2L, "B")).toDF("id", "seg") // 1 changes, 2 is a no-op
    val out = graft.sources.Warehouse.scd2Apply(cur, upd, "id", Seq("seg"),
        lit("2024-06-01"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("seg"),
        Option(r.getAs[Date]("valid_to")).map(_.toString).orNull,
        r.getAs[Boolean]("is_current"))).toSet
    assert(out == Set(
      (1L, "OLD", "2024-01-01", false),          // history untouched
      (1L, "A", "2024-06-01", false),            // closed
      (1L, "A2", null, true),                    // new version
      (2L, "B", null, true),                     // no-op update
      (3L, "C", null, true)))                    // no update
  }

  test("perGroupDeterministic: exactly k per group, stable across runs") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val a = graft.sources.Sampling.perGroupDeterministic(df, "grp", "id", 4)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"))).toSet
    val b = graft.sources.Sampling.perGroupDeterministic(df.repartition(11), "grp", "id", 4)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"))).toSet
    assert(a == b)
    assert(a.groupBy(_._1).forall(_._2.size == 4))
    // small group: returns the whole group, not an error
    val tiny = Seq((1L, "only")).toDF("id", "grp")
    assert(graft.sources.Sampling.perGroupDeterministic(tiny, "grp", "id", 4)
      .count() == 1)
  }

  test("triangles: closed triples only, each exactly once, ordered a<b<c") {
    // K4 on {1,2,3,4} (4 triangles) + a dangling chain 4-5, 5-6 (no triangle)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)
    ).toDF("doc_a", "doc_b")
    val tri = graft.llm.Clusters.triangles(edges, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("trianglesByDegree: same triangle set as id-oriented, incl. hub graphs") {
    // property check over seeded random graphs, including a star+clique
    // shape (one hub of high degree — the case degree orientation bounds)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 20 + trial * 8
      val all = for (a <- 0L until n; b <- (a + 1) until n) yield (a, b)
      val edgeSeq = all.filter(_ => rnd.nextInt(100) < 12) ++
        // hub 0 connected to everything (forces C(n-1,2) wedges under id
        // orientation; degree orientation never wedges at the hub)
        (1L until n).map(b => (0L, b))
      val edges = edgeSeq.distinct.toDF("doc_a", "doc_b")
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val byId = norm(graft.llm.Clusters.triangles(edges, "doc_a", "doc_b"))
      val byDeg = norm(graft.llm.Clusters.trianglesByDegree(edges, "doc_a", "doc_b"))
      assert(byDeg == byId, s"trial $trial: degree-oriented set diverged")
      assert(byDeg.forall { case (a, b, c) => a < b && b < c })
    }
  }

  test("winsorize clips to rounded exact percentiles and flags clipped rows") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val w = graft.operators.Cleaning.winsorize(df, "v", 0.05, 0.95)
    // exact interpolated p05 of 1..100 = 5.95, p95 = 95.05 -> rounded 2dp same
    val rows = w.collect()
    assert(rows.count(_.getAs[Boolean]("__clipped")) == 10) // 1..5 and 96..100
    val clippedVals = rows.map(_.getAs[Double]("v_winsorized"))
    assert(clippedVals.min == 5.95 && clippedVals.max == 95.05)
    // unclipped rows pass through bit-identical
    assert(rows.filter(!_.getAs[Boolean]("__clipped"))
      .forall(r => r.getAs[Double]("v") == r.getAs[Double]("v_winsorized")))
  }

  // ---- dedup verdict composition (q94's engine path) ------------------

  test("dedup verdict: pairs -> components -> keep min-id representative") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (10L, text), (11L, text), (12L, text),     // one 3-doc cluster
      (20L, "one two three four five six seven eight nine ten"),
      (21L, "one two three four five six seven eight nine ten"),
      (30L, "lone wolf document with entirely different words here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b")
    val cc = Clusters.connectedComponents(
      docs.select("doc_id"), "doc_id", pairs, "doc_a", "doc_b")
    val verdict = cc.groupBy("cluster_rep").agg(count(lit(1)).as("n"))
      .join(cc, "cluster_rep")
      .select(col("doc_id"), col("cluster_rep"), col("n"),
        (col("doc_id") === col("cluster_rep")).as("kept"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_rep"), r.getAs[Long]("n"), r.getAs[Boolean]("kept"))))
      .toMap

    assert(verdict(10L) == ((10L, 3L, true)))
    assert(verdict(11L) == ((10L, 3L, false)))
    assert(verdict(12L) == ((10L, 3L, false)))
    assert(verdict(20L) == ((20L, 2L, true)))
    assert(verdict(21L) == ((20L, 2L, false)))
    assert(verdict(30L) == ((30L, 1L, true)))
    // exactly one kept doc per cluster
    assert(verdict.values.count(_._3) == 3)
  }

  // ---- Mixing.temperatureSample ---------------------------------------

  test("temperatureSample: alpha=1 is a no-op; smallest domain keeps everything") {
    import graft.llm.Mixing
    val docs = (1 to 800).map(i => (i.toLong, "big", s"d$i")) ++
      (1 to 50).map(i => ((1000 + i).toLong, "small", s"s$i"))
    val df = docs.toDF("doc_id", "lang", "text")
    assert(Mixing.temperatureSample(df, "lang", "doc_id", alpha = 1.0).count() == 850)
    val kept = Mixing.temperatureSample(df, "lang", "doc_id", alpha = 0.5)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 50, s"smallest domain must keep all rows, got $kept")
    // big keeps ~ sqrt(50/800) = 25% of its rows; hash noise is a few %
    assert(kept("big") > 140 && kept("big") < 260, s"got $kept")
  }

  test("temperatureSample: membership is deterministic across parallelism and alpha monotone") {
    import graft.llm.Mixing
    val df = (1 to 500).map(i => (i.toLong, if (i % 5 == 0) "minor" else "major", "t"))
      .toDF("doc_id", "lang", "text")
    def ids(parts: Int, a: Double) =
      Mixing.temperatureSample(df.repartition(parts), "lang", "doc_id", a)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(1, 0.5)
    assert(ids(32, 0.5) == base && ids(7, 0.5) == base)
    // flatter alpha keeps strictly fewer majority-domain rows (lower threshold)
    assert(ids(1, 0.0).size < base.size && base.size < ids(1, 1.0).size)
    // thresholds report: smallest domain's thr = 65536 (keep-all)
    val thr = Mixing.domainThresholds(df, "lang", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(thr("minor") == 65536L && thr("major") < 65536L)
  }

  // ---- Bpe --------------------------------------------------------------

  test("trainMerges: the classic Sennrich corpus learns es, est, lo, low in order") {
    import graft.llm.Bpe
    // low:5 lower:2 newest:6 widest:3 — the worked example from the BPE paper
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val merges = Bpe.trainMerges(corpus, "text", rounds = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq
    // (e,s)=9 ties (s,t)=9 -> lexicographic picks es; then est=9; (l,o)=7
    // ties (o,w)=7 -> lo; then low=7
    assert(merges == Seq((1, "es", 9L), (2, "est", 9L), (3, "lo", 7L), (4, "low", 7L)))
  }

  test("trainMerges is partitioning-independent; applyMerges encodes with learned merges") {
    import graft.llm.Bpe
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val m1 = Bpe.trainMerges(corpus.repartition(1), "text", 4)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val m32 = Bpe.trainMerges(corpus.repartition(32), "text", 4)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(m1 == m32)
    val merges = Bpe.trainMerges(corpus, "text", 4)
    val enc = Bpe.applyMerges(Seq("lowest newest").toDF("text"), "text", merges)
      .select("bpe_tokens").head.getSeq[String](0)
    // lowest -> low+est (greedy left-to-right); newest -> n e w est
    assert(enc == Seq("low", "est", "n", "e", "w", "est"))
  }

  test("applyMerges (compiled expression) matches the unrolled reference form") {
    import graft.llm.Bpe
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
      (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val merges = Bpe.trainMerges(corpus, "text", 4)
    // adversarial encode inputs: unseen words, overlap runs ("aaa" under
    // (a,a)), unicode incl. a surrogate pair, single chars, empty text
    val texts = Seq("lowest newest", "aaa essst", "low low lower lowest",
      "héllo 𝄞 x", "a", "").toDF("text")
    val fast = Bpe.applyMerges(texts, "text", merges)
      .select("bpe_tokens").collect().map(_.getSeq[String](0)).toSeq
    val ref = Bpe.applyMergesUnrolled(texts, "text", merges)
      .select("bpe_tokens").collect().map(_.getSeq[String](0)).toSeq
    assert(fast == ref)

    // duplicate-pair table: (ab,c) is exhausted at rank 1, RE-CREATED by
    // rank 2's (a,b), and listed again at rank 3 — the fold applies both
    // passes, so "abc" must become [abc], not stall at [ab, c]
    val dup = Seq((1, "ab", "c", "abc", 1L), (2, "a", "b", "ab", 1L),
        (3, "ab", "c", "abc", 1L))
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
    val word = Seq("abc xabc").toDF("text")
    val fastDup = Bpe.applyMerges(word, "text", dup)
      .select("bpe_tokens").head.getSeq[String](0)
    val refDup = Bpe.applyMergesUnrolled(word, "text", dup)
      .select("bpe_tokens").head.getSeq[String](0)
    assert(fastDup == refDup && fastDup == Seq("abc", "x", "abc"))
  }

  test("applyMerges at 1200 merges: bounded plan/analysis, parity vs local fold") {
    import graft.llm.Bpe
    // synthetic rank-ordered merge table, 1200 entries: pairs over a small
    // alphabet plus chains onto earlier merged symbols — the shape of a
    // production vocab (late merges reference early merges' outputs)
    val rnd = new scala.util.Random(42)
    val letters = ('a' to 'j').map(_.toString)
    val merged = scala.collection.mutable.ArrayBuffer.empty[String]
    val mergeList = (1 to 1200).map { _ =>
      val l = if (merged.nonEmpty && rnd.nextInt(3) == 0)
        merged(rnd.nextInt(merged.length)) else letters(rnd.nextInt(letters.length))
      val r = letters(rnd.nextInt(letters.length))
      merged += (l + r)
      (l, r)
    }
    val mergesDf = mergeList.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r, l + r, 1L) }
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
    val words = (1 to 200).map(i =>
      (1 to (3 + rnd.nextInt(10))).map(_ => letters(rnd.nextInt(letters.length)))
        .mkString).mkString(" ")
    val t0 = System.nanoTime()
    val got = Bpe.applyMerges(Seq(words).toDF("text"), "text", mergesDf)
      .select("bpe_tokens").head.getSeq[String](0)
    val wallSec = (System.nanoTime() - t0) / 1e9
    // the r5 unrolled form at 1200 merges never finishes analysis in test
    // time; the compiled expression must stay interactive
    assert(wallSec < 30.0, s"compiled BPE encode took ${wallSec}s")

    // local executable spec of the fold semantics (mergeOnce per rank)
    def mergeOnceLocal(syms: Vector[String], x: String, y: String): Vector[String] =
      syms.foldLeft(Vector.empty[String])((acc, s) =>
        if (acc.nonEmpty && acc.last == x && s == y)
          acc.init :+ (x + y)
        else acc :+ s)
    val expected = words.split("\\s+", -1).toSeq.flatMap { w =>
      val chars = if (w.isEmpty) Vector("") else w.map(_.toString).toVector
      mergeList.foldLeft(chars)((acc, m) => mergeOnceLocal(acc, m._1, m._2))
    }
    assert(got == expected)
  }

  test("trainMerges stops early when no adjacent pairs remain") {
    import graft.llm.Bpe
    val merges = Bpe.trainMerges(Seq("a b a b").toDF("text"), "text", rounds = 10)
      .collect()
    assert(merges.isEmpty)  // all words are single-symbol, nothing to merge
  }

  // ---- dupSpanCoverage ------------------------------------------------

  test("dupSpanCoverage: hand-checked interval union, cross-doc only") {
    // d1/d2 share trigrams "a b c" (pos 1) and "b c d" (pos 2):
    // union [1,3] u [2,4] = 4 of 5 tokens. d3 is unique -> 0. d4 has a
    // within-doc repeated trigram only (1 distinct doc) -> 0. d5 is
    // shorter than n -> no grams, 0 covered, exact 0.0 ratio.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d x"), (3L, "p q r s t"),
      (4L, "z w v z w v z w"), (5L, "a b")).toDF("doc_id", "text")
    val out = TextStats.dupSpanCoverage(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("n_tokens"),
      r.getAs[Long]("covered_tokens"))).toSeq ==
      Seq((5L, 4L), (5L, 4L), (5L, 0L), (8L, 0L), (2L, 0L)))
    assert(out(0).getAs[Double]("dup_span_ratio") == 0.8)
    assert(out(4).getAs[Double]("dup_span_ratio") == 0.0)
    // partitioning-independent (sorted-fold + integer counts)
    val p32 = TextStats.dupSpanCoverage(docs.repartition(32), "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == p32.map(_.toSeq).toSeq)
  }

  test("dupSpanCoverage: non-adjacent duplicated grams add disjoint intervals") {
    // shared trigram at pos 1 and pos 5 of d1 (gap > n): 3 + 3 = 6 covered
    val docs = Seq(
      (1L, "a b c q q a b c q"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextStats.dupSpanCoverage(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("covered_tokens") == 6L)
    assert(out(1).getAs[Long]("covered_tokens") == 3L)
  }

  test("removeDuplicatedSpans: covered tokens cut, text rebuilt in order") {
    // same planted structure as the coverage test: d1/d2 share trigrams
    // covering positions 1-4; survivors are position 5 only. d3 unique ->
    // verbatim (token-normalized). d5 shorter than n -> verbatim.
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d x"), (3L, "p q r s t"),
      (5L, "a b")).toDF("doc_id", "text")
    val out = TextStats.removeDuplicatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("kept_tokens"),
      r.getAs[Long]("removed_tokens"), r.getAs[String]("deduped_text"))).toSeq ==
      Seq((1L, 4L, "e"), (1L, 4L, "x"), (5L, 0L, "p q r s t"), (2L, 0L, "a b")))
    // removal is consistent with the coverage diagnostic: removed ==
    // covered on every doc
    val cov = TextStats.dupSpanCoverage(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().map(_.getAs[Long]("covered_tokens"))
    assert(out.map(_.getAs[Long]("removed_tokens")).toSeq == cov.toSeq)
    // a doc that is ONE big duplicated span comes back empty
    val allDup = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val e = TextStats.removeDuplicatedSpans(allDup, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(e.forall(r => r.getAs[String]("deduped_text") == ""
      && r.getAs[Long]("kept_tokens") == 0L))
  }

  // ---- Scoring --------------------------------------------------------

  /** Independent JVM reference for the frozen hashed-linear weight of one
    * feature string (MessageDigest, not Spark's md5 expression). */
  private def refWeight(f: String, buckets: Int = 1024): Long = {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val b = java.lang.Long.parseLong(md5hex(f).take(8), 16) % buckets
    java.lang.Long.parseLong(md5hex(b.toString).take(4), 16) % 2001 - 1000
  }

  test("hashedLinearScore: score equals the JVM-reference feature-weight sum") {
    val docs = Seq((1L, "the cat sat"), (2L, "x")).toDF("doc_id", "text")
    val out = graft.llm.Scoring.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val feats1 = Seq("the", "cat", "sat", "the cat", "cat sat")
    assert(out(0).getAs[Long]("n_feats") == 5L)
    assert(out(0).getAs[Long]("score") == feats1.map(refWeight(_)).sum)
    assert(out(1).getAs[Long]("n_feats") == 1L)   // no bigrams on 1 token
    assert(out(1).getAs[Long]("score") == refWeight("x"))
    assert(out(0).getAs[Double]("avg_weight") ==
      feats1.map(refWeight(_)).sum.toDouble / 5.0)
    assert(out(0).getAs[Boolean]("is_quality") ==
      (feats1.map(refWeight(_)).sum > 0))
  }

  test("hashedLinearScore is partitioning-independent and weight-bounded") {
    val docs = (1L to 60L).map(i => (i, s"tok$i alpha beta gamma tok${i % 7}"))
      .toDF("doc_id", "text")
    val a = graft.llm.Scoring.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = graft.llm.Scoring.hashedLinearScore(docs.repartition(16), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    a.foreach { r =>
      val (n, s) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])
      assert(math.abs(s) <= 1000L * n)   // weights live in [-1000, 1000]
    }
  }

  test("trainLogistic matches a local JVM reference trainer bit-for-bit " +
      "and is partitioning-independent") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"), (2L, "beta gamma delta"),
      (3L, "spam junk noise spam"), (4L, "junk noise filler"),
      (5L, "alpha delta beta gamma"), (6L, "noise filler spam junk")
    ).toDF("doc_id", "text")
    val got = graft.llm.Scoring.trainLogistic(docs, "doc_id", "text",
      $"doc_id" <= 2L || $"doc_id" === 5L, buckets = 256, iters = 4)
    // independent local trainer: same integer arithmetic, plain Scala
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucketsOf(text: String, nb: Int): Seq[Int] = {
      val t = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val feats = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      feats.map(f =>
        (java.lang.Long.parseLong(md5hex(f).take(8), 16) % nb).toInt)
    }
    val S = graft.llm.Scoring.TrainScale
    val design = Seq(
      (1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L), (5L, 1L), (6L, 0L)
    ).map { case (id, y) =>
      (y, bucketsOf(docs.filter($"doc_id" === id).head.getString(1), 256))
    }
    val w = Array.fill(256)(0L)
    for (_ <- 1 to 4) {
      val g = Array.fill(256)(0L)
      design.foreach { case (y, bs) =>
        val m = bs.map(w(_)).sum
        val p = math.max(0L, math.min(S, S / 2 + m / 4))
        bs.foreach(b => g(b) += p - y * S)
      }
      for (b <- 0 until 256) w(b) -= g(b) / design.size
    }
    assert(got.toSeq == w.toSeq)
    // same weights from any physical partitioning (order-free sums)
    val repart = graft.llm.Scoring.trainLogistic(docs.repartition(16),
      "doc_id", "text", $"doc_id" <= 2L || $"doc_id" === 5L,
      buckets = 256, iters = 4)
    assert(repart.toSeq == got.toSeq)
  }

  test("confusableFoldKey folds homoglyph/NFKC variants onto their ASCII " +
      "original; plain NFC does not (the q216 division of labor)") {
    val cases = Seq(
      ("ѕесurity", "security"),   // Cyrillic ѕес → sec
      ("nоtiсе", "notice"),       // Cyrillic о/с/е
      ("ﬁnal", "final"),                    // ﬁ ligature (NFKC)
      ("ａｌｐｈａ", "alpha") // fullwidth (NFKC)
    )
    val df = cases.toDF("variant", "original")
    val folded = df.select(
      graft.functions.TextFns.confusableFoldKey($"variant").as("fv"),
      graft.functions.TextFns.confusableFoldKey($"original").as("fo"),
      graft.functions.TextFns.normalize($"variant").as("nv"),
      graft.functions.TextFns.normalize($"original").as("no")).collect()
    folded.foreach { r =>
      assert(r.getString(0) === r.getString(1),
        s"fold mismatch: ${r.getString(0)} vs ${r.getString(1)}")
      // NFC alone must NOT merge them — these are compatibility/
      // confusable variants, not canonical decompositions; that gap is
      // exactly why the aggressive fold is a separate opt-in key
      assert(r.getString(2) !== r.getString(3))
    }
    // lossiness documented: NFKC erases meaningful distinctions, so the
    // fold is an opt-in KEY, never the stored text
    val sup = Seq(("x²", "x2")).toDF("a", "b").select(
      graft.functions.TextFns.confusableFoldKey($"a").as("fa"),
      graft.functions.TextFns.confusableFoldKey($"b").as("fb")).head
    assert(sup.getString(0) === sup.getString(1))
  }

  test("trainLogisticBalanced separates the imbalanced dup split that " +
      "unweighted training majority-collapses on (the q206b closure)") {
    val docs = Tables.documents(spark, sf)
    val label = array_contains(
      graft.functions.TextFns.tokens($"text"), "dup")
    def matrix(w: Array[Long]): Map[(Boolean, Boolean), Long] =
      graft.llm.Scoring.scoreWithWeights(docs, "doc_id", "text", w)
        .join(docs.select($"doc_id", label.as("y")), Seq("doc_id"))
        .groupBy($"y", $"is_quality").count().collect()
        .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
        .withDefaultValue(0L)
    // unweighted fixed-eta: the majority collapse q206 surfaces
    val plain = matrix(graft.llm.Scoring.trainLogistic(docs, "doc_id",
      "text", label, buckets = 1024, iters = 3))
    assert(plain((true, true)) === 0L)
    // balanced + harmonic decay: genuine separation on the same rounds
    val bal = matrix(graft.llm.Scoring.trainLogisticBalanced(docs, "doc_id",
      "text", label, buckets = 1024, iters = 40))
    assert(bal((true, true)) > bal((true, false)))   // recall > 50%
    assert(bal((false, false)) > bal((false, true))) // specificity > 50%
  }

  test("trainLogistic is exactly invariant under corpus duplication " +
      "(the batch-GD normalization check)") {
    // every per-bucket gradient doubles AND nDocs doubles, so the step
    // is the SAME rational g/n — and truncating division is a function
    // of the rational value, so the fixed-point weights are bit-equal.
    // A trainer that forgot to normalize (or normalized by anything but
    // the doc count) fails this exactly.
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "beta delta"),
      (3L, "spam junk noise"), (4L, "junk filler")
    ).toDF("doc_id", "text")
    val doubled = docs.unionByName(
      docs.withColumn("doc_id", $"doc_id" + 100L))
    val w1 = graft.llm.Scoring.trainLogistic(docs, "doc_id", "text",
      $"doc_id" % 100 <= 2L, buckets = 256, iters = 4)
    val w2 = graft.llm.Scoring.trainLogistic(doubled, "doc_id", "text",
      $"doc_id" % 100 <= 2L, buckets = 256, iters = 4)
    assert(w1.toSeq == w2.toSeq)
  }

  test("trainLogistic separates a planted quality/junk split; trained " +
      "weights drive scoreWithWeights and the pipeline gate") {
    val qualityVocab = Seq("clear", "prose", "article", "evidence", "cited",
      "structured", "informative", "analysis", "method", "result")
    val junkVocab = Seq("spamword", "clickbait", "lorem", "filler",
      "keyword", "stuffing", "zzz", "buynow", "garbled", "noise")
    // unique front token: texts stay exact-distinct (doc(seed) would
    // repeat with period 10 and the pipeline's dedup would eat them) and
    // shingle overlap stays below the 0.8 near-dup bar
    def doc(vocab: Seq[String], seed: Int) =
      (s"uq$seed" +: (0 until 8).map(j => vocab((seed * 7 + j * 3) % vocab.size)))
        .mkString(" ")
    val docs = ((1L to 30L).map(i => (i, doc(qualityVocab, i.toInt))) ++
      (31L to 60L).map(i => (i, doc(junkVocab, i.toInt)))).toDF("doc_id", "text")
    val trained = graft.llm.Scoring.trainLogistic(docs, "doc_id", "text",
      $"doc_id" <= 30L, buckets = 1024, iters = 3)
    val scored = graft.llm.Scoring
      .scoreWithWeights(docs, "doc_id", "text", trained)
      .select("doc_id", "is_quality").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((1L to 30L).forall(scored(_)), "quality docs must score > 0")
    assert((31L to 60L).forall(!scored(_)), "junk docs must score <= 0")
    // the pipeline's classifier gate accepts the trained model: with a
    // generous token budget the selected set is exactly the quality half
    val stages = graft.llm.Curation.pipeline(docs, "doc_id", "text",
      lmRef = docs, tokenBudget = 100000L, seqLen = 64,
      clfWeights = Some(trained))
    val kept = stages.selected.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == (1L to 30L).toSet)
  }

  test("FeatureBucketsExpr equals the HOF md5Int reference form") {
    import org.apache.spark.sql.functions.{col, transform}
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "x"), (3L, "aa bb aa"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("toks"))
    val kernel = docs.select(col("doc_id"),
        graft.plans.ScoringExprs.featureBuckets(col("toks"), 1024).as("bks"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val hof = docs.select(col("doc_id"),
        transform(graft.llm.Scoring.ngramFeatures(col("toks")),
          f => graft.llm.Scoring.md5Int(f, 8) % 1024).as("bks"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(kernel.toSeq == hof.toSeq)
    // frozen weight table == the column-form md5 chain, spot-checked by
    // the refWeight tests above via the end-to-end score; here pin the
    // table itself against the independent JVM reference per bucket id
    val w = graft.plans.ScoringExprs.frozenWeights(1024)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until 1024 by 97).foreach { b =>
      assert(w(b) == java.lang.Long.parseLong(md5hex(b.toString).take(4), 16) % 2001 - 1000)
    }
  }

  test("dsirLogRatio: target-like docs outrank off-target docs; n_feats exact") {
    // target distribution: 'aa bb' repeated; raw corpus has one doc matching
    // the target exactly and one alien doc sharing no feature
    val target = (1L to 20L).map(i => (i, "aa bb aa bb")).toDF("doc_id", "text")
    val raw = Seq((101L, "aa bb aa bb"), (102L, "zz qq zz ww")).toDF("doc_id", "text")
    val out = graft.llm.Scoring.dsirLogRatio(target, raw, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_feats")).toSeq == Seq(7L, 7L))
    assert(out(0).getAs[Double]("log_ratio") > out(1).getAs[Double]("log_ratio"))
    assert(out(0).getAs[Double]("log_ratio") > 0.0)   // likelier under target
    assert(out(1).getAs[Double]("log_ratio") < 0.0)   // alien features
    // partitioning-independent (bucket-ordered fold + 6 dp round)
    val p = graft.llm.Scoring.dsirLogRatio(
        target.repartition(8), raw.repartition(4), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == p.map(_.toSeq).toSeq)
  }

  // ---- bigramNovelty --------------------------------------------------

  test("bigramLogProb: hand-computed add-one scores; <2-token docs kept with null") {
    // reference "a b a c": bigrams {a b:1, b a:1, a c:1}; unigrams a:2 b:1
    // c:1; V=3. Doc "a b c": "a b" -> ln((1+1)/(2+3)) = ln(0.4);
    // "b c" unseen -> ln((0+1)/(1+3)) = ln(0.25). avg over 2 occurrences.
    val ref = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c"), (11L, "solo")).toDF("doc_id", "text")
    val out = TextStats.bigramLogProb(ref, docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r10 = out(0)
    assert(r10.getAs[Long]("n_bigrams") == 2)
    val expected = BigDecimal((math.log(0.4) + math.log(0.25)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r10.getAs[Double]("avg_logprob") == expected)
    val r11 = out(1)
    assert(r11.getAs[Long]("n_bigrams") == 0 && r11.isNullAt(2))
    // partitioning-independent (the sorted-fold contract)
    val p32 = TextStats.bigramLogProb(ref, docs.repartition(32), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == p32.map(_.toSeq).toSeq)
  }

  test("bigramNovelty: hand-checked ratios, 0-bigram docs kept with null ratio") {
    val ref = Seq((1L, "a b c")).toDF("doc_id", "text")        // bigrams: {a b, b c}
    val docs = Seq(
      (10L, "a b x"),      // {a b, b x} -> 1 novel of 2
      (11L, "z"),          // no bigrams -> 0, null ratio
      (12L, "b c a b"),    // {b c, c a, a b} -> 1 novel of 3
      (13L, "q r q r")     // {q r, r q} -> all novel
    ).toDF("doc_id", "text")
    val out = TextStats.bigramNovelty(ref, docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 2L, 1L), (11L, 0L, 0L), (12L, 3L, 1L), (13L, 2L, 2L)))
    assert(out(0).getDouble(3) == 0.5)
    assert(out(1).isNullAt(3))
    assert(out(3).getDouble(3) == 1.0)
  }

  // ---- chunkByTokens --------------------------------------------------

  test("chunkByTokens: window starts, lengths, and text on a hand corpus") {
    import graft.llm.Chunking
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),                      // single short chunk
      (3L, "")                                        // empty -> one empty chunk
    ).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", size = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()

    // doc 1: starts 0,3,6,9 -> lengths 4,4,4,1
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[Long]("start_token")).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(d1.map(_.getAs[Long]("chunk_tokens")).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(d1(1).getAs[String]("chunk_text") == "t4 t5 t6 t7")
    assert(d1(3).getAs[String]("chunk_text") == "t10")
    // doc 2: one chunk of 3; doc 3: one empty chunk ("" splits to [""])
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[String]("chunk_text") == "only three tokens")
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3(0).getAs[Long]("chunk_tokens") == 1L)
  }

  test("chunkByTokens: full coverage and overlap reconstruction on real docs") {
    import graft.llm.Chunking
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 50)
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", size = 64, stride = 48)
    // stride*idx == start for every chunk; last chunk reaches the end
    val bad = chunks.filter(col("start_token") =!= col("chunk_idx") * 48).count()
    assert(bad == 0)
    val toks = docs.select(col("doc_id"),
      size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
    val last = chunks.groupBy("doc_id")
      .agg(max(col("start_token") + col("chunk_tokens")).as("covered"))
    val uncovered = last.join(toks, "doc_id").filter(col("covered") =!= col("n")).count()
    assert(uncovered == 0)
    // plan shape: no exchange — chunking is a pure flatMap
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("chunkByTokens edge contracts: null text kept as empty chunk; stride>size rejected") {
    import graft.llm.Chunking
    // NULL text must behave as the empty document, not vanish
    val docs = Seq((1L, null: String), (2L, "a b")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", size = 4, stride = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[String]("chunk_text") == "")
    // stride > size would skip tokens between windows — contract violation
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(docs, "doc_id", "text", size = 4, stride = 5)
    }
  }

  test("c4LineFilter: every published rule fires on a crafted page") {
    val docs = Seq(
      // line rules: keep 1 & 5; drop 2 (short), 3 (no punctuation),
      // 4 (javascript, case-insensitive)
      1L -> ("good line number one.\nshort no.\nthis has no punctuation\n" +
        "JAVASCRIPT is required here.\nfinal good line stays here!"),
      2L -> "lorem ipsum dolor sit amet.\nperfectly good line here.", // page drop
      3L -> "var x = function() { return 1; }\nok line with some words.", // brace
      4L -> "no terminal punctuation at all\nxy z.", // zero kept lines
      5L -> "the sign read \"closed\"" // closing-quote terminal is valid
    ).toDF("doc_id", "text")
    val out = TextStats.c4LineFilter(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("kept"))
    assert(out(0).getAs[Long]("n_lines") == 5 &&
      out(0).getAs[Long]("n_lines_kept") == 2)
    assert(out(0).getAs[String]("clean_text") ==
      "good line number one.\nfinal good line stays here!")
    assert(!out(1).getAs[Boolean]("kept") && !out(1).getAs[Boolean]("r_no_lorem"))
    assert(!out(2).getAs[Boolean]("kept") && !out(2).getAs[Boolean]("r_no_brace"))
    assert(!out(3).getAs[Boolean]("kept") && !out(3).getAs[Boolean]("r_min_lines"))
    assert(out(3).getAs[Long]("n_lines_kept") == 0) // "xy z." has 2 words only
    assert(out(3).isNullAt(out(3).fieldIndex("clean_text"))) // dropped pages carry no text
    assert(out(4).getAs[Boolean]("kept") &&
      out(4).getAs[Long]("n_lines_kept") == 1)
    // the filter is a pure projection: no exchange in the plan (the line
    // rules must stay inside the array HOF, not explode into rows)
    val plan = TextStats.c4LineFilter(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"), plan.take(500))
  }

  test("Mixing.matchTargetMix: quotas follow the target exactly; binding " +
      "domain keeps all; off-target domains dropped; deterministic order") {
    import graft.llm.Mixing
    val rows = (1 to 8).map(i => (i.toLong, "a")) ++
      (11 to 14).map(i => (i.toLong, "b")) ++
      (21 to 24).map(i => (i.toLong, "c")) ++
      (31 to 33).map(i => (i.toLong, "zz"))   // not in the target mix
    val df = rows.toDF("doc_id", "domain")
    // shares 0.5/0.3/0.2 over counts 8/4/4: scale = min(16, 13.33, 20)
    // = 13.33 -> quotas floor(6.67)=6, floor(4.0)=4, floor(2.67)=2
    val kept = Mixing.matchTargetMix(df, "domain", "doc_id",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val byDom = kept.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom == Map("a" -> 6L, "b" -> 4L, "c" -> 2L))
    // the kept 'c' docs are the 2 smallest by md5 order — deterministic
    val cKept = kept.filter($"domain" === "c").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val cExpect = (21 to 24).map(_.toLong)
      .sortBy(i => (org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString), i))
      .take(2).toSet
    assert(cKept == cExpect)
    // a share domain with no rows is refused, not silently zeroed
    intercept[IllegalArgumentException] {
      Mixing.matchTargetMix(df, "domain", "doc_id", Map("a" -> 0.5, "nope" -> 0.5))
    }
  }

  test("Vocab: ids are frequency ranks with deterministic ties; frozen " +
      "encode maps OOV to UNK id 0") {
    import graft.llm.Vocab
    val toks = Seq("b", "a", "b", "c", "a", "b").map(Tuple1(_)).toDF("term")
    val vocab = Vocab.build(toks, "term")
    val ids = vocab.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // b(3) -> 1; a(2) -> 2; c(1) -> 3
    assert(ids == Map("b" -> 1L, "a" -> 2L, "c" -> 3L))
    // tie: equal counts rank by token asc
    val tied = Vocab.build(Seq("z", "y").map(Tuple1(_)).toDF("term"), "term")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tied == Map("y" -> 1L, "z" -> 2L))
    val enc = Vocab.encodeTokens(
        Seq("a", "nope", "b").map(Tuple1(_)).toDF("term"), "term", vocab, "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc == Map("a" -> 2L, "nope" -> 0L, "b" -> 1L))
  }
}
