package graft

/** Replays every golden-gated query (the ones DuckDB cannot re-express:
  * hash-family dedup, ANN, the generator, the curation funnel) against its
  * committed sf0.001 snapshot. The driver enforces the sf0.01 snapshots via
  * `QueryDef.golden`'s read_parquet oracle; this is the same gate in CI.
  * Regenerate snapshots with `runMain graft.tools.MakeGolden` after any
  * INTENDED output change — an unintended diff fails here first. */
class GoldenSpec extends SparkSpecBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  QueryDef.goldenGated.foreach { name =>
    test(s"$name matches its committed sf0.001 golden snapshot") {
      val got = SparkEntry.queries(name)(spark, sf)
      val want = spark.read.parquet(s"/root/repo/golden/sf0.001/$name.parquet")
      assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq,
        "schema drift vs golden")
      val (g, w) = (canon(got), canon(want))
      assert(g.size == w.size, s"rowcount ${g.size} vs golden ${w.size}")
      assert(g == w, {
        val firstDiff = g.zip(w).indexWhere { case (a, b) => a != b }
        s"value drift vs golden at sorted row $firstDiff: " +
          s"got=${g.lift(firstDiff)} want=${w.lift(firstDiff)}"
      })
    }
  }
}
