package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{name:sec,...}}.
  * Numbers are recorded per-round in BASELINE.md.
  */
object Bench {
  /** Headline subset: the heaviest/most representative query per family. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary",   // wide agg over the fact table
    "q02_daily_sales",       // join + two-level agg
    "q05_customer_ltv",      // per-customer multi-agg
    "q06_product_performance", // dim ⟕ fact-agg join
    "q11_basket_pairs",      // within-order self-join (pair mining)
    "q14_customer_behavior", // biggest join (events ⋈ orders) + distinct agg
    "q19_txn_size_bins",     // global quantile binning
    "q42_dedup_ngram_jaccard", // inverted-index near-dup join
    "q43_dedup_minhash_lsh", // minhash + banded LSH
    "q44_dedup_simhash",     // SWAR simhash + pigeonhole bands
    "q46_ann_brute_topk",    // embedding scan + top-k
    "q48_text_stats",        // full-corpus text featurization
    "q52_embedding_near_dups", // blocked vector near-dup join
    "q55_profile_part"       // one-pass all-column profile
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    val qs = SparkEntry.queries
    // one warm-up pass so JVM/codegen startup isn't charged to q1
    qs(headline.head)(spark, sfDir).count()
    val results = headline.map { name =>
      val t0 = System.nanoTime()
      try { qs(name)(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a swallowed failure would read as a suspiciously fast query —
          // surface it loudly on stderr (stdout stays one JSON line)
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qj = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
