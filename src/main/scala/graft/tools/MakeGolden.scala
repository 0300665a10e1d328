package graft.tools

import graft._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Regenerates the committed golden-parquet oracles (`golden/<sf>/<q>.parquet`)
  * for the queries whose algorithms DuckDB cannot re-express (hash-family
  * dedup, ANN, the synthetic generator, the curation funnel). Their outputs
  * are deterministic by construction — seeded hash families, deterministic
  * hyperplanes, decimal-exact centroid means — so a committed snapshot is a
  * hard rows+schema+hash gate: the driver's DuckDB oracle just
  * `read_parquet`s the golden (see [[graft.QueryDef.golden]]).
  *
  * Determinism across parallelism is validated by running the verify gate
  * at different SPARK_GRAFT_CPUS against the same goldens.
  *
  * Usage: runMain graft.tools.MakeGolden [sfDir ...] (default sf0.001+sf0.01)
  */
object MakeGolden {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.defaultCpus)
    val spark = Sessions.local(cpus)
    // optional comma-separated subset, mirroring Verify's filter — lets a
    // new golden be generated without rewriting the committed snapshots
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val gated = QueryDef.goldenGated.filter(n => subset.forall(_.contains(n)))
    for (sfDir <- dirs; name <- gated) {
      val label = Paths.get(sfDir).getFileName.toString
      val tmp = Files.createTempDirectory("golden").toString
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst.orElseThrow()
      val dest = Paths.get(s"/root/repo/golden/$label/$name.parquet")
      Files.createDirectories(dest.getParent)
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      println(s"golden: $dest (${Files.size(dest)} bytes)")
    }
    spark.stop()
  }
}
