package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Writes `.explain("formatted")` dumps for named queries to
  * plans/<tag>/<query>_<suffix>.txt (the judge-facing plan evidence), plus
  * the staged-write shaping excerpt behind the r19 repartition-pinning
  * finding: the SAME frame shaped the pre-r19 way (`repartition(cols)`,
  * AQE-coalescible REPARTITION_BY_COL) and the current way
  * (`repartition(n, cols)`, REPARTITION_BY_NUM) — the write-job plan diff
  * that never shows in a declared query's own explain. Usage:
  *   sbt "runMain graft.tools.PlanDump r19 after q217_... q242_..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0); val suffix = args(1); val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Sessions.defaultCpus))
    val outDir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(outDir)
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the staged-write shaping excerpt (both variants, labelled)
    if (names.contains("stage_write")) {
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          pmod(col("event_id"), lit(240)).cast("string").as("bucket"))
      val byCol = ev.repartition(col("bucket"))
      val byNum = ev.repartition(
        spark.sessionState.conf.numShufflePartitions, col("bucket"))
      def fmt(df: org.apache.spark.sql.DataFrame) = {
        val qe = df.queryExecution
        qe.explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      }
      write("stage_write_REPARTITION_BY_COL_pre_r19opt", fmt(byCol))
      write("stage_write_REPARTITION_BY_NUM_post_r19opt", fmt(byNum))
    }
    names.filterNot(_ == "stage_write").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      write(name, df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
