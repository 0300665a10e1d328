package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.defaultCpus)
    val spark = Sessions.local(cpus)
    new java.io.File(outDir).mkdirs()
    // local-iteration knob (the driver leaves it unset): dump only a subset
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // every failed query is recorded in errors.json (not just stderr): a
    // query that throws during table load must surface as an explicit red
    // row downstream, never as a silently-absent dump (r8 lesson — 13
    // queries vanished from the correctness file when the events load broke)
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Golden-gated oracles are re-keyed to the SF label actually being
    // verified: a run against a dir with no committed snapshot then fails
    // on a missing parquet (clear) instead of hash-comparing this SF's
    // output against another SF's golden (silent, wrong).
    val sfLabel = Paths.get(sfDir).toAbsolutePath.normalize.getFileName.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val sql = if (QueryDef.goldenGated.contains(k))
          QueryDef.goldenOracleSql(k, sfLabel)
        // audit-twin oracles that embed a golden snapshot path inside
        // custom SQL (q44a, q38a, q61a; q59a/q91a left the club when
        // their parents converted to full oracles in r9) are re-keyed to
        // the SF being verified for the same missing-file-over-wrong-
        // golden failure mode as above
        else v.replace(s"${QueryDef.goldenRoot}/sf0.01/",
          s"${QueryDef.goldenRoot}/$sfLabel/")
        s"${q(k)}: ${q(sql)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // always written, even when empty: downstream can distinguish "no
    // failures" from "harness predates errors.json"
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
