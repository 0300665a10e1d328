package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an N-times scaled copy of the sf0.1 tables into a scratch
  * dir for scaling-curve measurements (tools-only; never part of the
  * driver contract). Each copy shifts every key by a copy-offset so the
  * copies are referentially independent (outputs should scale ~N-fold,
  * work ~N log N at worst), and perturbs document text per copy with a
  * vowel translation (injective per char, so WITHIN-copy similarity
  * structure is preserved exactly while cross-copy near-dup pairs vanish —
  * without this, N identical copies make dedup output quadratic in N,
  * which measures adversarial duplication, not scaling). */
object ScaleData {
  def main(args: Array[String]): Unit = {
    // --many-files: write every fact table as 32 files instead of the
    // fixture's single single-row-group file. The driver fixtures cap
    // scan parallelism at one task per file (BASELINE.md r9 note:
    // ~1.3-1.6x uniform scan inflation); at 100 TB inputs are many-file,
    // so scan-bound numbers measured on this layout are the ones that
    // transfer. `ScaleData 1 --many-files` re-materializes sf0.1
    // content-identically in the many-file layout.
    val manyFiles = args.contains("--many-files")
    val n = args.filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(8)
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft_scale$n" + (if (manyFiles) "mf" else ""))
    val src = "/root/testdata/sf0.1"
    val spark = Sessions.local(Sessions.defaultCpus)

    val K = 100000000L // key offset per copy
    def copies(f: Int => DataFrame): DataFrame =
      (0 until n).map(f).reduce(_ unionByName _)

    def write(name: String, df: DataFrame): Unit = {
      val shaped = if (manyFiles) df.repartition(32) else df
      shaped.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale] wrote $name")
    }

    // one distinct vowel permutation per copy (5! = 120 available, so any
    // n <= 120 keeps cross-copy texts disjoint)
    val vowelPerms = "aeiou".permutations.take(math.max(n, 1)).toIndexedSeq

    write("lineitem", copies(i => Tables.lineitem(spark, src)
      .withColumn("l_orderkey", col("l_orderkey") + i * K)
      .withColumn("l_partkey", col("l_partkey") + i * K)))
    write("orders", copies(i => Tables.orders(spark, src)
      .withColumn("o_orderkey", col("o_orderkey") + i * K)
      .withColumn("o_custkey", col("o_custkey") + i * K)))
    write("customer", copies(i => Tables.customer(spark, src)
      .withColumn("c_custkey", col("c_custkey") + i * K)))
    write("part", copies(i => Tables.part(spark, src)
      .withColumn("p_partkey", col("p_partkey") + i * K)))
    // events.ts is copied in whatever physical encoding the fixture uses
    // (raw nanos-as-long historically, native timestamp[us] since the r8
    // regeneration) — re-read WITHOUT conversion; Tables.events adapts to
    // either on the way back in
    write("events", copies(i => spark.read.parquet(s"$src/events.parquet")
      .withColumn("event_id", col("event_id") + i * K)
      .withColumn("user_id", col("user_id") + i * K)))
    write("documents", copies(i => Tables.documents(spark, src)
      .withColumn("doc_id", col("doc_id") + i * K)
      .withColumn("text", translate(col("text"), "aeiou", vowelPerms(i % vowelPerms.size)))))
    write("embeddings", copies(i => Tables.embeddings(spark, src)
      .withColumn("vec_id", col("vec_id") + i * K)
      .withColumn("label", col("label") + lit(i * 1000))))
    for (t <- Seq("region", "nation", "supplier"))
      write(t, spark.read.parquet(s"$src/$t.parquet"))
    spark.stop()
  }
}
