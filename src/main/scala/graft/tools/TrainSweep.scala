package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Scratch experiment: confusion matrices for the q206b weighted-training
  * variants across iteration counts / weights (tools-only). */
object TrainSweep {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("16")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = Tables.documents(spark, dir)
    val labelCol = array_contains(
      graft.functions.TextFns.tokens(col("text")), "dup")
    val labels = docs.select(col("doc_id"), labelCol.as("is_target"))
    for (pw <- Seq(9L, 19L); it <- Seq(10, 20, 40)) {
      val w = graft.llm.Scoring.trainLogistic(docs, "doc_id", "text",
        labelCol, buckets = 1024, iters = it, posWeight = pw, lrDecay = true)
      val cells = graft.llm.Scoring.scoreWithWeights(docs, "doc_id", "text", w)
        .join(labels, Seq("doc_id"))
        .groupBy(col("is_target"), col("is_quality"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
        .withDefaultValue(0L)
      println(s"[sweep] pw=$pw iters=$it tp=${cells((true, true))} " +
        s"fn=${cells((true, false))} fp=${cells((false, true))} " +
        s"tn=${cells((false, false))}")
    }
    spark.stop()
  }
}
