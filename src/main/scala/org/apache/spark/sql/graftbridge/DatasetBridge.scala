package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` plan→DataFrame constructor — the same
  * extension-point idiom as [[ColumnBridge]], here for mounting a custom
  * relation (graft.sources.TxFileIndex's HadoopFsRelation) as a DataFrame
  * without a full DataSourceV2 registration. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-mount a streaming micro-batch DataFrame (the frame a v1
    * `Sink.addBatch` receives) as a PLAIN batch DataFrame over its
    * already-planned physical RDD — the standard sink idiom: the
    * incremental execution is reused, and batch writers (which refuse
    * `isStreaming` plans) can consume it. */
  def rebatch(data: DataFrame): DataFrame = {
    val classic = data.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }
}
