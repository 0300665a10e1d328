package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Serializable per-file parquet → [[InternalRow]] reader, built from the
  * same `private[sql]` machinery `FileSourceScanExec` uses
  * (`ParquetFileFormat.buildReaderWithPartitionValues`) — the bridge that
  * lets a DataSource-V2 [[org.apache.spark.sql.connector.read.PartitionReader]]
  * (the tx-log streaming source, [[graft.streaming.TxSourceProvider]])
  * decode data files with Spark's own parquet path instead of a
  * hand-rolled materializer. Output rows are `dataSchema ++
  * partitionSchema` (the builder appends the partition values to every
  * row). Built ONCE on the driver; the wrapper closes over the
  * task-serializable function exactly as the scan exec does. */
object ParquetReadBridge {

  final class FileReadFn private[graftbridge] (
      f: PartitionedFile => Iterator[InternalRow]) extends Serializable {
    /** Read one whole file; `partValues` must match the partitionSchema
      * the reader was built with. */
    def apply(path: String, partValues: InternalRow,
              length: Long): Iterator[InternalRow] =
      f(PartitionedFile(partValues, SparkPath.fromPath(new Path(path)),
        0L, length, Array.empty, 0L, length))
  }

  /** Build the reader. The vectorized parquet path yields
    * `ColumnarBatch`es smuggled through `Iterator[InternalRow]` (the
    * FileSourceScanExec columnar contract), which a row-based V2 reader
    * cannot consume — so the builder runs against a CLONED session whose
    * conf disables the vectorized reader (never toggling the caller's
    * live session flag, which would race concurrent planning).
    * cloneSession, not newSession: the clone COPIES the parent's runtime
    * SQL confs (session timezone, parquet datetime/int96 rebase modes),
    * so streaming decode cannot diverge from batch reads in sessions
    * carrying non-default runtime confs — a fresh SessionState would
    * silently drop them. Row-based decode costs ~2× CPU on wide scans;
    * the streaming micro-batches this feeds are per-commit deltas, where
    * correctness and plumbing-simplicity dominate. */
  def rowReader(spark: SparkSession, dataSchema: StructType,
                partitionSchema: StructType): FileReadFn = {
    val isolated = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    isolated.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    val fmt = new ParquetFileFormat
    new FileReadFn(fmt.buildReaderWithPartitionValues(
      sparkSession = isolated,
      dataSchema = dataSchema,
      partitionSchema = partitionSchema,
      requiredSchema = dataSchema,
      filters = Seq.empty,
      options = Map.empty,
      hadoopConf = isolated.sessionState
        .newHadoopConfWithOptions(Map.empty)))
  }
}
