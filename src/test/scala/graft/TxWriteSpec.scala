package graft

import graft.sources.TxLog
import org.apache.spark.sql.functions._

/** The batch DataFrameWriter front door —
  * `df.write.format("txlog").mode(...).save(root)` — must route every
  * mode to the transactional front doors (the write-side twin of the
  * q245 batch read): recorded partitioning wins, CHECK constraints and
  * the additive schema guard enforce, txnAppId/txnVersion rides the
  * idempotent replay ledger, and `mode("overwrite")` is the ATOMIC
  * full-table replace (absent partitions drop in the same commit). */
class TxWriteSpec extends SparkSpecBase {

  private def freshRoot(tag: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-txwrite/$tag"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    root
  }

  test("append and overwrite modes route to the front doors; recorded " +
      "partitioning wins; bare writes == front-door writes") {
    val root = freshRoot("modes")
    import spark.implicits._
    // create via the bare writer: partitionBy is required and recorded
    val e0 = intercept[Exception] {
      Seq(("a", 1L)).toDF("part", "k").write.format("txlog").save(root)
    }
    assert(e0.getMessage.contains("partitionBy"), e0.getMessage)
    Seq(("a", 1L, 10.0), ("b", 2L, 20.0)).toDF("part", "k", "v")
      .write.format("txlog").partitionBy("part").save(root)        // v1
    assert(TxLog.tableMeta(spark, root)._2.map(_.name) === Seq("part"))
    // default mode on an existing table is ErrorIfExists — refuses
    val e1 = intercept[Exception] {
      Seq(("a", 9L, 0.0)).toDF("part", "k", "v")
        .write.format("txlog").save(root)
    }
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    // Ignore mode is a no-op on an existing table
    Seq(("a", 9L, 0.0)).toDF("part", "k", "v")
      .write.format("txlog").mode("ignore").save(root)
    assert(TxLog.readTable(spark, root).count() === 2L)
    // append (no partitionBy needed — the recorded one wins)
    Seq(("a", 3L, 30.0)).toDF("part", "k", "v")
      .write.format("txlog").mode("append").save(root)             // v2
    assert(TxLog.readTable(spark, root).count() === 3L)
    // a MISMATCHED partitionBy refuses loudly
    val e2 = intercept[Exception] {
      Seq(("a", 4L, 40.0)).toDF("part", "k", "v")
        .write.format("txlog").mode("append").partitionBy("k").save(root)
    }
    assert(e2.getMessage.contains("recorded partitioning"), e2.getMessage)
    // overwrite = FULL replace: partition "b" is absent from the new
    // data and must DROP in the same commit
    Seq(("a", 5L, 50.0), ("c", 6L, 60.0)).toDF("part", "k", "v")
      .write.format("txlog").mode("overwrite").save(root)          // v3
    assert(TxLog.readTable(spark, root).select("part")
      .collect().map(_.getString(0)).toSet === Set("a", "c"))
    assert(TxLog.partitionValues(spark, root) === Set("a", "c"))
    // time travel still serves the pre-overwrite state (atomic history)
    assert(TxLog.readTableAt(spark, root, 2L).count() === 3L)
    // round-trip through the bare READ path agrees
    assert(spark.read.format("txlog").load(root).orderBy("k")
      .collect().toSeq ===
      TxLog.readTable(spark, root).orderBy("k").collect().toSeq)
  }

  test("txnAppId/txnVersion: a replayed idempotent write lands exactly " +
      "once; a stale one refuses; a column-losing append refuses") {
    val root = freshRoot("txn")
    import spark.implicits._
    Seq(("a", 1L, 10.0)).toDF("part", "k", "v")
      .write.format("txlog").partitionBy("part")
      .option("txnAppId", "jobX").option("txnVersion", "1")
      .mode("overwrite").save(root)                                // v1
    // the replay (same appId+version) must NOT double-land
    Seq(("a", 1L, 10.0)).toDF("part", "k", "v")
      .write.format("txlog")
      .option("txnAppId", "jobX").option("txnVersion", "1")
      .mode("append").save(root)
    assert(TxLog.readTable(spark, root).count() === 1L)
    assert(TxLog.currentVersion(spark, root) === 1L)
    // the next version lands
    Seq(("a", 2L, 20.0)).toDF("part", "k", "v")
      .write.format("txlog")
      .option("txnAppId", "jobX").option("txnVersion", "2")
      .mode("append").save(root)                                   // v2
    assert(TxLog.readTable(spark, root).count() === 2L)
    // an ANCIENT version refuses loudly (behind the ledger)
    val stale = intercept[Exception] {
      Seq(("a", 3L, 30.0)).toDF("part", "k", "v")
        .write.format("txlog")
        .option("txnAppId", "jobX").option("txnVersion", "1")
        .mode("append").save(root)
    }
    assert(stale.getMessage.contains("behind the table's ledger"),
      stale.getMessage)
    // txnAppId without txnVersion refuses
    val half = intercept[Exception] {
      Seq(("a", 4L, 40.0)).toDF("part", "k", "v")
        .write.format("txlog").option("txnAppId", "jobX")
        .mode("append").save(root)
    }
    assert(half.getMessage.contains("txnVersion"), half.getMessage)
    // a column-losing append refuses loudly (the additive schema guard)
    val lost = intercept[Exception] {
      Seq(("a", 5L)).toDF("part", "k")
        .write.format("txlog").mode("append").save(root)
    }
    assert(lost.getMessage.contains("drops or retypes"), lost.getMessage)
  }

  test("writes honor renames, CHECK constraints and the column mapping " +
      "through the bare writer") {
    val root = freshRoot("ddl")
    import spark.implicits._
    Seq(("a", 1L, 10.0)).toDF("part", "k", "v")
      .write.format("txlog").partitionBy("part").mode("overwrite")
      .save(root)                                                  // v1
    TxLog.renameColumnTx(spark, root, "v", "amount")               // v2
    TxLog.addCheckConstraintTx(spark, root, "pos", "amount > 0")   // v3
    // writers speak LOGICAL names post-rename
    Seq(("a", 2L, 20.0)).toDF("part", "k", "amount")
      .write.format("txlog").mode("append").save(root)             // v4
    assert(TxLog.readTable(spark, root).agg(sum("amount")).head.getDouble(0)
      === 30.0)
    // a violating batch refuses before any metadata changes
    val e = intercept[Exception] {
      Seq(("a", 3L, -1.0)).toDF("part", "k", "amount")
        .write.format("txlog").mode("append").save(root)
    }
    assert(e.getMessage.contains("pos"), e.getMessage)
    assert(TxLog.currentVersion(spark, root) === 4L)
  }

  test("overwriteTableTx drops absent partitions atomically and " +
      "conflict-rederives; the Complete-mode sink inherits it") {
    val root = freshRoot("fullow")
    import spark.implicits._
    TxLog.appendBatchTx(
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("part", "k"),
      root, "part", "ow-b1")                                       // v1
    val v = TxLog.overwriteTableTx(
      Seq(("a", 10L), ("d", 40L)).toDF("part", "k"), root, Seq("part"))
    assert(v === 2L)
    assert(TxLog.partitionValues(spark, root) === Set("a", "d"))
    assert(TxLog.readTable(spark, root).select("k")
      .collect().map(_.getLong(0)).toSet === Set(10L, 40L))
    // history intact: the pre-overwrite state time-travels
    assert(TxLog.readTableAt(spark, root, 1L).count() === 3L)
    // the emptied partitions survive a checkpoint crossing (the fold's
    // empty-entry drop is recorded state, not a driver-only view)
    TxLog.checkpoint(spark, root)
    assert(TxLog.partitionValues(spark, root) === Set("a", "d"))
    assert(TxLog.readTable(spark, root).count() === 2L)
  }

  test("Complete-mode sink: a group disappearing from a non-empty " +
      "Complete result drops its partition (full-replace semantics)") {
    val root = freshRoot("complete")
    val cp = freshRoot("complete-cp")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val agg = mem.toDF().toDF("part", "v")
      .groupBy("part").agg(sum("v").as("total"))
      // the load-bearing filter: a group can LEAVE the complete result
      .filter(col("total") <= 100L)
    val q = agg.writeStream.format("txlog")
      .outputMode("complete")
      .option("checkpointLocation", cp)
      .partitionBy("part")
      .start(root)
    try {
      mem.addData(("a", 10L), ("b", 20L))
      q.processAllAvailable()
      assert(TxLog.partitionValues(spark, root) === Set("a", "b"))
      // push b past the filter: it must DROP from the table
      mem.addData(("b", 200L))
      q.processAllAvailable()
      assert(TxLog.partitionValues(spark, root) === Set("a"),
        "a group filtered out of a Complete result must drop its partition")
      assert(TxLog.readTable(spark, root).select("total")
        .head.getLong(0) === 10L)
    } finally q.stop()
  }

  test("timestampAsOf accepts a timestamp STRING (the two time-travel " +
      "surfaces agree) and still accepts epoch millis") {
    val root = freshRoot("ts")
    import spark.implicits._
    Seq(("a", 1L)).toDF("part", "k")
      .write.format("txlog").partitionBy("part").mode("overwrite")
      .save(root)                                                  // v1
    // a far-future timestamp string resolves the current version
    assert(spark.read.format("txlog")
      .option("timestampAsOf", "2999-12-31 23:59:59").load(root)
      .count() === 1L)
    // epoch millis keep working
    assert(spark.read.format("txlog")
      .option("timestampAsOf", s"${System.currentTimeMillis() + 3600000L}")
      .load(root).count() === 1L)
    // a non-timestamp string is a loud error, not a NumberFormatException
    val e = intercept[Exception] {
      spark.read.format("txlog")
        .option("timestampAsOf", "not-a-time").load(root).count()
    }
    assert(e.getMessage.contains("not a timestamp"), e.getMessage)
    // a PRE-table timestamp string refuses the same way the long form does
    val early = intercept[Exception] {
      spark.read.format("txlog")
        .option("timestampAsOf", "1999-01-01").load(root).count()
    }
    assert(early.getMessage.contains("predates"), early.getMessage)
  }
}
