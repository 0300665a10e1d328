package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Sessions
import graft.sources.TxLog

/** Interleaved in-JVM A/B of the parsed-log cache (the r15-mf
  * measurement rule: separate bench windows drift ±40%, so cache-on and
  * cache-off executions alternate inside ONE JVM and medians compare).
  *
  * Builds a tx table with a checkpoint plus a commit tail, then times a
  * metadata-bound read (currentVersion + tableMeta + a count through
  * readTable's plan construction) N times per mode, alternating modes
  * per iteration. Prints one JSON line with both medians.
  */
object LogCachePerf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    import spark.implicits._
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-lcperf/t"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    // 40 partitions, a checkpoint, then a 12-commit tail — the shape a
    // hot table sits in between maintenance runs
    val base = (1 to 4000).map(i => (s"p${i % 40}", i.toLong, i * 1.5))
      .toDF("part", "k", "v")
    TxLog.appendBatchTx(base, root, "part", "lc-seed")
    TxLog.checkpoint(spark, root): Unit
    (1 to 12).foreach { i =>
      TxLog.appendBatchTx(Seq((s"p${i % 40}", 100000L + i, 1.0))
        .toDF("part", "k", "v"), root, "part", s"lc-tail-$i")
    }
    def once(): Unit = {
      TxLog.currentVersion(spark, root): Unit
      // plan construction is the metadata-bound path: schema + file index
      TxLog.readTable(spark, root).queryExecution.executedPlan: Unit
    }
    once() // warm codegen/JIT before timing either mode
    val n = args.headOption.map(_.toInt).getOrElse(40)
    val times = collection.mutable.Map("on" -> Vector.empty[Double],
      "off" -> Vector.empty[Double])
    (1 to n).foreach { i =>
      val mode = if (i % 2 == 0) "on" else "off"
      spark.conf.set("graft.txlog.logCache", (mode == "on").toString)
      if (mode == "off") TxLog.clearLogCache()
      val t0 = System.nanoTime()
      once()
      times(mode) = times(mode) :+ (System.nanoTime() - t0) / 1e6
    }
    def median(v: Vector[Double]): Double = v.sorted.apply(v.length / 2)
    println(s"""{"metric":"logcache_read_ms","on":${median(times("on"))},""" +
      s""""off":${median(times("off"))},"n":$n}""")
    spark.stop()
  }
}
