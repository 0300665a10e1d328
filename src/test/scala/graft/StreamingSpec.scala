package graft

import graft.streaming.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** ST1: the streaming surface computes the same answers as batch — the same
  * windowed-agg plan is run over a MemoryStream and over the identical rows
  * as a batch DataFrame, and the results must match (SURVEY §2.10 plan). */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (ts("2024-01-01 00:10:00"), "click", 1.0, 100L, 1L),
    (ts("2024-01-01 05:00:00"), "click", 2.0, 100L, 2L),
    (ts("2024-01-01 09:30:00"), "view",  3.0, 101L, 3L),
    (ts("2024-01-02 00:00:01"), "click", 4.0, 101L, 4L),
    (ts("2024-01-02 12:00:00"), "view",  5.0, 100L, 5L)
  )

  test("windowedTypeCounts: streaming result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long, Long)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value", "user_id", "event_id")
    val q = Events.toMemorySink(
      Events.windowedTypeCounts(streamDf, "1 day", "1 hour"), "stream_counts").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_counts")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = Events.windowedTypeCounts(
          rows.toDF("ts", "event_type", "value", "user_id", "event_id"), "1 day", "1 hour")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("windowedUserActivity runs on a stream with watermark state bounds") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long, Long)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value", "user_id", "event_id")
    val q = Events.toMemorySink(
      Events.windowedUserActivity(streamDf, "1 hour", "1 hour"), "stream_user").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("stream_user").collect()
      assert(got.length == 5)  // each event in its own (hour, user) cell here
      assert(got.forall(_.getAs[Long]("total_events") == 1L))
    } finally q.stop()
  }

  test("rate-source click stream is a valid streaming plan") {
    val s = graft.sources.Generator.clickStream(spark, rowsPerSecond = 10, seed = 1)
    assert(s.isStreaming)
    assert(s.columns.toSeq == Seq("event_id", "customer_id", "event_type", "ts"))
  }
}
