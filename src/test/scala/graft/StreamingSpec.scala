package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured Streaming: windowed aggregation with watermark, and the
  * custom flatMapGroupsWithState session counter, driven through a
  * MemoryStream micro-batch. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed type counts over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    ms.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "click", 2.0),
      Event(3, ts(2), 2, "view", 3.0),
      Event(4, ts(7), 1, "click", 4.0))
    val q = EventStream.windowedTypeCounts(ms.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      val out = spark.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("win_start").toString,
          r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
      assert(out(("2024-01-01 10:00:00.0", "click")) == 2)
      assert(out(("2024-01-01 10:00:00.0", "view")) == 1)
      assert(out(("2024-01-01 10:05:00.0", "click")) == 1)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered event ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventStream.dedupStream(ms.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      // batch 2 re-delivers event 1 within the watermark
      ms.addData(Event(1, ts(0), 1, "click", 1.0), Event(3, ts(2), 2, "view", 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("stateful session counting across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventStream.userSessionCounts(ms.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update).start()
    try {
      ms.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "view", 1.0))
      q.processAllAvailable()
      // second batch: 40 minutes later -> new session for user 7
      ms.addData(Event(3, ts(45), 7, "click", 1.0), Event(4, ts(46), 9, "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_count")))
      assert(out.contains((7L, 1L)), s"first batch: $out")
      assert(out.contains((7L, 2L)), s"gap opens a second session: $out")
      assert(out.contains((9L, 1L)))
    } finally q.stop()
  }
}
