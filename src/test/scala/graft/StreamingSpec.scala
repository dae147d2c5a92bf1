package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.GraftCatalog
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

  test("bounded replay probe: finds committed tags, stops at this sink's older tag, ignores other namespaces") {
    import org.apache.spark.sql.functions.col
    import graft.sources.GraftCatalog
    val root = s"/tmp/graft-streaming/replay_${System.nanoTime()}"
    val df = spark.range(5).select(col("id"))
    // batches 1..3 for the default namespace, interleaved with another
    // sink's batch 9 (whose higher id must NOT terminate the scan) and
    // a non-numeric-suffix tag
    GraftCatalog.commitSnapshotBatch(df, root, 1L)
    GraftCatalog.commitSnapshotBatch(df, root, 9L, sinkId = "other")
    GraftCatalog.commitSnapshotBatch(df, root, 2L)
    GraftCatalog.commitSnapshotBatch(df, root, 3L)
    assert(GraftCatalog.findBatchReplay(spark, root, "#batch:", 2L).contains(3L),
      "committed batch resolves to its version")
    assert(GraftCatalog.findBatchReplay(spark, root, "#batch:", 7L).isEmpty,
      "uncommitted id above the newest tag probes empty (bounded at tag 3)")
    assert(GraftCatalog.findBatchReplay(spark, root, "#batch:other:", 9L)
      .contains(2L), "namespaced tags resolve within their own prefix")
    // replay through the public wrapper: no new version
    val head = GraftCatalog.snapshotVersions(spark, root).last
    assert(GraftCatalog.commitSnapshotBatch(df, root, 2L) == 3L)
    assert(GraftCatalog.snapshotVersions(spark, root).last == head)
  }

  test("foreachBatch sink lands batches idempotently under replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val out = "/tmp/graft-streams/idem_sink"
    val ms = MemoryStream[Event]
    ms.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "view", 2.0))
    val q = EventStream.toIdempotentParquet(ms.toDF(), out)
      .option("checkpointLocation", out + "_ckpt_" + System.nanoTime()).start()
    try {
      q.processAllAvailable()
      ms.addData(Event(3, ts(2), 1, "click", 3.0))
      q.processAllAvailable()
      val landed = spark.read.parquet(out)
      assert(landed.count() == 3)
      // simulate an at-least-once redelivery of batch 1: the keyed
      // overwrite must leave the table unchanged, not append duplicates
      val replay = Seq(Event(3, ts(2), 1, "click", 3.0)).toDF()
      EventStream.writeBatch(replay, 1L, out)
      assert(spark.read.parquet(out).count() == 3,
        "replayed batch duplicated rows")
      assert(spark.read.parquet(out).select("event_id").distinct().count() == 3)
    } finally q.stop()
  }

  test("sink maintenance: per-partition compaction after fragmented batch landings") {
    import org.apache.spark.sql.functions.sum
    // a foreachBatch sink's long-run pathology: every micro-batch lands
    // its own small files; the fix is a per-partition-dir maintenance
    // pass — exactly what compactParquet does. Land three artificially
    // fragmented batches, compact each batch_id dir, and check rows,
    // checksum, and the partition column all survive the swap.
    val out = "/tmp/graft-streams/compact_sink_" + System.nanoTime()
    for (b <- 0 until 3) {
      val batch = spark.range(b * 100L, (b + 1) * 100L)
        .toDF("event_id").repartition(12)
      EventStream.writeBatch(batch, b.toLong, out)
    }
    assert(spark.read.parquet(out).count() == 300)
    val dirs = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("batch_id="))
    assert(dirs.length == 3)
    val results = dirs.map(d =>
      graft.sources.GraftCatalog.compactParquet(spark, d.getAbsolutePath))
    assert(results.forall { case (before, after) => before >= 10 && after == 1 },
      s"compaction results: ${results.mkString(",")}")
    val back = spark.read.parquet(out)
    assert(back.count() == 300)
    assert(back.select("batch_id").distinct().count() == 3,
      "partition column lost in the swap")
    assert(back.agg(sum("event_id")).head.getLong(0) == (0L until 300L).sum)
  }

  test("two source streams union into one watermarked windowed aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, window}
    // the multi-source ingest shape: two independent feeds (e.g. two
    // regions' collectors) union BEFORE the stateful stage, so one
    // watermark and one state store cover both
    val a = MemoryStream[Event]
    val b = MemoryStream[Event]
    val unioned = a.toDF().unionByName(b.toDF())
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .count()
    val q = unioned.writeStream.format("memory")
      .queryName("union_counts").outputMode(OutputMode.Complete()).start()
    try {
      a.addData(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 2, "view", 1.0))
      b.addData(Event(3, ts(3), 3, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("union_counts")
        .select("event_type", "count").as[(String, Long)].collect().toMap
      assert(got == Map("click" -> 2L, "view" -> 1L),
        s"union stream counts wrong: $got")
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

  test("parquet file source streams a directory of drops incrementally") {
    import spark.implicits._
    val dir = "/tmp/graft-stream-src"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def drop(name: String, evs: Event*): Unit =
      evs.toDS().write.mode("overwrite").parquet(s"$dir/$name")
    // the source schema comes from a batch sample of the same shape
    val schema = Seq.empty[Event].toDS().schema
    drop("f1", Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "click", 2.0))
    val q = EventStream.windowedTypeCounts(
        EventStream.fromParquetDir(spark, s"$dir/*", schema))
      .writeStream.format("memory").queryName("file_counts")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_counts").collect()
        .map(_.getAs[Long]("n")).sum == 2)
      // a second file lands later; the tail picks it up without restart
      drop("f2", Event(3, ts(2), 2, "view", 3.0))
      q.processAllAvailable()
      val out = spark.table("file_counts").collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
      assert(out("click") == 2 && out("view") == 1)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog rate-limited, stops, and resumes incrementally") {
    import spark.implicits._
    val root = "/tmp/graft-stream-an-" + System.nanoTime()
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    def drop(name: String, evs: Event*): Unit =
      evs.toDS().write.mode("overwrite").parquet(s"$in/$name")
    val schema = Seq.empty[Event].toDS().schema
    def src = EventStream.fromParquetDir(spark, s"$in/*", schema, maxFilesPerTrigger = 1)

    // backlog of two files; maxFilesPerTrigger=1 forces multiple
    // micro-batches, which AvailableNow must drain COMPLETELY (the
    // deprecated Trigger.Once would stop after one batch)
    drop("f1", Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
    drop("f2", Event(3, ts(2), 2, "click", 3.0))
    EventStream.drainAvailableNow(EventStream.toIdempotentParquet(src, out), ckpt)
    assert(spark.read.parquet(out).count() == 3, "first drain missed backlog files")
    val batchDirsAfter1 = new java.io.File(out).listFiles
      .count(_.getName.startsWith("batch_id="))
    assert(batchDirsAfter1 >= 2, "rate limit ignored: backlog drained in one batch")

    // drain with nothing new: terminates, lands nothing
    EventStream.drainAvailableNow(EventStream.toIdempotentParquet(src, out), ckpt)
    assert(spark.read.parquet(out).count() == 3, "empty drain changed the sink")

    // a late file lands; the next drain picks up ONLY it
    drop("f3", Event(4, ts(3), 2, "purchase", 4.0), Event(5, ts(4), 1, "click", 5.0))
    EventStream.drainAvailableNow(EventStream.toIdempotentParquet(src, out), ckpt)
    val landed = spark.read.parquet(out)
    assert(landed.count() == 5)
    val newDirs = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("batch_id=")).sortBy(_.getName)
      .drop(batchDirsAfter1)
    val run3Ids = spark.read.parquet(newDirs.map(_.getAbsolutePath): _*)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(run3Ids == Set(4L, 5L), s"third drain reprocessed old files: $run3Ids")

    // union of drains == one continuous run over the same input
    val continuous = spark.read.parquet(s"$in/*").select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed.select("event_id").collect().map(_.getLong(0)).toSet == continuous)
  }

  test("stream-static broadcast enrichment joins events to a dim table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStream.enrich(ms.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      ms.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "view", 1.0),
        Event(3, ts(2), 99, "view", 1.0)) // no dim row -> dropped (inner)
      q.processAllAvailable()
      val out = spark.table("enriched").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("tier"))).toSet
      assert(out == Set((1L, "gold"), (2L, "basic")))
    } finally q.stop()
  }

  test("watermarked stream-stream join attributes views to clicks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventStream.clickViewJoin(clicks.toDF(), views.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Event(10, ts(0), 1, "click", 1.0), Event(11, ts(0), 2, "click", 1.0))
      views.addData(
        Event(20, ts(5), 1, "view", 1.0),   // within 10 min of click 10
        Event(21, ts(25), 1, "view", 1.0),  // too late for click 10
        Event(22, ts(3), 3, "view", 1.0))   // no click for user 3
      q.processAllAvailable()
      // advance both watermarks so joinable pairs are final
      clicks.addData(Event(12, ts(59), 9, "click", 1.0))
      views.addData(Event(23, ts(59), 9, "other", 1.0))
      q.processAllAvailable()
      val pairs = spark.table("attrib").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id"))).toSet
      assert(pairs.contains((10L, 20L)), s"missing attribution: $pairs")
      assert(!pairs.exists(_._2 == 21L), "view outside the 10-minute bound was joined")
      assert(!pairs.exists(_._2 == 22L), "view with no matching click was joined")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null-view rows after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventStream.clickViewLeftJoin(clicks.toDF(), views.toDF())
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        Event(10, ts(0), 1, "click", 1.0),  // will match
        Event(11, ts(0), 2, "click", 1.0))  // never matches
      views.addData(Event(20, ts(5), 1, "view", 1.0))
      q.processAllAvailable()
      // push both watermarks far past click 11's join window so the
      // engine can certify "no view can still arrive" and emit the
      // outer row; the certification needs one more batch to land
      clicks.addData(Event(12, ts(59), 9, "click", 1.0))
      views.addData(Event(23, ts(59), 9, "other", 1.0))
      q.processAllAvailable()
      clicks.addData(Event(13, Timestamp.valueOf("2024-01-01 11:30:00"), 9, "click", 1.0))
      views.addData(Event(24, Timestamp.valueOf("2024-01-01 11:30:00"), 9, "other", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer").collect()
        .map(r => (r.getAs[Long]("click_id"),
          Option(r.getAs[java.lang.Long]("view_id")).map(_.toLong)))
      assert(rows.contains((10L, Some(20L))), s"matched pair missing: ${rows.toSeq}")
      assert(rows.contains((11L, None)),
        s"unmatched click never emitted its outer row: ${rows.toSeq}")
    } finally q.stop()
  }

  test("event-time timeout evicts idle session state past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val q = EventStream.userSessionCounts(ms.toDS())
      .writeStream.format("memory").queryName("evicted")
      .outputMode(OutputMode.Update).start()
    try {
      ms.addData(Event(1, ts(0), 7, "click", 1.0))
      q.processAllAvailable()
      // watermark (10 min lateness) must pass 7's timeout (last event
      // + 30 min gap): an event at +60 min pushes it to +50 min
      ms.addData(Event(2, Timestamp.valueOf("2024-01-01 11:00:00"), 9, "view", 1.0))
      q.processAllAvailable()
      // the timed-out group fires on the following batch
      ms.addData(Event(3, Timestamp.valueOf("2024-01-01 11:01:00"), 9, "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("evicted").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_count"),
          r.getAs[Boolean]("closed")))
      assert(out.contains((7L, 1L, true)),
        s"user 7's state was never evicted by the event-time timeout: ${out.toSeq}")
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

  test("sliding windows count each event in every overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    // 10:07 lies in [10:00,10:10) and [10:05,10:15) — both must count it
    ms.addData(Event(1, ts(7), 1, "click", 1.0))
    val q = EventStream.slidingTypeCounts(ms.toDF())
      .writeStream.format("memory").queryName("slide_counts")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      val wins = spark.table("slide_counts").collect()
        .map(r => r.getAs[Timestamp]("win_start").toString -> r.getAs[Long]("n"))
        .toMap
      assert(wins == Map(
        "2024-01-01 10:00:00.0" -> 1L,
        "2024-01-01 10:05:00.0" -> 1L), s"got $wins")
    } finally q.stop()
  }

  test("composed streaming pipeline: dedup then windowed counts in one query") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    // event 2 is delivered twice (at-least-once redelivery): the
    // composed dedup→window plan must count it once
    ms.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "click", 2.0),
      Event(2, ts(1), 1, "click", 2.0),
      Event(3, ts(2), 2, "view", 3.0))
    val q = EventStream.dedupedWindowedCounts(ms.toDF())
      .writeStream.format("memory").queryName("dedup_win")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      val out = spark.table("dedup_win").collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
      assert(out("click") == 2, s"redelivered event double-counted: $out")
      assert(out("view") == 1)
    } finally q.stop()
  }

  test("composed dedup → sliding window → static enrich counts redelivery once, enriched") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[Event]
    // event 2 redelivered: the composed three-stage plan must count it
    // once, land it in BOTH overlapping windows, and carry the tier
    ms.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "click", 2.0),
      Event(2, ts(1), 1, "click", 2.0),
      Event(3, ts(2), 2, "view", 3.0))
    val q = EventStream.dedupedWindowedEnriched(ms.toDF(), dim)
      .writeStream.format("memory").queryName("dedup_win_enrich")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("dedup_win_enrich").collect()
      val byKey = rows.map(r => (r.getAs[Timestamp]("win_start").toString,
        r.getAs[Long]("user_id")) -> (r.getAs[Long]("n"), r.getAs[String]("tier"))).toMap
      // user 1's two deduped events (10:00, 10:01) hit windows 09:55 and 10:00
      assert(byKey(("2024-01-01 09:55:00.0", 1L)) == ((2L, "gold")),
        s"redelivery double-counted or enrich lost: $byKey")
      assert(byKey(("2024-01-01 10:00:00.0", 1L)) == ((2L, "gold")))
      assert(byKey(("2024-01-01 10:00:00.0", 2L)) == ((1L, "basic")))
    } finally q.stop()
  }

  test("native session windows merge by gap on the stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    // user 1: events at 10:00 and 10:10 (one session — gap < 30 min),
    // then 11:00 (new session); user 2: one event
    ms.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "view", 3.0),
      Event(4, ts(5), 2, "view", 4.0))
    // session windows support Append only: a session emits once the
    // watermark passes its end (finalized, exactly once)
    val q = EventStream.sessionWindowCounts(ms.toDF())
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // advance the watermark past every open session's end
      ms.addData(Event(5, Timestamp.valueOf("2024-01-01 13:00:00"), 3, "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_win").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("sess_start").toString) ->
          (r.getAs[Long]("n"), r.getAs[Timestamp]("sess_end").toString)).toMap
      // session end = last event + gap
      assert(out((1L, "2024-01-01 10:00:00.0")) == ((2L, "2024-01-01 10:40:00.0")),
        s"gap merge wrong: $out")
      assert(out((1L, "2024-01-01 11:00:00.0")) == ((1L, "2024-01-01 11:30:00.0")))
      assert(out((2L, "2024-01-01 10:05:00.0")) == ((1L, "2024-01-01 10:35:00.0")))
    } finally q.stop()
  }

  test("stateful streaming runs on the RocksDB state store provider") {
    // The default HDFS-backed provider keeps every key in executor
    // heap — fine at test scale, fatal for 100 TB watermark state.
    // RocksDB spills state to local disk with bounded memory; the SAME
    // declarative pipeline must produce the SAME answer on it.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      ms.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "click", 2.0),
        Event(2, ts(1), 1, "click", 2.0), // redelivered
        Event(3, ts(2), 2, "view", 3.0))
      val q = EventStream.dedupedWindowedCounts(ms.toDF())
        .writeStream.format("memory").queryName("rocksdb_counts")
        .outputMode(OutputMode.Update).start()
      try {
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.nonEmpty) // stateful work really ran
        val out = spark.table("rocksdb_counts").collect()
          .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
        assert(out("click") == 2, s"RocksDB path double-counted redelivery: $out")
        assert(out("view") == 1)
      } finally q.stop()
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("transformWithState tracks composite typed state across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // arbitrary-state v2 requires the RocksDB provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = EventStream.userTypeStats(ms.toDS())
        .writeStream.format("memory").queryName("type_stats")
        .outputMode(OutputMode.Update).start()
      try {
        ms.addData(
          Event(1, ts(0), 1, "click", 1.0),
          Event(2, ts(1), 1, "view", 2.0))
        q.processAllAvailable()
        // second batch: view pulls ahead for user 1; user 2 appears
        ms.addData(
          Event(3, ts(2), 1, "view", 3.0),
          Event(4, ts(3), 2, "click", 4.0))
        q.processAllAvailable()
        val rows = spark.table("type_stats").collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_types"),
            r.getAs[String]("top_type"), r.getAs[Long]("top_count"),
            r.getAs[Double]("total_value")))
        // batch 1, user 1: tie click/view at 1 → type-asc picks click
        assert(rows.contains((1L, 2L, "click", 1L, 3.0)), s"got ${rows.toSeq}")
        // batch 2, user 1: map state carried across batches, view now 2
        assert(rows.contains((1L, 2L, "view", 2L, 6.0)), s"got ${rows.toSeq}")
        assert(rows.contains((2L, 1L, "click", 1L, 4.0)), s"got ${rows.toSeq}")
      } finally q.stop()
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("StreamingQueryListener observes per-batch progress: input rows and state metrics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener.{
      QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
    // the production observability surface: every micro-batch reports
    // rows, durations and state-store size through the listener bus —
    // this is how a 100 TB deployment alarms on lag and state growth,
    // without touching the query itself
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[QueryProgressEvent]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = seen.add(e)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val ms = MemoryStream[Event]
      val q = EventStream.windowedTypeCounts(ms.toDF())
        .writeStream.format("memory").queryName("listener_counts")
        .outputMode(OutputMode.Update).start()
      try {
        ms.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 1.0))
        q.processAllAvailable()
        ms.addData(Event(3, ts(2), 2, "click", 1.0))
        q.processAllAvailable()
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        def progresses = seen.toArray(Array.empty[QueryProgressEvent])
          .filter(_.progress.id == q.id)
        while (progresses.map(_.progress.numInputRows).sum < 3
            && System.nanoTime() < deadline) Thread.sleep(100)
        val ps = progresses
        assert(ps.map(_.progress.numInputRows).sum == 3,
          s"listener saw ${ps.map(_.progress.numInputRows).toSeq} input rows")
        // the stateful agg must report its state store through progress
        val withState = ps.filter(_.progress.stateOperators.nonEmpty)
        assert(withState.nonEmpty, "no stateOperators in any progress event")
        assert(withState.exists(_.progress.stateOperators.head.numRowsTotal > 0),
          "state rows never reported > 0")
      } finally q.stop()
    } finally spark.streams.removeListener(listener)
  }

  test("state TTL ages out idle keys: active keys accumulate, expired keys restart from zero") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      // ProcessingTime mode keeps scheduling batches as the clock
      // advances, so processAllAvailable never quiesces — pace the
      // engine with an interval trigger and POLL the sink instead
      val q = EventStream.userRecentCounts(ms.toDS(), java.time.Duration.ofSeconds(10))
        .writeStream.format("memory").queryName("ttl_counts")
        .outputMode(OutputMode.Update)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
        .start()
      try {
        def latest(): Map[Long, Long] = spark.table("ttl_counts").collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_recent")))
          .zipWithIndex.groupBy(_._1._1)
          .map { case (u, rs) => u -> rs.maxBy(_._2)._1._2 }
        def awaitLatest(expect: Map[Long, Long], why: String): Unit = {
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          while (latest() != expect && System.nanoTime() < deadline)
            Thread.sleep(100)
          assert(latest() == expect, s"$why: ${latest()}")
        }
        ms.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 1.0))
        awaitLatest(Map(1L -> 2L), "first batch counts both events")
        // within TTL: state carries, count accumulates
        ms.addData(Event(3, ts(2), 1, "click", 1.0))
        awaitLatest(Map(1L -> 3L), "state inside TTL must accumulate")
        // let the entry age past the 10 s TTL, then touch the key again:
        // the expired counter must restart at 1, not reach 4 (the TTL
        // is generous because early RocksDB micro-batches take seconds
        // — a tight TTL can expire between two ACTIVE batches)
        Thread.sleep(12000)
        ms.addData(Event(4, ts(3), 1, "view", 1.0))
        awaitLatest(Map(1L -> 1L), "expired state must restart from zero")
      } finally q.stop()
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming pattern matching counts funnel matches incrementally, batch-parity on terminal patterns") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val classify: EventStream.Event => String = e => e.event_type match {
      case "signup" => "S"; case "click" => "C"; case "view" => "V"
      case "purchase" => "P"; case _ => "X"
    }
    try {
      val ms = MemoryStream[Event]
      val q = EventStream.patternMatchCounts(ms.toDS(), "S[CV]*P", classify)
        .writeStream.format("memory").queryName("pat_counts")
        .outputMode(OutputMode.Update).start()
      def latest(): Map[Long, Long] = spark.table("pat_counts")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_matches").as("n"))
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
      try {
        // u1's funnel spans the batch boundary: S C | V P
        ms.addData(Event(1, ts(0), 1, "signup", 0), Event(2, ts(1), 1, "click", 0),
          Event(3, ts(0), 2, "click", 0), Event(4, ts(1), 2, "view", 0),
          Event(5, ts(2), 2, "purchase", 0))
        q.processAllAvailable()
        assert(latest() == Map(1L -> 0L, 2L -> 0L),
          s"no terminal P yet for u1, no S for u2: ${latest()}")
        ms.addData(Event(6, ts(2), 1, "view", 0), Event(7, ts(3), 1, "purchase", 0),
          Event(8, ts(2), 2, "signup", 0), Event(9, ts(3), 2, "error", 0),
          Event(10, ts(4), 2, "purchase", 0))
        q.processAllAvailable()
        // u1: SCVP completed across batches; u2: SEP never matches
        assert(latest() == Map(1L -> 1L, 2L -> 0L), s"${latest()}")
        ms.addData(Event(11, ts(4), 1, "signup", 0), Event(12, ts(5), 1, "purchase", 0))
        q.processAllAvailable()
        assert(latest() == Map(1L -> 2L, 2L -> 0L), s"${latest()}")

        // batch parity: the batch operator over ALL events agrees
        val allEvents = Seq(
          (1L, ts(0), "signup"), (1L, ts(1), "click"), (1L, ts(2), "view"),
          (1L, ts(3), "purchase"), (1L, ts(4), "signup"), (1L, ts(5), "purchase"),
          (2L, ts(0), "click"), (2L, ts(1), "view"), (2L, ts(2), "purchase"),
          (2L, ts(2), "signup"), (2L, ts(3), "error"), (2L, ts(4), "purchase"))
          .zipWithIndex.map { case ((u, t, et), i) => (u, t, i.toLong, et) }
          .toDF("user_id", "ts", "event_id", "etype")
        // NOTE: event_ids differ from the stream's, but within-(user,ts)
        // order only breaks ties between DIFFERENT symbols for u2's
        // (view@ts2? no — click/view distinct ts) — the only tie is u2's
        // purchase/signup at ts(2), ordered purchase-then-signup in both.
        val batch = graft.operators.PatternMatch.symbolSequence(
          allEvents, "user_id", "ts", "event_id",
          Seq(graft.operators.PatternMatch.Sym('S', org.apache.spark.sql.functions.col("etype") === "signup"),
            graft.operators.PatternMatch.Sym('C', org.apache.spark.sql.functions.col("etype") === "click"),
            graft.operators.PatternMatch.Sym('V', org.apache.spark.sql.functions.col("etype") === "view"),
            graft.operators.PatternMatch.Sym('P', org.apache.spark.sql.functions.col("etype") === "purchase")))
        val batchCounts = batch.select(org.apache.spark.sql.functions.col("pk"),
          graft.operators.PatternMatch.matchCount(
            org.apache.spark.sql.functions.col("seq"), "S[CV]*P").as("n"))
          .collect().map(r => r.getAs[Long]("pk") -> r.getAs[Long]("n")).toMap
        assert(batchCounts == latest(), s"batch $batchCounts vs stream ${latest()}")
      } finally q.stop()
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming z-order sink prunes 2-D scans near batch-layout quality; compaction preserves it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, min, max}
    // real corpus, arriving in TIME ORDER (the production pattern that
    // makes a naive streamed layout unprunable on the user dimension)
    val ev = Tables.df(spark, "/root/testdata/sf0.01", "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("tsl"))
    val rows = ev.orderBy("tsl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = rows.length.toLong
    val zsDir = "/tmp/graft-streams/zsink_" + System.nanoTime()
    val ms = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.ZOrderStream.toZOrderedParquet(
        ms.toDF().toDF("event_id", "user_id", "tsl"),
        Seq("user_id", "tsl"), zsDir,
        filesPerBatch = 1, rowGroupBytes = 16 * 1024, resketchEvery = 2)
      .option("checkpointLocation", zsDir + "_ckpt").start()
    try {
      rows.grouped((rows.length / 5) + 1).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // batch-written reference layout on the same data, same granularity
    val zbDir = "/tmp/graft-streams/zbatch_" + System.nanoTime()
    GraftCatalog.zOrderWrite(ev, "user_id", "tsl", zbDir,
      nFiles = 4, rowGroupBytes = 16 * 1024)
    val (uLo, uHi) = {
      val r = ev.agg(min("user_id"), max("user_id")).head
      (r.getLong(0), r.getLong(0) + math.max(1L, (r.getLong(1) - r.getLong(0)) / 10))
    }
    def scanned(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir).where(col("user_id").between(uLo, uHi))
      val kept = df.count()
      val qe = df.queryExecution
      df.collect()
      (kept, qe.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum)
    }
    val (keptB, scanB) = scanned(zbDir)
    val (keptS, scanS) = scanned(zsDir)
    assert(keptS == keptB && keptS > 0, s"layouts disagree: $keptS vs $keptB")
    assert(scanS <= 2 * scanB,
      s"streamed z-layout prunes too little: scanned $scanS vs batch $scanB (total $total)")
    // the maintenance story: global re-cluster beats per-batch clustering
    // and must stay within the same bound of the batch layout
    val (before, after) = graft.streaming.ZOrderStream.compactZOrdered(
      spark, zsDir, Seq("user_id", "tsl"),
      targetBytes = 64 * 1024, rowGroupBytes = 16 * 1024)
    assert(after <= before, s"compaction grew the file count: $before -> $after")
    val (keptC, scanC) = scanned(zsDir)
    assert(keptC == keptB, s"compaction changed the data: $keptC vs $keptB")
    assert(scanC <= 2 * scanB,
      s"compacted z-layout prunes too little: scanned $scanC vs batch $scanB")
  }

  test("rate-limited source emits exactly rowsPerBatch deterministic events per trigger") {
    val q = EventStream.rateEvents(spark, rowsPerBatch = 20)
      .writeStream.format("memory").queryName("rate_events")
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val rows = spark.table("rate_events").collect()
      assert(rows.length == 20, s"expected one 20-row batch, got ${rows.length}")
      val ids = rows.map(_.getAs[Long]("event_id")).sorted
      assert(ids.sameElements(0L until 20L), "ids must be the dense batch range")
      rows.foreach { r =>
        assert(r.getAs[Long]("user_id") == r.getAs[Long]("event_id") % 50)
        assert(Set("click", "view", "purchase", "error", "login")
          .contains(r.getAs[String]("event_type")))
      }
    } finally q.stop()
  }

  test("streaming exactly-once snapshot commits: versions per batch, replay is a no-op, time travel live") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = "/tmp/graft-streams/snapsink_" + System.nanoTime()
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "v").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        GraftCatalog.commitSnapshotBatch(b, root, id); ()
      }
      .option("checkpointLocation", root + "_ckpt").start()
    try {
      Seq(Seq((1L, "a"), (2L, "b")), Seq((3L, "c")), Seq((4L, "d"), (5L, "e")))
        .foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def ids(v: Option[Long]) = GraftCatalog.readSnapshot(spark, root, v)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(GraftCatalog.snapshotVersions(spark, root) == Seq(1L, 2L, 3L))
    assert(ids(None) == Set(1L, 2L, 3L, 4L, 5L))
    // time travel INTO the stream's history: each version is the
    // table as of that micro-batch
    assert(ids(Some(1)) == Set(1L, 2L))
    assert(ids(Some(2)) == Set(1L, 2L, 3L))
    // a crash-replay of batch 1 must be a no-op, not a duplicate append
    val v = GraftCatalog.commitSnapshotBatch(
      Seq((3L, "c")).toDF("id", "v"), root, batchId = 1L)
    assert(v == 2L, s"replay must return the already-committed version, got $v")
    assert(GraftCatalog.snapshotVersions(spark, root) == Seq(1L, 2L, 3L))
    assert(ids(None) == Set(1L, 2L, 3L, 4L, 5L))
    // CDC over the stream's history: what did batch 3 do?
    val diff = GraftCatalog.snapshotDiff(spark, root, fromV = 2, toV = 3, pk = "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(1L -> "unchanged", 2L -> "unchanged", 3L -> "unchanged",
      4L -> "added", 5L -> "added"), s"snapshot diff wrong: $diff")
  }

  test("streaming merge sink: CDC upserts land exactly-once, head equals sequential relational upserts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = "/tmp/graft-streams/mergesink_" + System.nanoTime()
    // seed table: keys 1..5
    GraftCatalog.commitSnapshot(
      (1 to 5).map(i => (i.toLong, s"base$i")).toDF("id", "v"),
      root, append = false)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "v").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        GraftCatalog.mergeSnapshotBatch(spark, root, b, "id", id); ()
      }
      .option("checkpointLocation", root + "_ckpt").start()
    try {
      // batch 0 updates key 2 + inserts 10; batch 1 re-updates 2 and
      // updates 4; batch 2 inserts 11
      Seq(Seq((2L, "u2a"), (10L, "n10")),
          Seq((2L, "u2b"), (4L, "u4")),
          Seq((11L, "n11")))
        .foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def byId(v: Option[Long]) = GraftCatalog.readSnapshot(spark, root, v)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // one CDC version per micro-batch on top of the seed
    assert(GraftCatalog.snapshotVersions(spark, root) == Seq(1L, 2L, 3L, 4L))
    // head == base upserted by each batch in order, exactly once
    assert(byId(None) == Map(1L -> "base1", 2L -> "u2b", 3L -> "base3",
      4L -> "u4", 5L -> "base5", 10L -> "n10", 11L -> "n11"))
    // time travel INTO the CDC history: the table as of batch 0
    assert(byId(Some(2L)) == Map(1L -> "base1", 2L -> "u2a", 3L -> "base3",
      4L -> "base4", 5L -> "base5", 10L -> "n10"))
    // crash-replay of batch 1 must be a no-op, not a double-apply
    val v = GraftCatalog.mergeSnapshotBatch(spark, root,
      Seq((2L, "u2b"), (4L, "u4")).toDF("id", "v"), "id", batchId = 1L)
    assert(v == 3L, s"replay must return the already-applied version, got $v")
    assert(GraftCatalog.snapshotVersions(spark, root) == Seq(1L, 2L, 3L, 4L))
    assert(byId(None)(2L) == "u2b")
    // the table's own history answers "what did batch 1 do"
    val diff = GraftCatalog.snapshotDiff(spark, root, fromV = 2, toV = 3, pk = "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff(2L) == "changed" && diff(4L) == "changed" &&
      diff(1L) == "unchanged" && diff(10L) == "unchanged", s"diff: $diff")
  }

  test("streaming CDC sink: a real stream of I/U/D batches lands exactly-once, deletes included") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = "/tmp/graft-streams/cdcsink_" + System.nanoTime()
    GraftCatalog.commitSnapshot(
      (1 to 5).map(i => (i.toLong, s"base$i")).toDF("id", "v"),
      root, append = false)
    val ms = MemoryStream[(Long, String, String)]
    val q = ms.toDF().toDF("id", "v", "_op").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        GraftCatalog.applyCdcSnapshotBatch(spark, root, b, "id", id); ()
      }
      .option("checkpointLocation", root + "_ckpt").start()
    try {
      // batch 0: update 2, delete 3; batch 1: insert 10, delete 5
      Seq(Seq((2L, "u2", "U"), (3L, "x", "D")),
          Seq((10L, "n10", "I"), (5L, "x", "D")))
        .foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def byId(v: Option[Long]) = GraftCatalog.readSnapshot(spark, root, v)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(GraftCatalog.snapshotVersions(spark, root) == Seq(1L, 2L, 3L))
    assert(byId(None) == Map(1L -> "base1", 2L -> "u2", 4L -> "base4",
      10L -> "n10"))
    // time travel: post-batch-0 state still has key 5
    assert(byId(Some(2L)) == Map(1L -> "base1", 2L -> "u2", 4L -> "base4",
      5L -> "base5"))
    // crash-replay of batch 0 (deletes included) is a no-op
    val v = GraftCatalog.applyCdcSnapshotBatch(spark, root,
      Seq((2L, "u2", "U"), (3L, "x", "D")).toDF("id", "v", "_op"), "id", 0L)
    assert(v == 2L && GraftCatalog.snapshotVersions(spark, root) == Seq(1L, 2L, 3L))
    // a SnapshotTailer consumer sees one CDC version per micro-batch
    val ch = GraftCatalog.readChanges(spark, root, 1L, 3L)
    assert(ch.where(org.apache.spark.sql.functions.col("_version") === 2L).count() > 0 &&
      ch.where(org.apache.spark.sql.functions.col("_version") === 3L).count() > 0)
  }

  test("streaming dedup verdicts: d19 semantics live, canonical pointers, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val out = "/tmp/graft-streams/dedupv_" + System.nanoTime()
    val b0 = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight nine"))
    val b1 = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "red orange yellow green blue indigo violet"))
    val b2 = Seq((20L, "alpha beta gamma delta epsilon zeta eta theta"),
      (21L, "one two three four five six seven eight nine"),
      (22L, "lone unique vocabulary nothing shared anywhere here"))
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStream.ingestStreamWithVerdicts(
        ms.toDF().toDF("doc_id", "text"), out)
      .option("checkpointLocation", out + "_ckpt").start()
    try {
      Seq(b0, b1, b2).foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()
    def verdicts() = graft.streaming.DedupStream.allVerdicts(spark, out)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    val got = verdicts()
    val expected = Map(
      0L -> ("new", None), 1L -> ("new", None),
      10L -> ("dup_of_prior", Some(0L)), 11L -> ("new", None),
      20L -> ("dup_of_prior", Some(0L)), 21L -> ("dup_of_prior", Some(1L)),
      22L -> ("new", None))
    assert(got == expected, s"verdicts diverge: $got")
    // replay of the last batch must land byte-identical verdicts
    graft.streaming.DedupStream.processBatch(b2.toDF("doc_id", "text"), 2L, out)
    graft.streaming.DedupStream.batchVerdicts(b2.toDF("doc_id", "text"),
        spark.read.parquet(s"$out/pairs/batch_id=2"))
      .write.mode("overwrite").parquet(s"$out/verdicts/batch_id=2")
    assert(verdicts() == expected, "replay changed the verdict table")
  }

  test("streaming dedup ingest: batch-union equals full recompute, each pair once, replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = "/tmp/graft-streams/dedup_" + System.nanoTime()
    // three arrivals: b1 near-copies b0's doc 0; b2 copies docs from
    // BOTH prior batches and brings nothing new of its own
    val b0 = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight nine"))
    val b1 = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "red orange yellow green blue indigo violet"))
    val b2 = Seq((20L, "alpha beta gamma delta epsilon zeta eta theta"),
      (21L, "one two three four five six seven eight nine"),
      (22L, "lone unique vocabulary nothing shared anywhere here"))
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStream.ingestStream(
        ms.toDF().toDF("doc_id", "text"), out)
      .option("checkpointLocation", out + "_ckpt").start()
    try {
      Seq(b0, b1, b2).foreach { b => ms.addData(b); q.processAllAvailable() }
    } finally q.stop()

    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("a_id", "b_id", "CAST(n_eq AS BIGINT) AS n_eq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = graft.streaming.DedupStream.allPairs(spark, out)
    val got = pairSet(streamed)
    val full = pairSet(graft.operators.Dedup.bandEstimates(
      (b0 ++ b1 ++ b2).toDF("doc_id", "text")))
    assert(got == full,
      s"stream diverges from recompute: missing=${full -- got} extra=${got -- full}")
    assert(got.map(p => (p._1, p._2)) == Set(
      (0L, 10L), (0L, 20L), (10L, 20L), (1L, 21L)), s"unexpected pair set: $got")
    // exactly once across batches
    assert(streamed.groupBy("a_id", "b_id").count()
      .where(col("count") > 1).count() == 0, "a pair was reported twice")
    // a pair lands at the batch that INTRODUCED it (its later doc's)
    val byBatch = streamed.select("a_id", "b_id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number]("batch_id").longValue).toMap
    assert(byBatch((0L, 10L)) == 1L && byBatch((1L, 21L)) == 2L,
      s"pairs attributed to the wrong ingest batch: $byBatch")

    // replay the last micro-batch — a restarted query re-executing it
    // must land byte-identical outputs, not duplicates
    graft.streaming.DedupStream.processBatch(b2.toDF("doc_id", "text"), 2L, out)
    assert(pairSet(graft.streaming.DedupStream.allPairs(spark, out)) == full,
      "replaying a batch changed the pair table")
  }

  test("SnapshotTailer drains committed versions incrementally; outbox bridges into a file stream") {
    import spark.implicits._
    val root = "/tmp/graft-streams/snaptail_" + System.nanoTime()
    val outbox = root + "_outbox"
    val tailer = new graft.streaming.SnapshotTailer(spark, root)
    // nothing committed yet → nothing to drain
    assert(tailer.poll().isEmpty)

    def commit(lo: Int, hi: Int): Long = GraftCatalog.commitSnapshot(
      (lo to hi).map(i => (i.toLong, s"r$i")).toDF("id", "v"), root, append = true)

    // three committed versions, drained INCREMENTALLY: each poll sees
    // only the rows its new versions appended — cost ∝ the delta
    var drained = Set.empty[Long]
    commit(1, 5)
    val (v1, d1) = tailer.poll().get
    assert(v1 == 1L &&
      d1.where(org.apache.spark.sql.functions.col("_change") === "delete").count() == 0)
    drained ++= d1.select("id").collect().map(_.getLong(0))
    assert(drained == (1L to 5L).toSet)

    commit(6, 8)
    val (v2, d2) = tailer.poll().get
    assert(v2 == 2L && d2.count() == 3, "second poll must see ONLY version 2's rows")
    drained ++= d2.select("id").collect().map(_.getLong(0))

    // idle poll between commits is a no-op and does not move the cursor
    assert(tailer.poll().isEmpty && tailer.lastSeen == 2L)

    commit(9, 10)
    val (v3, d3) = tailer.poll().get
    assert(v3 == 3L && d3.count() == 2)
    drained ++= d3.select("id").collect().map(_.getLong(0))

    // union of incrementally drained changes == the latest snapshot
    val head = GraftCatalog.readSnapshot(spark, root)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(drained == head,
      s"incremental drain diverges from head: missing=${head -- drained} extra=${drained -- head}")

    // the outbox bridge: a SECOND tailer exports each version's inserts
    // to a parquet outbox, and a genuine Structured Streaming file
    // source drains that outbox — the changelog-topic pattern
    val exporter = new graft.streaming.SnapshotTailer(spark, root)
    assert(exporter.exportChanges(outbox) == Some(3L)) // catches up in one export
    commit(11, 12)
    assert(exporter.exportChanges(outbox) == Some(4L))
    val sq = spark.readStream
      .schema(GraftCatalog.readSnapshot(spark, root).schema)
      .parquet(outbox)
      .writeStream.format("memory").queryName("snaptail_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    sq.awaitTermination(60000)
    val streamed = spark.table("snaptail_stream")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(streamed == (1L to 12L).toSet,
      s"file stream over the outbox lost rows: $streamed")
  }

  test("SnapshotAggMaintainer tracks every CDC commit without a base rescan; fold == recompute after merge and delete") {
    import spark.implicits._
    val root = "/tmp/graft-streams/snapmv_" + System.nanoTime()

    def recompute(): Set[(String, Long, java.math.BigDecimal)] =
      GraftCatalog.readSnapshot(spark, root)
        .groupBy("g")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("amt").cast("decimal(18,2)"))
            .cast("decimal(28,2)").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    def mvSet(m: graft.streaming.SnapshotAggMaintainer) =
      m.current.collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet

    // v1: base table
    GraftCatalog.commitSnapshot(
      (1 to 100).map(i => (i.toLong, s"g${i % 4}", i * 1.25)).toDF("id", "g", "amt")
        .repartition(2), root, append = true)
    val m = new graft.streaming.SnapshotAggMaintainer(spark, root, "g", "amt")
    assert(m.refresh() == Some(1L))
    assert(mvSet(m) == recompute(), "MV after v1 must equal a full recompute")

    // v2: copy-on-write merge (same-key rewrites arrive as delete+insert
    // pairs for the untouched rows of the rewritten file — they must
    // cancel exactly in the decimal fold)
    GraftCatalog.mergeSnapshot(spark, root,
      Seq((10L, "g9", 1000.50), (200L, "g9", 2000.25)).toDF("id", "g", "amt"), "id")
    assert(m.refresh() == Some(2L))
    assert(mvSet(m) == recompute(), "MV after merge must equal a full recompute")

    // v3: copy-on-write delete
    GraftCatalog.deleteSnapshotWhere(spark, root,
      org.apache.spark.sql.functions.col("g") === "g1")
    assert(m.refresh() == Some(3L))
    val after = mvSet(m)
    assert(after == recompute(), "MV after delete must equal a full recompute")
    assert(!after.exists(_._1 == "g1"), "a fully-deleted group must leave the MV")

    // idle refresh between commits is a no-op
    assert(m.refresh().isEmpty && m.lastSeen == 3L)
    assert(mvSet(m) == after)

    // v4: MERGE-ON-READ delete — a version that rewrites NO files, only
    // a deletion vector; its rows arrive through readChanges as
    // delete-tagged CDC and the same fold subtracts them
    GraftCatalog.deleteSnapshotWhereMor(spark, root,
      org.apache.spark.sql.functions.col("id").isin(4L, 8L, 200L))
    assert(m.refresh() == Some(4L))
    assert(mvSet(m) == recompute(),
      "MV after a MoR delete must equal a full recompute")

    // v5: MERGE-ON-READ upsert — matched key DV'd + batch appended;
    // the delete+insert pair nets the value change into the MV
    GraftCatalog.mergeSnapshotMor(spark, root,
      Seq((10L, "g9", 9999.75), (300L, "g2", 1.25)).toDF("id", "g", "amt"), "id")
    assert(m.refresh() == Some(5L))
    assert(mvSet(m) == recompute(),
      "MV after a MoR upsert must equal a full recompute")
  }

  test("native snapshot stream source: one micro-batch per version, checkpoint resumes at the right version") {
    import spark.implicits._
    import graft.streaming.GraftSnapshotStream
    val root = "/tmp/graft-streams/snapsrc_" + System.nanoTime()
    val ckpt = root + "_ckpt"
    val outRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    GraftCatalog.commitSnapshot(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root, append = false)
    GraftCatalog.commitSnapshot(Seq((3L, "c")).toDF("id", "v"), root, append = true)
    GraftCatalog.commitSnapshot(Seq((4L, "d")).toDF("id", "v"), root, append = true)

    def drain(): Seq[Long] = {
      val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = GraftSnapshotStream.read(spark, root).writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          batches += id
          outRows ++= b.collect().map(r =>
            (r.getLong(0), r.getAs[Long]("_version"), r.getString(2), id))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      batches.toSeq
    }

    // 3-commit history drains as EXACTLY one micro-batch per version
    val b1 = drain()
    assert(b1.size == 3, s"expected 3 micro-batches, got ${b1.size}")
    val byVersion = outRows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byVersion == Map(1L -> Set(1L, 2L), 2L -> Set(3L), 3L -> Set(4L)))
    // each version landed in its own micro-batch
    assert(outRows.groupBy(_._4).values.forall(_.map(_._2).distinct.size == 1))
    // union of the insert stream == the head snapshot
    assert(outRows.filter(_._3 == "insert").map(_._1).toSet ==
      GraftCatalog.readSnapshot(spark, root)
        .select("id").collect().map(_.getLong(0)).toSet)

    // two more commits, then resume from the SAME checkpoint: only the
    // new versions replay, one batch each
    outRows.clear()
    GraftCatalog.commitSnapshot(Seq((5L, "e")).toDF("id", "v"), root, append = true)
    GraftCatalog.commitSnapshot(Seq((6L, "f")).toDF("id", "v"), root, append = true)
    val b2 = drain()
    assert(b2.size == 2, s"checkpoint resume must replay only v4+v5, got ${b2.size} batches")
    assert(outRows.map(_._2).toSet == Set(4L, 5L))
    assert(outRows.map(_._1).toSet == Set(5L, 6L))

    // an idle resume emits nothing new
    outRows.clear()
    drain()
    assert(outRows.isEmpty, "no new commits -> no new rows")

    // a MERGE-ON-READ delete (a version that changes NO files, only a
    // deletion vector) streams its deleted rows as delete-tagged CDC —
    // subscribers see the retraction, not an empty batch
    outRows.clear()
    GraftCatalog.deleteSnapshotWhereMor(spark, root,
      org.apache.spark.sql.functions.col("id") === 3L)
    val b3 = drain()
    assert(b3.size == 1, s"the DV-only version is one micro-batch, got $b3")
    assert(outRows.map(r => (r._1, r._3)).toList == List((3L, "delete")),
      s"expected the DV'd row as a delete: $outRows")
  }

  test("vacuum past a streaming checkpoint fails LOUDLY on resume, never silently skips") {
    import spark.implicits._
    import graft.streaming.GraftSnapshotStream
    val root = "/tmp/graft-streams/snapvac_" + System.nanoTime()
    val ckpt = root + "_ckpt"
    GraftCatalog.commitSnapshot(Seq((1L, "a")).toDF("id", "v"), root, append = false)
    GraftCatalog.commitSnapshot(Seq((2L, "b")).toDF("id", "v"), root, append = true)
    GraftCatalog.commitSnapshot(Seq((3L, "c")).toDF("id", "v"), root, append = true)
    def drain(): Set[Long] = {
      val got = scala.collection.mutable.Set.empty[Long]
      val q = GraftSnapshotStream.read(spark, root).writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.collect().map(_.getLong(0)); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      got.toSet
    }
    assert(drain() == Set(1L, 2L, 3L)) // checkpoint cursor = version 3
    // PREVENTION (r16): the source registered a retention cursor at or
    // below the replay floor (the engine calls Source.commit lazily, so
    // the pin may lag a batch — strictly MORE protective, never less),
    // entirely on its own
    val cursors = GraftCatalog.listStreamCursors(spark, root)
    assert(cursors.size == 1 && cursors.values.head <= 2L,
      s"expected an auto-registered cursor at or below v2, got $cursors")
    // derived id shape (r17): 64 digest bits of the metadata path, not
    // 32-bit hashCode — two streams on one table can't silently share
    // (and clobber) one pin on a hash collision
    assert(cursors.keys.head.matches("ck-[0-9a-f]{16}"),
      s"derived cursor id should be ck-<16 hex>, got ${cursors.keys.head}")
    GraftCatalog.commitSnapshot(Seq((4L, "d")).toDF("id", "v"), root, append = true)
    GraftCatalog.commitSnapshot(Seq((5L, "e")).toDF("id", "v"), root, append = true)
    // an OVER-AGGRESSIVE vacuum is clamped by the cursor: keepFrom = 5
    // would reap everything the checkpoint still needs, but the pin
    // keeps it and the stream RESUMES CORRECTLY — the real guarantee
    GraftCatalog.vacuumSnapshots(spark, root, keepFrom = 5L, orphanGraceMs = 0L)
    assert(GraftCatalog.snapshotVersions(spark, root).head <= 2L,
      "the cursor floor must clamp retention at or below the replay floor")
    assert(drain() == Set(4L, 5L)) // the clamp preserved the resume path
    assert(GraftCatalog.listStreamCursors(spark, root).values.head <= 4L)
    // the EXPLICIT OVERRIDE reclaims an abandoned stream's pin — after
    // which vacuum proceeds and the loud resume error is the backstop
    GraftCatalog.commitSnapshot(Seq((6L, "f")).toDF("id", "v"), root, append = true)
    GraftCatalog.commitSnapshot(Seq((7L, "g")).toDF("id", "v"), root, append = true)
    GraftCatalog.listStreamCursors(spark, root).keys
      .foreach(id => assert(GraftCatalog.dropStreamCursor(spark, root, id)))
    GraftCatalog.vacuumSnapshots(spark, root, keepFrom = 7L, orphanGraceMs = 0L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("vacuumed past streaming checkpoint")),
      s"expected the named vacuum-race error, got: ${msgs(e).mkString(" | ")}")
  }

  test("CDC stream steps over a metadata-only schema version instead of dying") {
    import spark.implicits._
    import graft.streaming.GraftSnapshotStream
    val root = "/tmp/graft-streams/snapddl_" + System.nanoTime()
    val ckpt = root + "_ckpt"
    GraftCatalog.commitSnapshot(
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), root, append = false)
    def drain(): Set[Long] = {
      val got = scala.collection.mutable.Set.empty[Long]
      val q = GraftSnapshotStream.read(spark, root).writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.collect().map(_.getLong(0)); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      got.toSet
    }
    assert(drain() == Set(1L, 2L))
    // a METADATA-ONLY version lands mid-stream (rename: same files,
    // new #schema line) — with one micro-batch per version, the
    // resumed stream serves it as an EMPTY batch (dataChange = false),
    // never an error, and the data version after it arrives intact
    GraftCatalog.renameSnapshotColumn(spark, root, "v", "w")
    GraftCatalog.commitSnapshot(
      Seq((3L, 30L)).toDF("id", "w"), root, append = true)
    assert(drain() == Set(3L),
      "resume must step over the DDL version and serve the data version")
  }

  test("native snapshot stream SINK: one version per micro-batch, exactly-once replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.GraftSnapshotStream
    val root = s"/tmp/graft-sink-${System.nanoTime()}"
    val ckpt = s"$root-ckpt"
    val ms = MemoryStream[(Long, String)]
    def drain(): Unit = {
      val q = ms.toDF().toDF("id", "kind").writeStream
        .format(GraftSnapshotStream.FORMAT)
        .option("path", root)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ms.addData((1L, "a"), (2L, "b"))
    drain()
    ms.addData((3L, "c"))
    drain()
    // two micro-batches → two committed versions, rows exact
    assert(GraftCatalog.snapshotVersions(spark, root) == Seq(1L, 2L))
    assert(GraftCatalog.readSnapshot(spark, root).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // replaying batch 0 against the same table is a no-op (the #batch:
    // tag is already committed) — the exactly-once contract
    val v = GraftCatalog.commitSnapshotBatch(
      Seq((9L, "dup")).toDF("id", "kind"), root, batchId = 0L)
    assert(v == 1L && GraftCatalog.snapshotVersions(spark, root) == Seq(1L, 2L))
    // the table is simultaneously a SOURCE: the sink's output tails
    val tail = GraftSnapshotStream.read(spark, root)
    assert(tail.isStreaming && tail.columns.contains("_change"))
  }
}
