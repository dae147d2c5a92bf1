package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.StructType

/** Structured Streaming operators over the events schema.
  *
  * The same transformations work on a batch DataFrame (tested against
  * the batch path) and a `readStream` source: declare the plan, let the
  * micro-batch planner own incrementalization. Watermarks bound state;
  * `flatMapGroupsWithState` carries the custom per-user session state
  * the built-in windows can't express.
  */
object EventStream {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserSessionState(sessionCount: Long, lastTs: Long)

  final case class SessionUpdate(user_id: Long, session_count: Long, closed: Boolean)

  /** Streaming file source: tail a directory of parquet drops — the
    * production shape for event pipelines landing files from an
    * upstream writer. `maxFilesPerTrigger` bounds per-batch work so a
    * backlog replays incrementally instead of as one giant batch. */
  def fromParquetDir(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Stream-static enrichment: the event stream joined to a batch
    * dimension table. The static side is broadcast, so enrichment adds
    * no shuffle and no state store — each micro-batch streams through
    * the same hash map, the canonical dim-join shape at any scale. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), "user_id")

  /** Watermarked stream-stream inner join: views attributed to the
    * click they followed within 10 minutes, per user. Both sides carry
    * watermarks and the join condition bounds event time, so each
    * side's buffered state is evictable — the requirements for Spark
    * to run an unbounded join in finite memory. */
  def clickViewJoin(clicks: DataFrame, views: DataFrame): DataFrame =
    clicks.select(
        col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
      .join(
        views.select(
            col("event_id").as("view_id"), col("user_id").as("v_user"),
            col("ts").as("v_ts"))
          .withWatermark("v_ts", "10 minutes"),
        expr("""c_user = v_user AND
                v_ts >= c_ts AND v_ts <= c_ts + INTERVAL 10 MINUTES"""))
      .select(col("click_id"), col("view_id"), col("c_user").as("user_id"),
        col("c_ts"), col("v_ts"))

  /** Watermarked stream-stream LEFT OUTER join: every click, with its
    * attributed view when one arrived within the 10-minute band — and
    * a null-view row for clicks that never matched, emitted only once
    * the watermark certifies no match can still arrive (outer results
    * are held in the join state until then; the time-bound condition
    * is what makes that certification, and hence eviction, possible).
    * The attribution-completeness twin of [[clickViewJoin]]: inner
    * answers "which clicks converted", this answers "which didn't". */
  def clickViewLeftJoin(clicks: DataFrame, views: DataFrame): DataFrame =
    clicks.select(
        col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
      .join(
        views.select(
            col("event_id").as("view_id"), col("user_id").as("v_user"),
            col("ts").as("v_ts"))
          .withWatermark("v_ts", "10 minutes"),
        expr("""c_user = v_user AND
                v_ts >= c_ts AND v_ts <= c_ts + INTERVAL 10 MINUTES"""),
        "left_outer")
      .select(col("click_id"), col("view_id"), col("c_user").as("user_id"),
        col("c_ts"), col("v_ts"))

  /** Tumbling-window event-type counts with a watermark: the canonical
    * streaming windowed aggregation (10-minute lateness bound keeps
    * state finite at any scale). */
  def windowedTypeCounts(events: DataFrame,
      windowLen: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_val"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_val"))

  /** Sliding-window event-type counts: windows of `windowLen` advancing
    * every `slide` — each event contributes to windowLen/slide
    * overlapping windows (the trend-detection shape tumbling windows
    * can't express). State cost scales by the same factor, so the
    * watermark matters even more than in the tumbling case. */
  def slidingTypeCounts(events: DataFrame,
      windowLen: String = "10 minutes", slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"))

  /** Native session windows on a stream: gap-merged sessions assigned
    * by the engine (the declarative twin of userSessionCounts' custom
    * state machine — no GroupState code at all). The watermark bounds
    * how long an open session can wait for a late event; state per key
    * is one mergeable session row, evicted when the watermark passes
    * its end. */
  def sessionWindowCounts(events: DataFrame,
      gap: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n"))

  /** Rate-limited synthetic source: `rate-micro-batch` emits exactly
    * `rowsPerBatch` rows per trigger with deterministic timestamps —
    * the load-generator / backpressure-drill shape (the production
    * throttle is the same option surface: maxFilesPerTrigger /
    * maxOffsetsPerTrigger bound per-batch work so a backlog drains at
    * a controlled rate instead of as one giant batch). Mapped onto the
    * events schema so every downstream EventStream operator runs
    * unchanged against it. */
  def rateEvents(spark: SparkSession, rowsPerBatch: Int = 100,
      startTsMs: Long = 1704067200000L): DataFrame =
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("startTimestamp", startTsMs)
      .load()
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(50)).as("user_id"),
        element_at(
          typedLit(Seq("click", "view", "purchase", "error", "login")),
          (pmod(col("value"), lit(5)) + 1).cast("int")).as("event_type"),
        (pmod(col("value"), lit(100)) / 10.0).as("value"))

  /** Streaming deduplication: drop re-delivered events by event_id. The
    * watermark bounds the dedup state — ids older than the lateness
    * horizon are evicted, so state stays finite on an unbounded stream
    * (the streaming twin of batch d01_dedup_exact). */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Composed pipeline: dedup THEN windowed counts in one streaming
    * query — two stateful operators sharing ONE watermark (declared
    * once at the source; re-declaring it between operators is
    * disallowed). This is the production ingest shape: at-least-once
    * delivery upstream, exactly-once counting downstream, both state
    * stores bounded by the same lateness horizon. */
  def dedupedWindowedCounts(events: DataFrame,
      windowLen: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** The full composed ingest: dedup → sliding-window per-user counts →
    * stream-static broadcast enrichment, ONE streaming query under ONE
    * watermark (declared once at the source; both stateful operators —
    * the dedup store and the window store — are bounded by the same
    * lateness horizon). The static dim joins AFTER the aggregation, so
    * each micro-batch enriches the handful of updated window rows, not
    * the raw event firehose — no extra shuffle, no extra state. */
  def dedupedWindowedEnriched(events: DataFrame, dim: DataFrame,
      windowLen: String = "10 minutes", slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), windowLen, slide), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_val"))
      .select(col("window.start").as("win_start"), col("user_id"),
        col("n"), col("sum_val"))
      .join(broadcast(dim), "user_id")

  /** foreachBatch sink: the general-purpose streaming-write shape when
    * the target has no native streaming connector. Each micro-batch is
    * an ordinary batch DataFrame; idempotence under replay comes from
    * keying the write on batchId — a re-delivered batch OVERWRITES its
    * own `batch_id=` directory instead of appending duplicates, which
    * is what turns at-least-once micro-batch delivery into an
    * effectively-once table. */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$outDir/batch_id=$batchId")

  def toIdempotentParquet(events: DataFrame, outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        writeBatch(batch.toDF(), batchId, outDir)
    }

  /** Trigger.AvailableNow drain: backfill-then-stop — the mode every
    * production backfill uses. Processes everything available at start
    * (in rate-limited micro-batches: unlike the deprecated
    * Trigger.Once, `maxFilesPerTrigger` still bounds each batch) and
    * terminates on its own. Against a persistent checkpoint each
    * invocation is an incremental catch-up — a later drain processes
    * ONLY files that landed since the previous one, and the union of
    * drains equals one continuous run. Blocks until the query stops. */
  def drainAvailableNow(
      writer: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
      checkpoint: String): Unit = {
    val q = writer
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally if (q.isActive) q.stop()
  }

  /** Custom state machine: per-user session counting with a 30-minute
    * inactivity gap, via flatMapGroupsWithState — the streaming twin of
    * batch q23_sessionize. State is bounded two ways: the watermark
    * bounds how late events may arrive, and an EVENT-TIME TIMEOUT
    * evicts idle users' state once the watermark passes 30 minutes
    * beyond their last event — without it, every user ever seen stays
    * in the state store forever, which is fatal on an unbounded
    * 100 TB-scale stream. A timed-out group emits a final
    * `closed = true` update before its state is removed. */
  final case class UserTypeStats(
      user_id: Long, n_types: Long, top_type: String, top_count: Long,
      total_value: Double)

  /** The arbitrary-state v2 processor behind [[userTypeStats]]: typed
    * composite state — a MapState of per-type counts next to a
    * ValueState running value total — instead of one serialized blob
    * per key. The point of the new API at scale: per-type map entries
    * are individual state-store rows, so one event touches ONE map
    * entry (a point get/put in RocksDB) rather than rewriting the
    * whole per-user aggregate, and each state variable evolves its
    * schema independently. */
  final class TypeStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTypeStats] {
    import org.apache.spark.sql.{Encoders, streaming => ss}

    @transient private var counts: ss.MapState[String, Long] = _
    @transient private var total: ss.ValueState[Double] = _

    override def init(outputMode: ss.OutputMode, timeMode: ss.TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, ss.TTLConfig.NONE)
      total = getHandle.getValueState[Double](
        "total", Encoders.scalaDouble, ss.TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: ss.TimerValues): Iterator[UserTypeStats] = {
      var t = if (total.exists()) total.get() else 0.0
      rows.foreach { e =>
        val c = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, c + 1)
        t += e.value
      }
      total.update(t)
      val entries = counts.iterator().toSeq
      val (topType, topCount) = entries.minBy { case (k, v) => (-v, k) }
      Iterator.single(UserTypeStats(user, entries.size.toLong, topType, topCount, t))
    }
  }

  /** Per-user running event-type leaderboard via `transformWithState`
    * (Spark 4 arbitrary-state v2, RocksDB-only): emits, on every batch
    * that touches a user, their distinct type count, modal type
    * (count-desc/type-asc tie-break) and running value total. The
    * declarative twin is a groupBy(user, type) two-level aggregate;
    * this is the shape for when the per-key state is genuinely
    * composite and per-event updates must stay point lookups. */
  def userTypeStats(events: Dataset[Event]): Dataset[UserTypeStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new TypeStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  final case class TtlCount(user_id: Long, n_recent: Long)

  /** State-TTL processor: a per-user activity counter whose state
    * expires `ttl` after its last write (arbitrary-state v2
    * TTLConfig, processing-time based). This is the OTHER state-bound
    * mechanism next to watermark+event-time timeout (the session
    * processor's): TTL needs no event-time column and no watermark —
    * the store itself ages entries out — which is the right eviction
    * for enrichment caches and abuse counters where "recent" means
    * wall clock, not event time. An expired key silently restarts
    * from zero on its next event; nothing is emitted at expiry (TTL
    * has no timeout callback — use event-time timers when a final
    * flush must fire). */
  final class TtlCountProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, TtlCount] {
    import org.apache.spark.sql.{Encoders, streaming => ss}

    @transient private var n: ss.ValueState[Long] = _

    override def init(outputMode: ss.OutputMode, timeMode: ss.TimeMode): Unit =
      n = getHandle.getValueState[Long](
        "n", Encoders.scalaLong, ss.TTLConfig(ttl))

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: ss.TimerValues): Iterator[TtlCount] = {
      val c = (if (n.exists()) n.get() else 0L) + rows.size
      n.update(c)
      Iterator.single(TtlCount(user, c))
    }
  }

  /** Per-user recent-activity count under a state TTL: counts
    * accumulate across batches while the user stays active within
    * `ttl`, and silently reset once the store ages the entry out. */
  def userRecentCounts(events: Dataset[Event],
      ttl: java.time.Duration): Dataset[TtlCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new TtlCountProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  final case class PatternUpdate(user_id: Long, n_matches: Long, tail_len: Long)

  /** Streaming MATCH_RECOGNIZE: the batch PatternMatch operator's
    * regex-over-symbol-string semantics (operators/PatternMatch.scala)
    * carried onto an unbounded stream via arbitrary-state v2. Per key,
    * a ValueState holds the UNMATCHED symbol tail: each batch appends
    * its symbols in (ts, event_id) order, counts the non-overlapping
    * matches in tail+new, then drops everything through the last match
    * end — SKIP PAST LAST ROW means matched rows can never participate
    * again, so their symbols need no state. A partial match at the
    * buffer end survives in state and completes when its remaining
    * symbols arrive in a later batch.
    *
    * Two documented boundaries of incremental matching: (1) emission is
    * final, so batch/stream counts agree exactly for patterns whose
    * matches cannot be EXTENDED by appending symbols (a definite
    * terminal symbol, like the P in S[CV]*P); an open-ended pattern
    * like E{2,} may count one batch-mode match as several. (2) the kept
    * tail is capped at maxTail symbols — unbounded per-key state is
    * fatal on an unbounded stream, so a single match spanning more than
    * maxTail rows is dropped; every streaming pattern engine (Flink CEP
    * etc.) imposes the same state bound, here it is explicit. Assumes
    * per-key event-time order across batches (the file-drop ingest
    * shape); within a batch, rows are sorted before classification. */
  final class PatternProcessor(pattern: String, classify: Event => String,
      maxTail: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, PatternUpdate] {
    import org.apache.spark.sql.{Encoders, streaming => ss}

    @transient private var tail: ss.ValueState[String] = _
    @transient private var total: ss.ValueState[Long] = _
    @transient private lazy val rx = pattern.r

    override def init(outputMode: ss.OutputMode, timeMode: ss.TimeMode): Unit = {
      tail = getHandle.getValueState[String](
        "tail", Encoders.STRING, ss.TTLConfig.NONE)
      total = getHandle.getValueState[Long](
        "total", Encoders.scalaLong, ss.TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: ss.TimerValues): Iterator[PatternUpdate] = {
      // Full-microsecond instant to match the batch operator's
      // unix_micros ordering — getTime alone is millisecond-truncated
      // and would tie sub-millisecond events onto event_id order.
      def micros(t: java.sql.Timestamp): Long =
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      val syms = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        .map(classify).mkString
      val buf = (if (tail.exists()) tail.get() else "") + syms
      val ms = rx.findAllMatchIn(buf).toSeq
      val rest = if (ms.nonEmpty) buf.substring(ms.last.end) else buf
      val kept = if (rest.length > maxTail) rest.takeRight(maxTail) else rest
      tail.update(kept)
      val t = (if (total.exists()) total.get() else 0L) + ms.size
      total.update(t)
      Iterator.single(PatternUpdate(user, t, kept.length.toLong))
    }
  }

  /** Per-user incremental pattern-match counts (see PatternProcessor).
    * `classify` maps an event to its one-character symbol — the same
    * alphabet contract as the batch operator. */
  def patternMatchCounts(events: Dataset[Event], pattern: String,
      classify: Event => String, maxTail: Int = 256): Dataset[PatternUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new PatternProcessor(pattern, classify, maxTail),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  def userSessionCounts(events: Dataset[Event],
      watermark: String = "10 minutes"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessionState, SessionUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserSessionState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, last.sessionCount, closed = true))
          } else {
            // Same full-microsecond ordering as PatternProcessor (:394)
            // — gap detection below stays millisecond (30-min gaps), but
            // in-batch event ORDER must not tie on sub-ms timestamps.
            val sorted = rows.toSeq.sortBy(e =>
              (e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L, e.event_id))
            if (sorted.isEmpty) Iterator.empty
            else {
              val init = state.getOption.getOrElse(UserSessionState(0L, Long.MinValue))
              val next = sorted.foldLeft(init) { (st, e) =>
                val isNew = st.lastTs == Long.MinValue || e.ts.getTime - st.lastTs > gapMs
                UserSessionState(st.sessionCount + (if (isNew) 1 else 0), e.ts.getTime)
              }
              state.update(next)
              state.setTimeoutTimestamp(next.lastTs + gapMs)
              Iterator.single(SessionUpdate(userId, next.sessionCount, closed = false))
            }
          }
      }
  }
}
