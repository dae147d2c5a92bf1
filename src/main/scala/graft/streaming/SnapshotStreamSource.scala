package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.GraftCatalog

/** NATIVE Structured Streaming SOURCE over a manifest-pointer snapshot
  * table — `spark.readStream.format(GraftSnapshotStream.FORMAT)
  * .option("path", root).load()` makes the table a first-class CDC
  * stream with no outbox copy (the [[SnapshotTailer]]'s `exportChanges`
  * bridge duplicates every changed row into a parquet directory; this
  * source serves the table's OWN files).
  *
  * Offsets ARE snapshot versions: micro-batch (start, end] carries
  * `readChanges(start, end)` — each committed version's added files as
  * `insert` rows and removed files as `delete` rows, tagged
  * `_change`/`_version` on top of the table schema. With the default
  * `maxVersionsPerBatch = 1` the stream replays the commit history one
  * version per micro-batch, in order; a checkpoint restart resumes at
  * the exact version the offset log recorded (version numbers are the
  * only state, and they are stable across restarts by construction).
  * Per-batch cost is proportional to that version's changed files,
  * never the table — the changelog-subscription shape a 100 TB table
  * needs.
  *
  * Options: `path` (table root, required), `startAfter` (emit versions
  * strictly greater; default 0 = full history), `maxVersionsPerBatch`
  * (admission control; default 1).
  *
  * The batch DataFrame is built on the driver from the manifest and
  * converted via `internalCreateDataFrame(isStreaming = true)` — the
  * same bridge Spark's own FileStreamSource uses; executors stream the
  * parquet bytes as a normal scan. Schema is pinned at stream start
  * (committed `#schema:` line when recorded): files evolved before the
  * pin read NULL for late columns, exactly like the batch readers. */
final class GraftSnapshotSource(sqlContext: SQLContext, root: String,
    startAfter: Long, maxVersionsPerBatch: Int,
    cursorId: Option[String] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => ConnOffset, ReadLimit}

  private val spark = sqlContext.sparkSession
  override val schema: StructType = GraftSnapshotStream.schemaOf(spark, root)

  // Highest version exposed to the engine so far. latestOffset lifts it
  // from the engine-supplied start offset on checkpoint recovery, and
  // getBatch lifts it when replaying a pending range from the offset log.
  private var cursor: Long = startAfter
  // Trigger.AvailableNow: versions committed after prepare() are left
  // for the next run — the run drains a FIXED backlog and terminates
  // (the FileStreamSource contract, one micro-batch per version here).
  private var availableNowCap: Option[Long] = None

  private def head(): Long =
    GraftCatalog.snapshotVersions(spark, root).lastOption.getOrElse(startAfter)

  /** The vacuum/cursor race, made LOUD: a checkpointed stream whose
    * cursor version was reaped by [[GraftCatalog.vacuumSnapshots]] can
    * never serve its next range (the manifests are gone) — without
    * this guard the failure mode is either an obscure missing-file
    * error or, worse, a silent skip to the oldest survivor that drops
    * every change in between. Exactly-once beats availability here:
    * fail with the named error and the operator's choices spelled
    * out. Checked on every resume path (offset negotiation AND batch
    * replay from the offset log). */
  private def requireNotVacuumed(fromV: Long): Unit =
    if (fromV > startAfter) {
      val vs = GraftCatalog.snapshotVersions(spark, root)
      if (!vs.contains(fromV))
        throw new IllegalStateException(
          s"vacuumed past streaming checkpoint: this stream's cursor is at " +
            s"version $fromV of $root, but the oldest surviving version is " +
            s"${vs.headOption.getOrElse(-1L)} — vacuumSnapshots reaped history " +
            "this checkpoint still needs (a restart re-reads the last " +
            "completed batch's START version, so that version must survive " +
            "too). Either restart from a fresh checkpoint (full reprocess), " +
            s"or keep retention at or below version $fromV: vacuum with " +
            s"keepFrom <= $fromV, pin it with a tag, or re-register the " +
            s"stream cursor (setStreamCursor) that normally prevents this " +
            "— it protects automatically unless dropped or started with " +
            ".option(\"cursor\", \"off\").")
    }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(head())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  // The admission-controlled offset negotiation (the engine prefers
  // this over getOffset once SupportsAdmissionControl is implemented):
  // advance at most maxVersionsPerBatch versions past the engine's own
  // start, never past the head (or the AvailableNow pin).
  override def latestOffset(start: ConnOffset, limit: ReadLimit): ConnOffset = {
    val from = Option(start).map(versionOf).getOrElse(startAfter)
    requireNotVacuumed(from)
    if (from > cursor) cursor = from
    val hd = availableNowCap.fold(head())(c => math.min(head(), c))
    if (hd > cursor) cursor = math.min(hd, cursor + maxVersionsPerBatch)
    if (cursor == startAfter) null else LongOffset(cursor)
  }

  override def reportLatestOffset(): ConnOffset = {
    val hd = head()
    if (hd == startAfter) null else LongOffset(hd)
  }

  // Plain-getOffset path (engines without admission control).
  override def getOffset: Option[Offset] = {
    val hd = head()
    if (hd > cursor) cursor = math.min(hd, cursor + maxVersionsPerBatch)
    if (cursor == startAfter) None else Some(LongOffset(cursor))
  }

  private def versionOf(o: ConnOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset from the checkpoint log
  }

  // start version of each served batch, keyed by its end version — the
  // retention pin commit() advances (a restart replays the last
  // completed batch from its START, so that is what must survive).
  private val batchStarts =
    scala.collection.mutable.Map.empty[Long, Long]

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startAfter)
    val toV = versionOf(end)
    requireNotVacuumed(fromV)
    batchStarts(toV) = fromV
    cursor = math.max(cursor, toV)
    val batch =
      if (toV <= fromV) GraftSnapshotStream.empty(spark, schema)
      else {
        val changes = GraftCatalog.readChanges(spark, root, fromV, toV)
        changes.select(schema.fields.toSeq.map { f =>
          (if (changes.columns.contains(f.name)) col(f.name).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)
        }: _*)
      }
    // A v1 Source must hand back a STREAMING DataFrame; route the batch
    // plan's rows through the same internal bridge FileStreamSource uses.
    org.apache.spark.sql.GraftStreamBridge.streamingDataFrame(
      spark, batch.queryExecution.toRdd, schema)
  }

  /** PREVENTION of the vacuum/checkpoint race (the loud error above is
    * only the backstop): each completed micro-batch advances this
    * stream's retention cursor to the batch's START version — the
    * version a restart re-reads — so [[GraftCatalog.vacuumSnapshots]]
    * never reaps history the checkpoint still needs. Best-effort: a
    * cursor write failure must not fail the batch (the loud error
    * still guards correctness); an abandoned stream's pin is reclaimed
    * with `dropStreamCursor` (the explicit operator override). */
  override def commit(end: Offset): Unit = cursorId.foreach { id =>
    val endV = versionOf(end)
    val pin = batchStarts.get(endV)
    batchStarts.filterInPlace { case (e, _) => e > endV }
    // When the batch's true start is unknown (near-unreachable under
    // the engine's getBatch-before-commit contract), advancing the pin
    // on a GUESS could only err upward — and an upward error lets
    // vacuum reap versions a restart still needs. Skip the advance and
    // keep the old, lower pin: staleness fails toward retention.
    pin.foreach { p =>
      try GraftCatalog.setStreamCursor(spark, root, id, p)
      catch { case scala.util.control.NonFatal(_) => }
    }
  }
  override def stop(): Unit = ()
}

/** NATIVE streaming SINK over a snapshot table:
  * `df.writeStream.format(GraftSnapshotStream.FORMAT)
  * .option("path", root)` — each micro-batch commits as ONE snapshot
  * version through [[GraftCatalog.commitSnapshotBatch]], so the table
  * IS the stream's output log with EXACTLY-ONCE semantics: a
  * foreachBatch replay after a crash finds its `#batch:` tag already
  * committed and no-ops instead of appending a duplicate. Append mode
  * appends; Complete mode overwrites the head per batch (same replay
  * tag). Readers — batch, time travel, the CDC source above — see one
  * ordinary versioned table; no separate sink directory, no manual
  * dedup. `sinkId` (optional) namespaces the replay tags so two
  * streams can feed one table. */
final class GraftSnapshotSink(root: String, sinkId: String,
    complete: Boolean)
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long, data0: DataFrame): Unit = {
    // the handed DataFrame is the micro-batch's incremental result,
    // still flagged isStreaming — rewrap it as a batch frame so the
    // one ordinary write job commitSnapshot runs is legal
    val data = org.apache.spark.sql.GraftStreamBridge.batchDataFrame(data0)
    if (complete) {
      val spark = data.sparkSession
      val prefix = if (sinkId.isEmpty) "#batch:" else s"#batch:$sinkId:"
      // bounded probe: stops at this sink's previous batch tag instead
      // of scanning the whole table history every micro-batch
      val replayed =
        GraftCatalog.findBatchReplay(spark, root, prefix, batchId).isDefined
      if (!replayed)
        GraftCatalog.commitSnapshot(data, root, append = false,
          meta = Seq(s"$prefix$batchId"), maxRetries = 3)
    } else {
      GraftCatalog.commitSnapshotBatch(data, root, batchId, sinkId)
    }
    ()
  }
  override def toString: String = s"GraftSnapshotSink[$root]"
}

/** The v1 provider `spark.readStream.format(...)` resolves by class
  * name. Stateless — all state is the offset log's version numbers. */
final class GraftSnapshotStreamProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider {

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "snapshot tables use HIDDEN partitioning (setSnapshotPartitionSpec) " +
        "- partitionBy has no meaning here")
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Update(),
      "graft-snapshot sink supports Append (versioned appends) and " +
        "Complete (versioned overwrites); Update has no table meaning")
    new GraftSnapshotSink(rootOf(parameters),
      parameters.getOrElse("sinkId", ""),
      outputMode == org.apache.spark.sql.streaming.OutputMode.Complete())
  }
  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot stream requires .option(\"path\", <table root>) or .load(<root>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-snapshot", GraftSnapshotStream.schemaOf(
      sqlContext.sparkSession, rootOf(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    // Retention-cursor identity: stable across restarts because the
    // engine derives metadataPath from the CHECKPOINT location. An
    // explicit .option("cursor", id) names it for operators; "off"
    // opts out (the loud resume error is then the only guard).
    // Derived id uses a real digest, not String.hashCode: two streams
    // on one table whose checkpoint paths collide in 32 bits would
    // silently SHARE a cursor file and overwrite each other's pin —
    // re-exposing the vacuum/checkpoint race the cursor exists to
    // prevent. 64 hex bits of SHA-256 make that a non-event.
    val cursorId = parameters.get("cursor") match {
      case Some("off") => None
      case Some(id) => Some(id)
      case None =>
        val id = "ck-" + java.security.MessageDigest
          .getInstance("SHA-256").digest(metadataPath.getBytes("UTF-8"))
          .take(8).map(b => f"$b%02x").mkString
        // MIGRATE the pre-digest id this same checkpoint would have
        // derived (ck-<32-bit hashCode>): left behind, its stale pin
        // would clamp the table's vacuum retention FOREVER. Carry the
        // old pin over only when this stream has no newer one (the
        // protective direction), then drop the legacy file.
        scala.util.Try {
          val legacy = "ck-" + java.lang.Integer.toHexString(metadataPath.hashCode)
          val spark = sqlContext.sparkSession
          val root = rootOf(parameters)
          val cursors = GraftCatalog.listStreamCursors(spark, root)
          cursors.get(legacy).foreach { oldPin =>
            if (!cursors.get(id).exists(_ >= oldPin))
              GraftCatalog.setStreamCursor(spark, root, id, oldPin)
            GraftCatalog.dropStreamCursor(spark, root, legacy)
          }
        }
        Some(id)
    }
    // Register the retention pin AT CREATION (r17 review fix): between
    // source creation and the first completed micro-batch the stream
    // was otherwise unpinned (only the loud resume error guarded it),
    // and in a genuine 32-bit collision the migration above could
    // leave the SECOND colliding stream pinless until its first
    // commit. Pinning at startAfter — exactly what the first batch's
    // commit() would pin — closes both windows; best-effort, never
    // moves an existing pin, protective direction throughout.
    cursorId.foreach { id =>
      scala.util.Try {
        val spark = sqlContext.sparkSession
        val root = rootOf(parameters)
        if (!GraftCatalog.listStreamCursors(spark, root).contains(id))
          GraftCatalog.setStreamCursor(spark, root, id,
            parameters.get("startAfter").map(_.toLong).getOrElse(0L))
      }
    }
    new GraftSnapshotSource(sqlContext, rootOf(parameters),
      parameters.get("startAfter").map(_.toLong).getOrElse(0L),
      parameters.get("maxVersionsPerBatch").map(_.toInt).getOrElse(1),
      cursorId)
  }
}

object GraftSnapshotStream {
  /** Pass to `spark.readStream.format(...)`. */
  val FORMAT: String = classOf[GraftSnapshotStreamProvider].getName

  /** Table schema (committed `#schema:` line when recorded, else the
    * head read's) plus the CDC tags. */
  private[streaming] def schemaOf(spark: org.apache.spark.sql.SparkSession,
      root: String): StructType = {
    val base = GraftCatalog.snapshotSchema(spark, root)
      .getOrElse(GraftCatalog.readSnapshot(spark, root).schema)
    StructType(base.fields ++ Seq(
      StructField("_change", StringType, nullable = true),
      StructField("_version", LongType, nullable = true)))
  }

  private[streaming] def empty(spark: org.apache.spark.sql.SparkSession,
      schema: StructType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  /** Convenience reader: the table as a version-tailing CDC stream. */
  def read(spark: org.apache.spark.sql.SparkSession, root: String,
      startAfter: Long = 0L, maxVersionsPerBatch: Int = 1): DataFrame =
    spark.readStream.format(FORMAT)
      .option("path", root)
      .option("startAfter", startAfter.toString)
      .option("maxVersionsPerBatch", maxVersionsPerBatch.toString)
      .load()
}
