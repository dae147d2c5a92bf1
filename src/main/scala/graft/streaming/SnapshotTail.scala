package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** Version-tailing consumer of a manifest-pointer snapshot table: the
  * incremental SOURCE side of the snapshot format (the sink side being
  * `commitSnapshotBatch`'s exactly-once appends). A downstream pipeline
  * subscribes to the TABLE instead of re-diffing it — each `poll()`
  * returns only the rows of versions committed since the last poll
  * (`GraftCatalog.readChanges`), so per-poll cost is proportional to
  * the new commits, never the table. At 100 TB that is the difference
  * between a changelog read and a nightly full-table reconciliation.
  *
  * The cursor (`lastSeen`) is the consumer's only state — persist it
  * wherever the consumer checkpoints and resume with `startAfter`.
  * Polling is idempotent between commits (no new version → `None`) and
  * never skips: versions are consumed contiguously in commit order.
  *
  * [[exportChanges]] bridges into Structured Streaming without a custom
  * DataSourceV2: each poll appends the insert-side rows to an outbox
  * directory that `spark.readStream.schema(...).parquet(outbox)` tails
  * as a normal file stream — the changelog-topic pattern, with the
  * snapshot table as the topic's source of truth.
  */
final class SnapshotTailer(spark: SparkSession, root: String, startAfter: Long = 0L) {
  private var last = startAfter

  /** The highest version this tailer has consumed. */
  def lastSeen: Long = last

  /** Changed rows of all versions committed since the last poll
    * (tagged `_change`/`_version` — see `GraftCatalog.readChanges`),
    * or None when the head hasn't moved. Advances the cursor. */
  def poll(): Option[(Long, DataFrame)] = {
    val head = GraftCatalog.snapshotVersions(spark, root).lastOption.getOrElse(0L)
    if (head <= last) None
    else {
      val df = GraftCatalog.readChanges(spark, root, last, head)
      last = head
      Some((head, df))
    }
  }

  /** Poll and append the insert-side rows (change tags dropped, plain
    * table schema) to `outDir` — the outbox a parquet file stream
    * tails. Returns the version drained to, if any. */
  def exportChanges(outDir: String): Option[Long] = poll().map { case (v, df) =>
    df.where(col("_change") === "insert").drop("_change", "_version")
      .write.mode("append").parquet(outDir)
    v
  }
}
