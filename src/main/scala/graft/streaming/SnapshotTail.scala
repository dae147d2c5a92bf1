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

/** Long-lived incremental aggregate-MV consumer of a snapshot table —
  * the q123 fold algebra (counts and decimal sums are self-maintainable
  * from CDC deltas: insert adds, delete subtracts, a copy-on-write
  * rewrite's unchanged rows arrive as delete+insert pairs and cancel
  * EXACTLY in decimal) packaged as the [[SnapshotTailer]]'s natural
  * subscriber. Each `refresh()` folds only the versions committed since
  * the last one, so keeping the MV current costs ∝ the delta, never the
  * table — against a CDC-merged 100 TB table the MV tracks every commit
  * without a single base rescan. The MV is |groups|-sized and
  * `localCheckpoint`ed per fold, so lineage never grows with the number
  * of refreshes. `startAfter = v` seeds the MV from that version's full
  * snapshot; `startAfter = 0` starts empty and lets the first poll's
  * inserts build it (the algebra is the same). */
final class SnapshotAggMaintainer(spark: SparkSession, root: String,
    key: String, valueCol: String, startAfter: Long = 0L) {
  private val tailer = new SnapshotTailer(spark, root, startAfter)
  private val dec = "decimal(28,2)"

  private def aggOf(df: DataFrame): DataFrame =
    df.groupBy(key).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("decimal(18,2)")).cast(dec).as("total"))

  private var mv: DataFrame =
    if (startAfter <= 0L)
      aggOf(GraftCatalog.readSnapshot(spark, root).where(lit(false)))
    else aggOf(GraftCatalog.readSnapshot(spark, root, Some(startAfter)))
      .localCheckpoint(true)

  /** Fold all versions committed since the last refresh into the MV.
    * Returns the version folded to, or None when the head hasn't
    * moved (the MV is untouched — refresh is idempotent between
    * commits). */
  def refresh(): Option[Long] = tailer.poll().map { case (v, changes) =>
    val sign = when(col("_change") === "insert", lit(1L)).otherwise(lit(-1L))
    val delta = changes.groupBy(key).agg(
      sum(sign).as("dn"),
      sum(sign * col(valueCol).cast("decimal(18,2)")).cast(dec).as("dt"))
    mv = mv.join(delta, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0L).cast(dec))
          + coalesce(col("dt"), lit(0L).cast(dec))).cast(dec).as("total"))
      .where(col("n") > 0)
      .localCheckpoint(true)
    v
  }

  /** The MV as of the last refresh: (key, n, total). */
  def current: DataFrame = mv

  /** The highest snapshot version folded into the MV. */
  def lastSeen: Long = tailer.lastSeen
}
