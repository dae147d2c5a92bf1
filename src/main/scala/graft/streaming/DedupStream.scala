package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Dedup

/** Streaming incremental near-dup ingest — the LIVE form of the batch
  * `d18_incremental_ingest` path: an unbounded stream of document
  * batches drained through foreachBatch, where each micro-batch's
  * candidate pairs are derived against the band rows of ALL PRIOR
  * batches and both outputs land under `batch_id=` directories.
  *
  * Replay safety comes from two structural choices, not bookkeeping:
  * the prior-index read filters `batch_id < id` (partition-pruned), so
  * a replayed batch sees EXACTLY the history its first attempt saw —
  * never its own half-written rows; and both writes are
  * `overwrite` into the batch's own partition directory (the
  * toIdempotentParquet contract), so re-execution lands byte-identical
  * results instead of appending duplicates. Union-of-batches therefore
  * equals the full batch recompute with every pair reported exactly
  * once — at the batch that introduced it — which the spec proves.
  *
  * 100 TB posture: per-batch cost is the d18 bound (|delta| band rows +
  * index rows in touched buckets; the bucket semi-join broadcasts only
  * the delta's (band, bh) keys), and the band index is an append-only
  * batch-partitioned parquet table a compaction/Z-order maintenance
  * pass can reorganize independently of the stream.
  */
object DedupStream {

  /** Sink: wire to `.option("checkpointLocation", …).start()`, or to
    * `EventStream.drainAvailableNow` for backfill-then-stop. */
  def ingestStream(docs: DataFrame, outDir: String): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, outDir)
      }

  /** One micro-batch: pairs vs the strict-prior band index, then the
    * batch's own band rows. Exposed for the spec's replay proof. */
  private[graft] def processBatch(batch: DataFrame, id: Long, outDir: String): Unit = {
    val spark = batch.sparkSession
    val dRows = Dedup.bandRows(batch).cache()
    try {
      val bandsRoot = s"$outDir/bands"
      val fs = new org.apache.hadoop.fs.Path(bandsRoot)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val prior =
        if (fs.exists(new org.apache.hadoop.fs.Path(bandsRoot)))
          spark.read.option("basePath", bandsRoot).parquet(bandsRoot)
            .where(col("batch_id") < id)
            .select("doc_id", "sig", "band", "bh")
        else dRows.select("doc_id", "sig", "band", "bh").where(lit(false))
      Dedup.deltaPairs(dRows, prior)
        .write.mode("overwrite").parquet(s"$outDir/pairs/batch_id=$id")
      dRows.select("doc_id", "sig", "band", "bh")
        .sortWithinPartitions("band", "bh")
        .write.mode("overwrite").parquet(s"$bandsRoot/batch_id=$id")
    } finally { dRows.unpersist(false); () }
  }

  /** Every pair the stream has found so far (batch_id is the partition
    * column — "which ingest introduced this duplicate" for free). */
  def allPairs(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", s"$outDir/pairs").parquet(s"$outDir/pairs")

  /** The VERDICT layer on the pair stream — d19's classification per
    * micro-batch doc, live: `dup_of_prior` (a candidate partner with
    * est_jac ≥ τ already lives in the index), `dup_in_batch` (the
    * earlier-id doc of a same-batch candidate pair — d19's min-id
    * arrival convention), else `new`; `canonical_id` is the earliest
    * qualifying partner, prior first. Derived purely from the batch's
    * OWN pairs output + its doc ids, so it shares the pair stream's
    * replay contract (same inputs ⇒ byte-identical verdicts) and costs
    * one |batch pairs| aggregation on top of processBatch. */
  private[graft] def batchVerdicts(batch: DataFrame, pairs: DataFrame,
      minEstJac: Double = 0.5): DataFrame = {
    val ids = batch.select(col("doc_id")).distinct()
    val inBatch = broadcast(ids.withColumn("in_b", lit(1)))
    val strong = pairs.where(col("est_jac") >= minEstJac)
    // orient every pair as (member doc, partner): a batch doc can sit
    // on either side of the ordered (a < b) pair
    val oriented = strong.select(col("a_id").as("doc_id"), col("b_id").as("partner"))
      .unionByName(strong.select(col("b_id").as("doc_id"), col("a_id").as("partner")))
      .join(inBatch, Seq("doc_id"), "left_semi")
      .join(inBatch.withColumnRenamed("doc_id", "partner")
        .withColumnRenamed("in_b", "p_in_b"), Seq("partner"), "left")
    val agg = oriented.groupBy("doc_id").agg(
      min(when(col("p_in_b").isNull, col("partner"))).as("prior_min"),
      min(when(col("p_in_b").isNotNull && col("partner") < col("doc_id"),
        col("partner"))).as("batch_min"))
    ids.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("prior_min").isNotNull, lit("dup_of_prior"))
          .when(col("batch_min").isNotNull, lit("dup_in_batch"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("prior_min"), col("batch_min")).as("canonical_id"))
  }

  /** Sink variant emitting BOTH surfaces per micro-batch: the pair
    * table and the per-doc verdicts, each idempotent under
    * `batch_id=`. */
  def ingestStreamWithVerdicts(docs: DataFrame, outDir: String,
      minEstJac: Double = 0.5): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, outDir)
        val pairs = batch.sparkSession.read.parquet(s"$outDir/pairs/batch_id=$id")
        batchVerdicts(batch, pairs, minEstJac)
          .write.mode("overwrite").parquet(s"$outDir/verdicts/batch_id=$id")
      }

  /** Every verdict so far, batch-attributed. */
  def allVerdicts(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.option("basePath", s"$outDir/verdicts").parquet(s"$outDir/verdicts")
}
