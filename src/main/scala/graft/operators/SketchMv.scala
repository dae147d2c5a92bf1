package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable-sketch materialized-view maintenance (VERDICT r7 item 5):
  * q90 proves the delta-merge contract for SELF-MAINTAINABLE aggregates
  * (sum/count partials add); this is the same contract for the SKETCH
  * family — the piece an incremental dataset card needs at 100 TB,
  * where "how many distinct users/customers so far" must absorb a new
  * ingest batch WITHOUT rescanning the corpus. Datasketches HLL partial
  * states (Spark `hll_sketch_agg`) are mergeable by construction
  * (`hll_union_agg` max-merges registers), so the MV is one tiny row
  * per batch of BINARY sketch state, persisted like any other table;
  * maintenance = sketch the new batch + union, cost O(batches), never
  * O(rows). Rows-only by the q34 contract (sketch estimates are
  * engine-specific; DuckDB's approx_count_distinct is a different HLL)
  * with the error floor + merge-equals-direct proofs in SketchMvSpec.
  * One honesty note the spec encodes: the Datasketches union estimator
  * (HIP accumulator) is absorption-ORDER sensitive, so two merges over
  * the same states can differ ~1%; all paths stay inside the lgK=12
  * published bound (RSE ≈ 1.6%), but bit-identical estimates across
  * merge orders are not part of the contract.
  *
  * Reference anchor: docs/6_aggregates.md partial aggregation — the
  * same partial/final split, persisted across time instead of across
  * partitions.
  */
object SketchMv {

  /** The MV delta table: one row per batch, `(batch, sketch binary,
    * n_rows)` — the HLL partial state of `key` within the batch. */
  def partials(df: DataFrame, batch: Column, key: Column): DataFrame =
    df.groupBy(batch.as("batch"))
      .agg(hll_sketch_agg(key).as("sketch"), count(lit(1)).as("n_rows"))

  /** Merge persisted partial states into one distinct-count estimate —
    * the MV refresh read path. O(|batches|) rows in, one row out. */
  def mergedEstimate(partialsDf: DataFrame): DataFrame =
    partialsDf.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_est"),
      sum(col("n_rows")).as("n_rows"))

  /** q103 — distinct customers via the sketch MV: per-month HLL
    * partials over orders (the ingest-batch unit), each month's own
    * estimate, and the union-merged ALL row. The ALL estimate comes
    * from MERGING the per-month states, not from re-sketching the
    * table — the output exercises the maintenance path itself. */
  private def q103(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val p = partials(o, date_format(col("o_orderdate"), "yyyy-MM"), col("o_custkey"))
    // both branches aggregate the SAME partials subplan — ReuseExchange
    // materializes the batch-sketch shuffle once
    val perBatch = p.select(col("batch").as("scope"),
      hll_sketch_estimate(col("sketch")).as("n_est"))
    val merged = mergedEstimate(p)
      .select(lit("ALL").as("scope"), col("n_est"))
    perBatch.unionAll(merged).orderBy("scope")
  }

  /** Streaming maintenance of the partials table — the live dataset
    * card: each micro-batch's HLL partial states land idempotently
    * under `batch_id=` (the EventStream.writeBatch replay contract),
    * and `mergedEstimate(spark.read.parquet(outDir))` answers "how
    * many distinct keys so far" at ANY moment for O(batches × groups)
    * read cost. The streaming twin of q103: ingest updates the card
    * without ever rescanning history — at 100 TB the stream appends
    * a few sketch rows per trigger while the naive alternative
    * re-aggregates the corpus. */
  def streamingPartials(stream: DataFrame, batchKey: Column, key: Column,
      outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        partials(b.toDF(), batchKey, key)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$outDir/batch_id=$batchId")
    }

  val all: Seq[Q] = Seq(
    Q("q103_sketch_mv", None, q103))
}
