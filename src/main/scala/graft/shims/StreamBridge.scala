package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** `private[sql]` bridge for the v1 streaming Source contract: a
  * Source's `getBatch` must return a DataFrame whose logical plan is
  * flagged `isStreaming` — `internalCreateDataFrame(isStreaming =
  * true)` is the exact door Spark's own FileStreamSource walks through
  * (FileStreamSource.getBatch), exposed here for graft's snapshot
  * source. Same spark-extensions pattern as [[GraftColumnBridge]]. */
object GraftStreamBridge {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The inverse door, for the v1 streaming SINK contract: `addBatch`
    * receives a DataFrame still flagged `isStreaming`, which refuses
    * batch writers — rewrap its executed rows as a plain batch frame
    * (what Spark's own v1 sinks do with the micro-batch plan). */
  def batchDataFrame(data: DataFrame): DataFrame = {
    val spark = data.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }
}
