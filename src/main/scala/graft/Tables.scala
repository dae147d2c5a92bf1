package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver's testdata tables.
  *
  * Mirrors the reference's table registration surface
  * (reference: tests/setup_tables.rs:26, docs/2_cli_create_tables.md) but
  * Spark-first: `spark.read.parquet` + temp views; sort-order /
  * partitioning hints are the planner's job (AQE + pushdown), not
  * manual registration flags.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Load one table. Single place to normalize schema quirks: the
    * `events.ts` column is nanosecond-precision in parquet, which Spark
    * rejects ([PARQUET_TYPE_ILLEGAL]); we read it as a long via the
    * nanosAsLong legacy conf and floor-convert to a microsecond
    * timestamp. `ts div 1000` stays in long arithmetic — a double-
    * routed division (`/`) would lose integer precision above 2^53
    * (epoch-ns ulp = 256 ns) and drift ±1 µs from the oracle's integer
    * truncation. Queries that output raw timestamps truncate to whole
    * seconds so the DuckDB oracle (which keeps ns) agrees (SURVEY.md §5).
    */
  def df(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(sfDir, name))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else spark.read.parquet(path(sfDir, name))

  /** Register every table as a temp view named after the file. Idempotent. */
  def ensure(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => df(spark, sfDir, n).createOrReplaceTempView(n) }
}
