package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/catalog surface — the Spark analog of the reference's external
  * tables + information schema (reference: docs/1_cli_information_schema.md,
  * docs/2_cli_create_tables.md, tests/setup_tables.rs:26).
  *
  * The reference registers CSV/Parquet files (single or directory) with
  * an optional declared sort order; in Spark the scan-order contract is
  * carried by bucketed+sorted tables (`writeBucketedSorted`), which let
  * the planner skip the shuffle/sort for joins and aggregations on the
  * bucket key — the same optimization `WITH ORDER` + prefer_existing_sort
  * buys DataFusion.
  */
object GraftCatalog {

  /** CREATE EXTERNAL TABLE ... STORED AS PARQUET LOCATION <dir>:
    * single file or whole directory (docs/2 "Create tables for many
    * files in a folder"). */
  def registerParquet(spark: SparkSession, name: String, location: String): DataFrame = {
    val df = spark.read.parquet(location)
    df.createOrReplaceTempView(name)
    df
  }

  /** CREATE EXTERNAL TABLE ... STORED AS CSV with header + schema
    * inference (docs/2 "From CSV file"). */
  def registerCsv(spark: SparkSession, name: String, location: String,
      header: Boolean = true, inferSchema: Boolean = true): DataFrame = {
    val df = spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(location)
    df.createOrReplaceTempView(name)
    df
  }

  /** CREATE EXTERNAL TABLE ... STORED AS JSON analog (line-delimited,
    * schema inferred or supplied). */
  def registerJson(spark: SparkSession, name: String, location: String): DataFrame = {
    val df = spark.read.json(location)
    df.createOrReplaceTempView(name)
    df
  }

  /** CREATE EXTERNAL TABLE ... STORED AS ORC analog — the other columnar
    * format a warehouse migration meets in practice; same pushdown/
    * pruning machinery as parquet (Spark's OrcScan reports PushedFilters
    * the same way). */
  def registerOrc(spark: SparkSession, name: String, location: String): DataFrame = {
    val df = spark.read.orc(location)
    df.createOrReplaceTempView(name)
    df
  }

  /** Schema-evolution read: one table over parquet files written at
    * different schema versions (columns added over time). mergeSchema
    * unions the per-file schemas at planning time; files missing a
    * column surface NULLs for it — how a long-lived 100 TB table
    * actually looks after a year of producers. (Reconciliation is
    * footer-metadata work at planning; the data path still prunes and
    * pushes down per file.) */
  def registerParquetMerged(spark: SparkSession, name: String, location: String): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(location)
    df.createOrReplaceTempView(name)
    df
  }

  /** In-memory table + INSERT analog (docs/2 "Create tables & Insert
    * data"): a local DataFrame registered as a view; "insert" = union +
    * re-register. */
  def registerValues(spark: SparkSession, name: String, df: DataFrame): DataFrame = {
    df.createOrReplaceTempView(name)
    df
  }

  def insertInto(spark: SparkSession, name: String, rows: DataFrame): DataFrame = {
    val merged = spark.table(name).unionByName(rows)
    merged.createOrReplaceTempView(name)
    merged
  }

  /** The `WITH ORDER (...)` analog: persist as a bucketed + sorted
    * managed table. Scans of this table expose the bucketing to the
    * planner, so joins/aggs keyed on `bucketCol` skip their shuffle —
    * DataFusion's prefer_existing_sort, Spark-first. */
  def writeBucketedSorted(df: DataFrame, table: String, bucketCol: String,
      sortCols: Seq[String], buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  // -------------------------------------------------------------------
  // Information schema (docs/1): SHOW TABLES / columns / df_settings.
  // -------------------------------------------------------------------

  /** information_schema.tables analog. */
  def tables(spark: SparkSession): DataFrame =
    spark.sql("SHOW TABLES")

  /** information_schema.columns / DESCRIBE analog. */
  def columns(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $table")

  /** information_schema.df_settings analog: session SQL configs as a
    * (name, value) relation, optionally substring-filtered. */
  def settings(spark: SparkSession, contains: String = ""): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.toSeq.toDF("name", "value")
      .where(col("name").contains(contains))
      .orderBy("name")
  }

  // -------------------------------------------------------------------
  // Sinks.
  // -------------------------------------------------------------------

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files (≥ 1) and atomically swap it in.
    * The small-files problem is a first-order 100 TB failure mode — a
    * streaming sink or over-parallel writer leaves thousands of KB-
    * sized files, and every later scan pays a task per file plus a
    * footer read per task. Compaction is one narrow re-write:
    * coalesce (no shuffle) down to the target count, write beside the
    * source, swap directories. Returns (files_before, files_after).
    *
    * SCOPE: local-filesystem directories ONLY. Sizing and the swap go
    * through java.io.File — on HDFS/S3 the listing returns nothing
    * (bytes = 0 ⇒ 1 output file) and renameTo fails; an object-store
    * deployment must instead flip a manifest/metastore pointer
    * (Iceberg/Delta-style), which replaces this whole method, not just
    * the rename. The rename-out/rename-in swap is also two-step, NOT
    * atomic: a reader listing the directory between the two renames
    * sees it absent, and if the second rename fails the data survives
    * only in the `.old` trash dir (no automatic restore) — acceptable
    * for the single-writer local maintenance job this models, and
    * exactly why the pointer flip is the at-scale design. */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val d = new java.io.File(dir)
    val parts = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
    val before = parts.length
    val bytes = parts.map(_.length()).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new java.io.File(d.getParent, d.getName + ".compact" + System.nanoTime())
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
    val trash = new java.io.File(d.getParent, d.getName + ".old" + System.nanoTime())
    require(d.renameTo(trash), s"compaction swap failed for $dir")
    require(tmp.renameTo(d), s"compaction swap-in failed for $dir")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(trash)
    val after = Option(d.listFiles()).getOrElse(Array.empty)
      .count(f => f.getName.endsWith(".parquet") && f.isFile)
    (before, after)
  }
}
