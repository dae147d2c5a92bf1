package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Z-order (Morton) interleaving of two numeric columns into one
    * cluster key: each value is scaled to a 16-bit bucket inside its
    * column's [min, max], and the bucket bits are interleaved, so rows
    * close in BOTH dimensions land close in the key order. Pure
    * codegen'd shift/or arithmetic — 32 terms, no UDF. */
  private def zBucket(v: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L)).otherwise(
      least(lit(65535L), greatest(lit(0L),
        ((v - mn).cast("double") / (mx - mn).cast("double") * 65535.0)
          .cast("long"))))

  def zValue(a: Column, b: Column, aMin: Column, aMax: Column,
      bMin: Column, bMax: Column): Column =
    zValueN(Seq((a, aMin, aMax), (b, bMin, bMax)))

  private def interleaveBits(buckets: Seq[Column], bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)),
          i * buckets.size + j))
      }
    }

  /** N-column Morton interleave (2–4 columns in one 64-bit key): each
    * value scales to a 16-bit bucket in its [min, max]; bit i of
    * column j lands at position i·k + j. Still pure codegen'd
    * shift/or arithmetic — 16·k terms. */
  def zValueN(cols: Seq[(Column, Column, Column)]): Column = {
    require(cols.size >= 2 && cols.size <= 4, "zValueN takes 2-4 columns")
    interleaveBits(cols.map { case (v, mn, mx) => zBucket(v, mn, mx) }, 16)
  }

  /** Multi-dimensional layout: write `df` parquet clustered by the
    * Z-order of two columns. A linear sort gives row-group min/max
    * stats that prune scans on ONE leading column; Z-order clustering
    * gives every row group a tight min/max envelope on BOTH columns,
    * so 2-D selective filters skip most row groups at read time — the
    * lakehouse layout move (Delta OPTIMIZE ZORDER / Iceberg sort-order)
    * for the "filter by user AND time" scan this engine's events
    * pipeline lives on. At 100 TB the same code holds: column min/max
    * come from one partial-aggregated scan, the range partitioner
    * spreads by z-key, and each task sorts only its own partition.
    * `rowGroupBytes` caps parquet row-group size so pruning granularity
    * is finer than file granularity (essential at small SFs; at
    * production SFs the 128 MB default is the right call). */
  def zOrderWrite(df: DataFrame, colA: String, colB: String, path: String,
      nFiles: Int, rowGroupBytes: Long = 128L * 1024 * 1024): Unit =
    zOrderWriteN(df, Seq(colA, colB), path, nFiles, rowGroupBytes)

  /** One-pass equi-depth boundary sketch for [[zOrderWriteN]]: a
    * single row with one 255-element ascending array per cluster
    * column (`bnd0..bndK`), from `percentile_approx`. Factored so the
    * streaming z-sink can compute it once and reuse it across
    * micro-batches. */
  private[graft] def zBoundaries(df: DataFrame, cols: Seq[String]): DataFrame = {
    val qs = (1 until 256).map(_.toDouble / 256).toArray
    val bndAggs = cols.zipWithIndex.map { case (c, i) =>
      percentile_approx(col(c).cast("double"),
        lit(qs), lit(10000)).as(s"bnd$i")
    }
    df.agg(bndAggs.head, bndAggs.tail: _*)
  }

  /** `df` plus the interleaved `_z` cluster key against a broadcast
    * boundaries row ([[zBoundaries]]). The per-column bucket is the
    * native `bucket_of` binary search (~8 comparisons inside
    * whole-stage codegen) — the first cut was an interpreted
    * `size(filter(bnd, x -> x <= v))` HOF scanning all 255 boundaries
    * through a lambda dispatch per row per column (the round-1
    * interpreted-HOF-on-hot-path lesson, SURVEY §4); NULL values keep
    * that formulation's bucket 0. */
  private[graft] def zKeyed(df: DataFrame, cols: Seq[String], bnds: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      expr(s"coalesce(bucket_of(CAST($c AS DOUBLE), bnd$i), 0)").cast("long")
    }
    df.crossJoin(broadcast(bnds))
      .withColumn("_z", interleaveBits(buckets, 8))
      .drop(cols.indices.map(i => s"bnd$i"): _*)
  }

  /** [[zOrderWrite]] for 2–4 cluster columns, with EQUI-DEPTH
    * (rank-space) bucketing: each column's 8-bit bucket is its
    * position among 255 approx-quantile boundaries from ONE sketch
    * pass — linear min/max scaling collapses on skewed data (a
    * log-normal column puts most mass in the lowest buckets and the
    * key stops discriminating it; Delta's OPTIMIZE ZORDER hits the
    * same wall), while rank space spreads every distribution evenly.
    * Boundaries broadcast back; the bucket is the codegen'd
    * `bucket_of` binary search; then the interleaved key, a range
    * partition and an in-partition sort — every row group ends with a
    * tight min/max envelope on EVERY cluster dimension. */
  def zOrderWriteN(df: DataFrame, cols: Seq[String], path: String,
      nFiles: Int, rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    zKeyed(df, cols, zBoundaries(df, cols))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files (≥ 1) and atomically swap it in.
    * The small-files problem is a first-order 100 TB failure mode — a
    * streaming sink or over-parallel writer leaves thousands of KB-
    * sized files, and every later scan pays a task per file plus a
    * footer read per task. Compaction is one narrow re-write:
    * coalesce (no shuffle) down to the target count, write beside the
    * source, swap directories. Returns (files_before, files_after).
    *
    * Sizing and the swap go through the Hadoop FileSystem API, so the
    * same code runs on local FS and HDFS (where each rename is atomic).
    * The two-rename swap still has a window where the directory is
    * absent to a concurrent lister, and on S3A a "rename" is a
    * non-atomic copy+delete — object-store deployments flip a
    * manifest/metastore pointer instead (Iceberg/Delta-style), which
    * replaces this whole method, not just the rename. If the swap-in
    * rename fails the original directory is renamed back before the
    * error propagates — data is never stranded in the trash dir. */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    def parquetParts(p: Path) = fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val parts = parquetParts(d)
    val before = parts.length
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new Path(d.getParent, d.getName + ".compact" + System.nanoTime())
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    swapDirs(fs, d, tmp)
    (before, parquetParts(d).length)
  }

  // ------------------------------------------------------------------
  // Manifest-pointer snapshots: versioned tables + time travel
  // ------------------------------------------------------------------
  //
  // compactParquet's scope note says it outright: at object-store scale
  // you don't swap directories, you flip a MANIFEST POINTER. This is
  // that contract in its minimal, dependency-free form (the
  // Iceberg/Delta core idea re-expressed over the Hadoop FS API):
  //
  //   <root>/data/b<nano>/part-*.parquet   immutable, write-once batches
  //   <root>/_manifests/v<N>.manifest      one data-file path per line
  //
  // A snapshot IS a manifest file; commit = one CREATE-EXCLUSIVE rename
  // of the manifest (atomic on HDFS, and the rename-to-existing-path
  // failure doubles as optimistic-concurrency conflict detection —
  // two racing writers cannot both publish v7). Published data files
  // are NEVER mutated, so a reader holding v3's file list is undisturbed
  // by later commits, compactions, or rollbacks — the snapshot-isolation
  // property the two-rename directory swap fundamentally cannot give.
  // Old versions stay readable (time travel) until an explicit
  // destructive `vacuumSnapshots`.

  private def manifestDir(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_manifests")

  private val ManifestName = raw"v(\d+)\.manifest".r

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** All published versions of a snapshot table, ascending. */
  def snapshotVersions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, r) = fsOf(spark, root)
    val md = manifestDir(r)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.flatMap(st => st.getPath.getName match {
      case ManifestName(n) => Some(n.toLong)
      case _ => None
    }).sorted
  }

  private def readManifestLines(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, v: Long): Seq[String] = {
    val in = fs.open(new org.apache.hadoop.fs.Path(manifestDir(root), s"v$v.manifest"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  /** Data-file list of a version (metadata `#key:value` lines skipped). */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, v: Long): Seq[String] =
    readManifestLines(fs, root, v).filterNot(_.startsWith("#"))

  /** Publish `df` as the next snapshot version. `append = true` carries
    * the previous version's files forward (ingest batch); `false`
    * replaces the table contents (the manifest flips, no data file is
    * touched). Returns the committed version. Throws if a concurrent
    * writer published the same version first — retry-on-conflict is the
    * caller's policy, exactly the optimistic-concurrency contract of a
    * real table format. */
  def commitSnapshot(df: DataFrame, root: String, append: Boolean,
      meta: Seq[String] = Seq.empty): Long = {
    val spark = df.sparkSession
    val (fs, r) = fsOf(spark, root)
    val versions = snapshotVersions(spark, root)
    val next = versions.lastOption.getOrElse(0L) + 1
    val batch = new org.apache.hadoop.fs.Path(r, s"data/b${System.nanoTime()}")
    df.write.mode(SaveMode.ErrorIfExists).parquet(batch.toString)
    val newFiles = fs.listStatus(batch)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(st.getPath).toString)
      .sorted.toSeq
    val carried =
      if (append && versions.nonEmpty) readManifest(fs, r, versions.last) else Seq.empty
    publishManifest(fs, r, next, meta ++ carried ++ newFiles)
    next
  }

  /** EXACTLY-ONCE streaming commit: append `df` as the next version
    * tagged with its micro-batch id — and refuse to commit a batch id
    * any existing version already carries, so a foreachBatch replay
    * after a crash is a no-op instead of a duplicate append. This is
    * the manifest-format answer to the `batch_id=` directory-overwrite
    * contract: the TABLE stays one logical snapshot line, and the
    * reader needs no dedup logic. Returns the committed (or already-
    * present) version. Wire as
    * `.foreachBatch((b, id) => commitSnapshotBatch(b, root, id))`. */
  def commitSnapshotBatch(df: DataFrame, root: String, batchId: Long): Long = {
    val spark = df.sparkSession
    val (fs, r) = fsOf(spark, root)
    val tag = s"#batch:$batchId"
    snapshotVersions(spark, root).reverse // replays hit recent versions
      .find(v => readManifestLines(fs, r, v).contains(tag)) match {
      case Some(v) => v // replay — already committed
      case None => commitSnapshot(df, root, append = true, meta = Seq(tag))
    }
  }

  /** CDC between two snapshot versions: per primary key, `added` /
    * `removed` / `changed` / `unchanged` — q81's full-outer
    * reconciliation applied to the table's OWN history, which is the
    * point of keeping that history: "what did last night's ingest do"
    * becomes a query instead of an archaeology project. Comparison is
    * by the non-key columns' values (struct equality, null-safe). */
  def snapshotDiff(spark: SparkSession, root: String,
      fromV: Long, toV: Long, pk: String): DataFrame = {
    val a = readSnapshot(spark, root, Some(fromV))
    val b = readSnapshot(spark, root, Some(toV))
    val rest = a.columns.filterNot(_ == pk).sorted
    def packed(df: DataFrame, side: String) = df.select(
      col(pk), struct(rest.map(col): _*).as(s"v_$side"))
    packed(a, "a").join(packed(b, "b"), Seq(pk), "full_outer")
      .select(col(pk),
        when(col("v_a").isNull, lit("added"))
          .when(col("v_b").isNull, lit("removed"))
          .when(col("v_a") <=> col("v_b"), lit("unchanged"))
          .otherwise(lit("changed")).as("change"))
  }

  /** Write the manifest under a temp name, then CREATE-EXCLUSIVE rename
    * into place — the commit point. */
  private def publishManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, v: Long, files: Seq[String]): Unit = {
    val md = manifestDir(root)
    fs.mkdirs(md)
    val tmp = new org.apache.hadoop.fs.Path(md, s".tmp-v$v-${System.nanoTime()}")
    val out = fs.create(tmp, false)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val fin = new org.apache.hadoop.fs.Path(md, s"v$v.manifest")
    if (fs.exists(fin) || !fs.rename(tmp, fin)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"snapshot commit conflict: version $v already published under $root")
    }
  }

  /** Read a snapshot — the latest version, or an explicit one (time
    * travel). The returned plan scans exactly the manifest's file
    * list; files added by later versions are invisible, files dropped
    * by later versions still resolve. `mergeSchema = true` unions the
    * per-file schemas (an appended batch may carry NEW columns — feed
    * generations evolve; older files read NULL for them) at the cost
    * of a footer read per file — the same trade the mergeSchema
    * source surface documents, opt-in for the same reason. */
  def readSnapshot(spark: SparkSession, root: String,
      version: Option[Long] = None, mergeSchema: Boolean = false): DataFrame = {
    val (fs, r) = fsOf(spark, root)
    val v = version.getOrElse {
      val vs = snapshotVersions(spark, root)
      require(vs.nonEmpty, s"no snapshots published under $root")
      vs.last
    }
    val files = readManifest(fs, r, v)
    require(files.nonEmpty, s"snapshot v$v of $root is empty")
    val rd = spark.read
    (if (mergeSchema) rd.option("mergeSchema", "true") else rd).parquet(files: _*)
  }

  /** Roll the table back to `to`'s contents by publishing its file
    * list as a NEW version — history is never rewritten, so the bad
    * versions stay inspectable and a concurrent reader of any version
    * is unaffected. */
  def rollbackSnapshot(spark: SparkSession, root: String, to: Long): Long = {
    val (fs, r) = fsOf(spark, root)
    val next = snapshotVersions(spark, root).last + 1
    publishManifest(fs, r, next, readManifest(fs, r, to))
    next
  }

  /** Snapshot-model compaction: read the current version, rewrite it
    * as ceil(bytes/target) files in a NEW batch dir, publish as the
    * next version. Unlike compactParquet's directory swap there is no
    * absent-directory window and no restore path — readers of every
    * existing version keep their file lists; the compacted layout
    * simply becomes the new head. */
  def compactSnapshot(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val (fs, r) = fsOf(spark, root)
    val v = snapshotVersions(spark, root).last
    val files = readManifest(fs, r, v)
    val bytes = files.map(f => fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    commitSnapshot(spark.read.parquet(files: _*).coalesce(nOut), root, append = false)
  }

  /** Z-ORDERED snapshot compaction: rewrite the current head
    * z-clustered on `cols` and publish it as the next version — the
    * round's layout win composed with the round's isolation win. A
    * maintenance job can re-cluster a live table while yesterday's
    * readers keep their yesterday file lists; the improved pruning
    * simply becomes the new head. (The streaming z-sink's
    * compactZOrdered does this with a directory swap; here the swap is
    * a manifest flip.) */
  def compactSnapshotZOrdered(spark: SparkSession, root: String,
      cols: Seq[String], nFiles: Int,
      rowGroupBytes: Long = 128L * 1024 * 1024): Long = {
    val (fs, r) = fsOf(spark, root)
    val v = snapshotVersions(spark, root).last
    val files = readManifest(fs, r, v)
    val batch = new org.apache.hadoop.fs.Path(r, s"data/b${System.nanoTime()}")
    zOrderWriteN(spark.read.parquet(files: _*), cols, batch.toString,
      nFiles, rowGroupBytes)
    val newFiles = fs.listStatus(batch)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(st.getPath).toString)
      .sorted.toSeq
    val next = snapshotVersions(spark, root).last + 1
    publishManifest(fs, r, next, newFiles)
    next
  }

  /** DESTRUCTIVE: delete data files referenced only by versions older
    * than `keepFrom`, then drop those versions' manifests. Time travel
    * to vacuumed versions is gone — the explicit retention trade every
    * table format makes. Returns the number of data files deleted. */
  def vacuumSnapshots(spark: SparkSession, root: String, keepFrom: Long): Int = {
    val (fs, r) = fsOf(spark, root)
    val (old, kept) = snapshotVersions(spark, root).partition(_ < keepFrom)
    val keepFiles = kept.flatMap(readManifest(fs, r, _)).toSet
    val dead = old.flatMap(readManifest(fs, r, _)).distinct.filterNot(keepFiles)
    dead.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    old.foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(manifestDir(r), s"v$v.manifest"), false))
    dead.size
  }

  /** The compaction two-rename swap (see [[compactParquet]]'s scope
    * notes): `tmp` replaces `d`, restore-on-failed-swap-in, trash
    * removed last. Shared with the streaming z-sink's re-clustering
    * compaction. */
  private[graft] def swapDirs(fs: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val trash = new Path(d.getParent, d.getName + ".old" + System.nanoTime())
    require(fs.rename(d, trash), s"compaction swap-out failed for $d")
    if (!fs.rename(tmp, d)) {
      fs.rename(trash, d)
      throw new IllegalStateException(
        s"compaction swap-in failed for $d; original restored")
    }
    fs.delete(trash, true)
  }
}
