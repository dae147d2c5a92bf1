package org.apache.spark.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, InMemoryFileIndex, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

/** STORAGE-PARTITIONED JOIN bridge (Iceberg's SPJ, reproduced for
  * graft snapshot tables): a DSv2 `Scan` that reports the table's
  * hidden `bucket(n, col)` layout to Catalyst as a
  * [[KeyGroupedPartitioning]] — one [[InputPartition]] per bucket,
  * each carrying its key via [[HasPartitionKey]] — so joining two
  * snapshot tables bucketed by the SAME spec on the bucket column
  * plans with ZERO shuffle exchanges (under
  * `spark.sql.sources.v2.bucketing.enabled=true`). At 100 TB this is
  * the difference between a fact⋈fact join moving both tables over
  * the network and moving nothing.
  *
  * The actual parquet reading delegates to Spark's OWN
  * `ParquetPartitionReaderFactory`, obtained from a throwaway
  * [[ParquetScan]] so every hadoop-conf knob (requested schema,
  * timezone, int96 handling, vectorization) is configured by Spark's
  * code, not replicated here. `private[sql]` machinery throughout,
  * hence this bridge file in the `org.apache.spark.sql` package (the
  * established spark-extensions pattern of [[GraftColumnBridge]] /
  * [[GraftSnapshotRelation]]).
  */
object GraftSpjBridge {

  /** One file of a bucket: (path, length). */
  type SpjFile = (String, Long)

  /** `dv` maps a file path (exactly as it appears in `buckets`) to its
    * SORTED deleted row positions — the per-file deletion-vector slice
    * each bucket's [[GraftSpjPartition]] ships to its own task, so a
    * merge-on-read table keeps its shuffle-free join between
    * compactions with zero driver broadcast and zero plan change. */
  def dataFrame(spark: SparkSession, name: String, schema: StructType,
      bucketCol: String, nBuckets: Int,
      buckets: Map[Int, Seq[SpjFile]],
      dv: Map[String, Array[Long]] = Map.empty): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val table = new GraftSpjTable(cs, name, schema, bucketCol, nBuckets,
      buckets, dv)
    classic.Dataset.ofRows(cs, DataSourceV2Relation.create(table, None, None))
  }

  /** The reader factory, built AFTER column pruning and filter
    * pushdown: a throwaway [[ParquetScan]] configures it exactly as a
    * native parquet DSv2 scan would (requested-schema json, session
    * TZ, int96/vectorization knobs) — its (empty) file index is never
    * consulted. `readDataSchema` is the PRUNED projection, so a
    * 2-column query reads 2 columns; `pushedFilters` reach parquet's
    * row-group/page skipping. */
  private[sql] def readerFactory(cs: classic.SparkSession,
      dataSchema: StructType, readDataSchema: StructType,
      filters: Array[org.apache.spark.sql.sources.Filter]): PartitionReaderFactory = {
    val dummyIndex = new InMemoryFileIndex(cs, Seq.empty, Map.empty, Some(dataSchema))
    ParquetScan(cs, cs.sessionState.newHadoopConf(), dummyIndex,
      dataSchema, readDataSchema, StructType(Nil), filters,
      CaseInsensitiveStringMap.empty(), None, Seq.empty, Seq.empty,
      Array.empty).createReaderFactory()
  }
}

final class GraftSpjTable(cs: classic.SparkSession, tableName: String,
    tableSchema: StructType, bucketCol: String, nBuckets: Int,
    buckets: Map[Int, Seq[GraftSpjBridge.SpjFile]],
    dv: Map[String, Array[Long]] = Map.empty) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSpjScanBuilder(cs, tableSchema, bucketCol, nBuckets, buckets, dv)
}

/** Column pruning + filter pushdown for the SPJ scan: Spark hands the
  * builder the query's REQUIRED schema and translated filters before
  * `build()`, so the parquet reader materializes only the projected
  * columns (a 2-column query reads 2 columns) and row-group/page
  * statistics skip within each file. Every filter is returned as a
  * residual — parquet pushdown is best-effort skipping, Spark keeps
  * the exact evaluation (the same contract as its own FileScan). */
final class GraftSpjScanBuilder(cs: classic.SparkSession,
    tableSchema: StructType, bucketCol: String, nBuckets: Int,
    buckets: Map[Int, Seq[GraftSpjBridge.SpjFile]],
    dv: Map[String, Array[Long]] = Map.empty)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = tableSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters
    filters // all residual: parquet skipping is advisory
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new GraftSpjScan(
    GraftSpjBridge.readerFactory(cs, tableSchema, required, pushed),
    // DV'd files read through an UNPUSHED factory: with no parquet
    // skipping a whole-file single-split read emits rows in exact file
    // order, so the reader's running count IS the row index the DV
    // positions key on. Spark re-evaluates every filter above the scan
    // (all filters are residual here), so correctness is untouched —
    // the only cost is parquet-internal skipping on exactly the files
    // that still carry deletes, until compaction folds them.
    if (dv.isEmpty) null
    else GraftSpjBridge.readerFactory(cs, tableSchema, required, Array.empty),
    required, bucketCol, nBuckets, buckets, dv)
}

final class GraftSpjScan(factory: PartitionReaderFactory,
    noPushFactory: PartitionReaderFactory,
    schema: StructType, bucketCol: String, nBuckets: Int,
    buckets: Map[Int, Seq[GraftSpjBridge.SpjFile]],
    dv: Map[String, Array[Long]])
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  private val keys = buckets.keys.toArray.sorted

  /** The layout contract Catalyst joins against: rows are grouped by
    * `bucket(n, col)`, one input partition per populated bucket. When
    * the projection pruned the bucket column away, the key expression
    * would reference a column absent from the output — report
    * UnknownPartitioning instead (such a query cannot exploit the
    * layout anyway). */
  override def outputPartitioning(): Partitioning =
    if (schema.fieldNames.contains(bucketCol))
      new KeyGroupedPartitioning(
        Array[org.apache.spark.sql.connector.expressions.Expression](
          Expressions.bucket(nBuckets, bucketCol)), keys.length)
    else new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(keys.length)

  override def planInputPartitions(): Array[InputPartition] =
    keys.map { k =>
      val files = buckets(k).map { case (p, len) =>
        PartitionedFile(InternalRow.empty, SparkPath.fromPathString(p),
          0L, len, Array.empty, 0L, len, Map.empty)
      }.toArray
      // each partition ships ONLY its own files' DV slices — the
      // per-file application shape: no broadcast, no shuffle, task
      // payload ∝ that bucket's deletes
      val slice = buckets(k).collect {
        case (p, _) if dv.contains(p) => p -> dv(p)
      }.toMap
      GraftSpjPartition(k, files, slice): InputPartition
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSpjReaderFactory(factory, noPushFactory)
}

/** All files of one bucket; `partitionKey` is the bucket ordinal the
  * reported `bucket(n, col)` transform evaluates to. `dv` maps this
  * bucket's DV'd file paths to their sorted deleted positions. */
final case class GraftSpjPartition(bucket: Int, files: Array[PartitionedFile],
    dv: Map[String, Array[Long]] = Map.empty)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

/** Adapts Spark's file-partition reader factory to the keyed
  * partitions: unwrap to a plain [[FilePartition]] and delegate, for
  * both row and columnar paths. Partitions carrying deletion-vector
  * slices read row-based through [[GraftSpjDvReader]] instead (a
  * per-row position filter cannot apply inside a ColumnarBatch). */
final class GraftSpjReaderFactory(delegate: PartitionReaderFactory,
    noPushDelegate: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def toFilePartition(p: InputPartition): FilePartition = p match {
    case GraftSpjPartition(b, files, _) => FilePartition(b, files)
    case other => throw new IllegalStateException(s"unexpected partition $other")
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftSpjPartition(b, files, dv) if dv.nonEmpty =>
        new GraftSpjDvReader(b, files, dv, delegate, noPushDelegate)
      case _ => delegate.createReader(toFilePartition(p))
    }
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    delegate.createColumnarReader(toFilePartition(p))
  // Spark requires every partition of a scan to agree on columnar-ness
  // — a table carrying ANY deletion vector reads row-based throughout
  // (the per-row position filter cannot apply inside a ColumnarBatch);
  // compaction folds the DVs and restores the vectorized path.
  override def supportColumnarReads(p: InputPartition): Boolean =
    noPushDelegate == null && delegate.supportColumnarReads(toFilePartition(p))
}

/** Sequential per-file reader applying deletion-vector positions: each
  * file opens as its own single-file [[FilePartition]] — DV'd files
  * through the unpushed factory (exact file row order, so the running
  * row count is the DV's position key), clean files through the normal
  * pushed factory — and deleted positions drop via a sorted-merge walk
  * (O(1) amortized per row, no per-row search). */
final class GraftSpjDvReader(bucket: Int, files: Array[PartitionedFile],
    dv: Map[String, Array[Long]],
    pushedFactory: PartitionReaderFactory,
    noPushFactory: PartitionReaderFactory)
    extends PartitionReader[InternalRow] {
  private var fi = -1
  private var cur: PartitionReader[InternalRow] = null
  private var positions: Array[Long] = null
  private var ptr = 0
  private var idx = -1L

  private def openNext(): Boolean = {
    fi += 1
    if (fi >= files.length) return false
    val f = files(fi)
    positions = dv.getOrElse(f.filePath.toString, null)
    ptr = 0; idx = -1L
    cur = (if (positions == null) pushedFactory else noPushFactory)
      .createReader(FilePartition(bucket, Array(f)))
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (cur == null && !openNext()) return false
      if (cur.next()) {
        if (positions == null) return true
        idx += 1
        while (ptr < positions.length && positions(ptr) < idx) ptr += 1
        if (ptr >= positions.length || positions(ptr) != idx) return true
        // deleted position — keep scanning
      } else {
        cur.close(); cur = null
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = cur.get()
  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}
