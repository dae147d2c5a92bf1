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

  def dataFrame(spark: SparkSession, name: String, schema: StructType,
      bucketCol: String, nBuckets: Int,
      buckets: Map[Int, Seq[SpjFile]]): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val table = new GraftSpjTable(cs, name, schema, bucketCol, nBuckets,
      buckets)
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
    buckets: Map[Int, Seq[GraftSpjBridge.SpjFile]]) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSpjScanBuilder(cs, tableSchema, bucketCol, nBuckets, buckets)
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
    buckets: Map[Int, Seq[GraftSpjBridge.SpjFile]])
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
    required, bucketCol, nBuckets, buckets)
}

final class GraftSpjScan(factory: PartitionReaderFactory,
    schema: StructType, bucketCol: String, nBuckets: Int,
    buckets: Map[Int, Seq[GraftSpjBridge.SpjFile]])
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
      GraftSpjPartition(k, files): InputPartition
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSpjReaderFactory(factory)
}

/** All files of one bucket; `partitionKey` is the bucket ordinal the
  * reported `bucket(n, col)` transform evaluates to. */
final case class GraftSpjPartition(bucket: Int, files: Array[PartitionedFile])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

/** Adapts Spark's file-partition reader factory to the keyed
  * partitions: unwrap to a plain [[FilePartition]] and delegate, for
  * both row and columnar paths. */
final class GraftSpjReaderFactory(delegate: PartitionReaderFactory)
    extends PartitionReaderFactory {
  private def toFilePartition(p: InputPartition): FilePartition = p match {
    case GraftSpjPartition(b, files) => FilePartition(b, files)
    case other => throw new IllegalStateException(s"unexpected partition $other")
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    delegate.createReader(toFilePartition(p))
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    delegate.createColumnarReader(toFilePartition(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(toFilePartition(p))
}
