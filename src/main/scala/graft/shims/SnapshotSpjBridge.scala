package org.apache.spark.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning}
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
    // a throwaway ParquetScan configures the reader factory exactly as
    // a native parquet DSv2 scan would (schema json, session TZ,
    // vectorization, …) — its (empty) file index is never consulted
    val dummyIndex = new InMemoryFileIndex(cs, Seq.empty, Map.empty, Some(schema))
    val factory = ParquetScan(cs, cs.sessionState.newHadoopConf(), dummyIndex,
      schema, schema, StructType(Nil), Array.empty,
      CaseInsensitiveStringMap.empty(), None, Seq.empty, Seq.empty,
      Array.empty).createReaderFactory()
    val table = new GraftSpjTable(name, schema, bucketCol, nBuckets,
      buckets, factory)
    classic.Dataset.ofRows(cs, DataSourceV2Relation.create(table, None, None))
  }
}

final class GraftSpjTable(tableName: String, tableSchema: StructType,
    bucketCol: String, nBuckets: Int,
    buckets: Map[Int, Seq[GraftSpjBridge.SpjFile]],
    factory: PartitionReaderFactory) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new GraftSpjScan(tableSchema, bucketCol, nBuckets, buckets, factory)
    }
}

final class GraftSpjScan(schema: StructType, bucketCol: String, nBuckets: Int,
    buckets: Map[Int, Seq[GraftSpjBridge.SpjFile]],
    factory: PartitionReaderFactory)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  private val keys = buckets.keys.toArray.sorted

  /** The layout contract Catalyst joins against: rows are grouped by
    * `bucket(n, col)`, one input partition per populated bucket. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array[org.apache.spark.sql.connector.expressions.Expression](
        Expressions.bucket(nBuckets, bucketCol)), keys.length)

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
