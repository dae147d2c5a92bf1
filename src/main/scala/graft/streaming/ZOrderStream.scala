package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}

import graft.sources.GraftCatalog

/** Streaming sink into the Z-ordered layout (VERDICT r7 item 3 /
  * SURVEY §9.3): without this, a streaming pipeline lands time-linear
  * files and the round-7 layout win exists only for batch rewrites —
  * `compactParquet` fixes file COUNTS but not clustering, so every
  * 2-D-selective scan over streamed data pays the full-table price
  * until someone schedules a batch `zOrderWriteN`. Here each
  * micro-batch is z-clustered ON THE WAY IN, and the matching
  * compaction re-clusters globally when batch files accumulate.
  *
  * Design, mirroring the ANN indexes' build-once/refresh contract:
  *  - The equi-depth boundary sketch ([[GraftCatalog.zBoundaries]]) is
  *    computed ONCE on the first non-empty batch and held on the
  *    driver (255 doubles per cluster column — foreachBatch runs
  *    driver-side, so plain state suffices; on restart it re-sketches
  *    from the first replayed batch). `resketchEvery = n` refreshes it
  *    every n batches to track distribution drift — stale boundaries
  *    never affect CORRECTNESS (bucket_of clamps out-of-range values
  *    into the end buckets), only pruning tightness.
  *  - Each batch goes through the same codegen'd z-key path as the
  *    batch writer ([[GraftCatalog.zKeyed]]), a per-batch range sort,
  *    and an idempotent `batch_id=` directory write (the
  *    `EventStream.writeBatch` replay contract: a re-delivered batch
  *    overwrites its own directory, so at-least-once delivery yields
  *    an effectively-once table).
  *  - At 100 TB the same shape holds: the sketch is one partial
  *    aggregate per refresh, per-batch sorts touch only that batch,
  *    and the global re-cluster is an explicit maintenance call
  *    ([[compactZOrdered]]) — not something hidden in the hot path.
  */
object ZOrderStream {

  /** Driver-side foreachBatch function carrying the boundary sketch
    * across micro-batches. */
  final class ZWriter(cols: Seq[String], outDir: String,
      filesPerBatch: Int, rowGroupBytes: Long, resketchEvery: Int)
      extends ((Dataset[Row], Long) => Unit) with Serializable {

    @transient private var bnds: Array[Seq[Double]] = _
    @transient private var seen: Int = 0

    override def apply(batchDs: Dataset[Row], batchId: Long): Unit = {
      val batch = batchDs.toDF()
      if (batch.isEmpty) return
      if (bnds == null || (resketchEvery > 0 && seen % resketchEvery == 0)) {
        val r = GraftCatalog.zBoundaries(batch, cols).head()
        // an all-NULL cluster column yields a NULL sketch — keep the
        // previous boundaries (or stay unsketched) rather than degrade
        if (cols.indices.forall(i => !r.isNullAt(i)))
          bnds = cols.indices.map(i => r.getSeq[Double](i)).toArray
      }
      seen += 1
      val writer =
        if (bnds == null) batch.coalesce(math.max(filesPerBatch, 1)).write
        else {
          val spark = batch.sparkSession
          val bndsDf = spark.createDataFrame(
            java.util.Collections.singletonList(Row.fromSeq(bnds.toSeq)),
            StructType(cols.indices.map(i =>
              StructField(s"bnd$i", ArrayType(DoubleType)))))
          GraftCatalog.zKeyed(batch, cols, bndsDf)
            .repartitionByRange(math.max(filesPerBatch, 1), col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
            .write
        }
      writer.mode(SaveMode.Overwrite)
        .option("parquet.block.size", rowGroupBytes)
        .parquet(s"$outDir/batch_id=$batchId")
    }
  }

  /** The z-clustered streaming sink: `start()` it like any writeStream.
    * Small `rowGroupBytes` keeps pruning granularity finer than file
    * granularity at test SFs; production keeps the 128 MB default. */
  def toZOrderedParquet(stream: DataFrame, cols: Seq[String], outDir: String,
      filesPerBatch: Int = 1, rowGroupBytes: Long = 128L * 1024 * 1024,
      resketchEvery: Int = 0): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch(
      new ZWriter(cols, outDir, filesPerBatch, rowGroupBytes, resketchEvery))

  /** Clustering-preserving compaction for a [[toZOrderedParquet]]
    * directory: where [[GraftCatalog.compactParquet]] would coalesce
    * away the per-batch z-clustering (fewer files, row order destroyed
    * across batches), this re-sketches boundaries over the FULL
    * accumulated table, re-keys through the same codegen'd path, and
    * lands one global range-sorted layout — batch-writer-quality
    * clustering — then swaps it in atomically with the shared
    * restore-on-failure rename dance. The `batch_id=` bookkeeping
    * partition column is sink metadata, not data, and does not survive
    * compaction. Returns (files_before, files_after). */
  def compactZOrdered(spark: SparkSession, dir: String, cols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024,
      rowGroupBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    def parquetFiles(p: Path): Seq[Path] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) buf += st.getPath
      }
      buf.toSeq
    }
    val before = parquetFiles(d)
    val bytes = before.map(fs.getFileStatus(_).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val data = spark.read.parquet(dir).drop("batch_id")
    val tmp = new Path(d.getParent, d.getName + ".compact" + System.nanoTime())
    GraftCatalog.zKeyed(data, cols, GraftCatalog.zBoundaries(data, cols))
      .repartitionByRange(nOut, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes)
      .parquet(tmp.toString)
    GraftCatalog.swapDirs(fs, d, tmp)
    (before.length, parquetFiles(d).length)
  }
}
