package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * decoded/feature-extracted in partition-sized batches.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic stub (`fakeDecode`); everything Spark-
  * side is real and load-bearing: the binary column, the metadata
  * struct, the typed `Dataset` batch boundary (`mapPartitions` — the
  * Scala analog of a vectorized/Pandas batch UDF), and the output
  * schema. Swapping `fakeDecode` for a JNI/codec call changes nothing
  * about the plan. Binary payloads stay in executor memory one
  * partition at a time; nothing is collected to the driver.
  */
object Multimodal {

  /** One "image" row entering the decode stage. */
  final case class MediaRow(
      doc_id: Long, payload: Array[Byte], width: Int, height: Int, fmt: String)

  /** Extracted features leaving the decode stage. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, fmt: String,
      mean_byte: Double, byte_entropy_q: Long)

  /** STUB — stands in for a real image decode + feature extraction.
    * Deterministic: mean byte value and a quantized byte-histogram
    * "entropy". A real implementation would decode `payload` with a
    * codec here; the Spark plumbing around it is unchanged.
    */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    val hist = new Array[Long](16)
    bytes.foreach(b => hist((b & 0xff) / 16) += 1)
    val q = hist.foldLeft(0L)((a, c) => a * 31 + c % 97)
    MediaFeatures(r.doc_id, bytes.length, r.width, r.height, r.fmt, mean, q)
  }

  /** m01 — synthesize binary payloads + metadata from `documents` (the
    * container ships no real media), push them through the typed
    * batch-decode boundary, return features. Rows-only oracle; the
    * semantics are pinned by MultimodalSpec. */
  private def m01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = graft.Tables.df(s, d, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(xxhash64(col("doc_id")), lit(1024)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col("doc_id"), lit(1)), lit(768)) + 64).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(2)) === 0, "png").otherwise("jpeg").as("fmt"))
      .as[MediaRow]
    media
      .mapPartitions(_.map(fakeDecode))
      .toDF()
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(Q("m01_multimodal", None, m01))
}
