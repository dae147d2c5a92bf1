package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sampling and dataset-splitting operators for a training-data
  * pipeline.
  *
  * The reproducible ops key off arithmetic on the stable document id —
  * a Knuth-style multiplicative hash in plain integer math — so the
  * same rows are selected on any engine, any partitioning, any cluster
  * size (and the DuckDB oracle can verify them exactly). `sampleBy` is
  * the rate-based alternative when no stable key exists; it is seeded
  * but partitioning-dependent, so it gets a tolerance-bounded spec
  * instead of an oracle.
  */
object Sampling {

  /** Multiplicative hash on the id: h(id) = (id * 2654435761 + 104729)
    * mod 1e6 — stays far inside Long range for any realistic id and is
    * identical in every engine. */
  private val hashCol = "pmod(doc_id * 2654435761L + 104729L, 1000000L)"

  /** p01 — reproducible ~10% sample: h(id) < 100000. */
  private def p01(s: SparkSession, d: String): DataFrame =
    Tables.df(s, d, "documents")
      .where(expr(s"$hashCol < 100000"))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  private val p01Oracle: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE (doc_id * 2654435761 + 104729) % 1000000 < 100000
      |ORDER BY doc_id""".stripMargin

  /** p02 — train/val/test fold split: fold = h(id) mod 10 (0-7 train,
    * 8 val, 9 test shape); reports per-fold counts and char volume. */
  private def p02(s: SparkSession, d: String): DataFrame =
    Tables.df(s, d, "documents")
      .withColumn("fold", expr(s"pmod($hashCol, 10L)"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      .orderBy("fold")

  private val p02Oracle: String =
    """SELECT ((doc_id * 2654435761 + 104729) % 1000000) % 10 AS fold,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
      |FROM documents GROUP BY fold ORDER BY fold""".stripMargin

  /** p03 — stratified sampling by language via sampleBy (seeded
    * Bernoulli per stratum; rows-only — rates are exact in expectation,
    * bounded in PipelineSpec). Balances a skewed corpus: the dominant
    * language is downsampled to ~1/4 rate. */
  private def p03(s: SparkSession, d: String): DataFrame = {
    val fractions = Map("en" -> 0.1, "de" -> 0.4, "es" -> 0.4, "fr" -> 0.4, "zh" -> 0.4)
    Tables.df(s, d, "documents")
      .stat.sampleBy("lang", fractions, 42L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(
    Q("p01_sample_hash", Some(p01Oracle), p01),
    Q("p02_split_folds", Some(p02Oracle), p02),
    Q("p03_sample_stratified", None, p03))
}
