package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** Every coverage entry from SURVEY.md §2, in inventory order. */
  def allQs: Seq[Q] =
    Relational.all ++ Analytic.all ++ Analytic2.all ++ Analytic3.all ++ Analytic4.all ++ Analytic5.all ++ Analytic6.all ++ PatternMatch.all ++ SketchMv.all ++ SnapshotOps.all ++ CatalogOps.all ++ TpcH.all ++ TopK.all ++ Dedup.all ++
      Similarity.all ++ TextAnalysis.all ++ Multimodal.all ++ Sampling.all

  /** Flagship query (the reference's opt_parallel_execution.rs test shape)
    * on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q17_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.run).toMap

  /** DuckDB-equivalent SQL per query (same column aliases — the driver
    * sorts columns by name before hashing). Rows-only ops are omitted. */
  def oracleSql: Map[String, String] =
    allQs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
