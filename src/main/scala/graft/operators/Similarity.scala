package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Vector math runs in the native vec_dot/vec_norm expressions
  * (graft.functions.VecExprs): double-precision left-to-right folds,
  * bit-identical to the DuckDB oracle, at tight-loop speed. The
  * brute-force scan is the exactness baseline: one narrow pass +
  * TakeOrderedAndProject (per-partition top-k heaps, no full sort) — at
  * 100 TB it reads every vector once but shuffles only k rows per
  * partition. The LSH variant is the scale path: candidates confined to
  * hyperplane-sign buckets.
  */
object Similarity {

  private def emb(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.df(s, d, "embeddings")
      .withColumn("nrm", expr("vec_norm(embedding)"))
  }

  /** s01 — brute-force cosine top-10 for the query vector (vec_id 0).
    * Ranking uses the 6-decimal-rounded cosine + vec_id so the cut at
    * k is stable across engines. */
  private def s01(s: SparkSession, d: String): DataFrame = {
    val all = emb(s, d)
    val q = all.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qnrm"))
    all.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos_r", round(expr("vec_dot(embedding, qe)") / (col("nrm") * col("qnrm")), 6))
      .select("vec_id", "label", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  private val s01Oracle: String =
    """WITH n AS (
      |  SELECT vec_id, label, embedding AS e,
      |    sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT e AS qe, nrm AS qnrm FROM n WHERE vec_id = 0)
      |SELECT vec_id, label,
      |  round(list_reduce(list_transform(list_zip(e, qe), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)
      |    / (nrm * qnrm), 6) AS cos_r
      |FROM n, q WHERE vec_id <> 0
      |ORDER BY cos_r DESC, vec_id LIMIT 10""".stripMargin

  /** s02 — LSH-bucketed ANN (rows-only: hyperplanes are seeded from
    * Spark's xxhash64). 8 deterministic pseudo-random hyperplanes give an
    * 8-bit sign bucket; the query's bucket plus all 1-bit-flip probes
    * (multi-probe LSH) bound the candidate set; exact cosine re-ranks.
    * At 100 TB: bucket id is the shuffle/cluster key, so each probe
    * touches a ~1/2^8 slice instead of the full table. */
  private def s02(s: SparkSession, d: String): DataFrame = {
    val planes =
      """transform(sequence(0, 7), p ->
        |  transform(sequence(0, 63), j ->
        |    CAST(pmod(xxhash64(p * 64 + j), 2000003L) AS DOUBLE) / 1000001.5D - 1.0D))""".stripMargin
    val withBucket = emb(s, d)
      .withColumn("planes", expr(planes))
      .withColumn("bucket", expr(
        """aggregate(sequence(0, 7), 0L, (acc, p) ->
          |  acc | CASE WHEN vec_dot(embedding, planes[p]) > 0D
          |        THEN shiftleft(1L, p) ELSE 0L END)""".stripMargin))
      .select(col("vec_id"), col("label"), col("embedding").as("e"), col("nrm"), col("bucket"))
    val q = withBucket.where(col("vec_id") === 0)
      .withColumn("probes", expr(
        "array_union(array(bucket), transform(sequence(0, 7), p -> bucket ^ shiftleft(1L, p)))"))
      .select(explode(col("probes")).as("qbucket"),
        col("e").as("qe"), col("nrm").as("qnrm"))
    withBucket.where(col("vec_id") =!= 0)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .withColumn("cos_r", round(expr("vec_dot(e, qe)") / (col("nrm") * col("qnrm")), 6))
      .select("vec_id", "label", "bucket", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  /** s03 — IVF-style ANN (rows-only): coarse quantizer = per-label mean
    * vectors (computed distributively via posexplode + per-dimension
    * avg); the query probes its 3 nearest centroids and brute-forces
    * only those inverted lists. At 100 TB the lists are the partition/
    * cluster key, so a probe touches nprobe/nlist of the data; recall
    * is bounded in PipelineSpec against the exact scan. */
  private def s03(s: SparkSession, d: String): DataFrame = {
    val all = emb(s, d)
    val centroids = all
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(avg(col("v")).as("cv"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)").as("ce"))
      .withColumn("cnrm", expr("vec_norm(ce)"))
    val q = all.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qnrm"))
    val probed = centroids.crossJoin(broadcast(q))
      .withColumn("ccos", expr("vec_dot(ce, qe)") / (col("cnrm") * col("qnrm")))
      .orderBy(col("ccos").desc, col("label"))
      .limit(3)
      .select(col("label").as("plabel"), col("qe"), col("qnrm"))
    all.where(col("vec_id") =!= 0)
      .join(broadcast(probed), col("label") === col("plabel"))
      .withColumn("cos_r", round(expr("vec_dot(embedding, qe)") / (col("nrm") * col("qnrm")), 6))
      .select("vec_id", "label", "cos_r")
      .orderBy(col("cos_r").desc, col("vec_id"))
      .limit(10)
  }

  val all: Seq[Q] = Seq(
    Q("s01_ann_brute", Some(s01Oracle), s01),
    Q("s02_ann_lsh", None, s02),
    Q("s03_ann_ivf", None, s03))
}
