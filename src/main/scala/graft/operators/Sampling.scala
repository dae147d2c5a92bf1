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

  /** p03 — stratified sampling by language, DETERMINISTIC per-stratum
    * Bernoulli via the portable hash (keep a doc iff its hash residue
    * clears the stratum's per-mille rate): balances a skewed corpus by
    * downsampling the dominant language to 1/4 rate. The hash-gate
    * formulation is what a production corpus pipeline wants anyway —
    * the SAME doc set reproduces on any engine, any rerun, any
    * partitioning (Spark's `sampleBy` seeds per-partition RNG, so its
    * selection silently changes with the file split) — and it makes
    * the whole sample DuckDB-recomputable: hash-pass, not rows-only.
    * Rate calibration floors stay asserted in PipelineSpec. */
  private def p03(s: SparkSession, d: String): DataFrame = {
    val permille = Map("en" -> 100, "de" -> 400, "es" -> 400, "fr" -> 400,
      "zh" -> 400).map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString(" ")
    Tables.df(s, d, "documents")
      .where(expr(s"pmod($hashCol, 1000L) < CASE lang $permille ELSE 0 END"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("lang")
  }

  private val p03Oracle: String =
    """SELECT lang, COUNT(*) AS n_sampled FROM documents
      |WHERE ((doc_id * 2654435761 + 104729) % 1000000) % 1000 <
      |  CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 400 WHEN 'es' THEN 400
      |            WHEN 'fr' THEN 400 WHEN 'zh' THEN 400 ELSE 0 END
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** p04 — context packing (the concat-and-chunk step before
    * pretraining): docs are laid out in stable-hash order WITHIN a
    * shard, a running token count assigns each doc to the 512-token
    * chunk its first token lands in, and the result is the per-chunk
    * manifest. The window is PARTITIONED by shard — a global
    * ORDER BY-window would serialize 100 TB through one task; per-shard
    * packing is how distributed pipelines actually do it, and the
    * shard is itself the stable hash, so the layout is reproducible on
    * any engine. */
  private def p04(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    Tables.df(s, d, "documents")
      .select(
        col("doc_id"),
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").as("n_tok"),
        expr(hashCol).as("h"))
      .withColumn("shard", expr("pmod(h, 8L)"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr("(cum - n_tok) div 512"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy("shard", "bin")
  }

  // DuckDB window SUM(int) yields HUGEINT; anything derived from it
  // (bin) surfaces as decimal128 to the driver's hasher and
  // mismatches Spark's int64 even when values are equal — cast to
  // BIGINT inside the oracle.
  private val p04Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tok,
      |    (doc_id * 2654435761 + 104729) % 1000000 AS h
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tok, h % 8 AS shard,
      |    CAST(SUM(n_tok) OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
      |      AS BIGINT) AS cum
      |  FROM t)
      |SELECT shard, (cum - n_tok) // 512 AS bin,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      |FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin

  /** p05 — benchmark-contamination screen: training docs sharing any
    * 3-token shingle with the held-out set (stand-in: doc_id % 97 = 0)
    * are flagged with their overlap count. The benchmark shingle set is
    * tiny relative to the corpus, so the probe is a BROADCAST join —
    * at 100 TB the training side streams once and nothing shuffles. */
  private[graft] def contamination(docsDf: DataFrame): DataFrame = {
    val sh = Dedup.shingleIndex(docsDf)
    val bench = sh.where(expr("pmod(doc_id, 97L) = 0"))
      .select("shingle").distinct()
    sh.where(expr("pmod(doc_id, 97L) <> 0"))
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  private def p05(s: SparkSession, d: String): DataFrame =
    contamination(Tables.df(s, d, "documents"))

  private val p05Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(t[i+1:i+3], ' ') for i in range(len(t) - 2)])) AS shingle
      |  FROM toks WHERE len(t) >= 3),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
      |SELECT a.doc_id AS doc_id, COUNT(*) AS n_shared
      |FROM sh a JOIN bench b USING (shingle)
      |WHERE a.doc_id % 97 <> 0
      |GROUP BY a.doc_id ORDER BY doc_id""".stripMargin

  /** p06 — temperature sampling across sources (the multilingual/
    * multi-source rebalance step: keep-rate ∝ n_s^(α−1), α = 0.5, scaled
    * so the smallest source keeps everything). The per-source rate table
    * is a tiny broadcast dim; membership is the same reproducible id
    * hash as p01, so the selected set is engine- and partitioning-
    * independent and the oracle can verify it exactly. floor() pins the
    * threshold (Spark CAST truncates where DuckDB rounds); sqrt/division
    * are IEEE-exact in both engines. */
  private[graft] def temperatureSample(docsDf: DataFrame): DataFrame = {
    val counts = docsDf.groupBy("source").agg(count(lit(1)).as("n_s"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_s")).as("n_min"))))
      .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_s").cast("double")))
      .select("source", "rate")
    docsDf
      .join(broadcast(rates), "source")
      .where(expr(s"$hashCol < floor(rate * 1000000)"))
      .select(col("doc_id"), col("source"), round(col("rate"), 6).as("rate_r"))
      .orderBy("doc_id")
  }

  private def p06(s: SparkSession, d: String): DataFrame =
    temperatureSample(Tables.df(s, d, "documents"))

  private val p06Oracle: String =
    """WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
      |m AS (SELECT MIN(n_s) AS n_min FROM c),
      |r AS (SELECT source, sqrt(CAST(n_min AS DOUBLE) / CAST(n_s AS DOUBLE)) AS rate FROM c, m)
      |SELECT d.doc_id AS doc_id, d.source AS source, round(r.rate, 6) AS rate_r
      |FROM documents d JOIN r USING (source)
      |WHERE (doc_id * 2654435761 + 104729) % 1000000 < floor(rate * 1000000)
      |ORDER BY doc_id""".stripMargin

  /** p07 — the end-to-end training-data pipeline as ONE DataFrame
    * program (the composability proof: every stage is a §2.D operator
    * reused verbatim): near-dup cluster → keep the best-quality
    * representative per cluster (d08's champion pick) → rebalance
    * sources by temperature (p06) → assign reproducible folds (p02's
    * hash). One job, no intermediate materialization — Catalyst fuses
    * the stages; the only shuffles are the ones each stage already
    * owns. Oracle: the d08 recursive-CTE keeper pick composed with
    * p06's rate CTEs and p02's fold arithmetic (PipelineSpec keeps the
    * stage-consistency property check on top). */
  private def p07(s: SparkSession, d: String): DataFrame = {
    val ds = Tables.df(s, d, "documents")
    // the shared dup-graph label index (content-signature cached; see
    // Dedup.dupLabelIndex) — p07 no longer owns or frees it
    val labels = Dedup.dupLabelIndex(ds).toDF("doc_id", "cluster_id")
    // keepers is one id per cluster — tiny — but its subplan carries the
    // whole CC + quality pipeline; the temperature sampler references
    // `deduped` three times (rate numerator, rate denominator, membership
    // join), so without a cut here Catalyst re-executes the regex-heavy
    // quality scan per reference. localCheckpoint materializes the id
    // list once; each reuse is then a broadcast semi join against it.
    val keepers = labels
      .join(TextAnalysis.qualityScore(ds), "doc_id")
      .groupBy("cluster_id")
      .agg(max_by(col("doc_id"), struct(col("quality_score"), -col("doc_id"))).as("doc_id"))
      .select("doc_id")
      .localCheckpoint()
    val deduped = ds.join(keepers, Seq("doc_id"), "left_semi")
    temperatureSample(deduped)
      .join(deduped.select("doc_id", "lang", "n_chars"), "doc_id")
      .withColumn("fold", expr(s"pmod($hashCol, 10L)"))
      .select("doc_id", "source", "lang", "fold", "n_chars")
      .orderBy("doc_id")
  }

  /** The end-to-end restatement: keepers = d08's champion per cluster,
    * deduped = documents ∩ keepers, then p06's temperature membership
    * and p02's fold, all over the deduped relation. */
  private val p07Oracle: String =
    Dedup.dupGraphCtes + ",\n" + Dedup.qualityCte + ",\n" +
    """keep AS (
      |  SELECT first(l.doc_id ORDER BY q.quality_score DESC, l.doc_id ASC) AS doc_id
      |  FROM lab l JOIN q USING (doc_id) GROUP BY l.cluster_id),
      |ded AS (
      |  SELECT d.doc_id, d.source, d.lang, d.n_chars
      |  FROM documents d JOIN keep USING (doc_id)),
      |src_counts AS (SELECT source, COUNT(*) AS n_s FROM ded GROUP BY source),
      |src_min AS (SELECT MIN(n_s) AS n_min FROM src_counts),
      |rates AS (
      |  SELECT source, sqrt(CAST(n_min AS DOUBLE) / CAST(n_s AS DOUBLE)) AS rate
      |  FROM src_counts, src_min)
      |SELECT d.doc_id AS doc_id, d.source AS source, d.lang AS lang,
      |  ((d.doc_id * 2654435761 + 104729) % 1000000) % 10 AS fold,
      |  d.n_chars AS n_chars
      |FROM ded d JOIN rates USING (source)
      |WHERE (d.doc_id * 2654435761 + 104729) % 1000000 < floor(rate * 1000000)
      |ORDER BY doc_id""".stripMargin

  /** p08 — fixed-size deterministic sample: EXACTLY k rows, the k
    * smallest under the reproducible id hash — the complement to p01's
    * rate-based membership when a downstream stage needs a hard row
    * budget (eval slices, human-review batches). Sort+limit collapses
    * to TakeOrderedAndProject: per-partition k-heaps, k rows per
    * partition into the final merge — no global sort at 100 TB. */
  private def p08(s: SparkSession, d: String): DataFrame =
    Tables.df(s, d, "documents")
      .select(col("doc_id"), expr(hashCol).as("h"), col("source"))
      .orderBy("h", "doc_id")
      .limit(100)

  private val p08Oracle: String =
    """SELECT doc_id, (doc_id * 2654435761 + 104729) % 1000000 AS h, source
      |FROM documents ORDER BY h, doc_id LIMIT 100""".stripMargin

  /** p09 — weighted reproducible sampling: keep-probability proportional
    * to (capped) document length — the char-budget-aware variant of
    * p01. Membership is still pure id arithmetic (h(id) < w·1e6), so
    * the SAME rows are kept on any engine or partitioning, and longer
    * docs are kept proportionally more — the sampled set approximates
    * a uniform sample of CHARACTERS, not documents. The weight compare
    * is one double multiply against the integer hash: identical IEEE
    * arithmetic in both engines, no RNG anywhere. */
  private def p09(s: SparkSession, d: String): DataFrame =
    Tables.df(s, d, "documents")
      .where(expr(hashCol) <
        least(col("n_chars"), lit(2000)).cast("double") / 2000.0 * 1000000.0)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars_kept"))
      .orderBy("source")

  private val p09Oracle: String =
    """SELECT source, COUNT(*) AS n_kept,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept
      |FROM documents
      |WHERE (doc_id * 2654435761 + 104729) % 1000000
      |      < least(n_chars, 2000) / 2000.0 * 1000000.0
      |GROUP BY source ORDER BY source""".stripMargin

  /** p10 — decontaminated fold split: the composition a real training
    * pipeline ships between p05 and p02 — benchmark docs AND any
    * training doc sharing a shingle with them are dropped, THEN the
    * survivors get reproducible folds. The contamination probe is
    * p05's broadcast anti-join (the training side never shuffles), the
    * fold is p02's id arithmetic — the output proves no leaked doc
    * reaches any training fold. */
  private def p10(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.df(s, d, "documents")
    val flagged = contamination(docs).select("doc_id")
    docs.where(expr("pmod(doc_id, 97L) <> 0"))
      .join(flagged, Seq("doc_id"), "left_anti")
      .withColumn("fold", expr(s"pmod($hashCol, 10L)"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      .orderBy("fold")
  }

  private val p10Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    [array_to_string(t[i+1:i+3], ' ') for i in range(len(t) - 2)])) AS shingle
      |  FROM toks WHERE len(t) >= 3),
      |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      |flagged AS (
      |  SELECT DISTINCT a.doc_id FROM sh a JOIN bench USING (shingle)
      |  WHERE a.doc_id % 97 <> 0)
      |SELECT ((doc_id * 2654435761 + 104729) % 1000000) % 10 AS fold,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
      |FROM documents
      |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)
      |GROUP BY fold ORDER BY fold""".stripMargin

  /** p11 — training-mixture plan: allocate a token budget across
    * sources with temperature α = 0.5 (weight ∝ tokens^α — the standard
    * up-weighting of small high-quality sources against web-scale
    * bulk). Outputs per source: token inventory, normalized mixture
    * weight, the budget quota, and implied epochs (quota / available —
    * epochs > 1 means that source repeats). One narrow scan +
    * partial+final agg; the per-source table and its α-sum are a
    * broadcast scalar — nothing here grows with corpus size except the
    * one token-count pass. The companion to p06: p06 SELECTS the rows,
    * p11 is the PLAN a budget owner signs off on first. */
  private def p11(s: SparkSession, d: String): DataFrame = {
    val budget = 1000000.0
    val per = Tables.df(s, d, "documents")
      .select(col("source"),
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"), sum(col("n_tok")).as("tokens"))
    val z = per.agg(sum(sqrt(col("tokens").cast("double"))).as("z"))
    per.crossJoin(broadcast(z))
      .withColumn("weight", sqrt(col("tokens").cast("double")) / col("z"))
      .select(col("source"), col("docs"), col("tokens"),
        round(col("weight"), 6).as("weight_r"),
        round(lit(budget) * col("weight"), 2).as("quota_r"),
        round(lit(budget) * col("weight") / col("tokens").cast("double"), 6).as("epochs_r"))
      .orderBy("source")
  }

  private val p11Oracle: String =
    """WITH per AS (
      |  SELECT source, COUNT(*) AS docs,
      |    CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |z AS (SELECT SUM(sqrt(CAST(tokens AS DOUBLE))) AS z FROM per)
      |SELECT source, docs, tokens,
      |  round(sqrt(CAST(tokens AS DOUBLE)) / z, 6) AS weight_r,
      |  round(1000000 * sqrt(CAST(tokens AS DOUBLE)) / z, 2) AS quota_r,
      |  round(1000000 * sqrt(CAST(tokens AS DOUBLE)) / z / tokens, 6) AS epochs_r
      |FROM per, z ORDER BY source""".stripMargin

  /** p12 — EXACTLY k per stratum, deterministically: the k docs with
    * the smallest id-hash within each source (p08's fixed-size
    * guarantee, per group). The rank filter compiles to Spark's
    * WindowGroupLimit — a per-partition top-k heap BEFORE the shuffle,
    * then one bounded window per group — so no group is ever fully
    * sorted and the shuffle carries ≤ k rows per (source, partition).
    * Same engine/partitioning-independent membership as the rest of
    * the p-family: pure id arithmetic, no RNG. */
  private def p12(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(expr(hashCol), col("doc_id"))
    Tables.df(s, d, "documents")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select("source", "rk", "doc_id", "n_chars")
      .orderBy("source", "rk")
  }

  private val p12Oracle: String =
    """WITH r AS (
      |  SELECT source, doc_id, n_chars,
      |    ROW_NUMBER() OVER (
      |      PARTITION BY source
      |      ORDER BY (doc_id * 2654435761 + 104729) % 1000000, doc_id) AS rk
      |  FROM documents)
      |SELECT source, CAST(rk AS INT) AS rk, doc_id, n_chars
      |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  /** p13 — dataset card: the per-source datasheet row a training-data
    * release ships (docs, exact-dup extent via distinct content
    * hashes, language spread, token inventory, length profile). One
    * scan, one partial+final aggregate; the two DISTINCTs are
    * per-group hash-distinct aggregates Spark plans with Expand —
    * bounded by the group's distinct values, never a global set. */
  private def p13(s: SparkSession, d: String): DataFrame =
    Tables.df(s, d, "documents")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(sha2(col("text"), 256)).as("n_unique"),
        (count(lit(1)) - countDistinct(sha2(col("text"), 256))).as("n_exact_dups"),
        countDistinct(col("lang")).as("n_langs"),
        sum(expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long")).as("tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("mean_chars_r"))
      .orderBy("source")

  private val p13Oracle: String =
    """SELECT source,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT sha256(text)) AS n_unique,
      |  COUNT(*) - COUNT(DISTINCT sha256(text)) AS n_exact_dups,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens,
      |  MIN(n_chars) AS min_chars,
      |  MAX(n_chars) AS max_chars,
      |  round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_chars_r
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** p14 — oversampling materializer: docs from small sources REPEATED
    * ∝ sqrt(n_max/n_s) (epochs ≥ 1; integer part for every doc, the
    * fractional remainder by the reproducible id hash) via
    * explode(sequence(1, n_copies)) — the row-multiplication half of
    * rebalancing that p06's keep/drop filter can't express. Epochs are
    * capped at the blow-up the smallest source implies, bounded by
    * construction; row multiplication is a Generate, no shuffle until
    * the final rollup. The checksum (Σ doc_id·copy_idx) pins EXACT
    * per-row multiplicities against the oracle, not just counts. */
  private def p14(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.df(s, d, "documents")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(max(col("n_s")).as("n_max"))))
      .withColumn("epochs", sqrt(col("n_max").cast("double") / col("n_s").cast("double")))
      .select("source", "epochs")
    docs
      .join(broadcast(rates), "source")
      .withColumn("n_copies",
        floor(col("epochs")).cast("long") +
          when(expr(s"$hashCol") <
            floor((col("epochs") - floor(col("epochs"))) * 1000000), 1L).otherwise(0L))
      .select(col("source"), col("doc_id"),
        explode(expr("sequence(1L, n_copies)")).as("copy_idx"))
      .groupBy("source")
      .agg(
        countDistinct(col("doc_id")).as("n_input"),
        count(lit(1)).as("n_output"),
        sum(col("doc_id") * col("copy_idx")).as("checksum"))
      .orderBy("source")
  }

  private val p14Oracle: String =
    """WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
      |m AS (SELECT MAX(n_s) AS n_max FROM c),
      |r AS (SELECT source, sqrt(CAST(n_max AS DOUBLE) / n_s) AS epochs FROM c, m),
      |d AS (
      |  SELECT doc_id, d0.source,
      |    CAST(floor(epochs) AS BIGINT) +
      |    CASE WHEN (doc_id * 2654435761 + 104729) % 1000000
      |              < floor((epochs - floor(epochs)) * 1000000)
      |         THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d0 JOIN r USING (source)),
      |x AS (SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy_idx FROM d)
      |SELECT source, COUNT(DISTINCT doc_id) AS n_input, COUNT(*) AS n_output,
      |  CAST(SUM(doc_id * copy_idx) AS BIGINT) AS checksum
      |FROM x GROUP BY source ORDER BY source""".stripMargin

  /** p15 — percentile winsorization: clamp per-source token-count
    * outliers to the source's [p05, p95] band — the standard
    * length-outlier treatment before token-budget planning (one
    * 100M-token doc otherwise eats a whole pack). Exact per-group
    * percentiles (one partial+final agg on a |sources|-row spine)
    * broadcast back; the clamp is a pure projection. */
  private def p15(s: SparkSession, d: String): DataFrame = {
    val docsT = Tables.df(s, d, "documents")
      .select(col("doc_id"), col("source"),
        expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("double").as("tc"))
    val bounds = docsT.groupBy("source").agg(
      expr("percentile(tc, 0.05)").as("lo"),
      expr("percentile(tc, 0.95)").as("hi"))
    docsT.join(broadcast(bounds), Seq("source"))
      .select(col("doc_id"), col("source"), col("tc").cast("long").as("n_tokens"),
        round(greatest(least(col("tc"), col("hi")), col("lo")), 4).as("tc_winsor"),
        (col("tc") < col("lo") || col("tc") > col("hi")).as("clipped"))
      .orderBy("doc_id")
  }

  private val p15Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS tc
      |  FROM documents),
      |b AS (SELECT source, quantile_cont(tc, 0.05) AS lo,
      |        quantile_cont(tc, 0.95) AS hi FROM t GROUP BY source)
      |SELECT doc_id, t.source, CAST(tc AS BIGINT) AS n_tokens,
      |  round(GREATEST(LEAST(tc, hi), lo), 4) AS tc_winsor,
      |  (tc < lo OR tc > hi) AS clipped
      |FROM t JOIN b ON t.source = b.source
      |ORDER BY doc_id""".stripMargin

  /** p16 — per-group feature scaling (z-score + min-max of n_chars per
    * source): the normalization stage before any learned scorer mixes
    * features across sources. Moments come from exact integer power
    * sums (sum, sum-of-squares, min, max, count are all
    * order-independent on integer-valued doubles below 2^53), so the
    * derived stddev is the SAME double in any partitioning and in
    * DuckDB; the spelled-out sqrt((Σx² − (Σx)²/n)/(n−1)) formula is
    * written identically on both sides. One tiny agg spine, broadcast
    * back, pure projection after. */
  private def p16(s: SparkSession, d: String): DataFrame = {
    val docsT = Tables.df(s, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars").cast("double").as("x"))
    val m = docsT.groupBy("source").agg(
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sx2"),
      count(lit(1)).cast("double").as("n"),
      min(col("x")).as("mn"),
      max(col("x")).as("mx"))
    // Degenerate-group guards (single doc ⇒ n−1 = 0; constant n_chars
    // ⇒ mx−mn = 0 and sd = 0): NULL out rather than trip the session's
    // ANSI DIVIDE_BY_ZERO mid-job — mirrored with NULLIF in the oracle.
    val sd = sqrt((col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
    docsT.join(broadcast(m), Seq("source"))
      .select(col("doc_id"), col("source"), col("x").cast("long").as("n_chars"),
        round(when(col("n") > 1 && sd =!= 0.0,
          (col("x") - col("sx") / col("n")) / sd), 4).as("z_score"),
        round(when(col("mx") =!= col("mn"),
          (col("x") - col("mn")) / (col("mx") - col("mn"))), 4).as("min_max"))
      .orderBy("doc_id")
  }

  private val p16Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS x FROM documents),
      |m AS (
      |  SELECT source, SUM(x) AS sx, SUM(x * x) AS sx2,
      |    CAST(COUNT(*) AS DOUBLE) AS n, MIN(x) AS mn, MAX(x) AS mx
      |  FROM t GROUP BY source)
      |SELECT doc_id, t.source, CAST(x AS BIGINT) AS n_chars,
      |  round((x - sx / n) /
      |    NULLIF(sqrt((sx2 - sx * sx / n) / NULLIF(n - 1, 0)), 0), 4) AS z_score,
      |  round((x - mn) / NULLIF(mx - mn, 0), 4) AS min_max
      |FROM t JOIN m ON t.source = m.source
      |ORDER BY doc_id""".stripMargin

  /** p17 — quality-gated quarantine routing: every doc gets a verdict
    * (pass / review / fail) and a machine-readable reason code from a
    * FIRST-MATCH rule chain — the triage stage in front of any
    * training-data ingest (fail drops, review quarantines for humans,
    * pass flows on). All predicates are integer counts or single
    * divisions of integers, so the routing is engine-exact; one
    * codegen'd projection, no shuffle before the final sort. */
  private def p17(s: SparkSession, d: String): DataFrame = {
    val toks = expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    Tables.df(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(toks).as("n_tok"),
        size(array_distinct(toks)).as("n_distinct"),
        col("n_chars"))
      .withColumn("verdict",
        when(col("n_tok") < 5, lit("fail"))
          .when(col("n_distinct") / col("n_tok") < 0.3, lit("fail"))
          .when(col("n_chars") > 500, lit("review"))
          .otherwise(lit("pass")))
      .withColumn("reason",
        when(col("n_tok") < 5, lit("too_short"))
          .when(col("n_distinct") / col("n_tok") < 0.3, lit("low_diversity"))
          .when(col("n_chars") > 500, lit("long_doc"))
          .otherwise(lit("ok")))
      .orderBy("doc_id")
  }

  private val p17Oracle: String =
    """SELECT doc_id, source,
      |  len(regexp_extract_all(lower(text), '[a-z]+')) AS n_tok,
      |  len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS n_distinct,
      |  n_chars,
      |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) < 5 THEN 'fail'
      |       WHEN len(list_distinct(regexp_extract_all(lower(text), '[a-z]+')))
      |            / len(regexp_extract_all(lower(text), '[a-z]+')) < 0.3 THEN 'fail'
      |       WHEN n_chars > 500 THEN 'review'
      |       ELSE 'pass' END AS verdict,
      |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) < 5 THEN 'too_short'
      |       WHEN len(list_distinct(regexp_extract_all(lower(text), '[a-z]+')))
      |            / len(regexp_extract_all(lower(text), '[a-z]+')) < 0.3 THEN 'low_diversity'
      |       WHEN n_chars > 500 THEN 'long_doc'
      |       ELSE 'ok' END AS reason
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** p18 — deterministic source interleave: a global training order
    * that round-robins across sources (doc k of each source before doc
    * k+1 of any) with stable hash order within a source — the "don't
    * feed 1M docs of one source in a row" curriculum layout. The
    * interleave key is (per-source rank, source): the rank costs one
    * window per SOURCE partition, and the total order is the range-
    * partitioned output sort — deliberately NO global row_number
    * window (an explicit position column would serialize 100 TB
    * through one task; a consumer needing it uses zipWithIndex on the
    * sorted result, where per-partition offsets keep it parallel). */
  private def p18(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("h", "doc_id")
    Tables.df(s, d, "documents")
      .select(col("doc_id"), col("source"), expr(hashCol).as("h"))
      .withColumn("rn", row_number().over(w))
      .select("rn", "source", "doc_id")
      .orderBy("rn", "source", "doc_id")
  }

  private val p18Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    (doc_id * 2654435761 + 104729) % 1000000 AS h
      |  FROM documents)
      |SELECT ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn,
      |  source, doc_id
      |FROM t
      |ORDER BY rn, source, doc_id""".stripMargin

  /** p19 — seeded deterministic global shuffle: every epoch of
    * training wants the SAME pseudo-random permutation given the same
    * seed, reproducible across engines and runs. The shuffle key is
    * md5(seed || doc_id) — a portable hash both engines compute
    * identically (xxhash64 is Spark-private, so p01's key would be
    * rows-only) — and the global position comes from
    * ExactPercentile.withGroupRank over a constant group: a
    * RANGE-partitioned distributed row numbering, never the
    * single-task global window `row_number() OVER (ORDER BY …)` plans
    * naively. Shards are pos mod 8 — the downstream loader's file
    * assignment.
    *
    * Codegen boundary note (VERDICT r7): withGroupRank returns an
    * RDD-backed DataFrame, so everything downstream of the rank exits
    * whole-stage codegen — fine here (one projection + the output
    * sort), but an epoch-shard consumer chaining heavy transforms
    * after this query should materialize the shard table first (write
    * the epoch permutation to parquet — which a training pipeline does
    * anyway to freeze the epoch — and read it back inside codegen). */
  private def p19(s: SparkSession, d: String): DataFrame = {
    val keyed = Tables.df(s, d, "documents")
      .select(col("doc_id"),
        md5(concat(lit("seed42:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("g", lit(0))
    ExactPercentile.withGroupRank(keyed, "g", Seq("k"), "rnk")
      .select(col("doc_id"), (col("rnk") + 1).as("pos"),
        (col("rnk") % 8).cast("int").as("shard"))
      .orderBy("doc_id")
  }

  private val p19Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, md5('seed42:' || CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents),
      |r AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k) AS pos FROM t)
      |SELECT doc_id, pos, CAST((pos - 1) % 8 AS INT) AS shard
      |FROM r ORDER BY doc_id""".stripMargin

  /** Fixed-size PPS (probability-proportional-to-size) SYSTEMATIC
    * sample: n picks at cumulative-weight positions
    * `floor((2i+1)·W / 2n)` (centered strides) over the id-ordered
    * corpus — the survey-sampling classic that p09's Bernoulli variant
    * cannot give you: EXACTLY n rows, inclusion probability ∝ weight,
    * rows heavier than the stride W/n selected multiple times (their
    * multiplicity IS the weight signal a char-budgeted curriculum
    * wants). All arithmetic is integer (Long positions, Long running
    * weights), so the selection is bit-reproducible on any engine and
    * any partitioning — no RNG, no transcendentals (the A-ES
    * exponential-key alternative ranks on -ln(u)/w, which is libm-ulp
    * fragile cross-engine; SURVEY §5).
    *
    * Scale shape = the `ExactPercentile.weightedMedian` two-pass:
    * range-partition by id, per-partition weight sums to the driver
    * (P longs of planning metadata), assign each position to the one
    * partition whose [offset, offset+sum) range holds it, then stream
    * each partition once emitting crossings — n rows total leave the
    * executors, no global window, no single-task sort. Input must have
    * a unique numeric id first column; weight second (NULL / non-
    * positive weights are excluded from the population).
    *
    * Reference anchor: docs/6_aggregates.md partial aggregation — the
    * per-partition-sums-then-combine split, applied to selection.
    */
  def ppsSystematic(df: DataFrame, n: Int, partitions: Int = 0): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val cols = df.columns
    val rp = df
      .select(col(cols(0)).cast("long").as("id"), col(cols(1)).cast("long").as("wt"))
      .where(col("wt").isNotNull && col("wt") > 0)
      .repartitionByRange(p, col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Pass 1 — planning metadata: total weight per partition (P longs).
      val sums: Array[(Int, Long)] = rp
        .groupBy(spark_partition_id().as("pid"))
        .agg(sum(col("wt")).as("w"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      val totalW = sums.map(_._2).sum
      if (totalW == 0L) {
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ppsSchema)
      }
      // Centered-stride positions, all-integer: floor((2i+1)·W / 2n).
      val positions: Array[(Long, Long)] =
        Array.tabulate(n)(i => (i.toLong, (2L * i + 1L) * totalW / (2L * n)))
      // Assign each position to the partition whose weight range holds it.
      var off = 0L
      val byPid = scala.collection.mutable.Map.empty[Int, Array[(Long, Long, Long)]]
      sums.sortBy(_._1).foreach { case (pid, w) =>
        val mine = positions.collect {
          case (i, pos) if pos >= off && pos < off + w => (i, pos, off)
        }
        if (mine.nonEmpty) byPid.update(pid, mine)
        off += w
      }
      val bc = spark.sparkContext.broadcast(byPid.toMap)

      // Pass 2 — stream each partition once in id order; a position is
      // satisfied by the first row whose running cum exceeds it.
      val picked = rp
        .sortWithinPartitions(col("id"))
        .rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val want = bc.value.getOrElse(pid, Array.empty[(Long, Long, Long)])
          if (want.isEmpty) Iterator.empty
          else {
            val byPos = want.sortBy(_._2)
            var wi = 0
            var cum = byPos.head._3 // partition start offset
            val out = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.spark.sql.Row]
            it.foreach { row =>
              if (wi < byPos.length) {
                cum += row.getLong(1)
                while (wi < byPos.length && byPos(wi)._2 < cum) {
                  out += org.apache.spark.sql.Row(
                    byPos(wi)._1, row.getLong(0), row.getLong(1))
                  wi += 1
                }
              }
            }
            out.iterator
          }
        }
      spark.createDataFrame(picked, ppsSchema)
    } finally rp.unpersist(blocking = false)
  }

  private val ppsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sample_idx",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("wt",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** STRATIFIED `ppsSystematic`: exactly n PPS picks per GROUP, in one
    * two-pass job over all strata (never a per-group loop — the
    * mixture-curriculum shape "10 docs per source ∝ length" must not
    * cost |sources| scans at 100 TB). Same integer crossing rule per
    * stratum, same partition-prefix metadata now keyed (partition ×
    * group) — P × |groups| longs on the driver, the documented
    * low-cardinality-group contract shared with `ExactPercentile`
    * (strata are sources/languages/splits: tens, not millions; a
    * high-cardinality stratification belongs in p12's per-key top-k).
    * Input: (group, unique id, weight); NULL groups and NULL/non-
    * positive weights are excluded. Output one row per (group,
    * sample_idx). */
  def ppsStratified(df: DataFrame, n: Int, partitions: Int = 0): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val cols = df.columns
    val rp = df
      .select(col(cols(0)).cast("string").as("g"),
        col(cols(1)).cast("long").as("id"),
        col(cols(2)).cast("long").as("wt"))
      .where(col("g").isNotNull && col("wt").isNotNull && col("wt") > 0)
      .repartitionByRange(p, col("g"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sums: Array[(Int, String, Long)] = rp
        .groupBy(spark_partition_id().as("pid"), col("g"))
        .agg(sum(col("wt")).as("w"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      val totals: Map[String, Long] =
        sums.groupBy(_._2).map { case (g, xs) => g -> xs.map(_._3).sum }
      val posPerGroup: Map[String, Array[(Long, Long)]] = totals.map {
        case (g, wTot) =>
          g -> Array.tabulate(n)(i => (i.toLong, (2L * i + 1L) * wTot / (2L * n)))
      }
      val offsets = scala.collection.mutable.Map.empty[String, Long]
      val byPid = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.Map[String, (Long, Array[(Long, Long)])]]
      sums.sortBy(_._1).foreach { case (pid, g, w) =>
        val start = offsets.getOrElse(g, 0L)
        val mine = posPerGroup(g).filter { case (_, pos) =>
          pos >= start && pos < start + w
        }
        if (mine.nonEmpty)
          byPid.getOrElseUpdate(pid, scala.collection.mutable.Map.empty)
            .update(g, (start, mine.sortBy(_._2)))
        offsets.update(g, start + w)
      }
      val bc = spark.sparkContext.broadcast(
        byPid.map { case (k, m) => k -> m.toMap }.toMap)

      val picked = rp
        .sortWithinPartitions(col("g"), col("id"))
        .rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val want = bc.value
            .getOrElse(pid, Map.empty[String, (Long, Array[(Long, Long)])])
          if (want.isEmpty) Iterator.empty
          else {
            var curG: String = null
            var cum = 0L
            var byPos: Array[(Long, Long)] = Array.empty
            var wi = 0
            val out = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.spark.sql.Row]
            it.foreach { row =>
              val g = row.getString(0)
              if (g != curG) {
                curG = g
                val e = want.getOrElse(g, (0L, Array.empty[(Long, Long)]))
                cum = e._1; byPos = e._2; wi = 0
              }
              if (wi < byPos.length) {
                cum += row.getLong(2)
                while (wi < byPos.length && byPos(wi)._2 < cum) {
                  out += org.apache.spark.sql.Row(
                    g, byPos(wi)._1, row.getLong(1), row.getLong(2))
                  wi += 1
                }
              }
            }
            out.iterator
          }
        }
      spark.createDataFrame(picked, stratSchema)
    } finally rp.unpersist(blocking = false)
  }

  private val stratSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("source",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("sample_idx",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("wt",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** p21 — 10 docs per source, drawn ∝ n_chars via `ppsStratified`:
    * the per-stratum curriculum sample, one job for all sources. The
    * oracle restates the per-stratum integer crossing rule with a
    * partitioned window cumsum. */
  private def p21(s: SparkSession, d: String): DataFrame =
    ppsStratified(
      Tables.df(s, d, "documents").select(col("source"), col("doc_id"), col("n_chars")),
      10)
      .orderBy("source", "sample_idx")

  private val p21Oracle: String =
    """WITH w AS (
      |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS wt
      |  FROM documents WHERE n_chars > 0 AND source IS NOT NULL),
      |tot AS (
      |  SELECT source, CAST(SUM(wt) AS BIGINT) AS total
      |  FROM w GROUP BY source),
      |pos AS (
      |  SELECT tot.source, CAST(i AS BIGINT) AS sample_idx,
      |    ((2 * CAST(i AS BIGINT) + 1) * tot.total) // 20 AS p
      |  FROM tot, range(0, 10) t(i)),
      |cum AS (
      |  SELECT source, doc_id, wt,
      |    CAST(SUM(wt) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS c
      |  FROM w)
      |SELECT pos.source AS source, pos.sample_idx, cum.doc_id, cum.wt
      |FROM pos JOIN cum
      |  ON pos.source = cum.source AND pos.p >= cum.c - cum.wt AND pos.p < cum.c
      |ORDER BY pos.source, sample_idx""".stripMargin

  /** p20 — fixed-size char-weighted corpus sample via `ppsSystematic`:
    * exactly 100 docs drawn proportional to n_chars. The oracle
    * restates the integer crossing rule in plain SQL (window cumsum +
    * integer-division positions), so DuckDB verifies the distributed
    * two-pass selection row for row. */
  private def p20(s: SparkSession, d: String): DataFrame =
    ppsSystematic(
      Tables.df(s, d, "documents").select(col("doc_id"), col("n_chars")), 100)
      .orderBy("sample_idx")

  private val p20Oracle: String =
    """WITH w AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS wt
      |  FROM documents WHERE n_chars > 0),
      |tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS total FROM w),
      |pos AS (
      |  SELECT CAST(i AS BIGINT) AS sample_idx,
      |    ((2 * CAST(i AS BIGINT) + 1) * (SELECT total FROM tot)) // 200 AS p
      |  FROM range(0, 100) t(i)),
      |cum AS (
      |  SELECT doc_id, wt,
      |    CAST(SUM(wt) OVER (ORDER BY doc_id) AS BIGINT) AS c
      |  FROM w)
      |SELECT pos.sample_idx, cum.doc_id, cum.wt
      |FROM pos JOIN cum ON pos.p >= cum.c - cum.wt AND pos.p < cum.c
      |ORDER BY sample_idx""".stripMargin

  /** Distributed per-stratum greedy BUDGET FILL: order each group's
    * rows by (rank key DESC, id ASC) and keep the prefix whose running
    * weight stays within `num/den` of the group's total weight — "fill
    * half the token budget with the best-ranked docs of each source",
    * the curriculum-construction primitive between p15's clamping and
    * p21's fixed-COUNT sampling (this is fixed-WEIGHT selection).
    *
    * The running sum is NOT a per-group window (`SUM OVER (PARTITION
    * BY g ORDER BY …)` serializes each 100 TB stratum through one
    * task). It is the `ppsSystematic` two-pass shape applied to prefix
    * sums: range-partition by (g, rank DESC, id), per-partition
    * per-group weight sums to the driver (P × |groups| longs — the
    * documented low-cardinality-group contract shared with
    * `ExactPercentile`), broadcast each partition's per-group START
    * offset back, then stream every partition once emitting rows while
    * offset + local running sum stays inside the group's budget. All
    * comparisons are integer (budget = total · num / den in Long
    * arithmetic), so the kept set is bit-reproducible on any engine
    * and any partitioning — the spec proves partition-count
    * independence. Rows with NULL group / NULL rank / non-positive
    * weight are excluded from both the totals and the fill.
    *
    * Input: (group, unique id, weight, rank). Output one row per kept
    * doc: (source, doc_id, wt, cum_wt). */
  def budgetFill(df: DataFrame, num: Long, den: Long,
      partitions: Int = 0): DataFrame = {
    require(num >= 0 && den > 0, s"budget fraction $num/$den is not a fraction")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val cols = df.columns
    val rp = df
      .select(col(cols(0)).cast("string").as("g"),
        col(cols(1)).cast("long").as("id"),
        col(cols(2)).cast("long").as("wt"),
        col(cols(3)).cast("double").as("q"))
      .where(col("g").isNotNull && col("q").isNotNull &&
        col("wt").isNotNull && col("wt") > 0)
      .repartitionByRange(p, col("g"), col("q").desc, col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Pass 1 — planning metadata: per (partition, group) weight sums.
      val sums: Array[(Int, String, Long)] = rp
        .groupBy(spark_partition_id().as("pid"), col("g"))
        .agg(sum(col("wt")).as("w"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      val budgets: Map[String, Long] = sums.groupBy(_._2)
        .map { case (g, xs) => g -> xs.map(_._3).sum * num / den }
      // Each partition's per-group start offset (prefix of earlier
      // partitions' sums — partitions are range-ordered by the sort key).
      val offsets = scala.collection.mutable.Map.empty[String, Long]
      val byPid = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.Map[String, Long]]
      sums.sortBy(_._1).foreach { case (pid, g, w) =>
        val start = offsets.getOrElse(g, 0L)
        // partitions fully past the budget never emit — skip their entry
        if (start < budgets(g))
          byPid.getOrElseUpdate(pid, scala.collection.mutable.Map.empty)
            .update(g, start)
        offsets.update(g, start + w)
      }
      val bcStarts = spark.sparkContext.broadcast(
        byPid.map { case (k, m) => k -> m.toMap }.toMap)
      val bcBudgets = spark.sparkContext.broadcast(budgets)

      // Pass 2 — stream each partition once in (g, q desc, id) order.
      val kept = rp
        .sortWithinPartitions(col("g"), col("q").desc, col("id"))
        .rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val starts = bcStarts.value.getOrElse(pid, Map.empty[String, Long])
          if (starts.isEmpty) Iterator.empty
          else {
            val budgets = bcBudgets.value
            var curG: String = null
            var cum = 0L
            var live = false
            val out = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.spark.sql.Row]
            it.foreach { row =>
              val g = row.getString(0)
              if (g != curG) {
                curG = g
                live = starts.contains(g)
                cum = starts.getOrElse(g, 0L)
              }
              if (live) {
                cum += row.getLong(2)
                if (cum <= budgets(g))
                  out += org.apache.spark.sql.Row(
                    g, row.getLong(1), row.getLong(2), cum)
                else live = false // cum is monotone — group is done here
              }
            }
            out.iterator
          }
        }
      spark.createDataFrame(kept, fillSchema)
    } finally rp.unpersist(blocking = false)
  }

  private val fillSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("source",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("wt",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cum_wt",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** p22 — fill HALF of each source's token budget with its
    * highest-diversity docs (type/token ratio DESC, doc_id tie-break)
    * via `budgetFill`. The oracle restates the fill as a per-source
    * window cumsum — fine at sf0.01, the very plan the operator
    * exists to avoid at scale. The rank key is one divide of exact
    * integers, so both engines order identically. */
  private def p22(s: SparkSession, d: String): DataFrame = {
    val toks = "regexp_extract_all(lower(text), '[a-z]+', 0)"
    val w = Tables.df(s, d, "documents")
      .select(col("source"), col("doc_id"),
        expr(s"CAST(size($toks) AS BIGINT)").as("wt"),
        expr(s"CAST(size(array_distinct($toks)) AS DOUBLE) / size($toks)").as("q"))
      .where(col("wt") > 0)
    budgetFill(w, 1L, 2L).orderBy("source", "doc_id")
  }

  private val p22Oracle: String =
    """WITH w AS (
      |  SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS wt,
      |    CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS DOUBLE)
      |      / len(regexp_extract_all(lower(text), '[a-z]+')) AS q
      |  FROM documents
      |  WHERE len(regexp_extract_all(lower(text), '[a-z]+')) > 0),
      |tot AS (SELECT source, CAST(SUM(wt) AS BIGINT) AS t FROM w GROUP BY 1),
      |r AS (
      |  SELECT source, doc_id, wt,
      |    CAST(SUM(wt) OVER (
      |      PARTITION BY source ORDER BY q DESC, doc_id) AS BIGINT) AS cum_wt
      |  FROM w)
      |SELECT r.source, r.doc_id, r.wt, r.cum_wt
      |FROM r JOIN tot ON r.source = tot.source
      |WHERE r.cum_wt <= tot.t // 2
      |ORDER BY r.source, r.doc_id""".stripMargin

  /** p23 — fixed-TOTAL temperature apportionment (α = 0.5): p06 flattens
    * a skewed source mix by per-doc Bernoulli rates (output size only
    * in expectation); this is the variant a production mixture needs
    * when the output budget is contractual — exactly T docs split
    * across groups ∝ n_g^α. The apportionment stays INTEGER-exact
    * cross-engine: s_g = floor(sqrt(n_g)) (IEEE sqrt is correctly
    * rounded, so both engines floor the same double), targets
    * t_g = min(n_g, T·s_g div Σs) in Long arithmetic — no float share
    * ever divides. Selection inside each group is deterministic
    * hash-rank: row_number over (md5(doc_id), doc_id), keep rn ≤ t_g —
    * the seeded-shuffle ordering (p19) reused as a sampler. The
    * rank-filter carries a LITERAL bound (rn ≤ T) next to the per-group
    * one, so Spark's WindowGroupLimit prunes each map partition to its
    * top-T before the group shuffle — the window never sees the full
    * 100 TB stratum. Group sizes are a |groups|-row broadcast. */
  private def p23(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val T = 200L
    val docs = Tables.df(s, d, "documents")
      .where(col("lang").isNotNull).select(col("lang"), col("doc_id"))
    val sz = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("sg", floor(sqrt(col("n").cast("double"))).cast("long"))
    val tgt = sz.crossJoin(broadcast(sz.agg(sum("sg").as("ssum"))))
      .withColumn("t", least(col("n"), expr(s"($T * sg) div ssum")))
      .select("lang", "t")
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= lit(T))
      .join(broadcast(tgt), "lang")
      .where(col("rn") <= col("t"))
      .select(col("lang"), col("doc_id"), col("rn").as("pick_rank"))
      .orderBy("lang", "doc_id")
  }

  private val p23Oracle: String =
    """WITH sz AS (
      |  SELECT lang, COUNT(*) AS n FROM documents
      |  WHERE lang IS NOT NULL GROUP BY lang),
      |s AS (
      |  SELECT lang, n, CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS sg
      |  FROM sz),
      |tgt AS (
      |  SELECT lang, LEAST(n, (200 * sg) // (SELECT SUM(sg) FROM s)) AS t
      |  FROM s),
      |rk AS (
      |  SELECT lang, doc_id,
      |    row_number() OVER (
      |      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      |      AS pick_rank
      |  FROM documents WHERE lang IS NOT NULL)
      |SELECT rk.lang, rk.doc_id, rk.pick_rank
      |FROM rk JOIN tgt ON rk.lang = tgt.lang AND rk.pick_rank <= tgt.t
      |ORDER BY rk.lang, rk.doc_id""".stripMargin

  /** Deterministic Gumbel-top-k importance RESAMPLING — the published
    * companion to importance scoring (sampling k items ∝ exp(score/τ)
    * without replacement == top-k on score/τ + Gumbel noise, the
    * Gumbel-max trick): τ → 0 degenerates to exact top-k (pure
    * exploitation), τ large to the seeded-hash shuffle (pure
    * exploration) — ONE operator spans the curriculum knob. The noise
    * is derived from xxhash64(id) (u strictly inside (0,1) via the
    * half-ulp offset, so ln never sees 0), which makes the draw
    * REPRODUCIBLE on any cluster, any partitioning — the same
    * derandomization discipline as p01/p19; the plan is one narrow
    * projection + TakeOrdered, no shuffle of the corpus. */
  private[graft] def gumbelTopK(scored: DataFrame, idCol: String,
      scoreCol: String, k: Int, tau: Double): DataFrame = {
    require(k > 0 && tau > 0, s"need k > 0 and tau > 0, got k=$k tau=$tau")
    val u = (pmod(xxhash64(col(idCol)), lit(1L << 52)).cast("double") + 0.5) /
      (1L << 52).toDouble
    scored
      .withColumn("gkey", col(scoreCol) / tau - log(-log(u)))
      .orderBy(col("gkey").desc, col(idCol))
      .limit(k)
  }

  /** p24 — DSIR scores (t26) resampled by Gumbel-top-k at τ = 0.5:
    * the end-to-end published data-selection pipeline (fit importance
    * weights, then draw a diverse-but-weighted sample) as one
    * composition. ORACLE-CHECKED since r14 via the export pattern: the
    * hash-seeded Gumbel noise (and the t26-checked score) export as
    * engine constants, and DuckDB replays the resample arithmetic
    * gkey = score/τ − noise (identical doubles, identical ops — bit-
    * exact), the cut at 20, the 4-digit round and the final ordering.
    * PipelineSpec keeps τ→0 == exact top-k, exact-k size, and
    * partition-count independence pinned. */
  private def p24(s: SparkSession, d: String): DataFrame = {
    val scored = TextAnalysis.dsirScores(Tables.df(s, d, "documents"),
      col("source") === "src0")
    val u = (pmod(xxhash64(col("doc_id")), lit(1L << 52)).cast("double") + 0.5) /
      (1L << 52).toDouble
    scored.withColumn("noise", log(-log(u)))
      .select("doc_id", "score", "noise")
      .write.mode("overwrite")
      .parquet(graft.operators.Similarity.exportPath("p24cand", d))
    gumbelTopK(scored, "doc_id", "score", 20, 0.5)
      .select(col("doc_id"), col("score"), round(col("gkey"), 4).as("gkey"))
      .orderBy(col("gkey").desc, col("doc_id"))
  }

  private def p24Oracle: String =
    s"""WITH c AS (
      |  SELECT doc_id, score, noise
      |  FROM read_parquet('${graft.operators.Similarity.oracleExportPath("p24cand")}/*.parquet')),
      |g AS (SELECT doc_id, score, score / 0.5 - noise AS gkey FROM c),
      |top AS (SELECT doc_id, score, gkey FROM g
      |        ORDER BY gkey DESC, doc_id LIMIT 20)
      |SELECT doc_id, score, round(gkey, 4) AS gkey FROM top
      |ORDER BY round(gkey, 4) DESC, doc_id""".stripMargin

  /** p25 — SEQUENCE PACKING (the GPT-style concat-and-chunk batch
    * prep every pretraining run does before the model ever sees data):
    * documents tokenize, concatenate in stable doc_id order WITHIN
    * EACH SOURCE SHARD, and split at a fixed context length (512).
    * Per-shard packing is the realistic scale shape — each shard's
    * running-offset window is independent, so the op parallelizes by
    * construction instead of forcing one global sort (a single global
    * window at 100 TB is a 1-partition bottleneck; per-shard is how
    * production packers shard the work). Reports, per source: docs,
    * tokens, chunks produced (`ceil(tokens / 512)`), boundary docs
    * (spanning ≥2 chunks — the fraction attention masking must
    * handle), and the mean chunk-span per doc in fixed-point MICRO
    * units (`avg_span_micro = (1e6 · Σspan) DIV n_docs` — exact
    * integer floor division in BOTH engines; the r12 form rounded a
    * double quotient and hash-diverged on the driver's DuckDB, the
    * precise failure class the SURVEY §5 decimal discipline exists to
    * kill). Pure integer window arithmetic end to end — DuckDB
    * replays it exactly on any host. */
  private def p25(s: SparkSession, d: String): DataFrame = {
    val C = 512L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val toks = Tables.df(s, d, "documents").select(col("doc_id"),
      col("source"),
      size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .cast("long").as("n"))
      .where(col("n") > 0)
      .withColumn("cum", sum(col("n")).over(w))
    // integer DIV, not double division: a shard's running token count
    // at 100 TB exceeds a double's 2^53 exact-integer range
    val spans = toks
      .withColumn("first_c", expr(s"(cum - n) DIV $C"))
      .withColumn("last_c", expr(s"(cum - 1) DIV $C"))
      .withColumn("span", col("last_c") - col("first_c") + 1)
    spans.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n")).as("n_toks"),
      expr(s"(MAX(cum) + ${C - 1}) DIV $C").as("n_chunks"),
      sum(when(col("span") > 1, 1L).otherwise(0L)).as("n_boundary"),
      expr("(SUM(span) * 1000000L) DIV COUNT(*)").as("avg_span_micro"))
      .orderBy("source")
  }

  private val p25Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n
      |  FROM documents
      |  WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
      |c AS (
      |  SELECT doc_id, source, n,
      |    SUM(n) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      |  FROM t),
      |s AS (
      |  SELECT source, n, cum,
      |    ((cum - 1) // 512) - ((cum - n) // 512) + 1 AS span
      |  FROM c)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS n_toks,
      |  CAST((MAX(cum) + 511) // 512 AS BIGINT) AS n_chunks,
      |  CAST(SUM(CASE WHEN span > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary,
      |  CAST((SUM(span) * 1000000) // COUNT(*) AS BIGINT) AS avg_span_micro
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  // def, not val: the p24 oracle interpolates its recorded export path.
  def all: Seq[Q] = Seq(
    Q("p01_sample_hash", Some(p01Oracle), p01),
    Q("p02_split_folds", Some(p02Oracle), p02),
    Q("p03_sample_stratified", Some(p03Oracle), p03),
    Q("p04_pack_contexts", Some(p04Oracle), p04),
    Q("p05_contamination", Some(p05Oracle), p05),
    Q("p06_sample_temperature", Some(p06Oracle), p06),
    Q("p07_e2e_pipeline", Some(p07Oracle), p07),
    Q("p08_sample_fixed", Some(p08Oracle), p08),
    Q("p09_sample_weighted", Some(p09Oracle), p09),
    Q("p10_decontaminated_folds", Some(p10Oracle), p10),
    Q("p11_mixture_weights", Some(p11Oracle), p11),
    Q("p12_sample_k_per_group", Some(p12Oracle), p12),
    Q("p13_dataset_card", Some(p13Oracle), p13),
    Q("p14_oversample", Some(p14Oracle), p14),
    Q("p15_winsorize", Some(p15Oracle), p15),
    Q("p16_feature_scale", Some(p16Oracle), p16),
    Q("p17_quarantine", Some(p17Oracle), p17),
    Q("p18_interleave", Some(p18Oracle), p18),
    Q("p19_seeded_shuffle", Some(p19Oracle), p19),
    Q("p20_pps_sample", Some(p20Oracle), p20),
    Q("p21_pps_stratified", Some(p21Oracle), p21),
    Q("p22_budget_fill", Some(p22Oracle), p22),
    Q("p23_alpha_mix", Some(p23Oracle), p23),
    Q("p24_gumbel_topk", Some(p24Oracle), p24),
    Q("p25_pack_chunks", Some(p25Oracle), p25))
}
