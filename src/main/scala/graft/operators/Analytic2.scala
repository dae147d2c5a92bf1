package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables

/** Third analytic wave: ordered string aggregation, lateral top-k,
  * IGNORE NULLS gap carry-forward, fixed-width histograms, discrete
  * percentiles, and NOT IN null semantics.
  *
  * These are deliberately SQL-expressed (`spark.sql`): each one
  * exercises a parser/analyzer surface the DataFrame API reaches only
  * awkwardly (WITHIN GROUP, LATERAL, IGNORE NULLS, null-aware NOT IN),
  * and Catalyst plans them onto the same physical families as the rest
  * of the library — no new operator machinery needed.
  */
object Analytic2 {

  private def sql(s: SparkSession, d: String, q: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(q)
  }

  /** q58 — ordered string aggregation (listagg WITHIN GROUP): each
    * customer's order-status lifecycle as a date-ordered string. The
    * aggregate collects within groups bounded by orders-per-customer,
    * so partial aggregation and group size both stay sane at 100 TB —
    * unlike a global listagg, which would be a single-reducer
    * anti-pattern. */
  private def q58(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """SELECT o_custkey,
        |  listagg(o_orderstatus, '') WITHIN GROUP (ORDER BY o_orderdate, o_orderkey) AS lifecycle,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)

  private val q58Oracle: String =
    """SELECT o_custkey,
      |  string_agg(o_orderstatus, '' ORDER BY o_orderdate, o_orderkey) AS lifecycle,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q59 — lateral top-k (correlated LATERAL subquery with ORDER BY +
    * LIMIT): the top 3 customers by balance per nation. A third top-N
    * plan shape next to q24 (window filter) and q36 (typed heap
    * aggregator): Catalyst decorrelates the lateral into a
    * rank-over-partition, so the per-group K-cut happens inside one
    * shuffle rather than per-row re-execution — the property that makes
    * LATERAL survive a 1000-executor fan-out. */
  private def q59(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """SELECT n_name, c.c_name, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 3) c
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)

  private val q59Oracle: String =
    """SELECT n_name, c.c_name, c.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 3) c
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  /** q60 — last-observation-carried-forward (time-series gap repair):
    * click events carry a numeric payload, every other event inherits
    * the user's most recent one via last_value IGNORE NULLS over an
    * unbounded-preceding frame. One window pass partitioned by user —
    * state per partition is a single scalar, so the frame never
    * buffers, and the partition key shards the 100 TB case. */
  private def q60(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """WITH e AS (
        |  SELECT event_id, user_id, date_trunc('second', ts) AS ts_s,
        |    CASE WHEN event_type = 'click'
        |      THEN CAST(get_json_object(props, '$.k') AS INT) END AS k
        |  FROM events)
        |SELECT event_id, user_id, ts_s, k,
        |  last_value(k) IGNORE NULLS OVER (
        |    PARTITION BY user_id ORDER BY ts_s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k_locf
        |FROM e ORDER BY user_id, ts_s, event_id""".stripMargin)

  private val q60Oracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_s,
      |    CASE WHEN event_type = 'click'
      |      THEN CAST(props ->> '$.k' AS INT) END AS k
      |  FROM events)
      |SELECT event_id, user_id, ts_s, k,
      |  last_value(k IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts_s, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k_locf
      |FROM e ORDER BY user_id, ts_s, event_id""".stripMargin

  /** q61 — fixed-width histogram: 12 × 50k bins over order totals,
    * clamped at both ends (width_bucket exists in Spark but not DuckDB,
    * so both sides state the arithmetic directly — identical IEEE
    * double division + floor, so bin assignment is bit-deterministic).
    * Binning is a pure projection feeding one partial+final count —
    * the shuffled row count equals the bin count, not the data. */
  private def q61(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """SELECT CAST(least(greatest(floor(o_totalprice / 50000.0), 0), 11) AS BIGINT) AS bin,
        |  COUNT(*) AS n,
        |  min(o_totalprice) AS lo,
        |  max(o_totalprice) AS hi
        |FROM orders GROUP BY bin ORDER BY bin""".stripMargin)

  private val q61Oracle: String =
    """SELECT CAST(least(greatest(floor(o_totalprice / 50000.0), 0), 11) AS BIGINT) AS bin,
      |  COUNT(*) AS n,
      |  min(o_totalprice) AS lo,
      |  max(o_totalprice) AS hi
      |FROM orders GROUP BY bin ORDER BY bin""".stripMargin

  /** q62 — discrete percentiles (percentile_disc WITHIN GROUP): unlike
    * q30's interpolating percentile, the discrete form returns an
    * actual data value (smallest value whose cume_dist ≥ p — both
    * engines agree on that definition), which is what quantile-based
    * data-quality cuts want: a real document length, not a synthetic
    * average of two. Computed by the distributed range-sort selection
    * primitive (ExactPercentile.discrete) — no buffering
    * percentile_disc aggregate, no per-group single-task sort; the
    * discrete form is pure row addressing (index ceil(p·n)−1 in
    * (group, value) order), which the two-pass selection answers with
    * O(groups × ps) rows leaving the executors. */
  private def q62(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val pct = ExactPercentile.discrete(
      graft.Tables.df(s, d, "orders").select(col("o_orderpriority"), col("o_totalprice")),
      Seq(0.25, 0.5, 0.75))
    pct.toSeq
      .map { case (g, r) => (g, r.values(0), r.values(1), r.values(2), r.n) }
      .toDF("o_orderpriority", "p25", "p50", "p75", "n")
      .orderBy("o_orderpriority")
  }

  private val q62Oracle: String =
    """SELECT o_orderpriority,
      |  quantile_disc(o_totalprice, 0.25) AS p25,
      |  quantile_disc(o_totalprice, 0.5)  AS p50,
      |  quantile_disc(o_totalprice, 0.75) AS p75,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q63 — NOT IN vs NOT EXISTS against a NULL-containing key set:
    * three-valued logic makes NOT IN return nothing once the subquery
    * holds a NULL (Spark plans it as a null-aware anti join to honor
    * exactly that), while NOT EXISTS is the plain anti join that keeps
    * matching rows. Shipping both side by side pins the semantics the
    * optimizer must preserve — the classic silent-wrong-answer trap in
    * dedup-by-exclusion pipelines. */
  private def q63(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """WITH keys AS (SELECT NULLIF(o_custkey, 13) AS k FROM orders),
        |a AS (SELECT COUNT(*) AS n FROM customer
        |      WHERE c_custkey NOT IN (SELECT k FROM keys)),
        |b AS (SELECT COUNT(*) AS n FROM customer c
        |      WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_custkey))
        |SELECT 'not_in' AS variant, n FROM a
        |UNION ALL
        |SELECT 'not_exists' AS variant, n FROM b
        |ORDER BY variant""".stripMargin)

  private val q63Oracle: String =
    """WITH keys AS (SELECT NULLIF(o_custkey, 13) AS k FROM orders),
      |a AS (SELECT COUNT(*) AS n FROM customer
      |      WHERE c_custkey NOT IN (SELECT k FROM keys)),
      |b AS (SELECT COUNT(*) AS n FROM customer c
      |      WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c.c_custkey))
      |SELECT 'not_in' AS variant, n FROM a
      |UNION ALL
      |SELECT 'not_exists' AS variant, n FROM b
      |ORDER BY variant""".stripMargin

  /** q64 — time-weighted average (the IoT/finance aggregate plain AVG
    * gets wrong): each carried-forward payload value is weighted by how
    * long it was in force (seconds to the next event), per user. Two
    * window passes over one partitioning (locf + lead share the same
    * shuffle) feeding one partial+final aggregation; the weighted sums
    * are exact integer arithmetic, so only the final single division is
    * floating point. */
  private def q64(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """WITH e AS (
        |  SELECT event_id, user_id, date_trunc('second', ts) AS ts_s,
        |    CASE WHEN event_type = 'click'
        |      THEN CAST(get_json_object(props, '$.k') AS INT) END AS k
        |  FROM events),
        |l AS (
        |  SELECT user_id,
        |    last_value(k) IGNORE NULLS OVER (
        |      PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kv,
        |    timestampdiff(SECOND, ts_s,
        |      lead(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)) AS dt
        |  FROM e)
        |SELECT user_id,
        |  CAST(SUM(kv * dt) AS BIGINT) AS wsum,
        |  CAST(SUM(dt) AS BIGINT) AS tsum,
        |  round(CAST(SUM(kv * dt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE), 6) AS twa
        |FROM l WHERE kv IS NOT NULL AND dt IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin)

  private val q64Oracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_s,
      |    CASE WHEN event_type = 'click'
      |      THEN CAST(props ->> '$.k' AS INT) END AS k
      |  FROM events),
      |l AS (
      |  SELECT user_id,
      |    last_value(k IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts_s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kv,
      |    date_diff('second', ts_s,
      |      lead(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)) AS dt
      |  FROM e)
      |SELECT user_id,
      |  CAST(SUM(kv * dt) AS BIGINT) AS wsum,
      |  CAST(SUM(dt) AS BIGINT) AS tsum,
      |  round(CAST(SUM(kv * dt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE), 6) AS twa
      |FROM l WHERE kv IS NOT NULL AND dt IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q65 — typed JSON decode (JsonToStructs): parse props ONCE with a
    * declared schema, then aggregate the typed field — q33's per-path
    * get_json_object re-parses the document per extraction; from_json
    * amortizes the parse across every downstream use and fails typed
    * (NULL on malformed), the shape JSON event pipelines want at scale. */
  private def q65(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """WITH p AS (
        |  SELECT event_type, from_json(props, 'k INT').k AS k
        |  FROM events)
        |SELECT event_type,
        |  COUNT(k) AS n_parsed,
        |  CAST(MIN(k) AS INT) AS min_k,
        |  CAST(MAX(k) AS INT) AS max_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin)

  private val q65Oracle: String =
    """WITH p AS (
      |  SELECT event_type, CAST(props ->> '$.k' AS INT) AS k
      |  FROM events)
      |SELECT event_type,
      |  COUNT(k) AS n_parsed,
      |  CAST(MIN(k) AS INT) AS min_k,
      |  CAST(MAX(k) AS INT) AS max_k,
      |  CAST(SUM(k) AS BIGINT) AS sum_k
      |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q66 — ratio-to-report (percent-of-total window): each order's share
    * of its customer's lifetime spend — a whole-partition window frame
    * (no ORDER BY), the one window shape q15/q32/q43/q49 don't cover.
    * The partition total is computed once per customer partition and
    * broadcast down its rows; the decimal-cast sum keeps the
    * denominator order-independent (SURVEY §5). */
  private def q66(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey) AS DOUBLE), 6) AS spend_share
        |FROM orders ORDER BY o_orderkey""".stripMargin)

  private val q66Oracle: String =
    """SELECT o_orderkey, o_custkey,
      |  round(o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (PARTITION BY o_custkey) AS DOUBLE), 6) AS spend_share
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q67 — recursive CTE (WITH RECURSIVE → Spark 4.x UnionLoop): walk
    * the digit-trim tree over doc ids (parent = id div 10) from the
    * single-digit roots, then roll up size and id-sum per (root,
    * depth). Graph/hierarchy traversal is the one relational surface
    * d06 had to hand-roll as driver-controlled iteration; here the
    * ENGINE runs the fixpoint — every UnionLoop step is an ordinary
    * join stage over the previous frontier, so state is bounded by the
    * frontier and the same shuffle/broadcast machinery applies at any
    * scale. */
  private def q67(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """WITH RECURSIVE tree AS (
        |  SELECT doc_id AS node, doc_id AS root, 0 AS depth
        |  FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT d.doc_id, t.root, t.depth + 1
        |  FROM documents d JOIN tree t ON d.doc_id div 10 = t.node
        |  WHERE d.doc_id >= 10)
        |SELECT root, depth, COUNT(*) AS n, SUM(node) AS sum_node
        |FROM tree GROUP BY root, depth ORDER BY root, depth""".stripMargin)

  private val q67Oracle: String =
    """WITH RECURSIVE tree AS (
      |  SELECT doc_id AS node, doc_id AS root, 0 AS depth
      |  FROM documents WHERE doc_id < 10
      |  UNION ALL
      |  SELECT d.doc_id, t.root, t.depth + 1
      |  FROM documents d JOIN tree t ON d.doc_id // 10 = t.node
      |  WHERE d.doc_id >= 10)
      |SELECT root, depth, COUNT(*) AS n, CAST(SUM(node) AS BIGINT) AS sum_node
      |FROM tree GROUP BY root, depth ORDER BY root, depth""".stripMargin

  /** q68 — VARIANT semi-structured column (Spark 4's open data type):
    * parse_json ONCE into the binary variant encoding, then typed path
    * extraction + aggregation. Complements q33 (per-path string
    * get_json_object) and q65 (rigid from_json schema): variant is the
    * schema-on-read middle ground — one parse, binary-encoded fields,
    * typed access without declaring the full schema up front. At scale
    * the parse cost is paid once per row, not once per path. */
  private def q68(s: SparkSession, d: String): DataFrame =
    sql(s, d,
      """WITH v AS (
        |  SELECT event_type,
        |    variant_get(parse_json(props), '$.k', 'bigint') AS k
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n, SUM(k) AS sum_k, MAX(k) AS max_k
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin)

  private val q68Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q58_listagg", Some(q58Oracle), q58),
    Q("q59_lateral_topk", Some(q59Oracle), q59),
    Q("q60_locf", Some(q60Oracle), q60),
    Q("q61_histogram", Some(q61Oracle), q61),
    Q("q62_percentile_disc", Some(q62Oracle), q62),
    Q("q63_not_in_nulls", Some(q63Oracle), q63),
    Q("q64_time_weighted_avg", Some(q64Oracle), q64),
    Q("q65_json_typed", Some(q65Oracle), q65),
    Q("q66_ratio_to_report", Some(q66Oracle), q66),
    Q("q67_recursive_cte", Some(q67Oracle), q67),
    Q("q68_variant", Some(q68Oracle), q68))
}
