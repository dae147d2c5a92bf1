package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Fourth analytic wave: multi-objective dominance (skyline) and
  * interval-concurrency sweeps — two query shapes whose naive
  * formulations are quadratic self-joins, re-expressed as the
  * linearithmic sweep plans a distributed engine can actually run at
  * 100 TB. The DuckDB oracles keep the naive quadratic form on purpose:
  * they are arms-length restatements of the SEMANTICS, not the plan.
  */
object Analytic3 {

  /** q70 — 2-D skyline / Pareto frontier (cheapest-and-smallest parts):
    * every part not dominated by another on (p_retailprice, p_size),
    * where a dominates b iff a is ≤ on both dimensions and < on at
    * least one. The textbook formulation is a NOT EXISTS anti self-join
    * — quadratic, and the oracle keeps it. This plan is the sort-sweep:
    * collapse to one spine row per distinct price with the min size at
    * that price (partial+final agg), take the running strict-prefix min
    * over the price order, and keep a part iff it achieves its price's
    * min size AND beats every cheaper price's best size. The global
    * window runs on the aggregated price spine — |distinct prices| ≪ n
    * rows, the same reduced-spine shape as q47's bin spine; the full
    * table is touched only by the partial agg and the final spine join
    * (broadcast: the surviving spine is small by construction). */
  private def q70(s: SparkSession, d: String): DataFrame = {
    val p = Tables.df(s, d, "part")
    val spine = p.groupBy(col("p_retailprice"))
      .agg(min(col("p_size")).as("msize"))
    // rows preceding = strictly cheaper prices (one spine row per price)
    val w = Window.orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = spine.withColumn("strict_prev", min(col("msize")).over(w))
    p.join(broadcast(pref), Seq("p_retailprice"))
      .where(col("p_size") === col("msize") &&
        (col("strict_prev").isNull || col("p_size") < col("strict_prev")))
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
  }

  private val q70Oracle: String =
    """SELECT p_partkey, p_name, p_size, p_retailprice
      |FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))
      |ORDER BY p_retailprice, p_partkey""".stripMargin

  /** q71 — interval-concurrency sweep (max simultaneously-open orders
    * per priority, each order open 30 days): the classic
    * max-overlapping-intervals query. The naive form joins intervals to
    * every timestamp they cover (quadratic in the overlap); the sweep
    * turns each interval into a +1/−1 delta pair, pre-aggregates deltas
    * per (priority, instant) — partial agg shrinks ties map-side — and
    * takes a running sum over the per-priority time order. Windows are
    * partitioned by priority, so the sweep parallelizes across keys;
    * within a key the spine is |distinct instants|, not |intervals|². */
  private def q71(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val deltas = o.select(
        col("o_orderpriority").as("pri"), col("o_orderdate").as("t"),
        lit(1L).as("dlt"))
      .unionAll(o.select(
        col("o_orderpriority"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("t"),
        lit(-1L)))
    val byInstant = deltas.groupBy("pri", "t").agg(sum(col("dlt")).as("dlt"))
    val w = Window.partitionBy("pri").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byInstant.withColumn("conc", sum(col("dlt")).over(w))
      .groupBy(col("pri"))
      .agg(max(col("conc")).as("max_concurrent"), count(lit(1)).as("n_instants"))
      .orderBy("pri")
  }

  private val q71Oracle: String =
    """WITH deltas AS (
      |  SELECT o_orderpriority AS pri, o_orderdate AS t, 1 AS dlt FROM orders
      |  UNION ALL
      |  SELECT o_orderpriority, o_orderdate + INTERVAL 30 DAY, -1 FROM orders),
      |g AS (SELECT pri, t, SUM(dlt) AS dlt FROM deltas GROUP BY pri, t),
      |r AS (SELECT pri, SUM(dlt) OVER (
      |  PARTITION BY pri ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc FROM g)
      |SELECT pri, CAST(MAX(conc) AS BIGINT) AS max_concurrent,
      |  COUNT(*) AS n_instants
      |FROM r GROUP BY pri ORDER BY pri""".stripMargin

  /** q72 — running distinct count per key (each user's distinct
    * event-type count as of every event): COUNT(DISTINCT) OVER a
    * running frame, which neither engine supports natively. The
    * decomposition: flag each (user, type)'s first occurrence, then
    * running-sum the flags per user. BOTH windows partition by
    * user_id — the first-occurrence flag comes from a lag() over the
    * (type, time) sort, where each type's rows are contiguous, so one
    * run-head per type — and only the sort differs between the two
    * windows. One Exchange total; the naive row_number-per-(user,type)
    * variant pays a second shuffle for a finer partitioning that buys
    * nothing. */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val e = Tables.df(s, d, "events")
    val typeW = Window.partitionBy("user_id")
      .orderBy(col("event_type"), col("ts"), col("event_id"))
    val runW = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("is_first",
        when(lag(col("event_type"), 1).over(typeW).isNull ||
          lag(col("event_type"), 1).over(typeW) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("n_distinct_types", sum(col("is_first")).over(runW))
      .select("user_id", "event_id", "n_distinct_types")
      .orderBy("user_id", "event_id")
  }

  private val q72Oracle: String =
    """WITH f AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN ROW_NUMBER() OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
      |    THEN 1 ELSE 0 END AS is_first
      |  FROM events)
      |SELECT user_id, event_id,
      |  CAST(SUM(is_first) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
      |FROM f ORDER BY user_id, event_id""".stripMargin

  /** q73 — ordered funnel (signup → first view after it → first
    * purchase after that): per-stage minima with an order constraint,
    * the product-analytics staple. Each stage is agg-then-join — the
    * per-user stage table is aggregated BEFORE the next join, so joins
    * carry one row per user per side and the event table is scanned
    * once per stage with the type filter pushed down. Comparisons and
    * outputs run on second-truncated timestamps (SURVEY §5: the ns/µs
    * parquet mismatch must not decide "after"). */
  private def q73(s: SparkSession, d: String): DataFrame = {
    val e = Tables.df(s, d, "events")
      .withColumn("tss", date_trunc("second", col("ts")))
    val sg = e.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("tss")).as("t_signup"))
    val vw = e.where(col("event_type") === "view")
      .select(col("user_id").as("v_uid"), col("tss").as("v_ts"))
    val pc = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("tss").as("p_ts"))
    val s2 = sg.join(vw, col("user_id") === col("v_uid") && col("v_ts") > col("t_signup"), "left")
      .groupBy(col("user_id"), col("t_signup")).agg(min(col("v_ts")).as("t_view"))
    s2.join(pc, col("user_id") === col("p_uid") && col("p_ts") > col("t_view"), "left")
      .groupBy(col("user_id"), col("t_signup"), col("t_view"))
      .agg(min(col("p_ts")).as("t_purchase"))
      .withColumn("stage",
        lit(1) + when(col("t_view").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))
      .select("user_id", "t_signup", "t_view", "t_purchase", "stage")
      .orderBy("user_id")
  }

  private val q73Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, date_trunc('second', ts) AS tss FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(tss) AS t_signup FROM e
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT s1.user_id, t_signup, MIN(v.tss) AS t_view
      |  FROM s1 LEFT JOIN e v
      |    ON v.user_id = s1.user_id AND v.event_type = 'view' AND v.tss > s1.t_signup
      |  GROUP BY s1.user_id, t_signup),
      |s3 AS (
      |  SELECT s2.user_id, t_signup, t_view, MIN(p.tss) AS t_purchase
      |  FROM s2 LEFT JOIN e p
      |    ON p.user_id = s2.user_id AND p.event_type = 'purchase' AND p.tss > s2.t_view
      |  GROUP BY s2.user_id, t_signup, t_view)
      |SELECT user_id, t_signup, t_view, t_purchase,
      |  1 + CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END
      |    + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END AS stage
      |FROM s3 ORDER BY user_id""".stripMargin

  /** q74 — cohort retention matrix: users bucketed by first-seen day,
    * distinct actives per (cohort, day-offset) — the growth dashboard
    * behind every "day-N retention" number. Two aggregations and one
    * key join; the distinct-user count is Spark's partial-aggregating
    * HashAggregate over (cohort, offset, user), so no per-cell set is
    * ever materialized. The cohort dim joins on the user key — at
    * 100 TB that is a shuffle join on the natural key, with AQE free
    * to broadcast when a day's cohort is small. */
  private def q74(s: SparkSession, d: String): DataFrame = {
    val e = Tables.df(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    e.join(cohort, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  private val q74Oracle: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
      |SELECT cohort_day,
      |  CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM e JOIN c USING (user_id)
      |GROUP BY cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** q75 — event-transition matrix (first-order Markov counts): for
    * each user's time-ordered event sequence, count type→next-type
    * transitions and report each transition's share of its source
    * type's outgoing edges. One lead() window per user plus a
    * partial+final count — the sequence never leaves its user
    * partition, and the matrix is |types|² rows regardless of corpus
    * size. The share denominator is a window over the tiny matrix, not
    * a second scan. */
  private def q75(s: SparkSession, d: String): DataFrame = {
    val e = Tables.df(s, d, "events")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = e
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    trans
      .withColumn("share_r",
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("from_type")), 6))
      .select("from_type", "to_type", "n", "share_r")
      .orderBy("from_type", "to_type")
  }

  private val q75Oracle: String =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |t AS (
      |  SELECT from_type, to_type, COUNT(*) AS n FROM seq
      |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n,
      |  round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS share_r
      |FROM t ORDER BY from_type, to_type""".stripMargin

  /** q76 — median absolute deviation per group (robust dispersion —
    * the outlier-tolerant stddev): MAD = median(|x − median(x)|),
    * composed from TWO passes of the distributed range-sort selection
    * primitive (ExactPercentile.continuous) with the tiny per-group
    * median broadcast-joined back between them. No buffering
    * `percentile` aggregate anywhere — its per-group state grows with
    * DISTINCT values (≈ rows on continuous money columns), an
    * executor-OOM shape at 100 TB — and no per-group single-task sort:
    * each selection pass range-partitions the group across many tasks. */
  private def q76(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val o = Tables.df(s, d, "orders")
    val med = ExactPercentile.continuous(
      o.select(col("o_orderpriority"), col("o_totalprice")), Seq(0.5))
    val medDf = med.toSeq.map { case (g, r) => (g, r.values(0), r.n) }
      .toDF("o_orderpriority", "med", "n")
    val adev = o.join(broadcast(medDf.select("o_orderpriority", "med")), "o_orderpriority")
      .select(col("o_orderpriority"), abs(col("o_totalprice") - col("med")).as("adev"))
    val mad = ExactPercentile.continuous(adev, Seq(0.5))
    med.toSeq
      .map { case (g, r) => (g, r.n, r.values(0), mad(g).values(0)) }
      .toDF("o_orderpriority", "n", "median", "mad")
      .select(col("o_orderpriority"), col("n"),
        round(col("median"), 2).as("median_r"),
        round(col("mad"), 2).as("mad_r"))
      .orderBy("o_orderpriority")
  }

  private val q76Oracle: String =
    """WITH med AS (
      |  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o.o_orderpriority, COUNT(*) AS n,
      |  round(ANY_VALUE(med), 2) AS median_r,
      |  round(quantile_cont(abs(o.o_totalprice - med), 0.5), 2) AS mad_r
      |FROM orders o JOIN med USING (o_orderpriority)
      |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin

  /** q77 — relational division (universal quantification): customers
    * who have placed orders in EVERY priority class. "FOR ALL" is the
    * one classic relational operator with no direct SQL verb; the
    * textbook form is a double NOT EXISTS. The set-arithmetic plan:
    * count distinct priorities per customer, keep those equal to the
    * global priority count — two partial+final aggregates and a
    * broadcast scalar, no nested correlated anti-joins to decorrelate.
    * The oracle keeps the double-NOT-EXISTS form as the arms-length
    * semantic statement. */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val nPri = o.agg(countDistinct(col("o_orderpriority")).as("n_pri"))
    o.groupBy("o_custkey")
      .agg(countDistinct(col("o_orderpriority")).as("n_cust_pri"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(nPri))
      .where(col("n_cust_pri") === col("n_pri"))
      .select("o_custkey", "n_orders")
      .orderBy("o_custkey")
  }

  private val q77Oracle: String =
    """SELECT c.o_custkey, COUNT(*) AS n_orders
      |FROM orders c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM (SELECT DISTINCT o_orderpriority FROM orders) p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.o_custkey
      |      AND o.o_orderpriority = p.o_orderpriority))
      |GROUP BY c.o_custkey ORDER BY c.o_custkey""".stripMargin

  /** q78 — period-over-period growth (MoM revenue delta and percent
    * change via lag over the month spine): the aggregation collapses
    * the fact table to one row per (status, month) FIRST, so the lag
    * window slides over a spine bounded by the date range — the
    * dashboard-query shape that stays cheap at any fact-table size.
    * Decimal-cast sums keep the money math order-independent
    * (SURVEY §5). */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val monthly = o
      // to_date: DuckDB's month-granularity date_trunc returns DATE
      .groupBy(col("o_orderstatus").as("status"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_d"))
    val w = Window.partitionBy("status").orderBy("month")
    monthly
      .withColumn("prev_d", lag(col("rev_d"), 1).over(w))
      .select(
        col("status"), col("month"),
        col("rev_d").cast("double").as("revenue"),
        (col("rev_d") - col("prev_d")).cast("double").as("delta"),
        round((col("rev_d") - col("prev_d")).cast("double") /
          col("prev_d").cast("double") * 100, 4).as("pct_change_r"))
      .orderBy("status", "month")
  }

  private val q78Oracle: String =
    """WITH m AS (
      |  SELECT o_orderstatus AS status, date_trunc('month', o_orderdate) AS month,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
      |  FROM orders GROUP BY status, month),
      |w AS (
      |  SELECT status, month, rev_d,
      |    LAG(rev_d) OVER (PARTITION BY status ORDER BY month) AS prev_d
      |  FROM m)
      |SELECT status, month,
      |  CAST(rev_d AS DOUBLE) AS revenue,
      |  CAST(rev_d - prev_d AS DOUBLE) AS delta,
      |  round(CAST(rev_d - prev_d AS DOUBLE) / CAST(prev_d AS DOUBLE) * 100, 4) AS pct_change_r
      |FROM w ORDER BY status, month""".stripMargin

  /** q79 — FORWARD as-of join (each event's next order at or after it):
    * the mirror of q35, planned differently on purpose. q35 expands
    * the per-user candidate set and argmax-aggregates it; here the two
    * tables are UNIONED into one per-user timeline sorted descending,
    * and a running `last(order, ignoreNulls)` carries the nearest
    * future order backwards onto every event row — one sort per user
    * partition, zero candidate fan-out, state bounded by one struct
    * per row. At equal timestamps order rows sort ahead of event rows
    * (>= semantics) and among tied orders the smallest key wins, both
    * enforced by the sort key, not post-filtering. The interleave is
    * the scale shape for dense event × sparse reference tables where
    * q35's expansion would fan out. */
  private def q79(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.df(s, d, "orders").select(
      col("o_custkey").as("uid"), col("o_orderdate").as("t"),
      col("o_orderkey").as("okey"), lit(null).cast("long").as("event_id"))
    val ev = Tables.df(s, d, "events").select(
      col("user_id").as("uid"), col("ts").as("t"),
      lit(null).cast("long").as("okey"), col("event_id"))
    val w = Window.partitionBy("uid")
      .orderBy(col("t").desc, coalesce(col("okey"), lit(-1L)).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("nxt", last(
        when(col("okey").isNotNull, struct(col("t").as("ots"), col("okey"))),
        ignoreNulls = true).over(w))
      .where(col("event_id").isNotNull)
      .select(
        col("event_id"), col("uid").as("user_id"),
        date_trunc("second", col("t")).as("ets"),
        date_trunc("second", col("nxt.ots")).as("next_order_ts"),
        col("nxt.okey").as("next_order_key"))
      .orderBy("event_id")
  }

  private val q79Oracle: String =
    """SELECT e.event_id, e.user_id,
      |  date_trunc('second', e.ts) AS ets,
      |  date_trunc('second', x.o_orderdate) AS next_order_ts,
      |  x.o_orderkey AS next_order_key
      |FROM events e LEFT JOIN LATERAL (
      |  SELECT o_orderdate, o_orderkey FROM orders o
      |  WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
      |  ORDER BY o_orderdate, o_orderkey LIMIT 1) x ON true
      |ORDER BY event_id""".stripMargin

  /** q80 — weighted median per group (price point at which half the
    * shipped QUANTITY sits below): cumulative-weight crossing over the
    * per-group value order. Weights cumulate in DECIMAL so the running
    * sum and the half-total comparison are exact and order-independent
    * across engines; within a run of tied values every ordering yields
    * the same min-crossing VALUE, so no artificial tie-break key is
    * needed. Computed by the distributed range-sort crossing search
    * (ExactPercentile.weightedMedian): weights are pre-scaled to exact
    * integer cents, each flag is spread across MANY range partitions
    * (vs the previous Window.partitionBy(flag) that funneled the whole
    * fact table into 3 single-task sorts — the round-6 scale-audit
    * finding), and only the one partition straddling the half-total
    * crossing scans for it. */
  private def q80(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val li = Tables.df(s, d, "lineitem").select(
      col("l_returnflag").as("flag"),
      col("l_extendedprice").as("v"),
      (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("w"))
    val wm = ExactPercentile.weightedMedian(li)
    wm.toSeq
      .map { case (g, (v, totalCents)) => (g, v, totalCents / 100.0) }
      .toDF("flag", "wmedian", "total_w")
      .orderBy("flag")
  }

  private val q80Oracle: String =
    """WITH x AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS v,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS w
      |  FROM lineitem),
      |c AS (
      |  SELECT flag, v,
      |    SUM(w) OVER (PARTITION BY flag ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumw,
      |    SUM(w) OVER (PARTITION BY flag) AS total
      |  FROM x)
      |SELECT flag, MIN(v) AS wmedian, CAST(MAX(total) AS DOUBLE) AS total_w
      |FROM c WHERE cumw * 2 >= total
      |GROUP BY flag ORDER BY flag""".stripMargin

  /** q81 — snapshot diff / reconciliation (the CDC-batch shape: what
    * changed between two table versions, keyed by primary key): a full
    * outer join on the key classifies every row as added / removed /
    * changed / unchanged, then a tiny rollup counts each class. The
    * two "snapshots" are derived deterministically from orders so the
    * oracle can re-derive them: v1 drops keys ≡ 0 (mod 97), v2 drops
    * keys ≡ 0 (mod 89) and bumps the price of keys ≡ 1 (mod 11). At
    * scale this is one co-partitioned shuffle join on the pk — the
    * plan every data-reconciliation job reduces to — with the class
    * counts partial-aggregated. */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val v1 = o.where(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .select(col("o_orderkey").as("k1"), col("o_totalprice").as("p1"))
    val v2 = o.where(pmod(col("o_orderkey"), lit(89)) =!= 0)
      .select(col("o_orderkey").as("k2"),
        when(pmod(col("o_orderkey"), lit(11)) === 1, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("p2"))
    v1.join(v2, col("k1") === col("k2"), "full_outer")
      .withColumn("class",
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          .when(col("p1") =!= col("p2"), "changed")
          .otherwise("unchanged"))
      .groupBy("class")
      .agg(count(lit(1)).as("n"))
      .orderBy("class")
  }

  private val q81Oracle: String =
    """WITH v1 AS (
      |  SELECT o_orderkey AS k, o_totalprice AS p FROM orders
      |  WHERE o_orderkey % 97 <> 0),
      |v2 AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 11 = 1 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS p
      |  FROM orders WHERE o_orderkey % 89 <> 0)
      |SELECT CASE
      |    WHEN v1.k IS NULL THEN 'added'
      |    WHEN v2.k IS NULL THEN 'removed'
      |    WHEN v1.p <> v2.p THEN 'changed'
      |    ELSE 'unchanged' END AS class,
      |  COUNT(*) AS n
      |FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
      |GROUP BY class ORDER BY class""".stripMargin

  /** q82 — GROUPING() / GROUPING_ID over grouping sets: the bitmask
    * that tells subtotal rows apart from data rows whose key happens
    * to be NULL — without it, q41-style outputs are ambiguous whenever
    * a grouping column is nullable. Same Expand + two-phase agg plan
    * as q41; the grouping_id is a constant per Expand branch, free at
    * any scale. The SQL surface (spark.sql) exercises the parser path
    * for GROUPING SETS + grouping_id() together. */
  private def q82(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)
  }

  private val q82Oracle: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  /** q83 — GROUPS window frame (sum over the previous/current/next
    * peer GROUP, not row): Spark has no GROUPS frame type, but the
    * semantics are exactly a RANGE frame over dense_rank() — tied rows
    * share a rank, so rank±1 spans one whole peer group on each side.
    * Ordering by order-month within customer makes ties (and therefore
    * the GROUPS≠ROWS distinction) common. Both windows share the
    * (custkey, month-order) sort, so Catalyst plans one Window over one
    * Exchange+Sort — no extra shuffle for the rank pre-pass. DECIMAL
    * sums keep the money math partition-order-independent. The DuckDB
    * oracle uses its native GROUPS frame. */
  private def q83(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val month = to_date(date_trunc("month", col("o_orderdate")))
    val wr = Window.partitionBy(col("o_custkey")).orderBy(col("month"))
    val wg = Window.partitionBy(col("o_custkey")).orderBy(col("dr"))
      .rangeBetween(-1, 1)
    o.withColumn("month", month)
      .withColumn("dr", dense_rank().over(wr))
      .withColumn("grp_sum_d",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(wg))
      .select(col("o_orderkey"), col("o_custkey"), col("month"),
        col("grp_sum_d").cast("double").as("grp_sum"))
      .orderBy(col("o_orderkey"))
  }

  // DuckDB 1.0 has no GROUPS frame; the oracle restates the semantics
  // independently: collapse to the per-group spine, take prev+cur+next
  // group sums by lag/lead, join back to rows.
  private val q83Oracle: String =
    """WITH spine AS (
      |  SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      |  FROM orders GROUP BY 1, 2
      |), nb AS (
      |  SELECT o_custkey, month,
      |    COALESCE(LAG(s) OVER w, 0) + s + COALESCE(LEAD(s) OVER w, 0) AS gs
      |  FROM spine WINDOW w AS (PARTITION BY o_custkey ORDER BY month)
      |)
      |SELECT o.o_orderkey, o.o_custkey, nb.month,
      |       CAST(nb.gs AS DOUBLE) AS grp_sum
      |FROM orders o JOIN nb ON o.o_custkey = nb.o_custkey
      |  AND date_trunc('month', o.o_orderdate) = nb.month
      |ORDER BY o.o_orderkey""".stripMargin

  /** q84 — window-frame EXCLUDE clause (SQL:2016 EXCLUDE CURRENT ROW /
    * EXCLUDE GROUP), which Spark's frames lack entirely:
    *   - EXCLUDE CURRENT ROW ≡ frame aggregate minus the current value;
    *   - EXCLUDE GROUP ≡ frame aggregate minus the peer-group
    *     aggregate (a second window partitioned by the order value).
    * An excluded-to-empty frame yields NULL in the standard; since
    * o_totalprice > 0, the emulated difference is 0 exactly iff the
    * frame emptied, so nullif(·, 0) reproduces the NULL contract
    * without a row count. Three windows, all on the same
    * (custkey-partition) shuffle — one Exchange. DuckDB oracle uses
    * native EXCLUDE. */
  private def q84(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val month = to_date(date_trunc("month", col("o_orderdate")))
    val p = col("o_totalprice").cast("decimal(18,2)")
    val wRows = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rowsBetween(-2, 2)
    val wGrp = Window.partitionBy(col("o_custkey")).orderBy(col("dr"))
      .rangeBetween(-1, 1)
    val wPeers = Window.partitionBy(col("o_custkey"), col("month"))
    val wr = Window.partitionBy(col("o_custkey")).orderBy(col("month"))
    o.withColumn("month", month)
      .withColumn("dr", dense_rank().over(wr))
      .withColumn("excl_row_d", sum(p).over(wRows) - p)
      .withColumn("excl_grp_d", sum(p).over(wGrp) - sum(p).over(wPeers))
      .select(col("o_orderkey"), col("o_custkey"),
        nullif(col("excl_row_d"), lit(0)).cast("double").as("excl_row"),
        nullif(col("excl_grp_d"), lit(0)).cast("double").as("excl_grp"))
      .orderBy(col("o_orderkey"))
  }

  // excl_row: DuckDB's native EXCLUDE CURRENT ROW (arms-length vs the
  // subtraction emulation). excl_grp: GROUPS±1 EXCLUDE GROUP ≡ the sum
  // of just the two neighboring peer groups — restated on the group
  // spine with lag/lead (NULL when both neighbors are absent, matching
  // the standard's empty-frame contract).
  private val q84Oracle: String =
    """WITH spine AS (
      |  SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      |  FROM orders GROUP BY 1, 2
      |), nb AS (
      |  SELECT o_custkey, month,
      |    CASE WHEN LAG(s) OVER w IS NULL AND LEAD(s) OVER w IS NULL
      |         THEN NULL
      |         ELSE COALESCE(LAG(s) OVER w, 0) + COALESCE(LEAD(s) OVER w, 0)
      |    END AS gs
      |  FROM spine WINDOW w AS (PARTITION BY o_custkey ORDER BY month)
      |)
      |SELECT o.o_orderkey, o.o_custkey,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o.o_custkey ORDER BY o.o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW)
      |    AS DOUBLE) AS excl_row,
      |  CAST(nb.gs AS DOUBLE) AS excl_grp
      |FROM orders o JOIN nb ON o.o_custkey = nb.o_custkey
      |  AND date_trunc('month', o.o_orderdate) = nb.month
      |ORDER BY o.o_orderkey""".stripMargin

  /** q85 — exponentially-weighted moving average over the last 5
    * orders per customer (finite-window EMA): weight a^j on the j-th
    * lag, normalized by the weights actually present so partition-head
    * rows average over what exists. A recursive (infinite-memory) EMA
    * is not a window aggregate in either engine; the 5-term lag form
    * writes the SAME arithmetic expression on both sides, making the
    * float path engine-identical (round(·,6) absorbs codegen
    * reassociation). One window spec → one shuffle; lag is an O(1)
    * frame, nothing buffers beyond 5 rows at any scale. */
  private def q85(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val x = col("o_totalprice").cast("double")
    // literal weights, not math.pow: the oracle spells the same decimal
    // literals, and pow(0.6, 2) ≠ 0.36 in the last ulp
    val wts = Seq(1.0, 0.6, 0.36, 0.216, 0.1296)
    val terms = wts.zipWithIndex.map { case (wt, j) =>
      val lj = if (j == 0) x else lag(x, j).over(w)
      (coalesce(lj, lit(0.0)) * lit(wt),
        when(lj.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    o.select(col("o_orderkey"), col("o_custkey"),
        round(num / den, 6).as("ema5"))
      .orderBy(col("o_orderkey"))
  }

  private val q85Oracle: String =
    """SELECT o_orderkey, o_custkey,
      |  ROUND((
      |     COALESCE(o_totalprice, 0) * 1.0
      |   + COALESCE(LAG(o_totalprice, 1) OVER w, 0) * 0.6
      |   + COALESCE(LAG(o_totalprice, 2) OVER w, 0) * 0.36
      |   + COALESCE(LAG(o_totalprice, 3) OVER w, 0) * 0.216
      |   + COALESCE(LAG(o_totalprice, 4) OVER w, 0) * 0.1296
      |  ) / (
      |     1.0
      |   + CASE WHEN LAG(o_totalprice, 1) OVER w IS NOT NULL THEN 0.6 ELSE 0 END
      |   + CASE WHEN LAG(o_totalprice, 2) OVER w IS NOT NULL THEN 0.36 ELSE 0 END
      |   + CASE WHEN LAG(o_totalprice, 3) OVER w IS NOT NULL THEN 0.216 ELSE 0 END
      |   + CASE WHEN LAG(o_totalprice, 4) OVER w IS NOT NULL THEN 0.1296 ELSE 0 END
      |  ), 6) AS ema5
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q70_skyline", Some(q70Oracle), q70),
    Q("q71_concurrency_sweep", Some(q71Oracle), q71),
    Q("q72_running_distinct", Some(q72Oracle), q72),
    Q("q73_funnel", Some(q73Oracle), q73),
    Q("q74_retention_cohorts", Some(q74Oracle), q74),
    Q("q75_transition_matrix", Some(q75Oracle), q75),
    Q("q76_mad", Some(q76Oracle), q76),
    Q("q77_relational_division", Some(q77Oracle), q77),
    Q("q78_mom_growth", Some(q78Oracle), q78),
    Q("q79_asof_forward", Some(q79Oracle), q79),
    Q("q80_weighted_median", Some(q80Oracle), q80),
    Q("q81_table_diff", Some(q81Oracle), q81),
    Q("q82_grouping_id", Some(q82Oracle), q82),
    Q("q83_groups_frame", Some(q83Oracle), q83),
    Q("q84_frame_exclude", Some(q84Oracle), q84),
    Q("q85_ema", Some(q85Oracle), q85))


}
