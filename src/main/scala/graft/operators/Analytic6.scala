package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 relational surface: hypothetical-set aggregates and
  * gaps-and-islands streak detection.
  */
object Analytic6 {

  /** q120 — hypothetical-set aggregates (SQL:2003
    * `RANK(v) WITHIN GROUP (ORDER BY x)` and friends), which Spark has
    * no native form for: "if a 250k order arrived in each priority
    * class, what rank / dense_rank / percent_rank / cume_dist would it
    * take?" Implemented the way the feature scales — ONE partial+final
    * conditional aggregation computing the count identities
    * (rank = |x < v| + 1, dense_rank = |distinct x < v| + 1,
    * percent_rank = |x < v| / n, cume_dist = (|x ≤ v| + 1)/(n + 1))
    * — never by materializing the hypothetical row. The DuckDB oracle
    * takes the DEFINITIONAL route instead: UNION the probe row into
    * each group, run real rank()/dense_rank() windows, read the probe
    * row's values — so a hash match proves the count identities against
    * the standard's "insert and evaluate" semantics arms-length, not
    * against a restatement of the same arithmetic. All ratios are
    * exact-integer divisions evaluated in DOUBLE identically by both
    * engines. */
  private def q120(s: SparkSession, d: String): DataFrame = {
    val v = 250000.0
    Tables.df(s, d, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("o_totalprice") < v, 1)).as("below"),
        count(when(col("o_totalprice") <= v, 1)).as("at_below"),
        countDistinct(when(col("o_totalprice") < v, col("o_totalprice")))
          .as("dbelow"))
      .select(
        col("o_orderpriority"),
        (col("below") + 1L).as("hrank"),
        (col("dbelow") + 1L).as("hdense_rank"),
        (col("below").cast("double") / col("n")).as("hpct_rank"),
        ((col("at_below") + 1L).cast("double") / (col("n") + 1L))
          .as("hcume_dist"))
      .orderBy("o_orderpriority")
  }

  private val q120Oracle: String =
    """WITH probe AS (
      |  SELECT DISTINCT o_orderpriority, CAST(250000.0 AS DOUBLE) AS tp,
      |    1 AS is_probe
      |  FROM orders),
      |uni AS (
      |  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS tp, 0 AS is_probe
      |  FROM orders
      |  UNION ALL SELECT o_orderpriority, tp, is_probe FROM probe),
      |rk AS (
      |  SELECT o_orderpriority, is_probe,
      |    rank() OVER (PARTITION BY o_orderpriority ORDER BY tp) AS r,
      |    dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY tp) AS dr,
      |    count(*) OVER (PARTITION BY o_orderpriority
      |      ORDER BY tp RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS n_at_below,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS ntot
      |  FROM uni)
      |SELECT o_orderpriority,
      |  CAST(r AS BIGINT) AS hrank,
      |  CAST(dr AS BIGINT) AS hdense_rank,
      |  CAST(r - 1 AS DOUBLE) / (ntot - 1) AS hpct_rank,
      |  CAST(n_at_below AS DOUBLE) / ntot AS hcume_dist
      |FROM rk WHERE is_probe = 1
      |ORDER BY o_orderpriority""".stripMargin

  /** q121 — longest consecutive-day activity streak per user (the
    * engagement metric every product-analytics stack ships): distinct
    * purchase days per user, the gaps-and-islands `day_index −
    * row_number` key (consecutive days share it), island lengths, then
    * per-user longest/active-day rollup, top-20. All arithmetic stays
    * in the integer DATE domain (datediff from a fixed epoch) so both
    * engines agree bit-for-bit. Plan: one per-user shuffle carries the
    * distinct-day frame through the row_number window AND both
    * aggregations — no global sort until the final top-20
    * (TakeOrdered). At 100 TB the distinct-day collapse happens
    * map-side before the shuffle: the window sees |users|×|days| rows,
    * never |events|. */
  private def q121(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.df(s, d, "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("dy"))
      .distinct()
      .withColumn("di", datediff(col("dy"), lit("2024-01-01")))
    val w = Window.partitionBy("user_id").orderBy("dy")
    days
      .withColumn("isl", col("di") - row_number().over(w))
      .groupBy("user_id", "isl")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy(col("longest_streak").desc, col("user_id"))
      .limit(20)
  }

  private val q121Oracle: String =
    """WITH pd AS (
      |  SELECT user_id, CAST(ts AS DATE) AS dy
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |rn AS (
      |  SELECT user_id,
      |    datediff('day', DATE '2024-01-01', dy)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY dy) AS isl
      |  FROM pd),
      |st AS (
      |  SELECT user_id, isl, COUNT(*) AS len FROM rn GROUP BY 1, 2)
      |SELECT user_id, MAX(len) AS longest_streak, COUNT(*) AS n_streaks,
      |  CAST(SUM(len) AS BIGINT) AS active_days
      |FROM st GROUP BY user_id
      |ORDER BY longest_streak DESC, user_id
      |LIMIT 20""".stripMargin

  /** q125 — cohort retention matrix (the other product-analytics
    * staple beside q121's streaks): users cohorted by FIRST-activity
    * day, then for each cohort × week-offset cell, the fraction of the
    * cohort active that week. No per-user window and no self-join of
    * the raw fact: one per-user min-date aggregate (map-side partial),
    * one distinct on (user, day) that also collapses map-side, a
    * user-keyed join, and the matrix itself is |days × weeks| — tiny at
    * any corpus scale, so the 100 TB cost is two shuffles of per-user
    * collapsed rows. Week offsets stay in integer arithmetic
    * (`datediff div 7`); retention is one exact-integer division
    * rounded at 6 dp. */
  private def q125(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.df(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("dy")).distinct()
    val firsts = ev.groupBy("user_id").agg(min("dy").as("d0"))
    val cells = ev.join(firsts, "user_id")
      .select(col("user_id"), col("d0"),
        expr("CAST(datediff(dy, d0) div 7 AS BIGINT)").as("week_offset"))
      .distinct()
      .groupBy(col("d0").as("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val coh = firsts.groupBy(col("d0").as("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    cells.join(coh, "cohort_day")
      .select(col("cohort_day"), col("week_offset"),
        col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
      .orderBy("cohort_day", "week_offset")
  }

  private val q125Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS dy FROM events GROUP BY 1, 2),
      |f AS (SELECT user_id, MIN(dy) AS d0 FROM ev GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT ev.user_id, f.d0,
      |    CAST(datediff('day', f.d0, ev.dy) // 7 AS BIGINT) AS week_offset
      |  FROM ev JOIN f USING (user_id)),
      |coh AS (SELECT d0, COUNT(*) AS n_cohort FROM f GROUP BY 1),
      |m AS (SELECT d0, week_offset, COUNT(*) AS n_active FROM a GROUP BY 1, 2)
      |SELECT m.d0 AS cohort_day, m.week_offset, m.n_active, coh.n_cohort,
      |  round(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
      |FROM m JOIN coh USING (d0)
      |ORDER BY cohort_day, week_offset""".stripMargin

  /** q127 — aggregate FILTER clause (SQL:2003, supported natively by
    * both engines since Spark 3.0 / always in DuckDB): conditional
    * aggregation as first-class syntax instead of the
    * SUM(CASE WHEN …) idiom q56 exercises. One ANSI text run verbatim
    * by both engines — parser/analyzer surface like q91's GROUP BY
    * ALL; decimal money sums per the §5 discipline; the
    * no-matching-row groups yield NULL in both engines. */
  private def q127(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(q127Sql)
  }

  private val q127Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_price,
      |  COUNT(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q128 — tolerance-bounded as-of join (the feature-store staleness
    * contract: "the latest prior value, but only if it is FRESH
    * enough"): for each order, the same customer's most recent prior
    * order within 90 days — beyond the window the match is NULL, not
    * silently stale. q35's expand-and-argmax composition with BOTH
    * range bounds in the join condition, so the candidate fan-out is
    * bounded by orders-per-customer-per-90-days (not per-customer
    * history) — the bound is what keeps the expansion affordable at
    * 100 TB; unmatched orders re-enter via a left join on the
    * collapsed key. Per-(custkey, day) collapse first so the as-of
    * pick is deterministic; DuckDB LEFT JOIN LATERAL is the oracle. */
  private def q128(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.df(s, d, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val cand = ord.as("a")
      .join(ord.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("b.o_orderdate") < col("a.o_orderdate") &&
          col("b.o_orderdate") >= col("a.o_orderdate") - expr("INTERVAL 90 DAYS"))
      .groupBy(col("a.o_custkey").as("o_custkey"),
        col("a.o_orderdate").as("o_orderdate"))
      .agg(max(struct(col("b.o_orderdate"), col("b.o_orderkey"))).as("m"))
      .select(col("o_custkey"), col("o_orderdate"),
        col("m.o_orderkey").as("prev_orderkey"),
        col("m.o_orderdate").as("prev_date"))
    ord.join(cand, Seq("o_custkey", "o_orderdate"), "left_outer")
      .select(col("o_custkey"),
        to_date(col("o_orderdate")).as("od"),
        col("o_orderkey"), col("prev_orderkey"),
        datediff(to_date(col("o_orderdate")), to_date(col("prev_date")))
          .cast("long").as("gap_days"))
      .orderBy("o_custkey", "od", "o_orderkey")
  }

  private val q128Oracle: String =
    """WITH ord AS (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT a.o_custkey, CAST(a.o_orderdate AS DATE) AS od, a.o_orderkey,
      |  p.o_orderkey AS prev_orderkey,
      |  CAST(datediff('day', CAST(p.o_orderdate AS DATE),
      |    CAST(a.o_orderdate AS DATE)) AS BIGINT) AS gap_days
      |FROM ord a LEFT JOIN LATERAL (
      |  SELECT b.o_orderkey, b.o_orderdate
      |  FROM ord b
      |  WHERE b.o_custkey = a.o_custkey
      |    AND b.o_orderdate < a.o_orderdate
      |    AND b.o_orderdate >= a.o_orderdate - INTERVAL 90 DAY
      |  ORDER BY b.o_orderdate DESC, b.o_orderkey DESC LIMIT 1) p ON TRUE
      |ORDER BY a.o_custkey, od, a.o_orderkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q120_hypothetical_rank", Some(q120Oracle), q120),
    Q("q121_streaks", Some(q121Oracle), q121),
    Q("q125_cohort_retention", Some(q125Oracle), q125),
    Q("q127_filter_clause", Some(q127Sql), q127),
    Q("q128_asof_tolerance", Some(q128Oracle), q128))
}
