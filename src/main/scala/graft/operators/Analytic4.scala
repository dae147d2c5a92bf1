package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Fifth analytic wave: SQL surfaces Spark lacks re-expressed exactly
  * (window FILTER), distribution-aware binning, and warehouse
  * dimension maintenance (SCD-2) as a single-pass plan.
  */
object Analytic4 {

  /** q86 — aggregate FILTER clause inside a window (SQL:2003), which
    * Spark's window aggregates lack: running sum/count of only the
    * URGENT orders alongside the unconditional running sum, per
    * customer. The exact emulation is the conditional projection
    * sum(CASE WHEN …) — same NULL contract as FILTER (an empty
    * filtered frame yields NULL, since sum ignores the NULLs the CASE
    * emits). All three aggregates share one window spec → one shuffle
    * + sort; DECIMAL keeps the running money sums order-independent.
    * The DuckDB oracle uses its native FILTER clause. */
  private def q86(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = col("o_totalprice").cast("decimal(18,2)")
    val urgent = col("o_orderpriority") === "1-URGENT"
    o.select(col("o_orderkey"), col("o_custkey"),
        sum(p).over(w).cast("double").as("run_all"),
        sum(when(urgent, p)).over(w).cast("double").as("run_urgent"),
        count(when(urgent, lit(1))).over(w).as("n_urgent"))
      .orderBy(col("o_orderkey"))
  }

  private val q86Oracle: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_all,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderpriority = '1-URGENT') OVER w AS DOUBLE) AS run_urgent,
      |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') OVER w AS n_urgent
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  /** q87 — equi-depth (quantile) binning: 10 bins with equal row
    * counts over l_extendedprice, each reporting its [lo, hi] range —
    * the histogram that adapts to skew where q61's equi-width bins
    * starve. Ties on price are broken by the (orderkey, linenumber)
    * pk so the total order — and therefore every bin boundary — is
    * engine-independent. Plan: a RANGE-PARTITIONED sort (parallel)
    * + zipWithIndex (one extra job to collect per-partition counts;
    * indices assigned partition-locally) + arithmetic NTILE bucketing
    * + partial+final agg. A global ntile() WINDOW would compute the
    * same thing through a SINGLE task — the one plan shape that
    * cannot survive 100 TB — which is exactly why this is the one
    * place the implementation drops to the RDD zip; the DuckDB oracle
    * keeps the declarative NTILE form. */
  private def q87(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val l = Tables.df(s, d, "lineitem")
    val sorted = l
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .select(col("l_extendedprice")).as[Double]
    val n = l.count() // parquet metadata count — no sort execution
    // SQL NTILE(k): first (n mod k) buckets take ceil(n/k) rows
    val q = n / 10
    val r = n % 10
    sorted.rdd.zipWithIndex()
      .map { case (price, idx) =>
        val bin = if (idx < r * (q + 1)) idx / (q + 1) + 1
          else r + (idx - r * (q + 1)) / q + 1
        (bin.toInt, price)
      }
      .toDF("bin", "price")
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min(col("price")).as("lo"),
        max(col("price")).as("hi"))
      .orderBy("bin")
  }

  private val q87Oracle: String =
    """SELECT bin, COUNT(*) AS n, MIN(l_extendedprice) AS lo,
      |  MAX(l_extendedprice) AS hi
      |FROM (
      |  SELECT l_extendedprice,
      |    NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bin
      |  FROM lineitem)
      |GROUP BY bin ORDER BY bin""".stripMargin

  /** q88 — SCD type-2 dimension maintenance: apply a staged segment
    * change (premium upgrade for high-balance customers, effective
    * 1998-01-01) to the customer dimension, producing the versioned
    * history — changed keys close their old row (valid_to set,
    * is_current false) and open a new one; unchanged keys pass
    * through. The MERGE-less plan is a single pass: one key join,
    * then each row EXPLODES into its 1-or-2 output versions — no
    * union of three branches re-reading the join (the UNION ALL
    * formulation is left to the oracle, arms-length). At 100 TB the
    * staged side is usually small → broadcast; here it is derived
    * from the dim itself, so the join is key-colocated either way. */
  private def q88(s: SparkSession, d: String): DataFrame = {
    val c = Tables.df(s, d, "customer")
    val cur = c.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val staged = cur.where(col("c_acctbal") > 9000)
      .select(col("c_custkey"), lit("PREMIUM").as("new_seg"))
    val opened = to_date(lit("1992-01-01"))
    val eff = to_date(lit("1998-01-01"))
    val changed = col("new_seg").isNotNull && col("new_seg") =!= col("c_mktsegment")
    val ver = struct(
      col("c_mktsegment").as("segment"), opened.as("valid_from"),
      lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    val closedOld = struct(
      col("c_mktsegment").as("segment"), opened.as("valid_from"),
      eff.as("valid_to"), lit(false).as("is_current"))
    val openedNew = struct(
      col("new_seg").as("segment"), eff.as("valid_from"),
      lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    cur.join(staged, Seq("c_custkey"), "left")
      .select(col("c_custkey"),
        explode(when(changed, array(closedOld, openedNew))
          .otherwise(array(ver))).as("r"))
      .select(col("c_custkey"), col("r.segment").as("segment"),
        col("r.valid_from").as("valid_from"), col("r.valid_to").as("valid_to"),
        col("r.is_current").as("is_current"))
      .orderBy("c_custkey", "valid_from")
  }

  private val q88Oracle: String =
    """WITH staged AS (
      |  SELECT c_custkey, 'PREMIUM' AS new_seg FROM customer WHERE c_acctbal > 9000)
      |SELECT c.c_custkey, c.c_mktsegment AS segment,
      |  DATE '1992-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |  TRUE AS is_current
      |FROM customer c LEFT JOIN staged s ON c.c_custkey = s.c_custkey
      |WHERE s.new_seg IS NULL OR s.new_seg = c.c_mktsegment
      |UNION ALL
      |SELECT c.c_custkey, c.c_mktsegment, DATE '1992-01-01',
      |  DATE '1998-01-01', FALSE
      |FROM customer c JOIN staged s ON c.c_custkey = s.c_custkey
      |WHERE s.new_seg <> c.c_mktsegment
      |UNION ALL
      |SELECT c.c_custkey, s.new_seg, DATE '1998-01-01', NULL, TRUE
      |FROM customer c JOIN staged s ON c.c_custkey = s.c_custkey
      |WHERE s.new_seg <> c.c_mktsegment
      |ORDER BY c_custkey, valid_from""".stripMargin

  /** q89 — schema-evolving union (UNION BY NAME): two feed generations
    * of the same stream — v1 lacks the priority column — unioned by
    * column NAME with NULL backfill (`unionByName(allowMissingColumns
    * = true)`), the batch twin of the mergeSchema read in §2.A.
    * Position-based UNION would silently mis-align or reject; BY NAME
    * is the contract a long-lived pipeline needs as producers add
    * fields. Pure narrow union — no shuffle before the final sort. */
  private def q89(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val v1 = o.where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val v2 = o.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("o_orderkey")
  }

  private val q89Oracle: String =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_orderpriority, o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |ORDER BY o_orderkey""".stripMargin

  /** q90 — incremental aggregate maintenance (materialized-view delta
    * merge): a pre-aggregated base (orders before the cutoff) merged
    * with a delta batch's aggregate via full-outer join + coalesced
    * partial-state addition — sum and count are self-maintainable;
    * avg is re-DERIVED from the merged sums, never averaged across
    * batches (the classic MV-maintenance trap). The oracle is the
    * arms-length proof: a direct aggregate over the whole table must
    * equal the merge. At 100 TB the base agg is a stored MV and only
    * the delta partition is scanned — the merge cost is |groups|, not
    * |base|. */
  private def q90(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val p = col("o_totalprice").cast("decimal(18,2)")
    def aggOf(df: DataFrame): DataFrame = df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(p).as("s"))
    val base = aggOf(o.where(col("o_orderdate") < "1997-01-01"))
      .withColumnsRenamed(Map("n" -> "n0", "s" -> "s0"))
    val delta = aggOf(o.where(col("o_orderdate") >= "1997-01-01"))
      .withColumnsRenamed(Map("n" -> "n1", "s" -> "s1"))
    base.join(delta, Seq("o_orderstatus"), "full_outer")
      .select(col("o_orderstatus"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L))).as("n_orders"),
        (coalesce(col("s0"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("s1"), lit(0).cast("decimal(18,2)"))).cast("double").as("sum_price"))
      .withColumn("avg_price", round(col("sum_price") / col("n_orders"), 4))
      .orderBy("o_orderstatus")
  }

  private val q90Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |        / COUNT(*), 4) AS avg_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q91 — GROUP BY ALL / ORDER BY ALL (the modern SQL shorthand both
    * engines support natively — every non-aggregate select item
    * becomes a grouping key): exercises the parser/analyzer path, not
    * new plan machinery (the plan is q05's partial+final agg). */
  private def q91(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  private val q91Oracle: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin

  /** q92 — nested-array construction + indexed fold: collapse each
    * order's lineitems into a SORTED quantity array, then fold it with
    * position weights (Σ qty[i]·i) via the higher-order
    * transform(sequence)+aggregate pipeline — the array-of-structs
    * manipulation surface (build → order → index → reduce) that ELT
    * pipelines use for per-entity event lists. All arithmetic is
    * integer (qty is integer-valued, positions are ints), so the fold
    * is exact in any engine; the per-order array is bounded by
    * lineitems-per-order (≤ 7 in TPC-H), never a memory risk. One
    * shuffle: the groupBy building the arrays. */
  private def q92(s: SparkSession, d: String): DataFrame = {
    val l = Tables.df(s, d, "lineitem")
    l.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qs"))
      .select(col("l_orderkey"), size(col("qs")).as("n_items"),
        expr("aggregate(transform(sequence(1, size(qs)), i -> qs[i - 1] * CAST(i AS BIGINT)), 0L, (a, x) -> a + x)")
          .as("pos_weighted"))
      .orderBy("l_orderkey")
  }

  private val q92Oracle: String =
    """SELECT l_orderkey, len(qs) AS n_items,
      |  CAST(list_reduce(
      |    list_transform(range(1, len(qs) + 1), i -> qs[i] * i),
      |    (a, x) -> a + x) AS BIGINT) AS pos_weighted
      |FROM (
      |  SELECT l_orderkey,
      |    list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
      |  FROM lineitem GROUP BY l_orderkey)
      |ORDER BY l_orderkey""".stripMargin

  /** q93 — safe-cast / safe-arithmetic surface (try_cast, try_divide,
    * try_add): the data-quality contract under ANSI mode — this
    * session runs ANSI-strict, where a bad cast or division by zero
    * THROWS mid-job (correct for pipelines: fail loudly), and the
    * try_* family is the per-expression opt-out that yields NULL
    * instead, so one malformed row quarantines itself rather than
    * killing a 100 TB job. Derived malformed inputs: every third
    * order's "numeric" string is corrupted, every fifth divisor is
    * zero, one row in 997 overflows the add. The overflow rate is
    * deliberately RARE: try_add/try_cast null-out via a caught
    * exception (~30 µs per FAILING row, measured — negligible at
    * quarantine rates, pathological if half the corpus fails; a
    * mostly-failing column wants a CASE guard, not try_*). The oracle
    * spells the identical semantics with DuckDB's TRY_CAST and CASE
    * guards. */
  private def q93(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(
      """SELECT o_orderkey,
        |  try_cast(CASE WHEN o_orderkey % 3 = 0 THEN 'oops'
        |                ELSE CAST(o_orderkey AS STRING) END AS BIGINT) AS safe_cast,
        |  try_divide(o_totalprice, CAST(o_orderkey % 5 AS DOUBLE)) AS safe_div,
        |  try_add(9223372036854775807, CASE WHEN o_orderkey % 997 = 0 THEN 1 ELSE 0 END) AS safe_add
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val q93Oracle: String =
    """SELECT o_orderkey,
      |  TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'oops'
      |                ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS safe_cast,
      |  o_totalprice / NULLIF(CAST(o_orderkey % 5 AS DOUBLE), 0.0) AS safe_div,
      |  CASE WHEN o_orderkey % 997 <> 0 THEN 9223372036854775807 END AS safe_add
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** q94 — hierarchical share-of-parent: each nation's revenue as a
    * share of its region AND of the world, from ONE rollup pass —
    * grouping_id() tells the three levels apart, and the parent totals
    * come from windows PARTITIONED by the ancestor keys over the
    * rollup output (a |regions|+|nations|+1-row spine), so the fact
    * table is aggregated exactly once. The q66 ratio-to-report is the
    * flat special case; this is the drill-down report shape (share of
    * parent at every level) BI tools emit. Decimal sums; shares are
    * single divisions of identical decimals-cast-double. */
  private def q94(s: SparkSession, d: String): DataFrame = {
    val c = Tables.df(s, d, "customer")
    val o = Tables.df(s, d, "orders")
    val n = Tables.df(s, d, "nation")
    val r = Tables.df(s, d, "region")
    val p = col("o_totalprice").cast("decimal(18,2)")
    val joined = o
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val rolled = joined
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(p).as("rev_d"), grouping_id().cast("int").as("gid"))
    val wRegion = Window.partitionBy(col("r_name"))
    val wAll = Window.partitionBy()
    rolled
      .withColumn("region_total",
        max(when(col("gid") === 1, col("rev_d"))).over(wRegion))
      .withColumn("world_total",
        max(when(col("gid") === 3, col("rev_d"))).over(wAll))
      .select(col("r_name"), col("n_name"), col("gid"),
        col("rev_d").cast("double").as("revenue"),
        round(col("rev_d").cast("double") /
          col("region_total").cast("double"), 6).as("share_of_region"),
        round(col("rev_d").cast("double") /
          col("world_total").cast("double"), 6).as("share_of_world"))
      .orderBy(col("gid"), col("r_name"), col("n_name"))
  }

  private val q94Oracle: String =
    """WITH rolled AS (
      |  SELECT r_name, n_name,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d,
      |    CAST(grouping_id(r_name, n_name) AS INT) AS gid
      |  FROM orders, customer, nation, region
      |  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
      |    AND n_regionkey = r_regionkey
      |  GROUP BY ROLLUP (r_name, n_name))
      |SELECT r_name, n_name, gid,
      |  CAST(rev_d AS DOUBLE) AS revenue,
      |  round(CAST(rev_d AS DOUBLE) / CAST(
      |    MAX(CASE WHEN gid = 1 THEN rev_d END)
      |      OVER (PARTITION BY r_name) AS DOUBLE), 6) AS share_of_region,
      |  round(CAST(rev_d AS DOUBLE) / CAST(
      |    MAX(CASE WHEN gid = 3 THEN rev_d END) OVER () AS DOUBLE), 6)
      |    AS share_of_world
      |FROM rolled
      |ORDER BY gid, r_name, n_name""".stripMargin

  /** q95 — declarative constraint checking (the dbt-test / data-
    * contract surface): evaluate referential integrity, uniqueness,
    * NOT-NULL and range constraints as ONE union of count queries,
    * emitting (check_name, n_violations, status). Each check is the
    * cheapest plan for its class — FK checks are broadcast anti joins
    * against the dim's key set (never a shuffle of the fact), the
    * uniqueness check is a partial+final agg, range/null checks are
    * pushed-down filter counts. A failing production run gates the
    * pipeline on status; here the corpus is clean by construction and
    * the oracle pins every count at zero-or-not identically. */
  private def q95(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
    val c = Tables.df(s, d, "customer")
    val l = Tables.df(s, d, "lineitem")
    def check(name: String, viol: => DataFrame): DataFrame =
      viol.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"),
          when(col("n_violations") === 0, lit("pass")).otherwise(lit("fail")).as("status"))
    check("orders_custkey_fk",
        o.join(broadcast(c.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti"))
      .unionByName(check("lineitem_orderkey_fk",
        l.select(col("l_orderkey")).distinct()
          .join(o.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")))
      .unionByName(check("orders_pk_unique",
        o.groupBy("o_orderkey").agg(count(lit(1)).as("n")).where(col("n") > 1)))
      .unionByName(check("orders_price_positive",
        o.where(col("o_totalprice") <= 0 || col("o_totalprice").isNull)))
      .unionByName(check("lineitem_discount_range",
        l.where(col("l_discount") < 0 || col("l_discount") > 1)))
      .orderBy("check_name")
  }

  private val q95Oracle: String =
    """SELECT * FROM (
      |  SELECT 'orders_custkey_fk' AS check_name, COUNT(*) AS n_violations,
      |    CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'fail' END AS status
      |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_fk', COUNT(*),
      |    CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'fail' END
      |  FROM (SELECT DISTINCT l_orderkey FROM lineitem)
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |  UNION ALL
      |  SELECT 'orders_pk_unique', COUNT(*),
      |    CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'fail' END
      |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
      |  UNION ALL
      |  SELECT 'orders_price_positive', COUNT(*),
      |    CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'fail' END
      |  FROM orders WHERE o_totalprice <= 0 OR o_totalprice IS NULL
      |  UNION ALL
      |  SELECT 'lineitem_discount_range', COUNT(*),
      |    CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'fail' END
      |  FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
      |ORDER BY check_name""".stripMargin

  /** q97 — NEAREST as-of join: each event matched to the order (same
    * user) minimizing |order time − event time|, ties to the earlier
    * (backward) side, then smallest key. Completes the as-of family —
    * q35 backward, q79 forward, this bidirectional — which is the
    * sensor/label-alignment join time-series stores ship natively.
    * Planned as ONE union-interleave timeline with TWO running
    * `last(ignoreNulls)` passes (ascending for prev, descending for
    * next) over the same per-user shuffle: one exchange, two in-
    * partition sorts, zero candidate fan-out. Tie placement is encoded
    * in the sort keys (orders ahead of equal-time events in both
    * directions; among tied orders the smallest key ends nearest the
    * event). All comparisons and deltas run on second-truncated
    * timestamps (SURVEY §5: the ns/µs parquet mismatch must not decide
    * nearest-ness — a half-second midpoint is representable exactly in
    * neither engine's favor). */
  private def q97(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.df(s, d, "orders").select(
      col("o_custkey").as("uid"),
      col("o_orderdate").cast("timestamp").as("t"),
      col("o_orderkey").as("okey"),
      lit(null).cast("long").as("event_id"))
    val ev = Tables.df(s, d, "events").select(
      col("user_id").as("uid"),
      date_trunc("second", col("ts")).as("t"),
      lit(null).cast("long").as("okey"),
      col("event_id"))
    val cand = when(col("okey").isNotNull, struct(col("t").as("ots"), col("okey")))
    val wNext = Window.partitionBy("uid")
      .orderBy(col("t").desc, coalesce(col("okey"), lit(-1L)).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy("uid")
      .orderBy(col("t").asc, coalesce(col("okey"), lit(Long.MinValue)).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("nxt", last(cand, ignoreNulls = true).over(wNext))
      .withColumn("prv", last(cand, ignoreNulls = true).over(wPrev))
      .where(col("event_id").isNotNull)
      .withColumn("dp", unix_micros(col("t")) - unix_micros(col("prv.ots")))
      .withColumn("dn", unix_micros(col("nxt.ots")) - unix_micros(col("t")))
      .withColumn("pick_prev",
        col("prv").isNotNull && (col("nxt").isNull || col("dp") <= col("dn")))
      .select(
        col("event_id"), col("uid").as("user_id"), col("t").as("ets"),
        when(col("pick_prev"), col("prv.okey")).otherwise(col("nxt.okey")).as("near_key"),
        when(col("pick_prev"), col("prv.ots")).otherwise(col("nxt.ots")).as("near_ts"),
        when(col("pick_prev"), lit("prev"))
          .otherwise(when(col("nxt").isNotNull, lit("next"))).as("side"))
      .orderBy("event_id")
  }

  private val q97Oracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ets
      |  FROM events)
      |SELECT e.event_id, e.user_id, e.ets,
      |  CASE WHEN p.okey IS NOT NULL AND (n.okey IS NULL OR
      |         epoch_us(e.ets) - epoch_us(p.ots) <= epoch_us(n.ots) - epoch_us(e.ets))
      |       THEN p.okey ELSE n.okey END AS near_key,
      |  CASE WHEN p.okey IS NOT NULL AND (n.okey IS NULL OR
      |         epoch_us(e.ets) - epoch_us(p.ots) <= epoch_us(n.ots) - epoch_us(e.ets))
      |       THEN p.ots ELSE n.ots END AS near_ts,
      |  CASE WHEN p.okey IS NOT NULL AND (n.okey IS NULL OR
      |         epoch_us(e.ets) - epoch_us(p.ots) <= epoch_us(n.ots) - epoch_us(e.ets))
      |       THEN 'prev'
      |       WHEN n.okey IS NOT NULL THEN 'next' END AS side
      |FROM e
      |LEFT JOIN LATERAL (
      |  SELECT CAST(o_orderdate AS TIMESTAMP) AS ots, o_orderkey AS okey
      |  FROM orders o
      |  WHERE o.o_custkey = e.user_id AND CAST(o_orderdate AS TIMESTAMP) <= e.ets
      |  ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 1) p ON true
      |LEFT JOIN LATERAL (
      |  SELECT CAST(o_orderdate AS TIMESTAMP) AS ots, o_orderkey AS okey
      |  FROM orders o
      |  WHERE o.o_custkey = e.user_id AND CAST(o_orderdate AS TIMESTAMP) >= e.ets
      |  ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1) n ON true
      |ORDER BY event_id""".stripMargin

  /** q98 — rolling z-score anomaly detection: each (priority, day)'s
    * revenue scored against its own trailing 7-observation window
    * (current day excluded, ≥5 days of history required — the
    * cold-start rows are not scorable). Scale shape: the fact table is
    * reduced FIRST by a partial+final groupBy to one row per
    * (priority, day); the ordered window then runs over a
    * calendar-bounded spine — per-key state is days, never raw orders,
    * so the plan survives any fact-table scale-up. Variance comes from
    * decimal-exact power sums over the frame (q50's discipline), so
    * both engines agree bit-for-bit; the only floats are the final
    * correctly-rounded div/sqrt chain. Zero-variance windows yield a
    * NULL score (guarded both sides — ANSI mode would otherwise raise
    * DIVIDE_BY_ZERO on a flat week). */
  private def q98(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.df(s, d, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        col("o_orderdate").cast("date").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window.partitionBy("prio").orderBy("day").rowsBetween(-7, -1)
    val win = daily
      .withColumn("n_hist", count(lit(1)).over(w))
      .withColumn("sx", sum(col("rev")).over(w))
      .withColumn("sxx",
        sum((col("rev") * col("rev")).cast("decimal(38,4)")).over(w))
      .where(col("n_hist") >= 5)
    val n = col("n_hist").cast("double")
    val x = col("rev").cast("double")
    val sx = col("sx").cast("double")
    val sxx = col("sxx").cast("double")
    val num = n * sxx - sx * sx
    val z = when(num > 0, round((x - sx / n) / sqrt(num / (n * (n - 1))), 6))
    win.select(col("prio"), col("day"), x.as("rev"), col("n_hist"),
        z.as("z"), (z.isNotNull && abs(z) > 2.0).as("is_anomaly"))
      .orderBy("prio", "day")
  }

  private val q98Oracle: String =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1, 2),
      |win AS (
      |  SELECT prio, day, rev,
      |    COUNT(*) OVER w AS n_hist,
      |    SUM(rev) OVER w AS sx,
      |    SUM(CAST(rev * rev AS DECIMAL(38,4))) OVER w AS sxx
      |  FROM daily
      |  WINDOW w AS (PARTITION BY prio ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |sc AS (
      |  SELECT prio, day, CAST(rev AS DOUBLE) AS rev, n_hist,
      |    CASE WHEN CAST(n_hist AS DOUBLE) * CAST(sxx AS DOUBLE)
      |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |      THEN round(
      |        (CAST(rev AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n_hist AS DOUBLE))
      |        / sqrt((CAST(n_hist AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |               / (CAST(n_hist AS DOUBLE) * CAST(n_hist - 1 AS DOUBLE))), 6)
      |    END AS z
      |  FROM win WHERE n_hist >= 5)
      |SELECT prio, day, rev, n_hist, z,
      |  (z IS NOT NULL AND abs(z) > 2.0) AS is_anomaly
      |FROM sc ORDER BY prio, day""".stripMargin

  /** q99 — last-touch attribution: each purchase credited to the SAME
    * user's most recent preceding non-purchase event within a 7-day
    * lookback, else "direct" — the marketing/conversion accounting
    * every events store answers, distinct from q73's ordered funnel
    * (stage minima) and the as-of family (cross-table alignment).
    * One per-user window pass: running last(ignoreNulls) over the
    * strictly-preceding frame carries the latest touch; the lookback
    * is a microsecond comparison on second-truncated timestamps
    * (q97's ns/µs discipline). Rollup is a partial+final aggregate on
    * the |event_types|-bounded channel. */
  private def q99(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.df(s, d, "events").select(
      col("user_id"), col("event_id"), col("event_type"),
      date_trunc("second", col("ts")).as("t"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("t").as("tt"), col("event_type").as("ch")))
    ev.withColumn("prev", last(touch, ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("prev").isNotNull &&
          unix_micros(col("t")) - unix_micros(col("prev.tt")) <= 604800000000L,
          col("prev.ch")).otherwise(lit("direct")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("channel")
  }

  private val q99Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS t
      |  FROM events),
      |p AS (
      |  SELECT user_id, event_type, t,
      |    last_value(CASE WHEN event_type <> 'purchase'
      |                    THEN struct_pack(tt := t, ch := event_type) END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
      |  FROM e),
      |a AS (
      |  SELECT CASE WHEN prev IS NOT NULL
      |              AND epoch_us(t) - epoch_us(prev.tt) <= 604800000000
      |         THEN prev.ch ELSE 'direct' END AS channel,
      |    user_id
      |  FROM p WHERE event_type = 'purchase')
      |SELECT channel, COUNT(*) AS n_purchases,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM a GROUP BY channel ORDER BY channel""".stripMargin

  /** q101 — path analysis: the 10 most common consecutive 3-event
    * sequences across all user streams — "what do users actually do",
    * the product-analytics staple next to q73's fixed funnel (which
    * asks about ONE prescribed path) and q75's 1-step transition
    * matrix (this is the 2-step generalization). Two lead() taps over
    * one per-user window (a single shuffle + sort), then a partial+
    * final count on the |types|³-bounded path key; top-10 cut is
    * deterministic (count desc, path asc). Sequences deliberately span
    * the whole per-user stream — session-bounding is q23/q69's
    * composition point. */
  private def q101(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.df(s, d, "events").select(
      col("user_id"), col("event_id"), col("event_type"),
      date_trunc("second", col("ts")).as("t"))
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    ev.withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(10)
  }

  private val q101Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS t
      |  FROM events),
      |p AS (
      |  SELECT event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
      |SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
      |FROM p WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** q102 — conversion-latency percentiles: exact p50/p90 of
    * signup→first-purchase time across converting users — q73 counts
    * WHO converts, this measures HOW LONG conversion takes, the
    * product-health number next to the funnel. Latencies are exact
    * integer seconds (floor-divided microsecond deltas — `div`/`//`
    * so neither engine floats the division), and the percentiles run
    * on `ExactPercentile.continuous` — per-user latency is
    * |users|-sized at 100 TB, exactly the population the buffering
    * percentile aggregate must not hold per group. */
  private def q102(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val e = Tables.df(s, d, "events").select(col("user_id"),
      col("event_type"), date_trunc("second", col("ts")).as("t"))
    val su = e.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("t")).as("st"))
    val lat = e.join(su, "user_id")
      .where(col("event_type") === "purchase" && col("t") >= col("st"))
      .groupBy("user_id", "st").agg(min(col("t")).as("pt"))
      .select(expr("(unix_micros(pt) - unix_micros(st)) div 1000000")
        .cast("double").as("lat_s"))
    val pct = ExactPercentile.continuous(
      lat.select(lit("all").as("g"), col("lat_s")), Seq(0.5, 0.9))
    // A corpus with zero signup→purchase pairs yields an empty map;
    // the SQL global aggregate still returns one row (0, NULL, NULL)
    // — emit the same so the degenerate case row-counts agree.
    val rows = if (pct.isEmpty) Seq((0L, None: Option[Double], None: Option[Double]))
      else pct.toSeq.map { case (_, r) => (r.n, Some(r.values(0)), Some(r.values(1))) }
    rows.toDF("n_converted", "p50_raw", "p90_raw")
      .select(col("n_converted"),
        round(col("p50_raw"), 4).as("p50_s"),
        round(col("p90_raw"), 4).as("p90_s"))
  }

  private val q102Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS t
      |  FROM events),
      |s AS (
      |  SELECT user_id, MIN(t) AS st FROM e
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |fp AS (
      |  SELECT e.user_id, s.st, MIN(e.t) AS pt
      |  FROM e JOIN s USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.t >= s.st
      |  GROUP BY e.user_id, s.st),
      |lat AS (
      |  SELECT CAST((epoch_us(pt) - epoch_us(st)) // 1000000 AS DOUBLE)
      |    AS lat_s
      |  FROM fp)
      |SELECT COUNT(*) AS n_converted,
      |  round(quantile_cont(lat_s, 0.5), 4) AS p50_s,
      |  round(quantile_cont(lat_s, 0.9), 4) AS p90_s
      |FROM lat""".stripMargin

  /** q104 — per-customer exact [p50, p90] of order price through the
    * regime-dispatching `ExactPercentile.percentilesAuto`: customer
    * cardinality crosses the dispatch boundary BETWEEN the verify SFs
    * (~1.5k customers at sf0.01 → range-sort selection; ~15k at sf0.1
    * → buffering aggregate), so the oracle hash-checks BOTH physical
    * regimes against the same SQL — the "exact p99 per key without
    * knowing your group cardinality" contract, live. Elements rounded
    * to 4 (the q30 cross-engine interpolation discipline). Output is
    * SCALAR columns (p50/p90 via element_at) — the driver's pandas
    * comparison cannot sort/hash array-typed columns, the contract
    * OutputSchemaLint in PlanLintSpec now enforces corpus-wide. */
  private def q104(s: SparkSession, d: String): DataFrame = {
    val o = Tables.df(s, d, "orders")
      .select(col("o_custkey"), col("o_totalprice").cast("double"))
    ExactPercentile.percentilesAuto(o, Seq(0.5, 0.9))
      .select(col("g").as("custkey"), col("n"),
        round(element_at(col("pcts"), 1), 4).as("p50"),
        round(element_at(col("pcts"), 2), 4).as("p90"))
      .orderBy("custkey")
  }

  private val q104Oracle: String =
    """SELECT CAST(o_custkey AS VARCHAR) AS custkey,
      |  COUNT(*) AS n,
      |  round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 4) AS p50,
      |  round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 4) AS p90
      |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin

  /** q105 — map-typed columns as first-class values (deferred since r5
    * over DuckDB MAP-oracle friction; solved arms-length): per user,
    * the event_type→count MAP is built with map_from_entries, then
    * consumed with size / element_at / map_filter / map_keys — the
    * typed-dictionary shape feature stores and per-doc metadata bags
    * use. The ORACLE never touches a MAP: it restates the flattened
    * output in plain SQL (count-distinct, filtered count, ordered
    * string_agg), so agreement proves the map pipeline end-to-end
    * rather than one engine's map encoding. Deterministic: entries
    * sorted before map construction, keys sorted before join. */
  private def q105(s: SparkSession, d: String): DataFrame = {
    val c = Tables.df(s, d, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    c.groupBy("user_id")
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        size(col("m")).cast("long").as("n_types"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"),
        array_join(array_sort(map_keys(
          expr("map_filter(m, (k, v) -> v >= 2)"))), ",").as("heavy_types"))
      .orderBy("user_id")
  }

  private val q105Oracle: String =
    """WITH c AS (
      |  SELECT user_id, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id,
      |  COUNT(*) AS n_types,
      |  COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN n END), 0) AS purchases,
      |  COALESCE(string_agg(CASE WHEN n >= 2 THEN event_type END, ','
      |    ORDER BY event_type), '') AS heavy_types
      |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q106 — approx_top_k frequency sketch (Datasketches frequent
    * items), exercised in its EXACT regime: a frequent-items sketch
    * tracking more slots than the column has distinct values returns
    * exact counts, so the low-cardinality event_type profile is
    * oracle-checkable against plain GROUP BY counts — the q34-family
    * sketch whose exactness boundary is a documented contract rather
    * than an error bound. At 100 TB this is THE first-look profile
    * query on any categorical column (status codes, languages,
    * licenses): one pass, mergeable partials, no shuffle of raw rows.
    * Above the tracked-slot capacity counts go approximate — that
    * regime stays rows-only like q34. Ordered (n DESC, item) with k ≥
    * distinct so no sketch-internal tie-break can differ from SQL's. */
  private def q106(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(
      """SELECT t.item, t.count AS n
        |FROM (SELECT explode(approx_top_k(event_type, 8)) AS t FROM events)
        |ORDER BY n DESC, item""".stripMargin)
  }

  private val q106Oracle: String =
    """SELECT event_type AS item, COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY n DESC, item""".stripMargin

  /** q110 — portable per-partition table fingerprint: the anti-entropy
    * primitive for replica comparison / migration validation at 100 TB.
    * Each row canonicalizes to a typed string (decimal-cast money so
    * both engines render identically — the SURVEY §5 discipline — and
    * an explicit timestamp format), hashes through md5 (the p19
    * portable-hash choice: the ONLY hash both engines compute
    * bit-identically), and the top 60 bits fold into a per-month
    * BIT_XOR + row count. XOR is order- and partition-independent, so
    * the fingerprint is stable under any shuffle/file layout and never
    * overflows at any scale (sums do); identical-row cancellation is
    * impossible because the (orderkey, linenumber) PK is inside the
    * hash. Comparing two 100 TB replicas becomes one scan each side +
    * a |months|-row exchange — the oracle IS the cross-engine replica
    * check, live: DuckDB re-derives every fingerprint from the same
    * parquet and the driver hash-compares them. Plan: scan → codegen'd
    * project (md5+conv) → partial+final agg; shuffles |months| rows. */
  private def q110(s: SparkSession, d: String): DataFrame =
    Tables.df(s, d, "lineitem")
      .select(
        to_date(date_trunc("month", col("l_shipdate"))).as("mo"),
        expr("""cast(conv(substr(md5(concat_ws('|',
                  l_orderkey, l_linenumber,
                  cast(l_quantity as decimal(18,2)),
                  cast(l_extendedprice as decimal(18,2)),
                  cast(l_discount as decimal(18,2)),
                  cast(l_tax as decimal(18,2)),
                  l_returnflag, l_linestatus,
                  date_format(l_shipdate, 'yyyy-MM-dd HH:mm:ss'))),
                1, 15), 16, 10) as bigint)""").as("h"))
      .groupBy("mo")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("fp"))
      .orderBy("mo")

  private val q110Oracle: String =
    """WITH c AS (
      |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mo,
      |    CAST(('0x' || substr(md5(concat_ws('|',
      |        CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
      |        CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR),
      |        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
      |        CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR),
      |        CAST(CAST(l_tax AS DECIMAL(18,2)) AS VARCHAR),
      |        l_returnflag, l_linestatus,
      |        strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'))), 1, 15)) AS UBIGINT) AS h
      |  FROM lineitem)
      |SELECT mo, COUNT(*) AS n_rows, CAST(bit_xor(h) AS BIGINT) AS fp
      |FROM c GROUP BY mo ORDER BY mo""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q86_window_filter", Some(q86Oracle), q86),
    Q("q87_equi_depth", Some(q87Oracle), q87),
    Q("q88_scd2_upsert", Some(q88Oracle), q88),
    Q("q89_union_by_name", Some(q89Oracle), q89),
    Q("q90_incr_agg_merge", Some(q90Oracle), q90),
    Q("q91_group_by_all", Some(q91Oracle), q91),
    Q("q92_nested_fold", Some(q92Oracle), q92),
    Q("q93_try_functions", Some(q93Oracle), q93),
    Q("q94_share_of_parent", Some(q94Oracle), q94),
    Q("q95_constraint_check", Some(q95Oracle), q95),
    Q("q97_asof_nearest", Some(q97Oracle), q97),
    Q("q98_anomaly_zscore", Some(q98Oracle), q98),
    Q("q99_attribution", Some(q99Oracle), q99),
    Q("q101_path_analysis", Some(q101Oracle), q101),
    Q("q102_conversion_latency", Some(q102Oracle), q102),
    Q("q104_pct_auto", Some(q104Oracle), q104),
    Q("q105_map_types", Some(q105Oracle), q105),
    Q("q106_approx_topk", Some(q106Oracle), q106),
    Q("q110_table_fingerprint", Some(q110Oracle), q110))
}
