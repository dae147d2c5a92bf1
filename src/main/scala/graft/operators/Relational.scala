package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables
import graft.functions.Cols._

/** Core relational operator suite — the Spark-first re-expression of the
  * reference's capability surface (reference docs/3–8 and
  * tests/opt_parallel_execution.rs). Every query is a pure
  * `(SparkSession, sfDir) => DataFrame` built with the DataFrame API so
  * Catalyst owns pushdown, join strategy, and two-phase aggregation;
  * results are deterministically ordered with a total tie-break key.
  *
  * Scale notes are inline per query: what broadcasts, what shuffles, and
  * why the plan survives 1000 executors / 100 TB.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  /** q01 — projection; column pruning must reach the scan (ReadSchema
    * carries only 4 of 11 lineitem columns). Reference docs/4 "Projection". */
  private def q01(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")

  /** q02 — filter; predicate pushdown must reach the scan (PushedFilters).
    * Reference docs/5 "Filter Push Down". */
  private def q02(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** q03 — full sort of an unsorted table (reference docs/4): a real
    * range-partitioned shuffle sort at scale, no pre-existing order. */
  private def q03(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  /** q04 — top-K: sort + limit collapses to TakeOrderedAndProject (per-
    * partition heaps, no full shuffle) — the scale-correct plan. */
  private def q04(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** q05 — multi-key hash aggregate (TPC-H Q1 shape); Spark plans
    * partial+final automatically (reference docs/7 "Multi-step
    * Aggregation: Partial & Final"). */
  private def q05(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_qty", col("sum_qty") / col("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q06 — global aggregate, no groups (TPC-H Q6 shape): partial agg per
    * partition, single final reduce — no keyed shuffle at all. */
  private def q06(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** q07 — distinct aggregate: count(distinct) expands to a two-level
    * aggregate; stays fully distributed. */
  private def q07(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_orderstatus")

  /** q08 — SELECT DISTINCT = hash aggregate on all columns. */
  private def q08(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select("c_mktsegment", "c_nationkey")
      .distinct()
      .orderBy("c_mktsegment", "c_nationkey")

  /** q09 — star join: customer ⋈ nation ⋈ region with the dims explicitly
    * broadcast — the Spark analog of the reference's
    * `HashJoinExec mode=CollectLeft` (docs/8). At 100 TB the fact side
    * streams, dims ship once per executor. */
  private def q09(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_cust"),
        dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("r_name", "n_name")

  /** q10 — big ⋈ big join on the shared key: at scale this is a shuffle
    * (sort-merge) join on l_orderkey/o_orderkey; the post-join aggregate
    * reuses no partitioning, so Spark plans partial aggs before the final
    * 5-group reduce. */
  private def q10(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority")

  /** q11 — left outer join keeping customers with zero orders; count(col)
    * (not count(*)) so unmatched rows count 0. */
  private def q11(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** q12 — left semi join (EXISTS): customers with at least one big order. */
  private def q12(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(
        t(s, d, "orders").where(col("o_totalprice") > 400000),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")

  /** q13 — left anti join (NOT EXISTS): customers with no orders at all. */
  private def q13(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey")
      .orderBy("c_custkey")

  /** q14 — union all of two filtered streams, then aggregate; the union is
    * free (no shuffle), only the final groupBy shuffles. */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    ev.where(col("event_type") === "click").select("user_id")
      .unionAll(ev.where(col("event_type") === "purchase").select("user_id"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  /** q15 — window functions: row_number + running decimal sum per
    * customer. One shuffle on the partition key, then sorted windows. */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast(DoubleType).as("run_total"))
      .orderBy("o_custkey", "rn")
  }

  /** q16 — date_bin: 5-minute epoch-aligned buckets over the events
    * stream table (reference docs/7's date_bin pipeline). */
  private def q16(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(timeBin("ts", 300).as("ts_bin"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value"), 4).as("sum_val"))
      .orderBy("ts_bin", "event_type")

  /** q17 — the reference flagship (tests/opt_parallel_execution.rs:33):
    * filtered dimension ⋈ fact, 30-second date_bin, max per bin, final
    * sort. Dimension (customer, post-filter) is broadcast = CollectLeft;
    * the fact (events) never shuffles before the aggregate's own
    * partial/final split. */
  private def q17(s: SparkSession, d: String): DataFrame = {
    val dim = t(s, d, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_nationkey")
    t(s, d, "events")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("user_id"), timeBin("ts", 30).as("time_bin"), col("c_nationkey"))
      .agg(max(col("value")).as("max_bin_val"))
      .orderBy("user_id", "time_bin", "c_nationkey")
  }

  /** q18 — HAVING: post-aggregation filter. */
  private def q18(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 13)
      .orderBy("o_custkey")

  /** q19 — scalar subquery: rows above 1.8× the global (deterministic,
    * decimal-computed) average; the 1-row aggregate is broadcast. */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val thr = li.agg(davg(col("l_quantity")).as("t"))
    li.crossJoin(broadcast(thr))
      .where(col("l_quantity") > col("t") * 1.8)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q20 — conditional aggregation via CASE WHEN inside count. */
  private def q20(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_totalprice") > 300000, lit(1))).as("n_big"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_orderpriority")

  /** q21 — ROLLUP multi-level aggregate; NULLS FIRST ordering pinned
    * explicitly (Spark and DuckDB disagree on the default). */
  private def q21(s: SparkSession, d: String): DataFrame = {
    // SQL form: rollup's Expand duplicates attribute ids, and sorting the
    // Dataset-API result by the (nullable) grouping columns trips the
    // ambiguous-self-join check in Spark 4.1. The SQL path resolves fine
    // and plans identically (broadcast joins + Expand + hash agg).
    Tables.ensure(s, d)
    s.sql(
      """SELECT /*+ BROADCAST(nation), BROADCAST(region) */
        |  r_name, n_name, COUNT(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** q22 — string ops (LIKE, substr, concat, IN-list); all codegen'd
    * builtins, no UDFs. */
  private def q22(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .where(col("p_name").like("%widget%") || col("p_brand").isin("Brand#13", "Brand#19"))
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("pre8"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("bt"))
      .orderBy("p_partkey")

  /** q23 — sessionization (gaps-and-islands): 30-minute inactivity gap
    * via lag + running sum of session-break flags. Two window passes over
    * one shuffle-by-user partitioning. */
  private def q23(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s", when(col("gap_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(w))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        date_trunc("second", min(col("ts"))).as("session_start"))
      .orderBy("user_id", "session_id")
  }

  /** q24 — top-N per key via ranked window + filter; Catalyst rewrites
    * the rn<=3 filter into a per-partition limit (WindowGroupLimit). */
  private def q24(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** q25 — full outer join: per-nation customer counts ⋈ per-nation
    * supplier counts, preserving unmatched sides. */
  private def q25(s: SparkSession, d: String): DataFrame = {
    val cs = t(s, d, "customer").groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val sp = t(s, d, "supplier").groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    cs.join(sp, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"), col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  /** q26 — set operations: INTERSECT and EXCEPT of the customer/supplier
    * nation-key sets, tagged and unioned. */
  private def q26(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").select(col("c_nationkey").as("k"))
    val p = t(s, d, "supplier").select(col("s_nationkey").as("k"))
    c.intersect(p).withColumn("tag", lit("both"))
      .unionAll(c.except(p).withColumn("tag", lit("cust_only")))
      .select("tag", "k")
      .orderBy("tag", "k")
  }

  /** q27 — cross join (small × small): every region × market segment. */
  private def q27(s: SparkSession, d: String): DataFrame =
    t(s, d, "region").select("r_name")
      .crossJoin(t(s, d, "customer").select("c_mktsegment").distinct())
      .orderBy("r_name", "c_mktsegment")

  /** q28 — pivot: order counts by priority × status. na.fill(0) aligns
    * Spark's null-for-empty-cell with COUNT's 0. */
  private def q28(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0)
      .orderBy("o_orderpriority")

  /** q29 — IN-subquery through the SQL path (plans as a left semi join,
    * like q12's DataFrame form). */
  private def q29(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** q30 — exact percentiles per group, computed by the distributed
    * range-sort selection primitive (ExactPercentile.continuous): no
    * buffering `percentile` aggregate (whose per-group state grows with
    * distinct values — an OOM shape on continuous money columns at
    * 100 TB) and no per-group single-task sort. Same interpolation,
    * same oracle. */
  private def q30(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val pct = ExactPercentile.continuous(
      t(s, d, "orders").select(col("o_orderpriority"), col("o_totalprice")),
      Seq(0.5, 0.9))
    pct.toSeq
      .map { case (g, r) => (g, r.values(0), r.values(1)) }
      .toDF("o_orderpriority", "p50_raw", "p90_raw")
      .select(col("o_orderpriority"),
        round(col("p50_raw"), 4).as("p50"),
        round(col("p90_raw"), 4).as("p90"))
      .orderBy("o_orderpriority")
  }

  /** q31 — date-part extraction + aggregation. */
  private def q31(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("y", "m")

  /** q32 — window frames: lead, first_value, and a 3-row moving sum
    * (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). */
  private def q32(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val w3 = w.rowsBetween(-2, Window.currentRow)
    t(s, d, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("nxt"),
        first(col("o_orderkey")).over(w).as("fst"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w3)
          .cast(DoubleType).as("mov3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q33 — JSON extraction from the events props column + aggregation;
    * get_json_object stays codegen'd (no UDF JSON parsing). */
  private def q33(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("int")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** q35 — as-of join (an operator Spark lacks natively, composed from
    * existing ops): for each event, the user's most recent order at or
    * before the event time. Orders are first collapsed to one row per
    * (custkey, orderdate) so the as-of pick is deterministic; the
    * range-join expands to the per-user candidate set and a struct-max
    * aggregation keeps the latest — unlike a row_number window, the
    * argmax gets PARTIAL aggregation, so each map task sends one
    * candidate per event into the shuffle instead of the whole expanded
    * set. At 100 TB the same plan co-partitions both sides on the key,
    * and the candidate fan-out stays bounded by orders-per-user;
    * DuckDB's native ASOF JOIN is the oracle. */
  private def q35(s: SparkSession, d: String): DataFrame = {
    val ord = t(s, d, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val ev = t(s, d, "events").select("event_id", "user_id", "ts")
    ev.join(ord,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
      .select(
        col("event_id"), col("user_id"),
        date_trunc("second", col("ts")).as("ts_s"),
        col("m.o_orderkey").as("o_orderkey"), col("m.o_orderdate").as("o_orderdate"))
      .orderBy("event_id")
  }

  /** q34 — sketch aggregates: approx_count_distinct + approx_percentile
    * — the 100 TB path where exact distinct/percentile shuffles would
    * be prohibitive.
    *
    * ORACLE-CHECKED accuracy CONTRACT (r15): the estimates themselves
    * are engine-specific (HLL++/KLL internals), so the estimates export
    * to a pinned parquet path and BOTH sides independently verify the
    * published bound against their OWN exact computation — Spark with
    * countDistinct + a rank probe, DuckDB with COUNT(DISTINCT) + the
    * same probe over the echoed estimate. The hash-compared row is
    * (status, estimate echo, within-bound booleans): the estimator
    * stays free, the accuracy contract is checkable. PipelineSpec keeps
    * the tighter numeric error floor. */
  private def q34(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val out = Similarity.exportPath("q34est", d)
    o.groupBy("o_orderstatus")
      .agg(
        approx_count_distinct(col("o_custkey")).as("approx_cust"),
        expr("approx_percentile(o_totalprice, 0.5)").as("approx_p50"))
      .write.mode("overwrite").parquet(out)
    val est = s.read.parquet(out)
    val exact = o.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("ec"))
    val ranks = o.join(est, Seq("o_orderstatus"))
      .groupBy("o_orderstatus")
      .agg(
        (sum(when(col("o_totalprice") <= col("approx_p50"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("fr_le"),
        (sum(when(col("o_totalprice") < col("approx_p50"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("fr_lt"))
    est.join(exact, "o_orderstatus").join(ranks, "o_orderstatus")
      .select(col("o_orderstatus"), col("approx_cust"), col("approx_p50"),
        (abs(col("approx_cust") - col("ec")) <= col("ec") * lit(0.15))
          .as("cust_in_bound"),
        (col("fr_lt") <= lit(0.52) && col("fr_le") >= lit(0.48))
          .as("p50_in_bound"))
      .orderBy("o_orderstatus")
  }

  private def q34Oracle: String =
    s"""WITH est AS (
      |  SELECT * FROM read_parquet('${Similarity.oracleExportPath("q34est")}/*.parquet')),
      |ex AS (
      |  SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS ec
      |  FROM orders GROUP BY 1),
      |rk AS (
      |  SELECT o.o_orderstatus,
      |    CAST(SUM(CASE WHEN o.o_totalprice <= e.approx_p50 THEN 1 ELSE 0 END) AS DOUBLE)
      |      / COUNT(*) AS fr_le,
      |    CAST(SUM(CASE WHEN o.o_totalprice < e.approx_p50 THEN 1 ELSE 0 END) AS DOUBLE)
      |      / COUNT(*) AS fr_lt
      |  FROM orders o JOIN est e USING (o_orderstatus) GROUP BY 1)
      |SELECT e.o_orderstatus, e.approx_cust, e.approx_p50,
      |  abs(e.approx_cust - ex.ec) <= ex.ec * 0.15 AS cust_in_bound,
      |  (rk.fr_lt <= 0.52 AND rk.fr_le >= 0.48) AS p50_in_bound
      |FROM est e JOIN ex USING (o_orderstatus) JOIN rk USING (o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin

  /** q37 — salted two-stage aggregation: the explicit skew-mitigation
    * pattern (prompt: "salting for skew"). Stage 1 aggregates on
    * (key, salt) so a hot key spreads over 16 reducers; stage 2 merges
    * the partials. Decimal partial-sums merge exactly, so the result is
    * identical to the direct aggregation — same oracle shape as any
    * plain GROUP BY. AQE's skew-join handles the join-side analog
    * (GraftSession). */
  private def q37(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_custkey"), pmod(xxhash64(col("o_orderkey")), lit(16)).as("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("psum"))
      .groupBy("o_custkey")
      .agg(
        sum(col("pn")).as("n_orders"),
        sum(col("psum")).cast(DoubleType).as("sum_price"))
      .orderBy("o_custkey")

  /** q38 — CUBE multi-dimensional aggregation (all four grouping sets
    * of status × priority). Same Expand-based plan family as ROLLUP:
    * one pass over orders fans each row into its grouping sets, then
    * two-phase hash agg — no per-grouping rescans at any scale. SQL
    * path for the same Spark 4.1 nullable-grouping reason as q21. */
  private def q38(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** q39 — UNPIVOT (wide metrics → long (metric, value) rows) via the
    * native Dataset.unpivot — a narrow per-row expansion, no shuffle;
    * the oracle states the same relation as a UNION ALL. */
  private def q39(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        variableColumnName = "metric",
        valueColumnName = "val")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  /** q40 — banded range join (the batch twin of the streaming
    * click/view attribution): per click, how many of the same user's
    * views land within the following hour. The equality key (user_id)
    * makes this a plain hash join with a residual time-band filter —
    * never a nested-loop — so it shuffles exactly like q10 at scale,
    * and the band bounds the per-key fan-out. Timestamps compared at
    * second granularity (the ns-vs-us parquet rule, SURVEY §5). */
  private def q40(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("c_user"), col("ts_s").as("c_ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_s").as("v_ts"))
    clicks
      .join(views,
        col("c_user") === col("v_user") &&
          col("v_ts") >= col("c_ts") &&
          col("v_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_views"))
      .orderBy("event_id")
  }

  /** q41 — explicit GROUPING SETS (the general form behind ROLLUP/CUBE):
    * three hand-picked grouping sets in one pass. Same Expand + two-phase
    * hash-agg plan family as q21/q38 — the fact table is scanned once
    * regardless of how many sets are requested. SQL path for the same
    * Spark 4.1 nullable-grouping reason as q21. */
  private def q41(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** q42 — lateral explode (Spark's Generate operator): split each part
    * name into words and aggregate word frequencies. The expansion is
    * narrow (per-row, no shuffle until the count), so it pipelines
    * inside whole-stage codegen at any scale. */
  private def q42(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"), min(col("p_partkey")).as("first_key"))
      .orderBy("word")

  /** q43 — distribution-analytic window functions (ntile / percent_rank
    * / cume_dist) per order-priority partition. The composite
    * (o_totalprice, o_orderkey) sort key is total, so every rank is
    * deterministic; one shuffle by partition key, one sort per
    * partition. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    // Distribution analytics WITHOUT Window.partitionBy(priority): a
    // 5-value partition key over the whole fact table is one task per
    // priority — the q80-family skew shape. The composite
    // (o_totalprice, o_orderkey) ORDER BY key is UNIQUE, so ntile /
    // percent_rank / cume_dist are pure arithmetic on the within-group
    // rank, which ExactPercentile.withGroupRank computes over many
    // range partitions per group.
    val ranked = ExactPercentile.withGroupRank(
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
      "o_orderpriority", Seq("o_totalprice", "o_orderkey"), "rnk")
    val sizes = t(s, d, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    // SQL NTILE(k): first (n mod k) buckets take ceil(n/k) rows
    val q = col("n").divide(4).cast("long")
    val r = col("n") % 4
    ranked.join(broadcast(sizes), "o_orderpriority")
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        when(col("rnk") < r * (q + 1), col("rnk").divide(q + 1).cast("long") + 1)
          .otherwise(r + (col("rnk") - r * (q + 1)).divide(q).cast("long") + 1)
          .cast("int").as("quartile"),
        round(when(col("n") > 1, col("rnk").cast("double") / (col("n") - 1))
          .otherwise(lit(0.0)), 6).as("pr"),
        round((col("rnk") + 1).cast("double") / col("n"), 6).as("cd"))
      .orderBy("o_orderkey")
  }

  /** q44 — deterministic array aggregation: per-region nation roster as
    * a sorted, comma-joined list. `sort_array ∘ collect_list` pins the
    * element order (collect_list alone is partition-order-dependent —
    * never comparable across engines or runs), and the string join makes
    * the output hash-stable for the oracle. */
  private def q44(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")

  /** q45 — map-typed columns: per-user event-type counts built into a
    * real MapType (map_from_entries over sorted entries), consumed via
    * element_at lookup and flattened to a sorted "k=v" string. The map
    * is carried through the plan — the output is flattened only so the
    * oracle (which states the same relation without maps) can
    * hash-compare it engine-neutrally. */
  private def q45(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
        array_join(expr(
          "transform(map_entries(m), e -> concat(e.key, '=', e.value))"), ",").as("kv"))
      .orderBy("user_id")

  /** q46 — correlated scalar subquery: orders priced far above their own
    * customer's average. Catalyst de-correlates this into an aggregate +
    * join — one pass to build per-customer averages, one hash join —
    * never a per-row re-execution; the decimal-routed average keeps the
    * threshold bit-identical cross-engine. */
  private def q46(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** q47 — time-series gap filling: the dense (event_type × 5-minute
    * bin) grid between the observed bounds, zero-filled where no events
    * landed. The grid generates from a broadcast 1-row bounds aggregate
    * (sequence + explode — no driver loop), so the only shuffle is the
    * count aggregation; missing-bin detection is a left join against
    * the generated spine, the standard dense-timeline shape. */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events")
      .select(col("event_type"), timeBin("ts", 300).as("bin"))
    // bounds and the type roster derive from the aggregated counts, not
    // the raw table, and the tiny per-bin aggregate is lazily
    // checkpointed so its three consumers share ONE materialization —
    // events is scanned exactly once (plain plan sharing does not
    // dedupe here: each consumer's column pruning specializes its copy
    // of the subtree, so ReuseExchange never fires)
    val counts = e.groupBy("event_type", "bin").agg(count(lit(1)).as("n_raw"))
      .localCheckpoint(false)
    val bounds = counts.agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"))
    val grid = counts.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 5 minutes)")).as("bin"))
    grid.join(counts, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        coalesce(col("n_raw"), lit(0L)).as("n"))
      .orderBy("event_type", "bin")
  }

  /** q48 — latest record per key (the SCD/"current state" staple):
    * each user's most recent event. max_by over a (ts, event_id) struct
    * is a partial-aggregating reduction — every partition keeps one
    * candidate per user before the shuffle — where the textbook
    * ROW_NUMBER()=1 window would shuffle and sort every row. Ordering
    * uses second-truncated timestamps (the ns-vs-µs parquet rule) with
    * the event_id tie-break, so the pick is total and engine-exact. */
  private def q48(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts_s"),
        col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(max_by(
        struct(col("ts_s"), col("event_id"), col("event_type")),
        struct(col("ts_s"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.ts_s").as("ts_s"),
        col("last.event_id").as("event_id"), col("last.event_type").as("event_type"))
      .orderBy("user_id")

  /** q49 — event-time RANGE window frame: per user, how many of their
    * events landed in the sliding hour ending at each event — the
    * un-binned continuous twin of q16/q47's fixed bins (q32's frames
    * are ROWS-based; RANGE bounds by VALUE distance and includes
    * peers, so ties in ts cannot make the result order-dependent).
    * One shuffle by user, one sort per partition — same cost envelope
    * as any window. */
  private def q49(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts_s")) / 1000000L)
      .rangeBetween(-3600, 0)
    t(s, d, "events")
      .select(col("user_id"), date_trunc("second", col("ts")).as("ts_s"), col("event_id"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .orderBy("user_id", "ts_s", "event_id")
  }

  // ---------------------------------------------------------------------
  // Oracle SQL (DuckDB). Aliases match the Spark output column names
  // exactly; float discipline per SURVEY.md §5.
  // ---------------------------------------------------------------------

  private val binUs30 = "make_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) // 30000000 * 30000000)"
  private val binUs300 = "make_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) // 300000000 * 300000000)"

  /** `def`: q34's oracle names the export path THIS run wrote. */
  def all: Seq[Q] = Seq(
    Q("q01_project", Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin), q01),
    Q("q02_filter", Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin), q02),
    Q("q03_sort", Some(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey""".stripMargin), q03),
    Q("q04_topk", Some(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin), q04),
    Q("q05_agg", Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin), q05),
    Q("q06_agg_global", Some(
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin), q06),
    Q("q07_agg_distinct", Some(
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_rows
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin), q07),
    Q("q08_distinct", Some(
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer ORDER BY c_mktsegment, c_nationkey""".stripMargin), q08),
    Q("q09_join_broadcast", Some(
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin), q09),
    Q("q10_join_shuffle", Some(
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin), q10),
    Q("q11_join_left", Some(
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin), q11),
    Q("q12_join_semi", Some(
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin), q12),
    Q("q13_join_anti", Some(
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin), q13),
    Q("q14_union", Some(
      """SELECT user_id, COUNT(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |GROUP BY user_id ORDER BY user_id""".stripMargin), q14),
    Q("q15_window", Some(
      """SELECT o_orderkey, o_custkey,
        |  ROW_NUMBER() OVER w AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin), q15),
    Q("q16_date_bin", Some(
      s"""SELECT $binUs300 AS ts_bin, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
         |FROM events GROUP BY ts_bin, event_type
         |ORDER BY ts_bin, event_type""".stripMargin), q16),
    Q("q17_flagship", Some(
      s"""SELECT user_id, $binUs30 AS time_bin, c_nationkey,
         |  MAX(value) AS max_bin_val
         |FROM events JOIN customer ON user_id = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY user_id, time_bin, c_nationkey
         |ORDER BY user_id, time_bin, c_nationkey""".stripMargin), q17),
    Q("q18_having", Some(
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 13
        |ORDER BY o_custkey""".stripMargin), q18),
    Q("q19_subquery", Some(
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > (
        |  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM lineitem) * 1.8
        |ORDER BY l_orderkey, l_linenumber""".stripMargin), q19),
    Q("q20_case", Some(
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_totalprice > 300000 THEN 1 END) AS n_big,
        |  COUNT(*) AS n_rows
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin), q20),
    Q("q21_rollup", Some(
      """SELECT r_name, n_name, COUNT(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin), q21),
    Q("q22_strings", Some(
      """SELECT p_partkey, UPPER(SUBSTR(p_name, 1, 8)) AS pre8,
        |  CONCAT(p_brand, '#', p_type) AS bt
        |FROM part
        |WHERE p_name LIKE '%widget%' OR p_brand IN ('Brand#13', 'Brand#19')
        |ORDER BY p_partkey""".stripMargin), q22),
    Q("q23_sessionize", Some(
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |           - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
        |             (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP) AS session_start
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin), q23),
    Q("q24_topn_per_key", Some(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin), q24),
    Q("q25_join_full", Some(
      """SELECT COALESCE(ck, sk) AS nationkey, n_cust, n_supp FROM
        |  (SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN
        |  (SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
        |ON ck = sk ORDER BY nationkey""".stripMargin), q25),
    Q("q26_setops", Some(
      """SELECT 'both' AS tag, k FROM
        |  (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS tag, k FROM
        |  (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
        |ORDER BY tag, k""".stripMargin), q26),
    Q("q27_cross", Some(
      """SELECT r_name, c_mktsegment FROM region
        |CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
        |ORDER BY r_name, c_mktsegment""".stripMargin), q27),
    Q("q28_pivot", Some(
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin), q28),
    Q("q29_in_subquery", Some(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin), q29),
    Q("q30_percentile", Some(
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin), q30),
    Q("q31_date_parts", Some(
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin), q31),
    Q("q32_window_frames", Some(
      """SELECT o_custkey, o_orderkey,
        |  lead(o_orderkey) OVER w AS nxt,
        |  first_value(o_orderkey) OVER w AS fst,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin), q32),
    Q("q33_json", Some(
      """SELECT event_type,
        |  CAST(SUM(CAST((props ->> '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin), q33),
    Q("q34_approx", Some(q34Oracle), q34),
    Q("q35_asof_join", Some(
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT event_id, user_id,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s,
        |  o_orderkey, o_orderdate
        |FROM events ASOF JOIN ord
        |  ON user_id = o_custkey AND ts >= o_orderdate
        |ORDER BY event_id""".stripMargin), q35),
    Q("q37_salted_agg", Some(
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin), q37),
    Q("q38_cube", Some(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin), q38),
    Q("q39_unpivot", Some(
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin), q39),
    Q("q40_range_join", Some(
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_s
        |  FROM events)
        |SELECT c.event_id AS event_id, COUNT(*) AS n_views
        |FROM e c JOIN e v
        |  ON c.user_id = v.user_id
        | AND v.ts_s >= c.ts_s AND v.ts_s <= c.ts_s + INTERVAL 1 HOUR
        |WHERE c.event_type = 'click' AND v.event_type = 'view'
        |GROUP BY c.event_id ORDER BY event_id""".stripMargin), q40),
    Q("q41_grouping_sets", Some(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin), q41),
    Q("q42_explode_words", Some(
      """SELECT word, COUNT(*) AS n, MIN(p_partkey) AS first_key
        |FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY word""".stripMargin), q42),
    Q("q43_window_dist", Some(
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin), q43),
    Q("q44_array_agg", Some(
      """SELECT r_name,
        |  array_to_string(list(n_name ORDER BY n_name), ',') AS nations,
        |  COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin), q44),
    Q("q45_map_ops", Some(
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0) AS n_click,
        |  string_agg(event_type || '=' || n, ',' ORDER BY event_type) AS kv
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin), q45),
    Q("q46_correlated_subquery", Some(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin), q46),
    Q("q47_gap_fill", Some(
      """WITH e AS (
        |  SELECT event_type,
        |    make_timestamp(epoch_us(CAST(ts AS TIMESTAMP)) // 300000000 * 300000000) AS bin
        |  FROM events),
        |b AS (SELECT MIN(bin) AS lo, MAX(bin) AS hi FROM e),
        |grid AS (
        |  SELECT t.event_type, g.bin
        |  FROM (SELECT DISTINCT event_type FROM e) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS bin FROM b) g),
        |c AS (SELECT event_type, bin, COUNT(*) AS n_raw FROM e GROUP BY event_type, bin)
        |SELECT grid.event_type, grid.bin, COALESCE(c.n_raw, 0) AS n
        |FROM grid LEFT JOIN c USING (event_type, bin)
        |ORDER BY event_type, bin""".stripMargin), q47),
    Q("q48_latest_per_key", Some(
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ts_s,
        |    event_id, event_type,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY user_id
        |      ORDER BY date_trunc('second', CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts_s, event_id, event_type
        |FROM e WHERE rn = 1 ORDER BY user_id""".stripMargin), q48),
    Q("q49_range_frame", Some(
      """SELECT user_id,
        |  CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ts_s,
        |  event_id,
        |  COUNT(*) OVER (
        |    PARTITION BY user_id
        |    ORDER BY epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events
        |ORDER BY user_id, ts_s, event_id""".stripMargin), q49)
  )
}
