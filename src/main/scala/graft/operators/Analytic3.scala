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

  val all: Seq[Q] = Seq(
    Q("q70_skyline", Some(q70Oracle), q70),
    Q("q71_concurrency_sweep", Some(q71Oracle), q71))
}
