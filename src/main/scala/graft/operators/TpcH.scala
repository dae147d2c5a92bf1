package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Classic TPC-H queries (Q1, Q3, Q5, Q6), adapted only where the
  * driver schema lacks a column (Q3 projects o_orderpriority for the
  * absent o_shippriority) and date-shifted into this corpus's
  * 1995–2001 range. Each query is ONE ANSI SQL text executed verbatim
  * by BOTH engines — the strongest cross-engine statement the oracle
  * harness can make, and the benchmark-recognizable workload for the
  * perf story (reference: the docs/3–8 plan walkthroughs are TPC-H-
  * flavored throughout). Money math follows SURVEY §5: decimal casts
  * before arithmetic, and every intermediate keeps its FULL product
  * scale ((18,2)×(19,2) → scale-4, ×(19,2) again → scale-6) so no cast
  * ever rounds — engines disagree on decimal rounding modes, exactness
  * sidesteps the question. DOUBLE only at the output boundary.
  *
  * Plan posture at scale: Q1/Q6 are pure scan + partial/final agg
  * (pushdown cuts the scan to the date range); Q3/Q5 are star joins
  * where every dim side (customer·nation·region / filtered customer)
  * broadcasts under AQE sizing, leaving one shuffle for the fact-side
  * aggregation. Asserted in CoreSpec.
  */
object TpcH {

  private def run(sql: String)(s: SparkSession, d: String): DataFrame = {
    Tables.ensure(s, d)
    s.sql(sql)
  }

  private val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
      |    AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
      |    * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE)
      |    AS sum_charge,
      |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)
      |    AS avg_qty,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)
      |    AS avg_price,
      |  round(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)
      |    AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
      |    AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  private val q5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
      |    AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  private val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  val all: Seq[Q] = Seq(
    Q("tpch_q1", Some(q1Sql), run(q1Sql)),
    Q("tpch_q3", Some(q3Sql), run(q3Sql)),
    Q("tpch_q5", Some(q5Sql), run(q5Sql)),
    Q("tpch_q6", Some(q6Sql), run(q6Sql)))
}
