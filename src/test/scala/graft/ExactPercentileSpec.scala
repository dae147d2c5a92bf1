package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ExactPercentile

/** The distributed exact-percentile primitive (range-sort + two-pass
  * index selection) must agree EXACTLY with Spark's buffering
  * `percentile` / `percentile_disc` aggregates — the semantics the
  * DuckDB oracle verified the old plans under — while carrying none of
  * their scale hazards (per-group value buffers, single-task per-group
  * sorts). Agreement is checked on seeded random data with ties, skew,
  * and singleton groups; the shape claims are checked directly. */
class ExactPercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randomDf(rows: Int, groups: Int, distinct: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    (1 to rows).map { _ =>
      (s"g${rnd.nextInt(groups)}", (rnd.nextInt(distinct) * 17 + rnd.nextInt(100)) / 7.0)
    }.toDF("g", "v").repartition(7)
  }

  test("continuous matches Spark's exact percentile aggregate (ties + multi-group)") {
    val df = randomDf(rows = 5000, groups = 5, distinct = 300)
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = ExactPercentile.continuous(df, ps, partitions = 8)
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("p"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[Double](1), r.getLong(2)))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, r) =>
      assert(r.n == want(g)._2, s"group $g count")
      r.values.zip(want(g)._1).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) <= math.abs(b) * 1e-12 + 1e-12, s"group $g p=${ps(i)}: $a vs $b")
      }
    }
  }

  test("discrete matches percentile_disc and returns actual data values") {
    val df = randomDf(rows = 3000, groups = 4, distinct = 50)
    val ps = Seq(0.25, 0.5, 0.75)
    val got = ExactPercentile.discrete(df, ps, partitions = 8)
    df.createOrReplaceTempView("ep_disc_in")
    val want = spark.sql(
      """SELECT g,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS p25,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY v) AS p50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS p75
        |FROM ep_disc_in GROUP BY g""".stripMargin)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val domain = df.select("v").distinct().collect().map(_.getDouble(0)).toSet
    got.foreach { case (g, r) =>
      assert(r.values == want(g), s"group $g")
      r.values.foreach(v => assert(domain.contains(v), s"$v not an actual data value"))
    }
  }

  test("singleton group, constant group, and p at the extremes") {
    val s = spark
    import s.implicits._
    val df = (Seq(("one", 42.0)) ++ (1 to 100).map(_ => ("const", 7.0))).toDF("g", "v")
    val got = ExactPercentile.continuous(df, Seq(0.0, 0.5, 1.0), partitions = 4)
    assert(got("one") == ExactPercentile.GroupPct(1, IndexedSeq(42.0, 42.0, 42.0)))
    assert(got("const") == ExactPercentile.GroupPct(100, IndexedSeq(7.0, 7.0, 7.0)))
  }

  test("weightedMedian matches the windowed crossing definition") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 4000).map { _ =>
      (s"f${rnd.nextInt(3)}", rnd.nextInt(500) / 3.0, (rnd.nextInt(50) + 1).toLong)
    }.toDF("g", "v", "w").repartition(7)
    val got = ExactPercentile.weightedMedian(df, partitions = 8)
    df.createOrReplaceTempView("ep_wm_in")
    val want = spark.sql(
      """WITH c AS (
        |  SELECT g, v,
        |    SUM(w) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumw,
        |    SUM(w) OVER (PARTITION BY g) AS total
        |  FROM ep_wm_in)
        |SELECT g, MIN(v) AS wmedian, MAX(total) AS total
        |FROM c WHERE cumw * 2 >= total GROUP BY g""".stripMargin)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(got == want)
  }

  test("weightedMedian ignores NULL / non-positive weights and omits all-degenerate groups") {
    val s = spark
    import s.implicits._
    // "ok" has real weights plus degenerate rows the filter must drop;
    // "dead" has ONLY degenerate rows and must be omitted (not throw —
    // the r7 ADVICE NPE / NoSuchElementException cases).
    val df = Seq(
      ("ok", 1.0, Some(3L)), ("ok", 2.0, Some(1L)), ("ok", 3.0, None),
      ("ok", 4.0, Some(0L)), ("ok", 5.0, Some(-2L)),
      ("dead", 9.0, None), ("dead", 8.0, Some(0L))
    ).toDF("g", "v", "w")
    val got = ExactPercentile.weightedMedian(df, partitions = 4)
    assert(got == Map("ok" -> (1.0, 4L))) // cum 3 of 4 at v=1 crosses half
  }

  test("withGroupRank keeps a NULL group distinct from the string value \"null\"") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Option.empty[String], 1.0, 1L), (Option.empty[String], 2.0, 2L),
      (Some("null"), 1.0, 3L), (Some("null"), 2.0, 4L), (Some("null"), 3.0, 5L)
    ).toDF("g", "v", "id")
    val got = ExactPercentile.withGroupRank(df, "g", Seq("v", "id"), "rnk", partitions = 4)
      .collect().map(r => (Option(r.getString(0)), r.getLong(2)) -> r.getLong(3)).toMap
    // merged rank spaces would push some rank past its group's size
    assert(got == Map(
      (None, 1L) -> 0L, (None, 2L) -> 1L,
      (Some("null"), 3L) -> 0L, (Some("null"), 4L) -> 1L, (Some("null"), 5L) -> 2L))
  }

  test("shape: one group is spread across many range partitions (no single-task group sort)") {
    val s = spark
    import s.implicits._
    // One hot group — the exact case Window.partitionBy(g) funnels
    // into a single task. The primitive's range partitioning must
    // spread it over multiple partitions instead.
    val df = (1 to 20000).map(i => ("hot", i / 3.0)).toDF("g", "v")
    val pidCount = df.repartitionByRange(8, col("g"), col("v"))
      .select(spark_partition_id().as("pid"))
      .distinct().count()
    assert(pidCount >= 4, s"hot group landed in only $pidCount range partitions")
    // and the primitive still answers exactly on that layout
    val got = ExactPercentile.continuous(df, Seq(0.5), partitions = 8)("hot")
    assert(got.n == 20000 && math.abs(got.values.head - (10000 + 10001) / 2.0 / 3.0) < 1e-9)
  }

  test("withGroupRank matches row_number over a window, including a hot single group") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // skew: one group holds 80% of the rows — the case partitionBy(g)
    // serializes into a single task and this primitive must not
    val df = (1 to 6000).map { i =>
      val g = if (rnd.nextInt(5) > 0) "hot" else s"g${rnd.nextInt(3)}"
      (g, rnd.nextInt(800) / 7.0, i.toLong)
    }.toDF("g", "v", "id").repartition(7)
    val got = ExactPercentile.withGroupRank(df, "g", Seq("v", "id"), "rnk", partitions = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)) -> r.getLong(3)).toMap
    df.createOrReplaceTempView("gr_in")
    val want = spark.sql(
      """SELECT g, v, id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id) - 1 AS BIGINT) AS rnk
        |FROM gr_in""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got == want)
  }

  test("percentilesAuto flips plans between few-huge-groups and many-small-groups data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val fewHuge = (1 to 30000).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(900) / 7.0)
    }.toDF("g", "v").repartition(7)
    val manySmall = (1 to 30000).map { i =>
      (s"k${i % 10000}", rnd.nextInt(900) / 7.0)
    }.toDF("g", "v").repartition(7)
    val ps = Seq(0.5, 0.99)

    assert(ExactPercentile.chooseRegime(fewHuge) == ExactPercentile.RangeSort)
    assert(ExactPercentile.chooseRegime(manySmall) == ExactPercentile.BufferingAgg)

    // SAME call, two datasets, two physical plans: the few-huge result
    // is pre-selected driver rows (no percentile buffer anywhere); the
    // many-small result is the distributed aggregate (no P×|groups|
    // driver metadata — nothing was collected to build it).
    val fewDf = ExactPercentile.percentilesAuto(fewHuge, ps, partitions = 8)
    val manyDf = ExactPercentile.percentilesAuto(manySmall, ps, partitions = 8)
    val fewPlan = fewDf.queryExecution.executedPlan.toString
    val manyPlan = manyDf.queryExecution.executedPlan.toString
    assert(!fewPlan.toLowerCase.contains("percentile") && fewPlan.contains("ExistingRDD"),
      s"few-huge-groups call did not take the range-sort plan:\n$fewPlan")
    assert(manyPlan.toLowerCase.contains("percentile") && !manyPlan.contains("ExistingRDD"),
      s"many-small-groups call did not take the buffering aggregate:\n$manyPlan")

    // and both dispatches return the exact aggregate's answers
    for ((in, out) <- Seq((fewHuge, fewDf), (manySmall, manyDf))) {
      val want = in.groupBy("g")
        .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val got = out.collect().map(r => r.getString(0) -> r.getSeq[Double](2)).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (g, vs) =>
        vs.zip(want(g)).foreach { case (a, b) =>
          assert(math.abs(a - b) <= math.abs(b) * 1e-12 + 1e-12, s"group $g: $a vs $b")
        }
      }
    }
  }

  test("shape: re-planned q30/q62/q76/q80/q43 carry no buffering percentile and no full-data window") {
    for (q <- Seq("q30_percentile", "q62_percentile_disc", "q76_mad", "q80_weighted_median",
        "q43_window_dist")) {
      val plan = SparkEntry.queries(q)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("percentile"),
        s"$q still plans a buffering percentile aggregate")
      assert(!plan.contains("Window"), s"$q still plans a full-data window")
    }
  }
}
