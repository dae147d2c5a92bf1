package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanInspector._

/** Analytic2 wave (q58–q63): semantic properties plus the plan shapes
  * that make each operator survive scale. */
class Analytic2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q58: lifecycle string length equals the order count per customer") {
    SparkEntry.queries("q58_listagg")(spark, sf).collect().foreach { r =>
      assert(r.getAs[String]("lifecycle").length == r.getAs[Long]("n_orders"),
        s"customer ${r.get(0)}: lifecycle/count mismatch")
    }
  }

  test("q59: lateral top-k decorrelates to a partial+final WindowGroupLimit") {
    val df = SparkEntry.queries("q59_lateral_topk")(spark, sf)
    val plan = physical(df).toString
    // the map-side K-cut is the property that keeps LATERAL scalable:
    // each task forwards at most K rows per group into the shuffle
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"), s"no partial group-limit phase in:\n$plan")
    // at most 3 per nation, ordered within nation
    val rows = df.collect()
    val perNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(perNation.values.forall(_.length <= 3))
    perNation.values.foreach { g =>
      val bals = g.map(_.getAs[Double]("c_acctbal")).toSeq
      assert(bals == bals.sorted.reverse, "not descending within nation")
    }
  }

  test("q60: locf carries the last non-null payload forward per user") {
    val rows = SparkEntry.queries("q60_locf")(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { g =>
      var last: Option[Int] = None
      // output rows arrive ordered (user_id, ts_s, event_id)
      g.foreach { r =>
        if (!r.isNullAt(r.fieldIndex("k")))
          last = Some(r.getAs[Int]("k"))
        val want = last
        val got = if (r.isNullAt(r.fieldIndex("k_locf"))) None
                  else Some(r.getAs[Int]("k_locf"))
        assert(got == want, s"locf mismatch at event ${r.get(0)}")
      }
    }
  }

  test("q61: histogram is a two-phase aggregation with clamped bins") {
    val df = SparkEntry.queries("q61_histogram")(spark, sf)
    assert(hasTwoPhaseAgg(df), "binning must partial-aggregate map-side")
    val rows = df.collect()
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bin"); b >= 0 && b <= 11
    })
    rows.filter(r => r.getAs[Long]("bin") > 0 && r.getAs[Long]("bin") < 11)
      .foreach { r =>
        val b = r.getAs[Long]("bin")
        assert(r.getAs[Double]("lo") >= b * 50000.0 &&
          r.getAs[Double]("hi") < (b + 1) * 50000.0,
          s"bin $b bounds violated")
      }
  }

  test("q62: discrete percentiles are ordered actual data values") {
    val prices = spark.read
      .parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).toSet }
    SparkEntry.queries("q62_percentile_disc")(spark, sf).collect().foreach { r =>
      val (p25, p50, p75) =
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75)
      val pool = prices(r.getAs[String]("o_orderpriority"))
      assert(pool(p25) && pool(p50) && pool(p75),
        "percentile_disc must return member values, not interpolations")
    }
  }

  test("q64: time-weighted average stays inside the payload range with positive time") {
    SparkEntry.queries("q64_time_weighted_avg")(spark, sf).collect().foreach { r =>
      val twa = r.getAs[Double]("twa")
      assert(twa >= 0.0 && twa <= 99.0, s"twa $twa outside payload range [0,99]")
      assert(r.getAs[Long]("tsum") > 0)
      assert(math.abs(twa - r.getAs[Long]("wsum").toDouble / r.getAs[Long]("tsum")) < 1e-6)
    }
  }

  test("q65: typed JSON parse succeeds for every event (COUNT(k) = group size)") {
    val parsed = SparkEntry.queries("q65_json_typed")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_parsed")).toMap
    val raw = graft.Tables.df(spark, sf, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(parsed == raw, s"malformed-JSON drops: $parsed vs $raw")
  }

  test("q63: NOT IN goes null-aware (empty), NOT EXISTS anti-joins normally") {
    val df = SparkEntry.queries("q63_not_in_nulls")(spark, sf)
    val plan = physical(df).toString
    // Spark marks the null-aware variant with the isNullAware=true flag
    // on the anti join — both variants must plan as hash anti joins
    assert("LeftAnti, BuildRight, true".r.findFirstIn(plan).nonEmpty,
      s"NOT IN did not plan null-aware:\n$plan")
    assert("LeftAnti, BuildRight, false".r.findFirstIn(plan).nonEmpty,
      s"NOT EXISTS did not plan as plain anti join:\n$plan")
    val byVariant = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byVariant("not_in") == 0L,
      "NULL in the NOT IN subquery must empty the result (3-valued logic)")
    assert(byVariant("not_exists") > 0L)
  }
}
