package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Cost-based optimization: the reference's central claim is the engine
  * CHOOSING the optimal plan from data statistics (docs/7 group-by mode
  * selection, docs/8 CollectLeft build-side selection). The Spark analog
  * is CBO: `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` feeds
  * FilterEstimation / CostBasedJoinReorder, and the SAME query gets a
  * different — better — physical plan once statistics exist. These tests
  * assert both directions: the stats-less plan is the conservative shape,
  * the stats plan is the cheap one.
  */
class CboSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  override def afterAll(): Unit = {
    // later suites rely on the shared session being active/default
    SparkSession.setActiveSession(TestSpark.spark)
    SparkSession.setDefaultSession(TestSpark.spark)
  }

  /** A graft-catalog session: sidecar-fed CBO needs catalog reads to
    * resolve through the injected rule (the stamping site). */
  private val gwh = s"/tmp/graft-cbo-wh-${System.nanoTime()}"
  private lazy val gspark: SparkSession = {
    TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cbo")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.sql.catalog.graft_cbo", "graft.sources.GraftTableCatalog")
      .config("spark.sql.catalog.graft_cbo.warehouse", gwh)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cbo.db")
    s
  }

  private def withConfOn(s: SparkSession)(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit =
    withConfOn(spark)(pairs: _*)(f)

  private def saveTable(src: String, as: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $as")
    // a previous JVM's warehouse dir survives the (in-memory) catalog —
    // clear the location or CREATE TABLE refuses with LOCATION_ALREADY_EXISTS
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(warehouse, as))
    Tables.df(spark, sf, src).write.mode("overwrite").saveAsTable(as)
  }

  /** The deepest Join in the optimized plan (the one executed first). */
  private def deepestJoinLeaves(plan: LogicalPlan): Seq[String] = {
    val joins = plan.collect { case j: Join => j }
    val innermost = joins.filter(j => j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    innermost.flatMap(_.collectLeaves().map(_.toString))
  }

  test("CBO: column stats flip a shuffle join to broadcast on a selective filter") {
    saveTable("lineitem", "cbo_lineitem")
    saveTable("orders", "cbo_orders")
    val q = """SELECT l.l_orderkey, o.o_totalprice
              |FROM cbo_lineitem l JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
              |WHERE o.o_orderkey < 40""".stripMargin
    // threshold below both raw table sizes: without selectivity evidence
    // the optimizer must assume the filter keeps everything → shuffle join
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "4096",
      "spark.sql.cbo.enabled" -> "true") {
      val before = spark.sql(q).queryExecution.sparkPlan.toString
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"expected the stats-less plan to shuffle:\n$before")
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey")
      spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")
      val after = spark.sql(q).queryExecution.sparkPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"column stats did not flip the join to broadcast:\n$after")
    }
  }

  test("CBO: join reorder puts the selective dim join first with stats") {
    saveTable("lineitem", "cbo_lineitem2")
    saveTable("orders", "cbo_orders2")
    saveTable("customer", "cbo_customer2")
    // written order is the WORST order: fact ⋈ fact first, the selective
    // customer filter last — reorder should shrink orders via customer
    // before touching lineitem
    val q = """SELECT count(*) AS n
              |FROM cbo_lineitem2 l
              |JOIN cbo_orders2 o ON l.l_orderkey = o.o_orderkey
              |JOIN cbo_customer2 c ON o.o_custkey = c.c_custkey
              |WHERE c.c_custkey < 10""".stripMargin
    Seq("cbo_lineitem2" -> "l_orderkey", "cbo_orders2" -> "o_orderkey, o_custkey",
        "cbo_customer2" -> "c_custkey").foreach { case (t, cols) =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS $cols")
    }
    def optimized = spark.sql(q).queryExecution.optimizedPlan
    withConf(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.cbo.joinReorder.enabled" -> "false") {
      val leaves = deepestJoinLeaves(optimized)
      assert(leaves.exists(_.contains("cbo_lineitem2")) && leaves.exists(_.contains("cbo_orders2")),
        s"expected the written (worst) order without CBO, got innermost leaves: $leaves")
    }
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val leaves = deepestJoinLeaves(optimized)
      assert(leaves.exists(_.contains("cbo_customer2")),
        s"CBO join reorder did not move the selective customer join innermost: $leaves")
      assert(!(leaves.exists(_.contains("cbo_lineitem2")) && leaves.exists(_.contains("cbo_orders2"))),
        s"CBO kept the fact-fact join innermost: $leaves")
    }
  }

  test("sidecar NDV merges HLL sketches: repeated value sets across files report ~true NDV") {
    import org.apache.spark.sql.functions._
    val cat = graft.sources.GraftCatalog
    val root = s"/tmp/graft-cbo-ndv-${System.nanoTime()}"
    // the same 100 k-values in each of 4 commits: a per-file-count SUM
    // reports ~400 — the sketch union must report ~100
    for (i <- 0 until 4)
      cat.commitSnapshot(
        spark.range(100).select((col("id") % 100).as("k"),
          concat(lit("batch"), lit(i)).as("tag")),
        root, append = i > 0)
    val st = cat.snapshotCatalogStats(spark, root).get
    assert(st.rowCount.contains(BigInt(400)))
    val kNdv = st.colStats("k").distinctCount.get
    assert(kNdv >= BigInt(85) && kNdv <= BigInt(115),
      s"union NDV must be ~100, not the ~400 a per-file sum reports: $kNdv")
    // string avg/max lengths ride the same sidecar ("batch0" = 6 chars)
    val tagStats = st.colStats("tag")
    assert(tagStats.avgLen.contains(6L), s"avgLen: ${tagStats.avgLen}")
    assert(tagStats.maxLen.contains(6L), s"maxLen: ${tagStats.maxLen}")
    // a small CoW UPDATE batch goes through the SCANNING stats agg
    // (r17: footer fast path only above verbScanMaxBytes), so the
    // rewritten files carry fresh sketches and the table NDV STAYS in
    // the sketch tier with no compaction
    cat.updateSnapshotWhere(spark, root, col("k") === 5L,
      Seq("tag" -> lit("touched")))
    val kNdv2 = cat.snapshotCatalogStats(spark, root).get
      .colStats("k").distinctCount
    assert(kNdv2.isDefined, "a verb must not erase the column's NDV profile")
    assert(kNdv2.get >= BigInt(85) && kNdv2.get <= BigInt(115),
      s"post-verb NDV must stay sketch-tier ~100 (no compaction needed): $kNdv2")
  }

  test("footer-path verb degrades NDV to the tiered bound; ANALYZE restores sketch tier") {
    import org.apache.spark.sql.functions._
    val cat = graft.sources.GraftCatalog
    val root = s"/tmp/graft-cbo-anl-${System.nanoTime()}"
    for (i <- 0 until 4)
      cat.commitSnapshot(
        spark.range(100).select((col("id") % 100).as("k"),
          concat(lit("batch"), lit(i)).as("tag")),
        root, append = i > 0)
    // force the footer fast path for ANY batch size: the rewritten
    // files then carry no sketch and no NDV count
    spark.conf.set("spark.graft.stats.verbScanMaxBytes", "0")
    try cat.updateSnapshotWhere(spark, root, col("k") === 5L,
      Seq("tag" -> lit("touched")))
    finally spark.conf.unset("spark.graft.stats.verbScanMaxBytes")
    val kNdv = cat.snapshotCatalogStats(spark, root).get
      .colStats("k").distinctCount
    assert(kNdv.isDefined, "footer-path verb must not erase the NDV profile")
    assert(kNdv.get > BigInt(115) && kNdv.get <= BigInt(400),
      s"sketchless rewritten files degrade NDV to the count/row tier: $kNdv")
    // CALL graft.system.analyze re-scans exactly the sketchless files
    // and publishes a metadata-only version: sketch tier restored
    val v1 = cat.analyzeSnapshot(spark, root)
    val kNdv2 = cat.snapshotCatalogStats(spark, root).get
      .colStats("k").distinctCount.get
    assert(kNdv2 >= BigInt(85) && kNdv2 <= BigInt(115),
      s"post-analyze NDV must be back in the sketch tier: $kNdv2")
    assert(cat.readSnapshot(spark, root).count() == 400,
      "analyze must not change table content")
    // idempotent: a fully-sketched head is a zero-commit no-op
    assert(cat.analyzeSnapshot(spark, root) == v1)
  }

  test("NDV union never crosses sketch input forms (long-fed vs legacy string-fed)") {
    import graft.sources.ColStat
    val cat = graft.sources.GraftCatalog
    def b64(update: org.apache.datasketches.hll.HllSketch => Unit,
        tag: String): String = {
      val sk = new org.apache.datasketches.hll.HllSketch(10)
      update(sk)
      tag + java.util.Base64.getEncoder.encodeToString(sk.toCompactByteArray)
    }
    // the same 100 values, long-fed in one file and string-fed in the
    // other: a naive cross-form union would report ~200
    val longFed = b64(sk => (0L until 100L).foreach(sk.update), "l:")
    val strFed = b64(sk => (0 until 100).foreach(i => sk.update(i.toString)), "")
    val e1 = (100L, ColStat("k", "bigint", "0", "99", 0L, None, Some(100L), Some(longFed)))
    val e2 = (100L, ColStat("k", "bigint", "0", "99", 0L, None, Some(100L), Some(strFed)))
    val mixed = cat.unionNdvEstimate(Seq(e1, e2), rowCount = 200L).get
    assert(mixed >= BigInt(170) && mixed <= BigInt(215),
      s"off-form file must contribute its count tier (100+100), not union: $mixed")
    // same-form sketches DO union to ~100
    val same = cat.unionNdvEstimate(Seq(e1, e1), rowCount = 200L).get
    assert(same >= BigInt(85) && same <= BigInt(115), s"same-form union: $same")
  }

  test("date/timestamp min-max round-trip into plan stats; string equality gets NDV selectivity") {
    import org.apache.spark.sql.functions._
    val cat = graft.sources.GraftCatalog
    val root = s"/tmp/graft-cbo-dt-${System.nanoTime()}"
    cat.commitSnapshot(
      spark.range(1000).select(
        date_add(to_date(lit("2024-01-01")), (col("id") % 365).cast("int")).as("d"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          expr("make_interval(0, 0, 0, 0, 0, 0, id)")).as("ts"),
        concat(lit("cat"), (col("id") % 10)).as("s")),
      root, append = false)
    val st = cat.snapshotCatalogStats(spark, root).get
    val dcs = st.colStats("d")
    assert(dcs.min.isDefined && dcs.max.isDefined, s"date min/max missing: $dcs")
    // the round-trip PROOF: toPlanStat parses the external strings back
    // to internal values (a non-parse would throw / yield None)
    val dPlan = dcs.toPlanStat("d", org.apache.spark.sql.types.DateType)
    assert(dPlan.min.isDefined && dPlan.max.isDefined,
      s"date external form failed to round-trip: $dcs")
    val tcs = st.colStats("ts")
    val tPlan = tcs.toPlanStat("ts", org.apache.spark.sql.types.TimestampType)
    assert(tPlan.min.isDefined && tPlan.max.isDefined,
      s"timestamp external form failed to round-trip: $tcs")
    // string column: no min/max (no catalog form), but NDV + lengths
    val scs = st.colStats("s")
    assert(scs.min.isEmpty && scs.max.isEmpty)
    assert(scs.distinctCount.exists(n => n >= BigInt(9) && n <= BigInt(11)))
    assert(scs.avgLen.contains(4L)) // "cat0".."cat9"
  }

  test("graft catalog tables feed CBO from the stats sidecar - no ANALYZE needed") {
    val s = gspark
    // seed tables THROUGH the catalog: each commit writes its stats
    // sidecar, and that alone must power CBO (the point of this test —
    // Hive tables need an ANALYZE pass; a 100 TB graft table gets the
    // same numbers free at commit time)
    Seq("lineitem" -> "cbo_li", "orders" -> "cbo_ord", "customer" -> "cbo_cust")
      .foreach { case (src, as) =>
        s.sql(s"DROP TABLE IF EXISTS graft_cbo.db.$as")
        Tables.df(s, sf, src).writeTo(s"graft_cbo.db.$as").create()
      }
    // sidecar stats are visible on the optimized plan: rowCount + NDV
    withConfOn(s)("spark.sql.cbo.enabled" -> "true") {
      val st = s.sql("SELECT * FROM graft_cbo.db.cbo_ord")
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.exists(_ > 0), s"no rowCount from the sidecar: $st")
      assert(st.attributeStats.exists { case (a, cs) =>
        a.name == "o_orderkey" && cs.distinctCount.exists(_ > 0) },
        s"no o_orderkey NDV from the sidecar: ${st.attributeStats}")
    }
    val q = """SELECT l.l_orderkey, o.o_totalprice
              |FROM graft_cbo.db.cbo_li l
              |JOIN graft_cbo.db.cbo_ord o ON l.l_orderkey = o.o_orderkey
              |WHERE o.o_orderkey < 40""".stripMargin
    // threshold below both raw table sizes: WITHOUT the sidecar's
    // column stats the filter keeps the full size estimate → shuffle
    withConfOn(s)(
      "spark.sql.autoBroadcastJoinThreshold" -> "4096",
      "spark.sql.cbo.enabled" -> "false") {
      val before = s.sql(q).queryExecution.sparkPlan.toString
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"expected the size-only plan to shuffle:\n$before")
    }
    // WITH CBO the sidecar's min/max bound the filter's selectivity and
    // the filtered orders side broadcasts — no ANALYZE ever ran
    withConfOn(s)(
      "spark.sql.autoBroadcastJoinThreshold" -> "4096",
      "spark.sql.cbo.enabled" -> "true") {
      val after = s.sql(q).queryExecution.sparkPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"sidecar column stats did not flip the join to broadcast:\n$after")
    }
    // a selective string-equality filter gets NDV-driven (non-default)
    // selectivity from the sidecar — no ANALYZE ever ran (r16)
    withConfOn(s)("spark.sql.cbo.enabled" -> "true") {
      val full = s.sql("SELECT * FROM graft_cbo.db.cbo_ord")
        .queryExecution.optimizedPlan.stats.rowCount
      val est = s.sql(
        "SELECT * FROM graft_cbo.db.cbo_ord WHERE o_orderpriority = '1-URGENT'")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(full.exists(_ > 0) && est.isDefined,
        s"string-equality estimate missing: est=$est full=$full")
      assert(est.get * 2 <= full.get,
        s"string equality kept default selectivity: est=$est full=$full")
    }
    // 3-table reorder: written worst-first (fact ⋈ fact), the sidecar's
    // rowCounts + NDVs must move the selective customer join innermost
    val q3 = """SELECT count(*) AS n
               |FROM graft_cbo.db.cbo_li l
               |JOIN graft_cbo.db.cbo_ord o ON l.l_orderkey = o.o_orderkey
               |JOIN graft_cbo.db.cbo_cust c ON o.o_custkey = c.c_custkey
               |WHERE c.c_custkey < 10""".stripMargin
    withConfOn(s)(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      val leaves = deepestJoinLeaves(s.sql(q3).queryExecution.optimizedPlan)
      assert(leaves.exists(_.contains("cbo_cust")),
        s"sidecar-fed join reorder did not move customer innermost: $leaves")
      assert(!(leaves.exists(_.contains("cbo_li")) && leaves.exists(_.contains("cbo_ord"))),
        s"sidecar-fed CBO kept the fact-fact join innermost: $leaves")
    }
  }
}
