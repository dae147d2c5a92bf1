package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** SURVEY §2.A: sources, sinks, and the information-schema surface
  * (reference docs/1 + docs/2). */
class SourcesCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private val tmp = "/tmp/graft-sources"

  test("csv sink + source round-trip with header and schema inference") {
    val region = Tables.df(spark, sf, "region")
    GraftCatalog.writeCsv(region, s"$tmp/region_csv")
    val back = GraftCatalog.registerCsv(spark, "region_csv", s"$tmp/region_csv")
    assert(back.count() == region.count())
    assert(back.columns.toSeq == region.columns.toSeq)
    assert(spark.table("region_csv").where(col("r_regionkey") === 0).count() == 1)
  }

  test("multi-file parquet directory registers as one table") {
    val nation = Tables.df(spark, sf, "nation")
    nation.where(col("n_nationkey") < 12).write.mode("overwrite")
      .parquet(s"$tmp/nation_dir/part_a")
    nation.where(col("n_nationkey") >= 12).write.mode("overwrite")
      .parquet(s"$tmp/nation_dir/part_b")
    val df = GraftCatalog.registerParquet(
      spark, "nation_dir", s"$tmp/nation_dir/part_*")
    assert(df.count() == nation.count())
  }

  test("values + insert analog") {
    import spark.implicits._
    GraftCatalog.registerValues(spark, "manual",
      Seq(("A", "dev"), ("B", "prod")).toDF("dkey", "env"))
    val merged = GraftCatalog.insertInto(spark, "manual",
      Seq(("C", "prod")).toDF("dkey", "env"))
    assert(merged.count() == 3)
    assert(spark.table("manual").count() == 3)
  }

  test("bucketed+sorted table (WITH ORDER analog) joins without exchange on the bucket key") {
    val orders = Tables.df(spark, sf, "orders")
    // the in-memory catalog is per-session: a leftover warehouse dir from
    // an earlier JVM would block Overwrite, so clear both
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft-warehouse/orders_bkt"))
    GraftCatalog.writeBucketedSorted(orders, "orders_bkt", "o_custkey",
      Seq("o_custkey", "o_orderdate"), buckets = 8)
    val t = spark.table("orders_bkt")
    assert(t.count() == orders.count())
    // self-aggregation on the bucket key: no shuffle exchange needed
    val agged = t.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val plan = plans.PlanInspector.physical(agged).toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket pruning failed, plan still shuffles:\n$plan")
  }

  test("hive-partitioned layout prunes partitions at the scan") {
    val ev = Tables.df(spark, sf, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$tmp/events_by_day")
    val part = spark.read.parquet(s"$tmp/events_by_day")
      .where(col("day") === "2024-01-05")
    val plan = plans.PlanInspector.formatted(part)
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"no partition filter in scan:\n$plan")
    // pruned read touches exactly the one day
    val expected = ev.where(col("day") === "2024-01-05").count()
    assert(part.count() == expected && expected > 0)
  }

  test("information schema: tables, columns, settings") {
    Tables.ensure(spark, sf)
    val tbls = GraftCatalog.tables(spark).collect().map(_.getAs[String]("tableName")).toSet
    assert(Set("region", "nation", "lineitem").subsetOf(tbls))
    val cols = GraftCatalog.columns(spark, "region").collect().map(_.getString(0)).toSet
    assert(cols.contains("r_regionkey"))
    val st = GraftCatalog.settings(spark, "shuffle.partitions").collect()
    assert(st.exists(_.getString(0) == "spark.sql.shuffle.partitions"))
  }
}
