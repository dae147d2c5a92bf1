package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SketchMv

/** The sketch-MV contract: HLL partial states persisted per batch must
  * merge to the direct full-scan sketch's answer (within the sketch's
  * published error), and absorbing a new batch must be a pure
  * sketch-the-delta + union — never a rescan. lgConfigK defaults to 12
  * → relative standard error 1.04/√4096 ≈ 1.6%; the floor here is 5%
  * (≈3σ), the same style of bound PipelineSpec puts on q34. */
class SketchMvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def orders = Tables.df(spark, sf, "orders")
  private val month = date_format(col("o_orderdate"), "yyyy-MM")

  test("persisted partials merge to the direct sketch within the published error bound") {
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val direct = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("e"))
      .head().getLong(0)
    // the MV path: partial states through a BINARY parquet round-trip
    val dir = s"/tmp/graft-sketchmv/parts_${System.nanoTime()}"
    SketchMv.partials(orders, month, col("o_custkey"))
      .write.mode("overwrite").parquet(dir)
    val got = SketchMv.mergedEstimate(spark.read.parquet(dir)).head()
    val merged = got.getLong(0)
    assert(got.getLong(1) == orders.count(), "MV row accounting broke")
    assert(math.abs(direct - exact) <= 0.05 * exact, s"direct $direct vs exact $exact")
    assert(math.abs(merged - exact) <= 0.05 * exact, s"merged $merged vs exact $exact")
    assert(math.abs(merged - direct) <= 0.02 * math.max(direct, 1),
      s"merge-of-parts $merged drifted from direct $direct")
  }

  test("absorbing a delta batch = sketch the delta + union, matching a full rebuild") {
    // split on the batch boundary: the stored MV's partial rows and the
    // rebuilt table's partial rows cover the same per-month data, so
    // the merged estimates must agree up to the estimator's documented
    // order sensitivity (the Datasketches union HIP accumulator is
    // absorption-order dependent — observed ~1% here), and both must
    // sit inside the published bound of the exact answer.
    val cutoff = "1997-01-01"
    val dir = s"/tmp/graft-sketchmv/mv0_${System.nanoTime()}"
    SketchMv.partials(orders.where(col("o_orderdate") < cutoff), month, col("o_custkey"))
      .write.mode("overwrite").parquet(dir)
    val delta = SketchMv.partials(
      orders.where(col("o_orderdate") >= cutoff), month, col("o_custkey"))
    val incremental = SketchMv
      .mergedEstimate(spark.read.parquet(dir).unionByName(delta))
      .head().getLong(0)
    val rebuild = SketchMv
      .mergedEstimate(SketchMv.partials(orders, month, col("o_custkey")))
      .head().getLong(0)
    assert(math.abs(incremental - rebuild) <= 0.02 * rebuild,
      s"incremental $incremental drifted from full rebuild $rebuild")
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(incremental - exact) <= 0.05 * exact,
      s"incremental $incremental vs exact $exact")
  }

  test("streaming partials keep the live distinct-count card within bound after every batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = s"/tmp/graft-sketchmv/stream_${System.nanoTime()}"
    val ms = MemoryStream[(String, Long)]
    val q = SketchMv.streamingPartials(
        ms.toDF().toDF("etype", "user_id"), col("etype"), col("user_id"), dir)
      .option("checkpointLocation", dir + "_ckpt").start()
    val seen = scala.collection.mutable.Set.empty[Long]
    try {
      // overlapping user populations across batches: the card must
      // count each user once however many batches it appears in
      for ((lo, hi) <- Seq((0L, 4000L), (2000L, 7000L), (5000L, 9000L))) {
        ms.addData((lo until hi).map(u => (s"t${u % 3}", u)))
        q.processAllAvailable()
        seen ++= (lo until hi)
        val est = SketchMv.mergedEstimate(spark.read.parquet(dir)).head().getLong(0)
        assert(math.abs(est - seen.size) <= 0.05 * seen.size,
          s"card says $est, truth ${seen.size}")
      }
    } finally q.stop()
    // at-least-once redelivery: rewriting batch 1's partials in place
    // must leave the card unchanged (keyed overwrite, not append)
    val before = SketchMv.mergedEstimate(spark.read.parquet(dir)).head().getLong(0)
    SketchMv.partials(
        (2000L until 7000L).map(u => (s"t${u % 3}", u)).toDF("etype", "user_id"),
        col("etype"), col("user_id"))
      .write.mode("overwrite").parquet(s"$dir/batch_id=1")
    val after = SketchMv.mergedEstimate(spark.read.parquet(dir)).head().getLong(0)
    assert(after == before, s"replay changed the card: $before -> $after")
  }

  test("q103 ALL row is the merge of its own per-month partials") {
    val out = SparkEntry.queries("q103_sketch_mv")(spark, sf).collect()
    val all = out.filter(_.getString(0) == "ALL")
    assert(all.length == 1 && out.length > 12, s"got ${out.length} rows")
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(all.head.getLong(1) - exact) <= 0.05 * exact)
    // per-month estimates bound their months too
    val exactPer = orders.groupBy(month.as("m"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.filter(_.getString(0) != "ALL").foreach { r =>
      val e = exactPer(r.getString(0))
      assert(math.abs(r.getLong(1) - e) <= math.max(0.05 * e, 2.0), s"month ${r.getString(0)}")
    }
  }
}
