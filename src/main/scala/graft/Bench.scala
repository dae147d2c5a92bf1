package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is fully materialized through the `noop` sink — a bare
  * count() would let Catalyst prune the query down to a metadata scan
  * and time nothing. Each query runs 3 times and reports the MEDIAN:
  * round-1's single-shot harness attributed one-off GC/compile storms
  * to whichever query ran next (63 s of phantom regression). Failures
  * are reported explicitly in a "failed" list — a -1 can't silently
  * shrink the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    def median3(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val ts = Seq.fill(3)(once(fn))
      if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(1)
    }

    // JIT/codegen/session warm-up (not reported): one query per major
    // execution family — agg, window, join, regex/text, typed
    // Dataset/Aggregator encoders, iterative CC (localCheckpoint/RDD
    // machinery) — so the first reported member of each family doesn't
    // absorb its family's one-time codegen/JIT cost
    Seq("q05_agg", "q15_window", "q10_join_shuffle", "t02_quality",
      "q36_topn_agg", "d06_dedup_cluster")
      .foreach(q => once(SparkEntry.queries(q)))

    val results = SparkEntry.allQs.map(q => q.name -> median3(q.run))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
