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

    // One warm-up query BEFORE the build timers: the first job in a
    // fresh JVM absorbs several seconds of classloading/codegen/JIT
    // that would otherwise masquerade as index-build cost (pair_cache
    // read 8.1 s cold vs ~3 s warm at sf0.1).
    once(SparkEntry.queries("q05_agg"))

    // Build-once/query-many index builds, timed EXPLICITLY and first:
    // each accessor eagerly builds (or opens, if the signature-keyed
    // layout already exists on disk) its index, so the per-query
    // medians below exclude build cost BY CONSTRUCTION rather than by
    // median-of-3 accounting (VERDICT r6 §next-6 / SURVEY §9.4). A
    // build that fails records -1 and leaves its consumers to rebuild.
    def timedBuild(f: => Any): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
    val docsDf = Tables.df(spark, sfDir, "documents")
    val builds: Seq[(String, Double)] = Seq(
      "pair_cache" -> timedBuild(graft.operators.Dedup.jaccardPairs(docsDf)),
      "dup_label_index" -> timedBuild(graft.operators.Dedup.dupLabelIndex(docsDf)),
      "lsh_layout" -> timedBuild(graft.operators.Similarity.lshIndex(spark, sfDir)),
      "ivf_layout" -> timedBuild(graft.operators.Similarity.ivfIndex(spark, sfDir)),
      "pq_codebook" -> timedBuild(graft.operators.Similarity.pqIndex(spark, sfDir)),
      "ivfpq_layout" -> timedBuild(graft.operators.Similarity.ivfpqIndex(spark, sfDir)),
      "sq8_layout" -> timedBuild(graft.operators.Similarity.sq8Index(spark, sfDir)))

    // JIT/codegen/session warm-up (not reported): one query per major
    // execution family — agg, window, join, regex/text, typed
    // Dataset/Aggregator encoders, iterative CC (localCheckpoint/RDD
    // machinery) — so the first reported member of each family doesn't
    // absorb its family's one-time codegen/JIT cost
    Seq("q05_agg", "q15_window", "q10_join_shuffle", "t02_quality",
      "q36_topn_agg", "d06_dedup_cluster")
      .foreach(q => once(SparkEntry.queries(q)))

    // Snapshot fixture pre-warm (not reported): the pooled read-only
    // tables (q133/q134/q136/q137/q141/q142) and the clone base
    // (q117 family) build on FIRST touch — warming them here means the
    // measured medians time the pruned READ / describe / join, not a
    // one-time table build landing in whichever query ran first
    // (BENCHFOCUS_r10a showed q134 at 3.7 s of which ~3.2 s was the
    // fixture build).
    Seq("q117_merge_cow", "q133_hidden_partition", "q134_partition_describe",
      "q136_bloom_prune", "q137_partitions_tvf", "q141_spec_evolution",
      "q142_spj_join")
      .foreach(q => once(SparkEntry.queries(q)))

    val results = SparkEntry.allQs.map(q => q.name -> median3(q.run))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val buildJson = builds.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"build":$buildJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
