package graft
import org.apache.spark.sql.SparkSession

/** Idle-host re-measure tool for individual bench queries.
  * Usage: runMain graft.BenchFocus q1 q2 ... (defaults below).
  * Prints one JSON line: {"sf":"<dir>","queries":{"name":[t1,t2,t3],...},"median":{...}}
  * Reads SPARK_GRAFT_SF_DIR like Bench, falling back to the local sf0.1 dir.
  */
object BenchFocus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val targets =
      if (args.nonEmpty) args.toSeq
      else Seq("p07_e2e_pipeline", "q58_listagg", "t05_pii_redact", "q56_conditional_agg", "t04_fingerprint", "t06_bigram_freq")
    // Warm the JVM/codegen/scan caches on queries NOT under measurement.
    Seq("q05_agg", "q15_window", "q10_join_shuffle").foreach(once)
    val results = targets.map { q =>
      val ts = Seq.fill(3)(once(q))
      println(f"FOCUS $q: ${ts.map(t => f"$t%.2f").mkString(" ")}")
      q -> ts
    }
    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    // AMBIENT-NOISE CONTROLS — see [[BenchControls]] (shared with the
    // driver Bench since r17; references are r14 idle-host sf0.1).
    val controls = BenchControls.refs.map { case (q, ref) =>
      val m = results.find(_._1 == q).map(r => med(r._2))
        .getOrElse(med(Seq.fill(3)(once(q))))
      (q, m, ref)
    }
    val ambient = math.exp(
      controls.map { case (_, m, ref) => math.log(m / ref) }.sum / controls.size)
    val cJson = controls.map { case (q, m, ref) =>
      s""""$q":{"median":${BenchControls.num(m, 3)},"ref_r14":$ref}""" }.mkString(",")
    val qJson = results.map { case (q, ts) => s""""$q":[${ts.map(t => BenchControls.num(t, 3)).mkString(",")}]""" }.mkString(",")
    val mJson = results.map { case (q, ts) => s""""$q":${BenchControls.num(med(ts), 3)}""" }.mkString(",")
    println(s"""{"sf":"$sfDir","queries":{$qJson},"median":{$mJson},""" +
      s""""controls":{$cJson,"ambient_index":${BenchControls.num(ambient, 3)}}}""")
    spark.stop()
  }
}
