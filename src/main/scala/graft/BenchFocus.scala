package graft
import org.apache.spark.sql.SparkSession
object BenchFocus {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("q05_agg", "q15_window", "q10_join_shuffle").foreach(once)
    for (q <- Seq("q38_cube", "q39_unpivot", "q40_range_join", "q41_grouping_sets", "q50_stats_moments", "p07_e2e_pipeline", "d06_dedup_cluster", "d08_dedup_keep_best")) {
      val ts = Seq.fill(3)(once(q)).map(t => f"$t%.2f")
      println(s"FOCUS $q: ${ts.mkString(" ")}")
    }
    spark.stop()
  }
}
