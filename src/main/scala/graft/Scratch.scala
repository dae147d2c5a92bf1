package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("q05_agg", "d01_dedup_exact").foreach(once)
    for (q <- Seq("p07_e2e_pipeline", "s05_ann_rerank", "d09_dedup_calibrate", "q58_listagg", "q60_locf", "q64_time_weighted_avg")) {
      val ts = Seq.fill(3)(once(q)).map(t => f"$t%.2f")
      println(s"FOCUS $q: ${ts.mkString(" ")}")
    }
    spark.stop()
  }
}
