package graft

/** Local iteration tool: print the executed plan of one or more driver
  * queries. `runMain graft.ExplainQ <sfDir> <name>[,<name>…]`. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = (args(0), args(1).split(','))
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // force AQE final plan
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
