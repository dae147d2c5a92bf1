package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for the spec suite (one JVM, suites run
  * serially — see build.sbt). */
object TestSpark {
  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
