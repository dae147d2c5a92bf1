package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class ScratchDebug extends AnyFunSuite {
  test("debug rule stamping") {
    TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val wh = s"/tmp/graft-dbg-wh-${System.nanoTime()}"
    val s = SparkSession.builder().master("local[4]").appName("dbg")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.sql.catalog.gdbg", "graft.sources.GraftTableCatalog")
      .config("spark.sql.catalog.gdbg.warehouse", wh)
      .getOrCreate()
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdbg.db")
    Tables.df(s, TestSpark.sf, "orders").writeTo("gdbg.db.dbg_ord").create()
    s.conf.set("spark.sql.cbo.enabled", "true")
    val df = s.sql("SELECT * FROM gdbg.db.dbg_ord")
    val an = df.queryExecution.analyzed
    an.foreach {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        println(s"DBG lr.catalogTable=${lr.catalogTable.map(_.stats)}")
        val hfs = lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        println(s"DBG roots=${hfs.location.rootPaths.take(2).toList}")
      case o => ()
    }
    println(s"DBG stats=${df.queryExecution.optimizedPlan.stats}")
    val root = s"$wh/db/dbg_ord"
    println(s"DBG versions=${graft.sources.GraftCatalog.snapshotVersions(s, root)}")
    val files = graft.sources.GraftCatalog.snapshotScanFiles(s, root)._1
    println(s"DBG nfiles=${files.size} f0=${files.headOption}")
    val st = graft.sources.GraftCatalog.readStats(s, root, graft.sources.GraftCatalog.snapshotVersions(s, root).last)
    println(s"DBG statsKeys=${st.keys.take(2).toList} allCovered=${files.forall(st.contains)}")
    println(s"DBG direct=${graft.sources.GraftCatalog.snapshotCatalogStats(s, root, None)}")
    SparkSession.setActiveSession(TestSpark.spark)
    SparkSession.setDefaultSession(TestSpark.spark)
  }
}
