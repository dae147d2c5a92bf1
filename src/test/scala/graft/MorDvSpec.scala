package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** SURVEY §2.A: merge-on-read deletion vectors — scattered deletes as
  * positional sidecars with ZERO rewritten data files, DV-aware reads
  * and CoW rewrites, compaction fold-in, CDC/vacuum/time-travel/clone
  * integration. */
class MorDvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val tmp = "/tmp/graft-mordv"

  private def freshTable(prefix: String, n: Int = 1000): String = {
    val root = s"$tmp/${prefix}_${System.nanoTime()}"
    GraftCatalog.commitSnapshot(
      spark.range(n).select(col("id"), (col("id") % 7).as("grp"),
        (col("id") * 10).as("amount"))
        .repartitionByRange(4, col("id")),
      root, append = false)
    root
  }

  private def dataFiles(root: String): Seq[String] =
    GraftCatalog.snapshotScanFiles(spark, root)._1

  test("rewrite_eqdels folds equality-delete sidecars into one DV, zero data rewrite") {
    import spark.implicits._
    val root = freshTable("eqfold")
    val beforeRows = GraftCatalog.readSnapshot(spark, root).collect().toSet
    // two sidecars pile up, then a re-insert of a purged key (which
    // must survive the fold exactly as it survives the sidecar), then
    // a third sidecar whose keys match nothing
    GraftCatalog.deleteSnapshotKeysMor(spark, root, Seq(2L, 3L).toDF("id"), Seq("id"))
    GraftCatalog.deleteSnapshotKeysMor(spark, root, Seq(10L).toDF("id"), Seq("id"))
    GraftCatalog.commitSnapshot(
      Seq((2L, 2L % 7, 999L)).toDF("id", "grp", "amount"), root, append = true)
    GraftCatalog.deleteSnapshotKeysMor(spark, root,
      Seq(999999L).toDF("id"), Seq("id"))
    val filesPreFold = dataFiles(root).toSet
    val preFold = GraftCatalog.readSnapshot(spark, root).collect().toSet
    assert(preFold.size == 998) // 1000 - {2,3,10} + re-inserted 2
    val v = GraftCatalog.rewriteEqDeletesToDv(spark, root)
    // content preserved EXACTLY; same data files; no #eqdel survives
    assert(GraftCatalog.readSnapshot(spark, root).collect().toSet == preFold)
    assert(dataFiles(root).toSet == filesPreFold,
      "fold must not add/remove/rewrite any data file")
    val hist = GraftCatalog.describeSnapshotHistory(spark, root)
      .where(col("version") === v).select("meta").head().getString(0)
    assert(hist.contains("#rewrite:eqdels"))
    val (eqAfter, dvAfter) = {
      val ls = spark.read.textFile(s"$root/_manifests/v$v.manifest").collect().toSeq
      (ls.count(_.startsWith("#eqdel:")), ls.count(_.startsWith("#dv:")))
    }
    assert(eqAfter == 0, "every #eqdel line must drop")
    assert(dvAfter == 1, s"exactly one folded DV expected, got $dvAfter")
    // re-inserted key 2 is alive; originals 3 and 10 stay dead
    val ids = GraftCatalog.readSnapshot(spark, root)
      .where(col("id").isin(2L, 3L, 10L)).select("id", "amount").collect()
    assert(ids.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 999L)))
    // idempotent: nothing left to fold
    assert(GraftCatalog.rewriteEqDeletesToDv(spark, root) == v)
    // time travel to the pre-fold version still serves the sidecars
    assert(GraftCatalog.readSnapshot(spark, root, Some(v - 1)).collect().toSet == preFold)
    assert(GraftCatalog.readSnapshot(spark, root, Some(1L)).collect().toSet == beforeRows)
    // CDC: the fold is dataChange = FALSE — its version emits ZERO
    // rows (no second retraction of already-dead keys, and a tailing
    // stream steps over it instead of dying on an empty range)...
    val foldCdc = GraftCatalog.readChanges(spark, root, v - 1, v)
    assert(foldCdc.count() == 0, "eqdel→DV fold must emit no CDC rows")
    assert(foldCdc.columns.contains("_change") && foldCdc.columns.contains("_version"))
    // ...while the eqdel version itself still emits its deletes ONCE
    val eqCdc = GraftCatalog.readChanges(spark, root, 1L, 2L)
      .where(col("_change") === "delete").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(eqCdc == Set(2L, 3L), s"the eqdel's own CDC stays intact: $eqCdc")
  }

  test("MoR delete of scattered keys publishes zero rewritten data files") {
    val root = freshTable("scatter")
    val before = dataFiles(root).toSet
    // 10 single rows scattered across all 4 files — CoW would rewrite
    // every file; MoR writes one tiny sidecar
    val v = GraftCatalog.deleteSnapshotWhereMor(spark, root,
      col("id") % 100 === 37)
    assert(v == 2L)
    assert(dataFiles(root).toSet == before,
      "MoR delete must not add/remove/rewrite any data file")
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 990)
    assert(t.where(col("id") % 100 === 37).count() == 0)
    // hash-equivalence with the CoW result: same rows as a plain filter
    val expect = spark.range(1000).select(col("id"), (col("id") % 7).as("grp"),
        (col("id") * 10).as("amount"))
      .where(!(col("id") % 100 === 37)).collect().toSet
    assert(t.collect().toSet == expect)
    // time travel to the pre-delete version is untouched
    assert(GraftCatalog.readSnapshot(spark, root, Some(1L)).count() == 1000)
    // the catalyst-integrated auto read honors the DV too
    assert(GraftCatalog.readSnapshotAuto(spark, root).count() == 990)
    assert(GraftCatalog.readSnapshotAuto(spark, root)
      .where(col("grp") === 2).collect().toSet ==
      spark.range(1000).select(col("id"), (col("id") % 7).as("grp"),
          (col("id") * 10).as("amount"))
        .where(!(col("id") % 100 === 37) && col("id") % 7 === 2)
        .collect().toSet)
  }

  test("DV read is shuffle-free above the broadcast-join threshold; fallback anti-join stays correct") {
    val root = freshTable("noshuf", n = 20000)
    // DV ~6.7k scattered positions — disable the broadcast-JOIN path
    // entirely so the old anti-join formulation would HAVE to shuffle
    // the scan, then prove the broadcast-index read plans no exchange
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") % 3 === 0)
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      val top = df.queryExecution.executedPlan
      val p = top match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case other => other
      }
      p.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }.size
    }
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val scan = GraftCatalog.readSnapshot(spark, root)
      assert(shuffles(scan) == 0,
        s"DV scan must carry ZERO exchanges:\n${scan.queryExecution.executedPlan}")
      assert(scan.count() == 20000 - 6667)
      assert(scan.where(col("id") % 3 === 0).count() == 0)
      // the codegen'd probe path and the anti-join fallback agree
      spark.conf.set("spark.graft.dv.broadcastMaxPositions", "0")
      val fallback = GraftCatalog.readSnapshot(spark, root)
      assert(shuffles(fallback) > 0,
        "positions cap 0 must force the anti-join (test hook)")
      assert(fallback.count() == 20000 - 6667)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.unset("spark.graft.dv.broadcastMaxPositions")
    }
  }

  test("DVs accumulate across deletes; no-op MoR delete publishes nothing") {
    val root = freshTable("accum")
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 5L)
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 700L)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 998)
    // deleting an already-DV'd row is a no-op: head unchanged
    val head = GraftCatalog.snapshotVersions(spark, root).last
    assert(GraftCatalog.deleteSnapshotWhereMor(spark, root,
      col("id") === 5L) == head)
    assert(GraftCatalog.snapshotVersions(spark, root).last == head)
    // and a miss outside every envelope is a no-op too
    assert(GraftCatalog.deleteSnapshotWhereMor(spark, root,
      col("id") === 99999L) == head)
  }

  test("compaction folds deletion vectors into clean files") {
    val root = freshTable("fold")
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") % 250 === 3)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 996)
    GraftCatalog.compactSnapshot(spark, root)
    val head = GraftCatalog.snapshotVersions(spark, root).last
    assert(GraftCatalog.readSnapshot(spark, root).count() == 996)
    // a fresh append on the compacted head must NOT carry stale #dv
    // lines: the folded files are gone, and rows at the same positions
    // of NEW files must not be shadowed
    GraftCatalog.commitSnapshot(
      spark.range(2000, 2010).select(col("id"), (col("id") % 7).as("grp"),
        (col("id") * 10).as("amount")),
      root, append = true)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 1006)
    assert(GraftCatalog.readSnapshot(spark, root, Some(head)).count() == 996)
  }

  test("CoW verbs after a MoR delete never resurrect DV'd rows") {
    val root = freshTable("resurrect")
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 10L)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 999)
    // id=11 lives in the same file as the DV'd id=10 — the CoW update
    // rewrites that file; the rewrite must exclude id=10
    GraftCatalog.updateSnapshotWhere(spark, root, col("id") === 11L,
      Seq("amount" -> lit(0L)))
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 999, "CoW rewrite resurrected a DV-deleted row")
    assert(t.where(col("id") === 10L).count() == 0)
    assert(t.where(col("id") === 11L).head().getLong(2) == 0L)
    // CoW delete in another file: both delete kinds compose
    GraftCatalog.deleteSnapshotWhere(spark, root, col("id") === 900L)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 998)
    assert(GraftCatalog.readSnapshot(spark, root)
      .where(col("id").isin(10L, 900L)).count() == 0)
  }

  test("readChanges emits the DV'd rows as deletes at their version") {
    val root = freshTable("cdc")
    GraftCatalog.deleteSnapshotWhereMor(spark, root,
      col("id").isin(3L, 500L, 997L))
    val ch = GraftCatalog.readChanges(spark, root, 1L, 2L)
    val dels = ch.where(col("_change") === "delete")
    assert(dels.select("id").collect().map(_.getLong(0)).toSet ==
      Set(3L, 500L, 997L))
    assert(dels.select("_version").distinct().head().getLong(0) == 2L)
    assert(ch.where(col("_change") === "insert").count() == 0,
      "a MoR delete adds no files, so no insert rows")
  }

  test("vacuum keeps referenced DV sidecars and reaps orphaned ones") {
    val root = freshTable("vac")
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 1L) // v2
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 2L) // v3
    // CoW-compact to v4: folds DVs, head no longer references them
    GraftCatalog.compactSnapshot(spark, root)
    Thread.sleep(30)
    GraftCatalog.vacuumSnapshots(spark, root, keepFrom = 4L, orphanGraceMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dd = new org.apache.hadoop.fs.Path(s"$root/_deletes")
    val left = if (fs.exists(dd)) fs.listStatus(dd).length else 0
    assert(left == 0, s"orphaned DV sidecars survived vacuum: $left")
    assert(GraftCatalog.readSnapshot(spark, root).count() == 998)
  }

  test("vacuum never reaps a DV a kept version still references") {
    val root = freshTable("vackeep")
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 1L) // v2
    GraftCatalog.commitSnapshot(
      spark.range(5000, 5010).select(col("id"), (col("id") % 7).as("grp"),
        (col("id") * 10).as("amount")),
      root, append = true) // v3 carries the #dv line
    Thread.sleep(30)
    GraftCatalog.vacuumSnapshots(spark, root, keepFrom = 3L, orphanGraceMs = 0L)
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 1009)
    assert(t.where(col("id") === 1L).count() == 0,
      "vacuum reaped a DV the head still needs")
  }

  test("clone copies deletion vectors into its own root") {
    val root = freshTable("clonesrc")
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 42L)
    val dst = s"$tmp/clonedst_${System.nanoTime()}"
    GraftCatalog.cloneSnapshot(spark, root, dst)
    assert(GraftCatalog.readSnapshot(spark, dst).count() == 999)
    assert(GraftCatalog.readSnapshot(spark, dst)
      .where(col("id") === 42L).count() == 0)
    // the clone survives the source's vacuum reaping everything
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_deletes"), true)
    assert(GraftCatalog.readSnapshot(spark, dst)
      .where(col("id") === 42L).count() == 0,
      "clone must not depend on the source's _deletes dir")
  }

  test("MoR UPDATE: DV over old positions + one appended batch, zero rewrites") {
    val root = freshTable("morupd")
    val before = dataFiles(root).toSet
    GraftCatalog.updateSnapshotWhereMor(spark, root,
      col("id") % 100 === 7, Seq("amount" -> (col("amount") + 1)))
    val after = dataFiles(root).toSet
    assert(before.subsetOf(after), "MoR update must carry every old file")
    assert((after -- before).nonEmpty, "updated rows land as a new batch")
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 1000, "update must not change the row count")
    assert(t.where(col("id") === 107).head().getLong(2) == 1071L)
    assert(t.where(col("id") === 108).head().getLong(2) == 1080L)
    // equals the CoW result row-for-row
    val expect = spark.range(1000).select(col("id"), (col("id") % 7).as("grp"),
        (col("id") * 10 + when(col("id") % 100 === 7, 1L).otherwise(0L)).as("amount"))
      .collect().toSet
    assert(t.collect().toSet == expect)
    // a second MoR update composes (touches rows updated by the first)
    GraftCatalog.updateSnapshotWhereMor(spark, root,
      col("id") === 107L, Seq("amount" -> lit(0L)))
    val t2 = GraftCatalog.readSnapshot(spark, root)
    assert(t2.count() == 1000)
    assert(t2.where(col("id") === 107).head().getLong(2) == 0L)
    // no-op update publishes nothing
    val head = GraftCatalog.snapshotVersions(spark, root).last
    assert(GraftCatalog.updateSnapshotWhereMor(spark, root,
      col("id") === 99999L, Seq("amount" -> lit(1L))) == head)
  }

  test("MoR MERGE: matched keys DV'd + full batch appended; CDC shows delete+insert") {
    import spark.implicits._
    val root = freshTable("mormrg")
    val before = dataFiles(root).toSet
    val updates = Seq((5L, 0L, 999L), (2000L, 1L, 111L))
      .toDF("id", "grp", "amount")
    GraftCatalog.mergeSnapshotMor(spark, root, updates, "id")
    assert(before.subsetOf(dataFiles(root).toSet))
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 1001)
    assert(t.where(col("id") === 5).head().getLong(2) == 999L)
    assert(t.where(col("id") === 2000).head().getLong(2) == 111L)
    // CDC: the matched key is a delete+insert pair, the new key insert-only
    val ch = GraftCatalog.readChanges(spark, root, 1L, 2L)
    val byChange = ch.groupBy("_change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChange.getOrElse("delete", 0L) == 1L, s"one DV'd old row: $byChange")
    assert(byChange.getOrElse("insert", 0L) == 2L, s"two appended rows: $byChange")
  }

  test("EQUALITY delete: zero-read key purge; re-insert survives; rewrites/compaction fold") {
    import spark.implicits._
    val root = freshTable("eqdel")
    val before = dataFiles(root).toSet
    // purge 3 scattered keys by KEY LIST — no positional scan ever runs
    val v = GraftCatalog.deleteSnapshotKeysMor(spark, root,
      Seq(5L, 250L, 999L).toDF("id"), Seq("id"))
    assert(v == 2L)
    assert(dataFiles(root).toSet == before,
      "equality delete must not add/remove/rewrite any data file")
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 997 &&
      t.where(col("id").isin(5L, 250L, 999L)).isEmpty)
    assert(GraftCatalog.readSnapshotAuto(spark, root).count() == 997,
      "the auto FileIndex read path must apply equality deletes too")
    assert(GraftCatalog.readSnapshot(spark, root, Some(1L)).count() == 1000,
      "time travel to the pre-delete version stays intact")
    // CDC: the eq version emits exactly the 3 covered live rows as deletes
    val ch = GraftCatalog.readChanges(spark, root, 1L, 2L)
    assert(ch.where(col("_change") === "delete").count() == 3)
    // RE-INSERT of a purged key survives: the new batch is outside the
    // sidecar's covered set (the Iceberg sequence-number scoping)
    GraftCatalog.commitSnapshot(
      Seq((5L, 5L, 50L)).toDF("id", "grp", "amount"), root, append = true)
    val t2 = GraftCatalog.readSnapshot(spark, root)
    assert(t2.count() == 998)
    assert(t2.where(col("id") === 5L).head().getLong(2) == 50L)
    // composes with a positional MoR delete
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 7L)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 997)
    // a CoW rewrite of a covered file never resurrects the purged row
    GraftCatalog.updateSnapshotWhere(spark, root, col("id") === 251L,
      Seq("amount" -> lit(1L)))
    val t3 = GraftCatalog.readSnapshot(spark, root)
    assert(t3.where(col("id") === 250L).isEmpty,
      "the rewrite of 250's file must not resurrect the eq-deleted row")
    assert(t3.count() == 997)
    // compaction folds: clean head, no #eqdel/#dv lines, content identical
    val vc = GraftCatalog.compactSnapshot(spark, root)
    val headMeta = GraftCatalog.snapshotMeta(spark, root, vc)
    assert(!headMeta.exists(l => l.startsWith("#eqdel:") || l.startsWith("#dv:")),
      s"compaction must fold all delete sidecars: $headMeta")
    assert(GraftCatalog.readSnapshot(spark, root).count() == 997)
  }

  test("equality-delete batch wrapper lands exactly once under replay") {
    import spark.implicits._
    val root = freshTable("eqbatch", n = 100)
    val v1 = GraftCatalog.deleteSnapshotKeysBatch(spark, root,
      Seq(10L, 20L).toDF("id"), Seq("id"), batchId = 7L)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 98)
    // crash-replay of the same micro-batch: no new version, same head
    val v2 = GraftCatalog.deleteSnapshotKeysBatch(spark, root,
      Seq(10L, 20L).toDF("id"), Seq("id"), batchId = 7L)
    assert(v2 == v1 && GraftCatalog.snapshotVersions(spark, root).last == v1)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 98)
    // the next batch id applies
    GraftCatalog.deleteSnapshotKeysBatch(spark, root,
      Seq(30L).toDF("id"), Seq("id"), batchId = 8L)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 97)
  }

  test("equality deletes block dropping their key column until folded") {
    import spark.implicits._
    val root = freshTable("eqdrop", n = 100)
    GraftCatalog.deleteSnapshotKeysMor(spark, root,
      Seq(3L).toDF("grp"), Seq("grp"))
    val e = intercept[IllegalArgumentException](
      GraftCatalog.evolveSnapshotSchema(spark, root, drop = Seq("grp")))
    assert(e.getMessage.contains("equality delete"))
    GraftCatalog.compactSnapshot(spark, root)
    GraftCatalog.evolveSnapshotSchema(spark, root, drop = Seq("grp"))
    assert(!GraftCatalog.readSnapshot(spark, root).columns.contains("grp"))
  }

  test("equality deletes survive metadata-only DDL and rollback") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = freshTable("eqddl", n = 100)
    GraftCatalog.deleteSnapshotKeysMor(spark, root,
      Seq(10L, 20L).toDF("id"), Seq("id"))
    assert(GraftCatalog.readSnapshot(spark, root).count() == 98)
    // ADD COLUMN must carry the #eqdel sidecar — an unrelated ALTER
    // must never undo a key purge
    GraftCatalog.evolveSnapshotSchema(spark, root,
      add = StructType(Seq(StructField("note", StringType))))
    val t1 = GraftCatalog.readSnapshot(spark, root)
    assert(t1.count() == 98 && t1.where(col("id").isin(10L, 20L)).isEmpty,
      "ADD COLUMN dropped the equality-delete sidecar")
    // DROP of a NON-key column carries too
    GraftCatalog.evolveSnapshotSchema(spark, root, drop = Seq("note"))
    assert(GraftCatalog.readSnapshot(spark, root).count() == 98)
    // RENAME of the KEY column: the sidecar keys on the immutable
    // PHYSICAL name, so the purge survives the rename
    GraftCatalog.renameSnapshotColumn(spark, root, "id", "doc_id")
    val t2 = GraftCatalog.readSnapshot(spark, root)
    assert(t2.count() == 98 && t2.where(col("doc_id").isin(10L, 20L)).isEmpty,
      "RENAME dropped or mis-keyed the equality-delete sidecar")
    // a NEW eq delete through the renamed, differently-CASED pk must
    // resolve to the committed field and its physical storage name
    GraftCatalog.deleteSnapshotKeysMor(spark, root,
      Seq(30L).toDF("DOC_ID"), Seq("DOC_ID"))
    val t2b = GraftCatalog.readSnapshot(spark, root)
    assert(t2b.count() == 97 && t2b.where(col("doc_id") === 30L).isEmpty,
      "differently-cased pk on a renamed column must key physically")
    GraftCatalog.renameSnapshotColumn(spark, root, "doc_id", "id")
    assert(GraftCatalog.readSnapshot(spark, root).count() == 97)
    // ROLLBACK to the first post-delete version keeps ITS purge
    GraftCatalog.rollbackSnapshot(spark, root, 2L)
    val t3 = GraftCatalog.readSnapshot(spark, root)
    assert(t3.count() == 98 && t3.where(col("id").isin(10L, 20L)).isEmpty,
      "rollback dropped the equality-delete sidecar")
  }

  test("equality deletes survive type widening") {
    import spark.implicits._
    val root = s"$tmp/eqwide_${System.nanoTime()}"
    GraftCatalog.commitSnapshot(
      spark.range(100).select(col("id"),
        col("id").cast("int").as("score")), root, append = false)
    GraftCatalog.deleteSnapshotKeysMor(spark, root,
      Seq(1L, 2L).toDF("id"), Seq("id"))
    assert(GraftCatalog.readSnapshot(spark, root).count() == 98)
    GraftCatalog.widenSnapshotColumn(spark, root, "score",
      org.apache.spark.sql.types.LongType)
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.schema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(t.count() == 98 && t.where(col("id").isin(1L, 2L)).isEmpty,
      "widening dropped the equality-delete sidecar")
  }

  test("MoR MERGE schema evolution: evolved feed appends, old files read NULL, CDC intact") {
    import spark.implicits._
    val root = freshTable("morevo")
    val before = dataFiles(root).toSet
    // the feed carries a NEW column (score) — evolution admits it
    val updates = Seq((5L, 0L, 999L, 0.9), (2000L, 1L, 111L, 0.4))
      .toDF("id", "grp", "amount", "score")
    GraftCatalog.mergeSnapshotMor(spark, root, updates, "id",
      allowSchemaEvolution = true)
    assert(before.subsetOf(dataFiles(root).toSet),
      "MoR evolution must rewrite zero carried files")
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.columns.toSeq == Seq("id", "grp", "amount", "score"),
      "the committed schema must union the evolved column")
    assert(t.count() == 1001)
    // evolved rows carry the value; pre-evolution files read NULL
    assert(t.where(col("id") === 5).head().getDouble(3) == 0.9)
    assert(t.where(col("id") === 7).head().isNullAt(3),
      "old files must serve NULL for the evolved column")
    // CDC pairs intact: matched key = delete+insert, new key = insert
    val ch = GraftCatalog.readChanges(spark, root, 1L, 2L)
    val byChange = ch.groupBy("_change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChange.getOrElse("delete", 0L) == 1L, s"$byChange")
    assert(byChange.getOrElse("insert", 0L) == 2L, s"$byChange")
    // STRICT mode still clips: a feed with a column beyond the (now
    // evolved) table schema drops it rather than widening further
    GraftCatalog.mergeSnapshotMor(spark, root, Seq(
      (6L, 6L, 777L, 0.5, "junk")).toDF("id", "grp", "amount", "score", "extra"),
      "id")
    val t2 = GraftCatalog.readSnapshot(spark, root)
    assert(t2.columns.toSeq == Seq("id", "grp", "amount", "score"),
      "strict MoR merge must clip columns beyond the table schema")
    assert(t2.where(col("id") === 6).head().getDouble(3) == 0.5)
  }

  test("write mode 'mor' routes SQL DML onto the MoR verbs") {
    val root = freshTable("mode")
    GraftCatalog.setSnapshotWriteMode(spark, root, "mor")
    assert(GraftCatalog.snapshotWriteMode(spark, root) == "mor")
    val before = dataFiles(root).toSet
    graft.sources.GraftDml.sql(spark, s"DELETE FROM `$root` WHERE id % 100 = 3")
    assert(dataFiles(root).toSet == before,
      "mor-mode SQL DELETE must not rewrite data files")
    graft.sources.GraftDml.sql(spark,
      s"UPDATE `$root` SET amount = 0 WHERE id = 500")
    assert(before.subsetOf(dataFiles(root).toSet))
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 990)
    assert(t.where(col("id") === 500).head().getLong(2) == 0L)
    GraftCatalog.setSnapshotWriteMode(spark, root, "cow")
    assert(GraftCatalog.snapshotWriteMode(spark, root) == "cow")
  }

  test("DESCRIBE PARTITIONS reports LIVE rows under deletion vectors") {
    val root = s"$tmp/morpt_${System.nanoTime()}"
    GraftCatalog.setSnapshotPartitionSpec(spark, root,
      Seq(graft.sources.PartitionField("id", "bucket", 4)))
    GraftCatalog.commitSnapshot(
      spark.range(1000).select(col("id"), (col("id") % 7).as("grp"))
        .repartition(1),
      root, append = false)
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") % 100 === 0)
    val meta = GraftCatalog.describeSnapshotPartitions(spark, root)
      .agg(sum("n_rows")).head().getLong(0)
    assert(meta == 990L,
      s"partition metadata must subtract DV'd rows, got $meta")
    assert(GraftCatalog.readSnapshot(spark, root).count() == 990L)
  }

  test("SQL DELETE can choose the MoR path per-table default") {
    // the DML surface composes: MoR via the Scala verb, then SQL DML
    // (CoW) on the same table — both see the same logical content
    val root = freshTable("sqlmix")
    GraftCatalog.deleteSnapshotWhereMor(spark, root, col("id") === 77L)
    graft.sources.GraftDml.sql(spark, s"DELETE FROM `$root` WHERE grp = 6")
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.where(col("id") === 77L).count() == 0)
    assert(t.where(col("grp") === 6).count() == 0)
    // ids ≡ 6 (mod 7) in 0..999: 142; id=77 is grp 0 → 1000-142-1
    assert(t.count() == 1000 - 142 - 1)
  }
}
