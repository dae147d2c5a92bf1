package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** Manifest SEGMENTS — O(delta) commit metadata (SURVEY §2.A).
  *
  * A manifest that inlines every live data-file path is O(live files)
  * write amplification per commit; at 100 TB that is ~100 MB of
  * unchanged paths rewritten per minute-cadence append. These specs
  * drive the segment layer with tiny thresholds so small tables take
  * the segmented shape, and assert (a) every read surface is
  * byte-equivalent to the flat form, and (b) the head manifest's RAW
  * size is bounded by the DELTA, not the table. */
class ManifestSegmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val tmp = "/tmp/graft-segments"

  private def batch(lo: Int, hi: Int) = {
    val sp = spark; import sp.implicits._
    (lo to hi).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def rawLines(root: String, v: Long): Seq[String] =
    scala.io.Source.fromFile(s"$root/_manifests/v$v.manifest", "UTF-8")
      .getLines().toList.filter(_.nonEmpty)

  /** Spec-side include resolution: the version's data-file list,
    * expanded from the raw manifest + its segments. */
  private def resolvedData(root: String, v: Long): Seq[String] =
    rawLines(root, v).flatMap {
      case l if l.startsWith("#include:") =>
        scala.io.Source
          .fromFile(s"$root/_manifests/${l.stripPrefix("#include:")}", "UTF-8")
          .getLines().toList.filter(x => x.nonEmpty && !x.startsWith("#"))
      case l if !l.startsWith("#") => Seq(l)
      case _ => Seq.empty
    }

  private def segmentFiles(root: String): Seq[String] = {
    val d = new java.io.File(s"$root/_manifests")
    Option(d.list()).map(_.toSeq.filter(_.endsWith(".segment"))).getOrElse(Nil)
  }

  /** Run `body` with spec-sized segment thresholds, restoring the
    * engine defaults whatever happens. */
  private def withTinyThresholds[A](inlineMax: Int = 4, maxIncludes: Int = 3)(
      body: => A): A = {
    val (i0, m0) =
      (GraftCatalog.manifestInlineMax, GraftCatalog.manifestMaxIncludes)
    GraftCatalog.manifestInlineMax = inlineMax
    GraftCatalog.manifestMaxIncludes = maxIncludes
    try body
    finally {
      GraftCatalog.manifestInlineMax = i0
      GraftCatalog.manifestMaxIncludes = m0
    }
  }

  test("append chain: head manifest stays O(delta), reads stay exact") {
    withTinyThresholds() {
      val root = s"$tmp/chain_${System.nanoTime()}"
      // 8 files > inlineMax=4 → the overwrite itself seals a segment
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      assert(segmentFiles(root).nonEmpty,
        "an oversized inline run must seal into a segment")
      // a run of single-file appends: each publish carries the base's
      // UNRESOLVED include pointers — O(delta) per commit
      var expect = (1 to 8).map(_.toLong).toSet
      (9 to 14).foreach { i =>
        GraftCatalog.commitSnapshot(batch(i, i).coalesce(1), root, append = true)
        expect += i.toLong
        assert(ids(GraftCatalog.readSnapshot(spark, root)) == expect)
      }
      val head = GraftCatalog.snapshotVersions(spark, root).last
      val raw = rawLines(root, head)
      val inline = raw.count(l => !l.startsWith("#"))
      val includes = raw.count(_.startsWith("#include:"))
      assert(includes >= 1, "the chain must carry segment pointers")
      assert(inline <= 4,
        s"head manifest inlines $inline data lines — the delta bound is the whole point")
      // every historical version still resolves to its own exact set
      assert(ids(GraftCatalog.readSnapshot(spark, root, Some(1))) ==
        (1 to 8).map(_.toLong).toSet)
      assert(ids(GraftCatalog.readSnapshot(spark, root, Some(3))) ==
        (1 to 10).map(_.toLong).toSet)
    }
  }

  test("include-chain coalesce keeps the pointer fan-in bounded") {
    withTinyThresholds(inlineMax = 1, maxIncludes = 3) {
      val root = s"$tmp/coalesce_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 2).repartition(2), root, append = false)
      (3 to 12).foreach { i =>
        GraftCatalog.commitSnapshot(batch(i, i).coalesce(1), root, append = true)
      }
      val head = GraftCatalog.snapshotVersions(spark, root).last
      val includes = rawLines(root, head).count(_.startsWith("#include:"))
      assert(includes <= 4,
        s"found $includes include pointers — the coalesce cap must bound fan-in")
      assert(ids(GraftCatalog.readSnapshot(spark, root)) ==
        (1 to 12).map(_.toLong).toSet)
    }
  }

  test("rollback and CDC diff are exact over segmented manifests") {
    withTinyThresholds() {
      val root = s"$tmp/rollback_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 6).repartition(6), root, append = false)
      GraftCatalog.commitSnapshot(batch(7, 8).repartition(2), root, append = true)
      GraftCatalog.commitSnapshot(batch(9, 9).coalesce(1), root, append = true)
      // CDC: the v2→v3 delta over segment-carried manifests is the one batch
      val changes = GraftCatalog.readChanges(spark, root, 2, 3)
      assert(changes.select("id").collect().map(_.getLong(0)).toSet == Set(9L))
      val v4 = GraftCatalog.rollbackSnapshot(spark, root, 1)
      assert(ids(GraftCatalog.readSnapshot(spark, root, Some(v4))) ==
        (1 to 6).map(_.toLong).toSet)
      // the rollback itself republished v1's pointers, not a flat list
      assert(rawLines(root, v4).count(l => !l.startsWith("#")) <= 4)
    }
  }

  test("MoR equality delete and DV commits are O(delta) and carry through segments") {
    withTinyThresholds() {
      val root = s"$tmp/mor_${System.nanoTime()}"
      val sp = spark; import sp.implicits._
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      GraftCatalog.deleteSnapshotKeysMor(spark, root,
        Seq(3L).toDF("id"), Seq("id"))
      val headAfterDel = GraftCatalog.snapshotVersions(spark, root).last
      assert(rawLines(root, headAfterDel).count(l => !l.startsWith("#")) <= 4,
        "a zero-read key purge must not re-inline the whole file list")
      assert(ids(GraftCatalog.readSnapshot(spark, root)) ==
        ((1 to 8).map(_.toLong).toSet - 3L))
      // the eqdel fold over a segmented manifest: same content, no eqdel lines
      GraftCatalog.rewriteEqDeletesToDv(spark, root)
      val headAfterFold = GraftCatalog.snapshotVersions(spark, root).last
      assert(!rawLines(root, headAfterFold).exists(_.startsWith("#eqdel:")))
      assert(ids(GraftCatalog.readSnapshot(spark, root)) ==
        ((1 to 8).map(_.toLong).toSet - 3L))
    }
  }

  test("compaction of a segmented table re-seals; content preserved") {
    withTinyThresholds() {
      val root = s"$tmp/compact_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      (9 to 11).foreach(i =>
        GraftCatalog.commitSnapshot(batch(i, i).coalesce(1), root, append = true))
      GraftCatalog.compactSnapshot(spark, root)
      assert(ids(GraftCatalog.readSnapshot(spark, root)) ==
        (1 to 11).map(_.toLong).toSet)
    }
  }

  test("vacuum reaps segments of reaped manifests, keeps live ones") {
    withTinyThresholds() {
      val root = s"$tmp/vacuum_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      GraftCatalog.commitSnapshot(batch(100, 107).repartition(8), root, append = false)
      GraftCatalog.commitSnapshot(batch(200, 200).coalesce(1), root, append = true)
      val before = segmentFiles(root).size
      assert(before >= 2, s"expected v1's and v2's segments, saw $before")
      GraftCatalog.vacuumSnapshots(spark, root, keepFrom = 2, orphanGraceMs = 0)
      // v1 (and its segment) reaped; v2/v3 still read exactly
      assert(segmentFiles(root).size < before,
        "the vacuumed version's segment must be reaped")
      assert(ids(GraftCatalog.readSnapshot(spark, root)) ==
        ((100 to 107).map(_.toLong).toSet + 200L))
      assert(ids(GraftCatalog.readSnapshot(spark, root, Some(2))) ==
        (100 to 107).map(_.toLong).toSet)
      assertThrows[Exception](GraftCatalog.readSnapshot(spark, root, Some(1)))
    }
  }

  test("CoW verbs carry untouched segments as pointers — metadata cost ∝ touched files") {
    withTinyThresholds() {
      val root = s"$tmp/cowcarry_${System.nanoTime()}"
      val sp = spark; import sp.implicits._
      // v1 seals [1..8] into a segment; the append keeps 9 inline
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      GraftCatalog.commitSnapshot(batch(9, 9).coalesce(1), root, append = true)
      // a MERGE touching ONLY id=9's file must not re-inline the sealed segment
      GraftCatalog.mergeSnapshot(spark, root,
        Seq((9L, "updated9")).toDF("id", "payload"), "id")
      val head = GraftCatalog.snapshotVersions(spark, root).last
      val raw = rawLines(root, head)
      assert(raw.exists(_.startsWith("#include:")),
        "the untouched segment must carry as its pointer, not re-inline")
      assert(raw.count(l => !l.startsWith("#")) <= 2,
        "manifest text rewritten for a 1-file merge must be ∝ touched files")
      val got = GraftCatalog.readSnapshot(spark, root)
        .select("id", "payload").collect()
        .map(r0 => r0.getLong(0) -> r0.getString(1)).toMap
      assert(got == ((1 to 8).map(i => i.toLong -> s"row$i").toMap + (9L -> "updated9")))
      // the CoW's stats sidecar CHAINS; resolution scoped to live files
      val resolved = GraftCatalog.readStats(spark, root, head)
      assert(resolved.keySet == resolvedData(root, head).toSet,
        "the chained stats sidecar must cover exactly the live files")
    }
  }

  test("delete-where on a segmented table re-inlines only the touched segment's survivors") {
    withTinyThresholds() {
      val root = s"$tmp/cowdel_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      GraftCatalog.commitSnapshot(batch(100, 107).repartition(8), root, append = true)
      // deleting id=3 touches one file inside the FIRST segment: that
      // segment re-inlines its 7 survivors (resealed — still > inlineMax),
      // the second segment must remain pointer-carried
      val before = segmentFiles(root).toSet
      GraftCatalog.deleteSnapshotWhere(spark, root, col("id") === 3L)
      val head = GraftCatalog.snapshotVersions(spark, root).last
      val raw = rawLines(root, head)
      val carriedPointers = raw.filter(_.startsWith("#include:"))
        .map(_.stripPrefix("#include:")).toSet
      assert(carriedPointers.exists(before),
        "the untouched segment's pointer must survive the CoW commit")
      assert(ids(GraftCatalog.readSnapshot(spark, root)) ==
        ((1 to 8).map(_.toLong).toSet - 3L) ++ (100 to 107).map(_.toLong).toSet)
    }
  }

  test("append stats sidecars chain as deltas; resolution and vacuum stay exact") {
    withTinyThresholds() {
      val root = s"$tmp/statschain_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      (9 to 12).foreach(i =>
        GraftCatalog.commitSnapshot(batch(i, i).coalesce(1), root, append = true))
      val head = GraftCatalog.snapshotVersions(spark, root).last
      val statsName = rawLines(root, head)
        .find(_.startsWith("#stats:")).get.stripPrefix("#stats:")
      val statsText = scala.io.Source
        .fromFile(s"$root/_manifests/$statsName", "UTF-8").getLines().toList
      assert(statsText.take(2).exists(_.startsWith("#include:")),
        "an append's stats sidecar must chain at the base, not rewrite the world")
      assert(statsText.count(l => !l.startsWith("#")) == 1,
        "the delta sidecar must hold exactly the one new file's stats")
      // resolution covers EVERY live file — pruning is never blinded
      val live = resolvedData(root, head).toSet
      val resolved = GraftCatalog.readStats(spark, root, head)
      assert(resolved.keySet == live,
        s"resolved ${resolved.size} of ${live.size} file stats")
      // vacuum keeps the whole chain under the kept head
      GraftCatalog.vacuumSnapshots(spark, root, keepFrom = head, orphanGraceMs = 0)
      assert(GraftCatalog.readStats(spark, root, head).keySet == live,
        "vacuum must keep chain links referenced transitively by kept heads")
    }
  }

  test("stats chain flattens past the depth cap") {
    val d0 = GraftCatalog.statsMaxDepth
    GraftCatalog.statsMaxDepth = 2
    try withTinyThresholds() {
      val root = s"$tmp/statsflat_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 2).repartition(2), root, append = false)
      (3 to 7).foreach(i =>
        GraftCatalog.commitSnapshot(batch(i, i).coalesce(1), root, append = true))
      val head = GraftCatalog.snapshotVersions(spark, root).last
      val statsName = rawLines(root, head)
        .find(_.startsWith("#stats:")).get.stripPrefix("#stats:")
      val statsText = scala.io.Source
        .fromFile(s"$root/_manifests/$statsName", "UTF-8").getLines().toList
      val depth = statsText.headOption.filter(_.startsWith("#depth:"))
        .map(_.stripPrefix("#depth:").toInt).getOrElse(0)
      assert(depth <= 2, s"chain depth $depth escaped the cap")
      assert(GraftCatalog.readStats(spark, root, head).keySet ==
        resolvedData(root, head).toSet)
    } finally GraftCatalog.statsMaxDepth = d0
  }

  test("rewrite_manifests coalesces pointers and flattens the stats chain; content identical") {
    withTinyThresholds(inlineMax = 1, maxIncludes = 64) {
      val root = s"$tmp/rwman_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 3).repartition(3), root, append = false)
      (4 to 9).foreach(i =>
        GraftCatalog.commitSnapshot(batch(i, i).coalesce(1), root, append = true))
      val headBefore = GraftCatalog.snapshotVersions(spark, root).last
      val pointersBefore = rawLines(root, headBefore)
        .count(_.startsWith("#include:"))
      assert(pointersBefore >= 3, s"churn phase should fragment, saw $pointersBefore")
      val v = GraftCatalog.rewriteManifests(spark, root)
      // ONE pointer (everything resealed), flat depth-0 stats, same rows
      val raw = rawLines(root, v)
      assert(raw.count(_.startsWith("#include:")) == 1,
        "the rewrite must coalesce to a single segment")
      val statsName = raw.find(_.startsWith("#stats:")).get.stripPrefix("#stats:")
      val statsHead = scala.io.Source
        .fromFile(s"$root/_manifests/$statsName", "UTF-8").getLines().toList
      assert(!statsHead.exists(_.startsWith("#include:")),
        "the rewrite must flatten the stats chain")
      assert(ids(GraftCatalog.readSnapshot(spark, root)) ==
        (1 to 9).map(_.toLong).toSet)
      assert(GraftCatalog.readStats(spark, root, v).keySet ==
        resolvedData(root, v).toSet)
      // zero CDC rows: the rewrite is content-preserving metadata
      assert(GraftCatalog.readChanges(spark, root, headBefore, v).count() == 0)
      // time travel to the pre-rewrite head is undisturbed
      assert(ids(GraftCatalog.readSnapshot(spark, root, Some(headBefore))) ==
        (1 to 9).map(_.toLong).toSet)
    }
  }

  test("concurrent appenders race cleanly over segmented manifests") {
    withTinyThresholds(inlineMax = 2, maxIncludes = 3) {
      val root = s"$tmp/segrace_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 4).repartition(4), root, append = false)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      // 4 appenders × 3 commits each, every one retrying through the
      // claim conflict — all 12 must land with their content intact
      val writers = (0 until 4).map { w =>
        Future {
          (0 until 3).foreach { k =>
            val lo = 100 + w * 10 + k
            GraftCatalog.commitSnapshot(batch(lo, lo).coalesce(1), root,
              append = true, maxRetries = 50)
          }
        }
      }
      Await.result(Future.sequence(writers), 120.seconds)
      val expect = (1 to 4).map(_.toLong).toSet ++
        (for (w <- 0 until 4; k <- 0 until 3) yield (100 + w * 10 + k).toLong)
      assert(ids(GraftCatalog.readSnapshot(spark, root)) == expect)
      val head = GraftCatalog.snapshotVersions(spark, root).last
      assert(GraftCatalog.readStats(spark, root, head).keySet ==
        resolvedData(root, head).toSet,
        "every racer's stats chain link must survive the interleaving")
    }
  }

  test("per-table manifest.conf overrides the engine thresholds; clone inherits it") {
    // GLOBAL thresholds stay at the engine defaults — only the table's
    // own conf makes this tiny table take the segmented shape
    val root = s"$tmp/tblconf_${System.nanoTime()}"
    GraftCatalog.setSnapshotManifestConf(spark, root,
      inlineMax = Some(2), maxIncludes = Some(3), statsDepthMax = Some(2))
    GraftCatalog.commitSnapshot(batch(1, 6).repartition(6), root, append = false)
    assert(segmentFiles(root).nonEmpty,
      "the table conf must govern sealing with default globals")
    GraftCatalog.commitSnapshot(batch(7, 7).coalesce(1), root, append = true)
    val head = GraftCatalog.snapshotVersions(spark, root).last
    assert(rawLines(root, head).exists(_.startsWith("#include:")))
    assert(ids(GraftCatalog.readSnapshot(spark, root)) ==
      (1 to 7).map(_.toLong).toSet)
    // second set must refuse (create-exclusive, like bloom.conf)
    assertThrows[IllegalStateException](
      GraftCatalog.setSnapshotManifestConf(spark, root, inlineMax = Some(9)))
    // a clone inherits the conf: its own commits seal the same way
    val dst = s"$tmp/tblconf_clone_${System.nanoTime()}"
    GraftCatalog.cloneSnapshot(spark, root, dst)
    GraftCatalog.commitSnapshot(batch(100, 105).repartition(6), dst, append = false)
    assert(segmentFiles(dst).nonEmpty,
      "the cloned table must inherit manifest.conf")
    assert(ids(GraftCatalog.readSnapshot(spark, dst)) ==
      (100 to 105).map(_.toLong).toSet)
  }

  test("vacuum ABORTS when a kept version's segment is unreadable — live files never enter the dead sweep") {
    withTinyThresholds() {
      val root = s"$tmp/vacstrict_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      GraftCatalog.commitSnapshot(batch(9, 9).coalesce(1), root, append = true)
      val dataFiles = {
        val d = new java.io.File(s"$root/data")
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(d).filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
      }
      // simulate a lost/corrupt segment under the KEPT head: resolving
      // the keep set tolerantly would report zero live files for v2 and
      // the sweep would delete data still live there
      segmentFiles(root).foreach(s =>
        new java.io.File(s"$root/_manifests/$s").delete())
      Thread.sleep(30)
      assertThrows[Exception](
        GraftCatalog.vacuumSnapshots(spark, root, keepFrom = 2, orphanGraceMs = 0))
      val after = {
        val d = new java.io.File(s"$root/data")
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(d).filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
      }
      assert(after == dataFiles,
        "an aborted vacuum must not have deleted ANY data file")
    }
  }

  test("rename rewrites paths inside segments; reads follow the new root") {
    withTinyThresholds() {
      val tok = System.nanoTime()
      val root = s"$tmp/ren_src_$tok"
      val dst = s"$tmp/ren_dst_$tok"
      GraftCatalog.commitSnapshot(batch(1, 8).repartition(8), root, append = false)
      GraftCatalog.commitSnapshot(batch(9, 9).coalesce(1), root, append = true)
      GraftCatalog.renameSnapshotTable(spark, root, dst)
      assert(ids(GraftCatalog.readSnapshot(spark, dst)) ==
        (1 to 9).map(_.toLong).toSet)
      assert(ids(GraftCatalog.readSnapshot(spark, dst, Some(1))) ==
        (1 to 8).map(_.toLong).toSet)
    }
  }
}
