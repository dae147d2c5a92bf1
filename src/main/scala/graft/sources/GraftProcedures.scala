package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SQL `CALL` maintenance surface (Spark 4's DSv2 procedure SPI,
  * the Iceberg `CALL catalog.system.…` convention): every table-
  * maintenance verb a versioned format needs on a schedule — vacuum,
  * compaction (plain / z-order / partition-aware), rollback, tagging,
  * branching — runnable as one SQL text from a Thrift/notebook client:
  *
  * {{{
  *   CALL graft.system.vacuum(table => 'db.orders', keep_last => 3)
  *   CALL graft.system.compact('db.orders')
  *   CALL graft.system.compact_zorder('db.orders', 'k1,k2', 8)
  *   CALL graft.system.compact_partitioned('db.orders')
  *   CALL graft.system.rollback('db.orders', 3)
  *   CALL graft.system.tag('db.orders', 'release_v1', 3)
  *   CALL graft.system.create_branch('db.orders', 'dev')
  *   CALL graft.system.merge_branch('db.orders', 'dev')
  * }}}
  *
  * `table` is a warehouse-relative `ns….tbl` (the catalog's own
  * identifier space) or an absolute root path — so external snapshot
  * tables get the same maintenance verbs. Each procedure returns a
  * one-row result (the published version / removed count / branch
  * root) so maintenance scripts can log and pin what they produced.
  *
  * Scale note: all of these are manifest-level operations — vacuum
  * and the compactions read only sidecar stats to plan, and the data
  * I/O is exactly the rewrite each one publishes.
  */
object GraftProcedures {

  /** name → procedure, the `system` namespace the catalog serves. */
  def all: Map[String, GraftTableCatalog => UnboundProcedure] = Map(
    "vacuum" -> (c => vacuum(c)),
    "compact" -> (c => compact(c)),
    "compact_zorder" -> (c => compactZorder(c)),
    "compact_partitioned" -> (c => compactPartitioned(c)),
    "rewrite_eqdels" -> (c => rewriteEqdels(c)),
    "rewrite_manifests" -> (c => rewriteManifestsProc(c)),
    "analyze" -> (c => analyzeProc(c)),
    "rollback" -> (c => rollback(c)),
    "tag" -> (c => tag(c)),
    "create_branch" -> (c => createBranch(c)),
    "merge_branch" -> (c => mergeBranch(c)),
    "rebase_branch" -> (c => rebaseBranch(c)),
    "clone" -> (c => cloneProc(c)),
    "set_check" -> (c => setCheck(c)),
    "drop_check" -> (c => dropCheck(c)),
    "set_cursor" -> (c => setCursor(c)),
    "drop_cursor" -> (c => dropCursor(c)),
    "rename" -> (c => renameProc(c)))

  private def spark: SparkSession = SparkSession.active

  private def param(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()

  private def paramD(n: String, t: DataType, d: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(d).build()

  private def out(schema: StructType, row: InternalRow): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }).iterator()

  private val versionOut = new StructType().add("version", LongType, false)

  /** One procedure = a name, typed params, and a body over the
    * resolved snapshot root. */
  private def proc(procName: String, desc: String,
      params: Array[ProcedureParameter])(
      body: (String, InternalRow) => (StructType, InternalRow)): UnboundProcedure =
    new UnboundProcedure { self =>
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val (schema, row) = body(input.getUTF8String(0).toString, input)
            out(schema, row)
          }
        }
    }

  private def vacuum(c: GraftTableCatalog): UnboundProcedure =
    proc("vacuum",
      "remove versions older than the keep_last newest (tags pinned), " +
        "their unreferenced files, and aged orphans; older_than_ms > 0 " +
        "switches to TIME retention (commit time <= the epoch-ms cut; " +
        "the head always survives)",
      Array(param("table", StringType), paramD("keep_last", IntegerType, "3"),
        paramD("older_than_ms", LongType, "0L"))) {
      (t, in) =>
        val root = c.resolveTableArg(t)
        val olderThan = if (in.isNullAt(2)) 0L else in.getLong(2)
        val removed =
          if (olderThan > 0L)
            GraftCatalog.vacuumSnapshotsOlderThan(spark, root, olderThan)
          else {
            val keepLast = in.getInt(1)
            require(keepLast >= 1, s"keep_last must be >= 1, got $keepLast")
            val vs = GraftCatalog.snapshotVersions(spark, root)
            val keepFrom = vs.takeRight(keepLast).headOption.getOrElse(0L)
            GraftCatalog.vacuumSnapshots(spark, root, keepFrom)
          }
        (new StructType().add("removed_versions", IntegerType, false),
          InternalRow(removed))
    }

  private def compact(c: GraftTableCatalog): UnboundProcedure =
    proc("compact",
      "rewrite the head as ceil(bytes/target_bytes) files, publish as " +
        "the next version (readers of old versions keep their file lists)",
      Array(param("table", StringType),
        paramD("target_bytes", LongType, (128L * 1024 * 1024).toString + "L"))) {
      (t, in) =>
        val v = GraftCatalog.compactSnapshot(spark, c.resolveTableArg(t),
          in.getLong(1))
        (versionOut, InternalRow(v))
    }

  private def compactZorder(c: GraftTableCatalog): UnboundProcedure =
    proc("compact_zorder",
      "rewrite the head z-clustered on cols (csv) as n_files files",
      Array(param("table", StringType), param("cols", StringType),
        param("n_files", IntegerType))) { (t, in) =>
      val cols = in.getUTF8String(1).toString.split(",").map(_.trim).toSeq
      val v = GraftCatalog.compactSnapshotZOrdered(spark, c.resolveTableArg(t),
        cols, in.getInt(2))
      (versionOut, InternalRow(v))
    }

  private def compactPartitioned(c: GraftTableCatalog): UnboundProcedure =
    proc("compact_partitioned",
      "per-tuple small-file compaction honoring the hidden partition " +
        "spec; migrates retired-spec files into the active layout",
      Array(param("table", StringType),
        paramD("target_bytes", LongType, (128L * 1024 * 1024).toString + "L"),
        paramD("where", StringType, "''"))) {
      (t, in) =>
        val whereSql = if (in.isNullAt(2)) "" else in.getUTF8String(2).toString
        val v = GraftCatalog.compactSnapshotPartitioned(spark,
          c.resolveTableArg(t), in.getLong(1),
          if (whereSql.trim.isEmpty) None
          else Some(org.apache.spark.sql.functions.expr(whereSql)))
        (versionOut, InternalRow(v))
    }

  private def rewriteEqdels(c: GraftTableCatalog): UnboundProcedure =
    proc("rewrite_eqdels",
      "fold equality-delete sidecars into one positional deletion " +
        "vector (no data rewrite); reads get their sidecar-free plan back",
      Array(param("table", StringType))) { (t, in) =>
      val v = GraftCatalog.rewriteEqDeletesToDv(spark, c.resolveTableArg(t))
      (versionOut, InternalRow(v))
    }

  private def rewriteManifestsProc(c: GraftTableCatalog): UnboundProcedure =
    proc("rewrite_manifests",
      "coalesce commit metadata: resolve manifest segment pointers and " +
        "flatten the stats chain as one metadata-only commit (same file " +
        "list, zero data I/O, zero CDC rows)",
      Array(param("table", StringType))) { (t, in) =>
      val v = GraftCatalog.rewriteManifests(spark, c.resolveTableArg(t))
      (versionOut, InternalRow(v))
    }

  private def analyzeProc(c: GraftTableCatalog): UnboundProcedure =
    proc("analyze",
      "re-scan exactly the head files whose sidecar entries lack an " +
        "NDV sketch (footer-path verb batches, pre-sketch history) and " +
        "republish the same file list with the enriched sidecar — " +
        "restores sketch-tier table NDV without a compaction",
      Array(param("table", StringType))) { (t, in) =>
      val v = GraftCatalog.analyzeSnapshot(spark, c.resolveTableArg(t))
      (versionOut, InternalRow(v))
    }

  private def rollback(c: GraftTableCatalog): UnboundProcedure =
    proc("rollback",
      "republish version `to_version`'s file list as the next head " +
        "(history is append-only; nothing is deleted)",
      Array(param("table", StringType), param("to_version", LongType))) {
      (t, in) =>
        val v = GraftCatalog.rollbackSnapshot(spark, c.resolveTableArg(t),
          in.getLong(1))
        (versionOut, InternalRow(v))
    }

  private def tag(c: GraftTableCatalog): UnboundProcedure =
    proc("tag",
      "pin a version under an immutable name (vacuum-protected; " +
        "readable via VERSION AS OF '<name>' and graft_snapshot TVFs)",
      Array(param("table", StringType), param("name", StringType),
        param("version", LongType))) { (t, in) =>
      val v = in.getLong(2)
      GraftCatalog.tagSnapshot(spark, c.resolveTableArg(t),
        in.getUTF8String(1).toString, v)
      (new StructType().add("tagged_version", LongType, false), InternalRow(v))
    }

  private def setCursor(c: GraftTableCatalog): UnboundProcedure =
    proc("set_cursor",
      "register or advance a STREAM CURSOR: vacuum keeps every version " +
        ">= the pinned one (the native stream source registers its own " +
        "automatically; this is the manual spelling for external " +
        "consumers)",
      Array(param("table", StringType), param("cursor", StringType),
        param("version", LongType))) { (t, in) =>
      val v = in.getLong(2)
      GraftCatalog.setStreamCursor(spark, c.resolveTableArg(t),
        in.getUTF8String(1).toString, v)
      (new StructType().add("pinned_version", LongType, false), InternalRow(v))
    }

  private def dropCursor(c: GraftTableCatalog): UnboundProcedure =
    proc("drop_cursor",
      "the explicit override: reclaim an abandoned stream's retention " +
        "pin so vacuum can proceed (the loud resume error then guards " +
        "the stream)",
      Array(param("table", StringType), param("cursor", StringType))) {
      (t, in) =>
        val existed = GraftCatalog.dropStreamCursor(spark,
          c.resolveTableArg(t), in.getUTF8String(1).toString)
        (new StructType().add("dropped", BooleanType, false),
          InternalRow(existed))
    }

  private def createBranch(c: GraftTableCatalog): UnboundProcedure =
    proc("create_branch",
      "shallow-clone the head under a named branch root and tag the " +
        "fork base for 3-way merge",
      Array(param("table", StringType), param("name", StringType))) {
      (t, in) =>
        val root = c.resolveTableArg(t)
        val n = in.getUTF8String(1).toString
        GraftCatalog.createSnapshotBranch(spark, root, n)
        (new StructType().add("branch_root", StringType, false),
          InternalRow(UTF8String.fromString(
            GraftCatalog.snapshotBranchRoot(root, n))))
    }

  private def cloneProc(c: GraftTableCatalog): UnboundProcedure =
    proc("clone",
      "zero-copy shallow clone: the target publishes the source head's " +
        "file list (config inherited); vacuum on the source respects " +
        "clone-carried files",
      Array(param("table", StringType), param("target", StringType),
        paramD("version", LongType, "-1L"))) { (t, in) =>
      val src = c.resolveTableArg(t)
      val dst = c.resolveNewTableArg(in.getUTF8String(1).toString)
      val v = in.getLong(2)
      GraftCatalog.cloneSnapshot(spark, src, dst,
        if (v < 0) None else Some(v))
      (new StructType().add("clone_root", StringType, false),
        InternalRow(UTF8String.fromString(dst)))
    }

  private def setCheck(c: GraftTableCatalog): UnboundProcedure =
    proc("set_check",
      "add a named CHECK constraint (SQL predicate) every future batch " +
        "must satisfy; the current head is validated first",
      Array(param("table", StringType), param("name", StringType),
        param("predicate", StringType))) { (t, in) =>
      val name = in.getUTF8String(1).toString
      GraftCatalog.addSnapshotCheck(spark, c.resolveTableArg(t), name,
        in.getUTF8String(2).toString)
      (new StructType().add("check_name", StringType, false),
        InternalRow(UTF8String.fromString(name)))
    }

  private def dropCheck(c: GraftTableCatalog): UnboundProcedure =
    proc("drop_check",
      "remove a named CHECK constraint",
      Array(param("table", StringType), param("name", StringType))) {
      (t, in) =>
        val name = in.getUTF8String(1).toString
        GraftCatalog.dropSnapshotCheck(spark, c.resolveTableArg(t), name)
        (new StructType().add("check_name", StringType, false),
          InternalRow(UTF8String.fromString(name)))
    }

  private def renameProc(c: GraftTableCatalog): UnboundProcedure =
    proc("rename",
      "move the table root and migrate its path-keyed metadata " +
        "(manifests, stats, DV sidecars, branches) in one pass — the " +
        "path-addressed spelling of ALTER TABLE … RENAME TO; QUIESCED " +
        "operation (no concurrent writer)",
      Array(param("table", StringType), param("target", StringType))) {
      (t, in) =>
        val src = c.resolveTableArg(t)
        val dst = c.resolveNewTableArg(in.getUTF8String(1).toString)
        GraftCatalog.renameSnapshotTable(spark, src, dst)
        (new StructType().add("new_root", StringType, false),
          InternalRow(UTF8String.fromString(dst)))
    }

  private def mergeBranch(c: GraftTableCatalog): UnboundProcedure =
    proc("merge_branch",
      "fast-forward the table to a branch head (diverged histories " +
        "reject; use the Scala 3-way merge for those)",
      Array(param("table", StringType), param("name", StringType))) {
      (t, in) =>
        val v = GraftCatalog.mergeSnapshotBranch(spark, c.resolveTableArg(t),
          in.getUTF8String(1).toString)
        (versionOut, InternalRow(v))
    }

  private def rebaseBranch(c: GraftTableCatalog): UnboundProcedure =
    proc("rebase_branch",
      "replay a branch's row changes since its fork onto the moved " +
        "parent head (git rebase for table lines); pk keys the " +
        "reconciliation, resolve = fail|branch|parent",
      Array(param("table", StringType), param("name", StringType),
        param("pk", StringType), paramD("resolve", StringType, "'fail'"))) {
      (t, in) =>
        val v = GraftCatalog.rebaseSnapshotBranch(spark, c.resolveTableArg(t),
          in.getUTF8String(1).toString, in.getUTF8String(2).toString,
          in.getUTF8String(3).toString)
        (versionOut, InternalRow(v))
    }
}
