package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Resolves READS of [[GraftTableCatalog]] tables onto the engine's
  * own read path (the Delta-catalog pattern): the catalog serves a
  * thin v2 [[GraftSnapshotTable]], and this injected rule replaces its
  * relation with [[GraftCatalog.readSnapshotAuto]]'s plan — so a SQL
  * `SELECT` through the catalog gets the identical manifest-stats file
  * pruning, hidden-partition tuple pruning, bloom-sidecar skipping and
  * deletion-vector anti-joins as the Scala surface, instead of a
  * from-scratch v2 scan re-implementing all of it. `pinned` (VERSION /
  * TIMESTAMP AS OF, resolved by the catalog's loadTable SPI) reads
  * that exact version.
  *
  * The replacement projects onto the original relation's attribute ids
  * (an `Alias(..., exprId = old.exprId)` per column), so references
  * already resolved against the v2 relation in an earlier analyzer
  * iteration stay valid.
  *
  * What it deliberately does NOT touch:
  *  - v2 write commands' `table` side (AppendData/Overwrite* handle
  *    themselves through the table's own [[org.apache.spark.sql.connector.write.V1Write]];
  *    only their `query` side is recursed);
  *  - DML targets (DeleteFromTable/UpdateTable/MergeIntoTable) —
  *    [[GraftDmlRule]] runs FIRST in the extension list and lowers
  *    them onto the CoW/MoR verbs; a non-graft DML target is not ours
  *    to rewrite.
  */
case class GraftCatalogReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    case w: V2WriteCommand => w.withNewQuery(rewrite(w.query))
    // DML nodes: the TARGET side stays untouched ([[GraftDmlRule]]
    // lowers graft targets; a non-graft target is not ours) — but a
    // graft-catalog table used as the SOURCE of someone else's MERGE,
    // or inside a DML condition subquery, must still read through the
    // engine, so those children recurse.
    case d: DeleteFromTable =>
      d.transformExpressions {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      }
    case u: UpdateTable =>
      u.transformExpressions {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      }
    case m: MergeIntoTable =>
      m.copy(sourceTable = rewrite(m.sourceTable)).transformExpressions {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      }
    case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
        if s.table.isInstanceOf[GraftSnapshotTable] =>
      // `spark.readStream.table("graft.db.t")`: serve the v1 snapshot
      // stream source (offsets = versions, cost ∝ changed files per
      // micro-batch) projected to APPEND rows — Delta's table-stream
      // semantics. With `.option("readChangeFeed", "true")` (Delta's
      // spelling) the CDC-tagged feed serves through the table
      // identifier instead: every row including deletes, plus the
      // `_change`/`_version` tag columns on top of the table schema.
      // Reader options (startAfter, maxVersionsPerBatch) pass through.
      val t = s.table.asInstanceOf[GraftSnapshotTable]
      require(t.pinned.isEmpty,
        s"cannot stream a time-travel read of ${t.fullName}")
      import scala.jdk.CollectionConverters._
      val ds = org.apache.spark.sql.execution.datasources.DataSource(
        spark, className = graft.streaming.GraftSnapshotStream.FORMAT,
        options = s.extraOptions.asScala.toMap + ("path" -> t.root))
      val v1 = org.apache.spark.sql.execution.streaming.runtime
        .StreamingRelation(ds)
      val byName = v1.output
        .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
      val tableCols = s.output.map { o =>
        Alias(byName(o.name.toLowerCase(java.util.Locale.ROOT)), o.name)(
          exprId = o.exprId)
      }
      if (s.extraOptions.getBoolean("readChangeFeed", false)) {
        // CDC mode: table columns keep the relation's attribute ids;
        // the tag columns append with fresh ids and resolve by name in
        // later analyzer iterations.
        val tagCols = v1.output.filterNot(a =>
          s.output.exists(_.name.equalsIgnoreCase(a.name)))
        Project(tableCols ++ tagCols, v1)
      } else
        Project(tableCols,
          Filter(org.apache.spark.sql.catalyst.expressions.EqualTo(
            byName("_change"),
            org.apache.spark.sql.catalyst.expressions.Literal("insert")), v1))
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSnapshotTable] =>
      val t = r.table.asInstanceOf[GraftSnapshotTable]
      val read = GraftCatalog.readSnapshotAuto(spark, t.root, t.pinned)
      val analyzed0 = read.queryExecution.analyzed
      // CBO bridge: stamp the table's DATA-file relation (not DV/eqdel
      // sidecar scans) with the stats sidecar's rowCount + per-column
      // min/max/nulls/NDV, so FilterEstimation / join reordering /
      // broadcast decisions see real numbers instead of raw file
      // bytes. Zero extra I/O — the sidecar is already parsed. Any
      // stamping failure falls back to the unstamped plan: stats are
      // an optimization, never a correctness dependency.
      val analyzed = scala.util.Try {
        GraftCatalog.snapshotCatalogStats(spark, t.root, t.pinned) match {
          case None => analyzed0
          case Some(st) =>
            val rootStripped = org.apache.hadoop.fs.Path
              .getPathWithoutSchemeAndAuthority(
                new org.apache.hadoop.fs.Path(t.root)).toString
            // the table's own scan lists the root or files under
            // root/data; DV/eqdel sidecar scans live under
            // root/_deletes and must NOT carry table-level stats
            def isTableData(p: org.apache.hadoop.fs.Path): Boolean = {
              val s = org.apache.hadoop.fs.Path
                .getPathWithoutSchemeAndAuthority(p).toString
              (s == rootStripped || s.startsWith(rootStripped + "/")) &&
                !s.startsWith(rootStripped + "/_deletes")
            }
            val ct = org.apache.spark.sql.catalyst.catalog.CatalogTable(
              identifier = org.apache.spark.sql.catalyst.TableIdentifier(t.name()),
              tableType = org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
              storage = org.apache.spark.sql.catalyst.catalog.CatalogStorageFormat.empty,
              schema = t.schema(), provider = Some("graft"),
              stats = Some(st))
            analyzed0.transform {
              case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
                  if lr.catalogTable.isEmpty &&
                    lr.relation.isInstanceOf[
                      org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
                    lr.relation.asInstanceOf[
                        org.apache.spark.sql.execution.datasources.HadoopFsRelation]
                      .location.rootPaths.forall(isTableData) =>
                lr.copy(catalogTable = Some(ct))
            }
        }
      }.getOrElse(analyzed0)
      val byName = analyzed.output
        .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
      Project(r.output.map { o =>
        Alias(byName(o.name.toLowerCase(java.util.Locale.ROOT)), o.name)(
          exprId = o.exprId)
      }, analyzed)
    case other =>
      other.mapChildren(rewrite).transformExpressions {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      }
  }
}
