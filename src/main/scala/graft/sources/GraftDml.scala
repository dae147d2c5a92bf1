package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** SQL-parsed DML over snapshot tables: `MERGE INTO` / `UPDATE` /
  * `DELETE FROM` statements lowered onto the existing copy-on-write
  * verbs ([[GraftCatalog.mergeSnapshot]] /
  * [[GraftCatalog.updateSnapshotWhere]] /
  * [[GraftCatalog.deleteSnapshotWhere]]).
  *
  * Spark's OWN parser already produces `DeleteFromTable` /
  * `UpdateTable` / `MergeIntoTable` logical plans for these statements
  * (they just have no v1 execution path), so there is no custom
  * grammar anywhere — the engine intercepts the catalyst plans and
  * rewrites them into `LeafRunnableCommand`s. Two entry paths share
  * one lowering:
  *
  *  - [[GraftDml.sql]]: parse + lower + run on ANY session (the
  *    driver/test path — no session-construction opt-in needed);
  *  - [[graft.GraftExtensions]] injects [[GraftDmlRule]] as a
  *    resolution rule, so a pure-SQL client (Thrift / Connect /
  *    notebook `spark.sql`) mutates versioned tables with zero Scala
  *    call sites.
  *
  * Target addressing, both registration-free and registered:
  *  - a BACKTICKED ROOT PATH is its own address:
  *    {{{ DELETE FROM `/data/orders` WHERE o_status = 'X' }}}
  *    (accepted iff the path has a published snapshot version);
  *  - [[GraftDml.registerSnapshotTable]] binds a name to a root AND
  *    maintains a same-named temp view for reads, refreshed after
  *    every DML so `SELECT`s observe the new head.
  *
  * Each statement returns one row `(version BIGINT)` — the snapshot
  * version the mutation published (or the unchanged head when nothing
  * matched), so scripts can pin/tag exactly what they produced.
  *
  * Reference anchor: the reference engine has no DML surface at all
  * (docs/2 registers external tables read-only); this is part of the
  * snapshot-format extension (SURVEY §2.A), modeled on Delta/Iceberg
  * SQL semantics.
  */
object GraftDml {

  /** Opaque holder for expressions a command carries to RUN time.
    * The conditions/assignments are intentionally unresolved until the
    * CoW verb applies them to the snapshot's own DataFrame — but
    * `QueryPlan.expressions` discovers any `Expression`-typed product
    * element, and CheckAnalysis would reject the (correctly)
    * unresolved attributes at analysis time. A non-Expression wrapper
    * keeps them out of the tree walk. */
  final case class Raw(e: Expression)

  /** (session, lowercase name) → snapshot root. Session-scoped like the
    * temp-view namespace it mirrors. */
  private val tables = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Bind `name` to a snapshot root for DML AND (when the table has a
    * published version) create/refresh a same-named temp view for
    * reads. */
  def registerSnapshotTable(spark: SparkSession, name: String,
      root: String): Unit = {
    tables.put((spark, name.toLowerCase(java.util.Locale.ROOT)), root)
    refreshView(spark, name, root)
  }

  def unregisterSnapshotTable(spark: SparkSession, name: String): Unit = {
    tables.remove((spark, name.toLowerCase(java.util.Locale.ROOT)))
    spark.catalog.dropTempView(name)
  }

  private[sources] def refreshView(spark: SparkSession, name: String,
      root: String): Unit =
    if (GraftCatalog.snapshotVersions(spark, root).nonEmpty)
      GraftCatalog.readSnapshotAuto(spark, root).createOrReplaceTempView(name)

  /** Resolve a DML target's snapshot root: a registered name, or a
    * backticked root path (absolute or URI) that actually holds a
    * snapshot table. `None` → not ours, leave the plan alone. */
  private def rootForName(spark: SparkSession, name: String): Option[String] =
    Option(tables.get((spark, name.toLowerCase(java.util.Locale.ROOT))))
      .orElse {
        if ((name.startsWith("/") || name.contains("://")) &&
            scala.util.Try(GraftCatalog.snapshotVersions(spark, name))
              .toOption.exists(_.nonEmpty)) Some(name)
        else None
      }

  /** The (root, registered-view-name) of a DML target plan. Matches the
    * pre-resolution `UnresolvedRelation`, the post-view-resolution
    * `SubqueryAlias(name, …)`, and the catalog-resolved
    * [[GraftSnapshotTable]] relation shapes — extension-injected rules
    * run in the analyzer's fixed-point Resolution batch, so any can
    * appear first. */
  private def targetRoot(spark: SparkSession,
      plan: LogicalPlan): Option[(String, Option[String])] = plan match {
    case u: UnresolvedRelation if u.multipartIdentifier.size == 1 =>
      val n = u.multipartIdentifier.head
      rootForName(spark, n).map(r => (r, Some(n).filter(_ => !n.startsWith("/") && !n.contains("://"))))
    case u: UnresolvedRelation =>
      // `graft.db.t` spellings: resolve through the session's own
      // catalog plugin (the DML rule also runs in the pre-resolution
      // Hints batch, so catalog targets lower BEFORE builtin star
      // expansion imposes its name-matched-source semantics)
      catalogIdentRoot(spark, u.multipartIdentifier).map(r => (r, None))
    case a: SubqueryAlias =>
      targetRoot(spark, a.child).orElse {
        val n = a.alias
        rootForName(spark, n)
          .map(r => (r, Some(n).filter(_ => !n.startsWith("/") && !n.contains("://"))))
      }
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[GraftSnapshotTable] =>
      val t = r.table.asInstanceOf[GraftSnapshotTable]
      require(t.pinned.isEmpty,
        s"cannot run DML against a time-travel read of ${t.fullName}")
      // no temp view to refresh: catalog reads re-resolve the head
      // through loadTable on every query
      Some((t.root, None))
    case _ => None
  }

  /** The snapshot root of a multipart `catalog.ns….table` identifier
    * whose head names a [[GraftTableCatalog]] on this session; None
    * when the catalog or table is absent (Spark's own resolution then
    * produces the canonical error). */
  private def catalogIdentRoot(spark: SparkSession,
      parts: Seq[String]): Option[String] =
    if (parts.size < 2) None
    else scala.util.Try(
      spark.sessionState.catalogManager.catalog(parts.head)).toOption
      .collect { case g: GraftTableCatalog => g }
      .flatMap(_.tableRootOf(parts.tail))

  /** True when an INSERT target is a catalog-resolved snapshot table —
    * those inserts stay on Spark's NATIVE v2 path (AppendData over the
    * table's own V1Write), which applies positional column alignment
    * and casts before [[GraftCatalog.commitSnapshot]]; lowering them
    * here would skip that alignment. */
  private def isCatalogTarget(spark: SparkSession,
      plan: LogicalPlan): Boolean = plan match {
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      r.table.isInstanceOf[GraftSnapshotTable]
    case u: UnresolvedRelation =>
      catalogIdentRoot(spark, u.multipartIdentifier).isDefined
    case a: SubqueryAlias => isCatalogTarget(spark, a.child)
    case _ => false
  }

  private def colName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case a: AttributeReference => a.name
    case other => throw new IllegalArgumentException(
      s"expected a column reference, got: ${other.sql}")
  }

  /** Catalog-resolved DML targets arrive with conditions/assignments
    * ALREADY resolved against the v2 relation (builtin resolution runs
    * before extension rules each iteration) — but the commands apply
    * them to the verb's own `readSnapshot` DataFrame at run time, where
    * those exprIds mean nothing. Re-open every attribute to its name so
    * runtime analysis re-binds against the actual read. Registered-name
    * / backticked targets are never builtin-resolvable, so for them
    * this is the identity. */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  }

  /** Lower a parsed DML plan onto a runnable command; `None` when the
    * plan is not a DML statement against a snapshot table. */
  private[graft] def lower(spark: SparkSession,
      plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case DeleteFromTable(t, cond) =>
      targetRoot(spark, t).map { case (root, view) =>
        GraftDeleteCommand(root, view, GraftDml.Raw(unresolve(cond)))
      }
    case UpdateTable(t, assignments, cond) =>
      targetRoot(spark, t).map { case (root, view) =>
        val set = assignments.map(a =>
          colName(a.key) -> GraftDml.Raw(unresolve(a.value)))
        GraftUpdateCommand(root, view, set,
          GraftDml.Raw(unresolve(cond.getOrElse(Literal.TrueLiteral))))
      }
    case ins: InsertIntoStatement if !isCatalogTarget(spark, ins.table) =>
      targetRoot(spark, ins.table).map { case (root, view) =>
        require(ins.partitionSpec.isEmpty && !ins.ifPartitionNotExists,
          "snapshot tables use HIDDEN partitioning — INSERT has no " +
            "PARTITION clause (the table derives tuples itself)")
        require(ins.userSpecifiedCols.isEmpty,
          "INSERT with an explicit column list is not supported on " +
            "snapshot tables — project in the SELECT instead")
        GraftInsertCommand(root, view, ins.query, ins.overwrite)
      }
    case m: MergeIntoTable =>
      targetRoot(spark, m.targetTable).map { case (root, view) =>
        // mergeSnapshot is a full-row upsert by key — require exactly
        // that statement shape and reject the rest loudly (a silent
        // partial lowering would be a wrong-answer machine):
        //   MERGE INTO t USING s ON t.k = s.k
        //   WHEN MATCHED THEN UPDATE SET *
        //   WHEN NOT MATCHED THEN INSERT *
        // Resolve which equality side is the TARGET's key and which
        // the source's: same-named keys are unambiguous; differently
        // named keys (the common CDC-feed shape `t.k = s.src_k`)
        // resolve by the statement's own aliases/table names as
        // qualifiers. Ambiguous spellings reject loudly.
        def aliasNamesOf(pl: LogicalPlan): Set[String] = pl match {
          case a: SubqueryAlias =>
            Set(a.alias.toLowerCase(java.util.Locale.ROOT)) ++ aliasNamesOf(a.child)
          case u: UnresolvedRelation =>
            Set(u.multipartIdentifier.last.toLowerCase(java.util.Locale.ROOT))
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
              if r.table.isInstanceOf[GraftSnapshotTable] =>
            Set(r.table.asInstanceOf[GraftSnapshotTable].fullName
              .split('.').last.toLowerCase(java.util.Locale.ROOT))
          case _ => Set.empty
        }
        val tNames = aliasNamesOf(m.targetTable)
        val sNames = aliasNamesOf(m.sourceTable)
        def qualOf(e: Expression): Option[String] = e match {
          case a: UnresolvedAttribute if a.nameParts.size >= 2 =>
            Some(a.nameParts(a.nameParts.size - 2)
              .toLowerCase(java.util.Locale.ROOT))
          case _ => None
        }
        // catalog-resolved targets: the condition's sides are already
        // AttributeReferences — side membership is exprId-exact
        val tIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
          if (m.targetTable.resolved) m.targetTable.output.map(_.exprId).toSet
          else Set.empty
        def resolveByQualifier(l: Expression, r: Expression,
            ln: String, rn: String): (String, String) =
          (qualOf(l), qualOf(r)) match {
            case (Some(lq), _) if tNames(lq) => (ln, rn)
            case (_, Some(rq)) if tNames(rq) => (rn, ln)
            case (Some(lq), _) if sNames(lq) => (rn, ln)
            case (_, Some(rq)) if sNames(rq) => (ln, rn)
            case _ => throw new IllegalArgumentException(
              s"MERGE ON equates differently-named keys ($ln = $rn) " +
                "without a resolvable alias qualifier - qualify both " +
                "sides (t.k = s.src_k)")
          }
        val (pk, srcKey) = m.mergeCondition match {
          case EqualTo(l, r) =>
            val (ln, rn) = (colName(l), colName(r))
            if (ln.equalsIgnoreCase(rn)) (ln, rn)
            else (l, r) match {
              case (la: AttributeReference, _) if tIds(la.exprId) => (ln, rn)
              case (_, ra: AttributeReference) if tIds(ra.exprId) => (rn, ln)
              case _ => resolveByQualifier(l, r, ln, rn)
            }
          case other => throw new IllegalArgumentException(
            "MERGE ON must be a single key equality (t.k = s.k), got: " +
              other.sql)
        }
        def bad(what: String): Nothing = throw new IllegalArgumentException(
          s"unsupported MERGE shape ($what); supported: " +
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
            "[WHEN NOT MATCHED BY SOURCE THEN DELETE], or the key-feed " +
            "delete WHEN MATCHED THEN DELETE alone")
        // the KEY-FEED DELETE shape: `WHEN MATCHED THEN DELETE` as the
        // only action — "remove these keys" (a retraction feed / GDPR
        // list); absent keys no-op, per the CDC-apply contract
        val keyFeedDelete = m.matchedActions == Seq(DeleteAction(None)) &&
          m.notMatchedActions.isEmpty && m.notMatchedBySourceActions.isEmpty
        if (keyFeedDelete)
          GraftMergeDeleteCommand(root, view, m.sourceTable, pk, srcKey)
        else lowerUpsertMerge(m, root, view, pk, srcKey, bad, colName)
      }
    case _ => None
  }

  /** Matched-action classification for the general merge path:
    * `delete` xor assignments; `set = None` with `delete = false` is
    * the star shape (all source columns by name). */
  final case class MatchedSpec(delete: Boolean,
      cond: Option[Raw], set: Option[Seq[(String, Raw)]])

  /** Not-matched INSERT spec; `cols = None` is `INSERT *`. */
  final case class InsertSpec(cols: Option[Seq[String]],
      vals: Option[Seq[Raw]])

  /** The statement's top-level alias (or table name) of a MERGE side —
    * the qualifier the user's `t.x` / `s.x` references resolve by. */
  private def topAlias(pl: LogicalPlan, fallback: String): String = pl match {
    case a: SubqueryAlias => a.alias
    case u: UnresolvedRelation => u.multipartIdentifier.last
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[GraftSnapshotTable] =>
      r.table.asInstanceOf[GraftSnapshotTable].fullName.split('.').last
    case _ => fallback
  }

  private def lowerUpsertMerge(m: MergeIntoTable, root: String,
      view: Option[String], pk: String, srcKey: String,
      bad: String => Nothing,
      colName: Expression => String): LogicalPlan = {
        // builtin resolution may expand `UPDATE SET *` / `INSERT *`
        // into per-column assignment lists before this rule runs
        // (catalog-resolved targets resolve in the same analyzer
        // iteration) — a list where every assignment is a same-named
        // column-to-column copy IS the star shape
        def starLike(assigns: Seq[Assignment]): Boolean =
          assigns.nonEmpty && assigns.forall { a =>
            scala.util.Try(
              colName(a.key).equalsIgnoreCase(colName(a.value))).getOrElse(false)
          }
        def raw(e: Expression): Raw = Raw(unresolve(e))
        val matched: Option[MatchedSpec] = m.matchedActions match {
          case Seq() => None
          case Seq(UpdateStarAction(c)) =>
            Some(MatchedSpec(delete = false, c.map(raw), None))
          case Seq(UpdateAction(c, as, fromStar))
              if fromStar || starLike(as) =>
            Some(MatchedSpec(delete = false, c.map(raw), None))
          case Seq(UpdateAction(c, as, _)) =>
            Some(MatchedSpec(delete = false, c.map(raw),
              Some(as.map(a => colName(a.key) -> raw(a.value)))))
          case Seq(DeleteAction(c)) =>
            Some(MatchedSpec(delete = true, c.map(raw), None))
          case other => bad(s"matched actions: $other")
        }
        val notMatched: Option[InsertSpec] = m.notMatchedActions match {
          case Seq() => None
          case Seq(InsertStarAction(None)) => Some(InsertSpec(None, None))
          case Seq(InsertAction(None, as)) if starLike(as) =>
            Some(InsertSpec(None, None))
          case Seq(InsertAction(None, as)) =>
            Some(InsertSpec(Some(as.map(a => colName(a.key))),
              Some(as.map(a => raw(a.value)))))
          case other => bad(s"not-matched actions: $other")
        }
        val syncDelete = m.notMatchedBySourceActions match {
          case Seq() => false
          case Seq(DeleteAction(None)) => true
          case other => bad(s"not-matched-by-source actions: $other")
        }
        val plainStarUpsert =
          matched.contains(MatchedSpec(delete = false, None, None)) &&
            notMatched.contains(InsertSpec(None, None))
        if (plainStarUpsert)
          // the fast path: full-row upsert (optionally + sync delete)
          // on mergeSnapshot's single-join CoW/MoR machinery
          GraftMergeCommand(root, view, m.sourceTable, pk, srcKey,
            m.withSchemaEvolution, syncDelete)
        else {
          // the GENERAL path: conditional matched UPDATE with arbitrary
          // assignments, or conditional matched DELETE, with an
          // optional explicit-or-star INSERT — computed as a U/D/I
          // batch over one aliased join and applied in ONE manifest
          // flip by applyCdcSnapshot
          if (syncDelete) bad("NOT MATCHED BY SOURCE DELETE composes " +
            "only with the star upsert shape")
          require(!m.withSchemaEvolution,
            "MERGE WITH SCHEMA EVOLUTION requires the star upsert shape")
          if (matched.isEmpty && notMatched.isEmpty) bad("no actions")
          GraftMergeGeneralCommand(root, view, m.sourceTable, pk, srcKey,
            topAlias(m.targetTable, "__t"), topAlias(m.sourceTable, "__s"),
            Raw(unresolve(m.mergeCondition)), matched, notMatched)
        }
  }

  /** Parse + lower + run a DML statement on any session — the path
    * that needs NO session-construction opt-in. Returns the one-row
    * `(version BIGINT)` result; throws if the text is not a DML
    * statement against a snapshot table (use plain `spark.sql` for
    * everything else). */
  def sql(spark: SparkSession, text: String): DataFrame = {
    val parsed = spark.sessionState.sqlParser.parsePlan(text)
    val cmd = lower(spark, parsed).getOrElse(throw new IllegalArgumentException(
      "not a snapshot-table DML statement (is the target registered " +
        s"via registerSnapshotTable, or a backticked root path?): $text"))
    GraftColumnBridge.ofRows(spark, cmd)
  }
}

/** Analyzer rule injected by [[graft.GraftExtensions]]: rewrites
  * parsed DML plans whose target is a snapshot table into runnable
  * commands, so plain `spark.sql("MERGE INTO …")` works end-to-end for
  * SQL-only clients. Non-snapshot targets pass through untouched. */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftDml.lower(spark, plan).getOrElse(plan)
}

/** `DELETE FROM <t> WHERE <cond>` → [[GraftCatalog.deleteSnapshotWhere]]. */
case class GraftDeleteCommand(root: String, view: Option[String],
    cond: GraftDml.Raw) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // the table's declared write mode picks the physics; both modes
    // produce the same logical table
    val pc = GraftColumnBridge.column(cond.e)
    val v =
      if (GraftCatalog.snapshotWriteMode(spark, root) == "mor")
        GraftCatalog.deleteSnapshotWhereMor(spark, root, pc)
      else GraftCatalog.deleteSnapshotWhere(spark, root, pc)
    view.foreach(GraftDml.refreshView(spark, _, root))
    Seq(Row(v))
  }
}

/** `UPDATE <t> SET … WHERE <cond>` → [[GraftCatalog.updateSnapshotWhere]]. */
case class GraftUpdateCommand(root: String, view: Option[String],
    set: Seq[(String, GraftDml.Raw)], cond: GraftDml.Raw)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val pc = GraftColumnBridge.column(cond.e)
    val assigns = set.map { case (c, r) => c -> GraftColumnBridge.column(r.e) }
    val v =
      if (GraftCatalog.snapshotWriteMode(spark, root) == "mor")
        GraftCatalog.updateSnapshotWhereMor(spark, root, pc, assigns)
      else GraftCatalog.updateSnapshotWhere(spark, root, pc, assigns)
    view.foreach(GraftDml.refreshView(spark, _, root))
    Seq(Row(v))
  }
}

/** `INSERT INTO` (append) / `INSERT OVERWRITE` (replace) →
  * [[GraftCatalog.commitSnapshot]] — the ingestion side of the SQL
  * surface: CHECK constraints validate, hidden partitioning derives
  * tuples, the declared sort applies, all through the one writer. The
  * query plan stays unresolved until run time (same contract as
  * MERGE's source). */
case class GraftInsertCommand(root: String, view: Option[String],
    query: LogicalPlan, overwrite: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftColumnBridge.ofRows(spark, query)
    val v = GraftCatalog.commitSnapshot(df, root, append = !overwrite)
    view.foreach(GraftDml.refreshView(spark, _, root))
    Seq(Row(v))
  }
}

/** Upsert-form `MERGE INTO` → [[GraftCatalog.mergeSnapshot]]. The
  * source plan stays UNRESOLVED inside the command (not a child, so
  * the analyzer leaves it alone) and is analyzed at run time — it can
  * be a table, subquery, VALUES list, or a graft TVF. */
/** The GENERAL merge: `WHEN MATCHED [AND c] THEN UPDATE SET x = expr…`
  * (arbitrary assignments mixing `t.*`/`s.*`) or `WHEN MATCHED [AND c]
  * THEN DELETE`, with an optional explicit-or-star INSERT. Semantics
  * are standard MERGE: each source row updates/deletes its matched
  * table row iff the matched condition holds, inserts when unmatched,
  * and a matched row failing the condition stays untouched.
  *
  * Physics: ONE aliased inner join computes matched post-images (the
  * user's own statement aliases qualify the assignment expressions, so
  * `t.amount + s.amount` resolves exactly as written), one anti-join
  * shapes the inserts, and [[GraftCatalog.applyCdcSnapshot]] lands the
  * U/D/I batch in one manifest flip with stats-nominated file pinning
  * — cost ∝ touched files, never the table. A source matching the
  * same key twice aborts loudly (the apply's pk-uniqueness contract —
  * exactly SQL MERGE's cardinality rule). */
case class GraftMergeGeneralCommand(root: String, view: Option[String],
    source: LogicalPlan, pk: String, srcKey: String,
    tAlias: String, sAlias: String, mergeCond: GraftDml.Raw,
    matched: Option[GraftDml.MatchedSpec],
    insert: Option[GraftDml.InsertSpec])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val committed = GraftCatalog.snapshotSchema(spark, root).getOrElse(
      GraftCatalog.readSnapshot(spark, root).schema)
    val tDf = GraftCatalog.readSnapshotAuto(spark, root).alias(tAlias)
    val sDf = GraftColumnBridge.ofRows(spark, source).alias(sAlias)
    val joinCond = GraftColumnBridge.column(mergeCond.e)
    // side references go through each frame's OWN resolver (exprId-
    // exact) — a string-built qualifier would mis-parse a backticked
    // path alias on its dots
    def tCol(c: String) = tDf.col(c)
    val lowerSrc = sDf
      .columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val parts = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    matched.foreach { ms =>
      val mdf0 = tDf.join(sDf, joinCond, "inner")
      val mdf = ms.cond.fold(mdf0)(c =>
        mdf0.where(GraftColumnBridge.column(c.e)))
      if (ms.delete) {
        parts += mdf.select(committed.fields.map { f =>
          (if (f.name.equalsIgnoreCase(pk)) tCol(f.name)
           else lit(null).cast(f.dataType)).as(f.name)
        }.toIndexedSeq: _*).withColumn("_op", lit("D"))
      } else {
        val set: Map[String, GraftDml.Raw] = ms.set match {
          case Some(s) =>
            s.map { case (c, r) => c.toLowerCase(java.util.Locale.ROOT) -> r }.toMap
          case None => Map.empty // star — resolved per column below
        }
        parts += mdf.select(committed.fields.map { f =>
          val lc = f.name.toLowerCase(java.util.Locale.ROOT)
          val v = set.get(lc) match {
            case Some(r) => GraftColumnBridge.column(r.e)
            case None if ms.set.isEmpty && lowerSrc(lc) => // star
              sDf.col(f.name)
            case None => tCol(f.name)
          }
          v.cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*).withColumn("_op", lit("U"))
      }
    }
    insert.foreach { is =>
      val unmatched0 = sDf.join(tDf, joinCond, "left_anti")
      val idf = is.cols match {
        case None => // INSERT * — table columns by name, srcKey renamed
          val base =
            if (srcKey.equalsIgnoreCase(pk)) unmatched0
            else unmatched0.withColumnRenamed(srcKey, pk)
          base.select(committed.fields.map(f =>
            col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
        case Some(cols) =>
          val provided = cols.map(_.toLowerCase(java.util.Locale.ROOT))
            .zip(is.vals.get).toMap
          require(provided.contains(pk.toLowerCase(java.util.Locale.ROOT)),
            s"MERGE INSERT column list must provide the key column $pk")
          unmatched0.select(committed.fields.map { f =>
            val lc = f.name.toLowerCase(java.util.Locale.ROOT)
            (provided.get(lc) match {
              case Some(r) => GraftColumnBridge.column(r.e)
              case None => lit(null)
            }).cast(f.dataType).as(f.name)
          }.toIndexedSeq: _*)
      }
      parts += idf.withColumn("_op", lit("I"))
    }
    require(parts.nonEmpty, "MERGE with no actions")
    val batch = parts.reduce(_ unionByName _)
    val v = GraftCatalog.applyCdcSnapshot(spark, root, batch, pk)
    view.foreach(GraftDml.refreshView(spark, _, root))
    Seq(Row(v))
  }
}

/** The key-feed delete `MERGE … WHEN MATCHED THEN DELETE` (alone):
  * remove every table row whose key appears in the source — the
  * retraction-feed / GDPR-list statement. Lowered onto
  * [[GraftCatalog.applyCdcSnapshot]] with an all-`D` batch, which
  * reuses the merge discipline's stats-nominated file pinning (cost ∝
  * touched files, absent keys no-op) and lands in ONE manifest flip.
  * The source may be a bare key list — only its key column is read. */
case class GraftMergeDeleteCommand(root: String, view: Option[String],
    source: LogicalPlan, pk: String, srcKey: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val keys = GraftColumnBridge.ofRows(spark, source)
      .select(col(srcKey).as(pk)).distinct()
    // shape the batch like the table (the apply's upsert side is empty,
    // so the null fill never lands anywhere)
    val committed = GraftCatalog.snapshotSchema(spark, root).getOrElse(
      GraftCatalog.readSnapshot(spark, root).schema)
    val batch = committed.fields.foldLeft(keys) { (d, f) =>
      if (f.name.equalsIgnoreCase(pk)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }.withColumn("_op", lit("D"))
    val v = GraftCatalog.applyCdcSnapshot(spark, root, batch, pk)
    view.foreach(GraftDml.refreshView(spark, _, root))
    Seq(Row(v))
  }
}

case class GraftMergeCommand(root: String, view: Option[String],
    source: LogicalPlan, pk: String, srcKey: String,
    schemaEvolution: Boolean, syncDelete: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val src0 = GraftColumnBridge.ofRows(spark, source)
    // a differently-named source key aligns to the target's (renaming
    // must not shadow an existing same-named source column)
    val src =
      if (srcKey.equalsIgnoreCase(pk)) src0
      else {
        require(!src0.columns.exists(_.equalsIgnoreCase(pk)),
          s"MERGE source has both $srcKey and $pk columns - project one")
        src0.withColumnRenamed(srcKey, pk)
      }
    val v =
      if (syncDelete) {
        // the FULL-SYNC shape (UPDATE SET * / INSERT * / NOT MATCHED
        // BY SOURCE DELETE): matched rows take the source image,
        // unmatched source rows insert, unmatched TABLE rows delete —
        // the post-state is exactly the source keyed by pk, so the
        // minimal-physics lowering is ONE overwrite commit aligned to
        // the table's committed column order. No join, no per-file
        // nomination: at 100 TB a mirror-sync rewrites ~everything
        // anyway, and an overwrite is the cheapest plan that does.
        val aligned =
          if (schemaEvolution) src // an overwrite ADOPTS the batch schema
          else GraftCatalog.snapshotSchema(spark, root).fold(src) { sch =>
            src.select(sch.fieldNames.map(n => src.col(n)).toIndexedSeq: _*)
          }
        GraftCatalog.commitSnapshot(aligned, root, append = false)
      } else if (GraftCatalog.snapshotWriteMode(spark, root) == "mor") {
        require(!schemaEvolution,
          "MERGE WITH SCHEMA EVOLUTION is CoW-only; unset mor write mode")
        GraftCatalog.mergeSnapshotMor(spark, root, src, pk)
      } else GraftCatalog.mergeSnapshot(spark, root, src, pk,
        allowSchemaEvolution = schemaEvolution)
    view.foreach(GraftDml.refreshView(spark, _, root))
    Seq(Row(v))
  }
}
