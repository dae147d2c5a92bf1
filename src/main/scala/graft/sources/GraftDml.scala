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

  /** Side-preserving unresolve for the MERGE paths: a resolved
    * attribute re-opens QUALIFIED by the statement alias of whichever
    * relation owns its exprId, so a general merge over same-named
    * columns on both sides (`ON t.id = s.id`, `SET amount = t.amount +
    * s.amount`) re-resolves unambiguously against the command's own
    * aliased join at run time. A bare-name rewrite here loses the side
    * and fails with an ambiguous-reference error on the
    * catalog-resolved path. Attributes owned by neither side (shouldn't
    * exist in a MERGE) fall back to the bare name. */
  private def unresolveSided(e: Expression,
      tIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId],
      sIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId],
      tAlias: String, sAlias: String): Expression = e.transform {
    case a: AttributeReference if tIds(a.exprId) =>
      UnresolvedAttribute(Seq(tAlias, a.name))
    case a: AttributeReference if sIds(a.exprId) =>
      UnresolvedAttribute(Seq(sAlias, a.name))
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
        // Resolve each ON equality: which side is the TARGET's key
        // column and which the source's. Same-named keys are
        // unambiguous; differently named keys (the common CDC-feed
        // shape `t.k = s.src_k`) resolve by the statement's own
        // aliases/table names as qualifiers. Ambiguous spellings
        // reject loudly — a silent wrong-side guess would be a
        // wrong-answer machine.
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
        // the ON condition is a CONJUNCTION of key equalities — the
        // composite tuple is the merge identity (`ON t.a = s.a AND
        // t.b = s.b`); anything non-equality rejects loudly
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
            conjuncts(l) ++ conjuncts(r)
          case other => Seq(other)
        }
        val keyPairs: Seq[(String, String)] = conjuncts(m.mergeCondition).map {
          case EqualTo(l, r) =>
            val (ln, rn) = (colName(l), colName(r))
            if (ln.equalsIgnoreCase(rn)) (ln, rn)
            else (l, r) match {
              case (la: AttributeReference, _) if tIds(la.exprId) => (ln, rn)
              case (_, ra: AttributeReference) if tIds(ra.exprId) => (rn, ln)
              case _ => resolveByQualifier(l, r, ln, rn)
            }
          case other => throw new IllegalArgumentException(
            "MERGE ON must be a conjunction of key equalities " +
              "(t.k = s.k [AND t.k2 = s.k2 …]), got: " + other.sql)
        }
        require(keyPairs.map(_._1.toLowerCase(java.util.Locale.ROOT))
          .distinct.size == keyPairs.size,
          "MERGE ON equates the same target column twice")
        def bad(what: String): Nothing = throw new IllegalArgumentException(
          s"unsupported MERGE shape ($what)")
        // the KEY-FEED DELETE shape: `WHEN MATCHED THEN DELETE` as the
        // only action — "remove these keys" (a retraction feed / GDPR
        // list); absent keys no-op, per the CDC-apply contract
        val keyFeedDelete = m.matchedActions == Seq(DeleteAction(None)) &&
          m.notMatchedActions.isEmpty && m.notMatchedBySourceActions.isEmpty
        if (keyFeedDelete)
          GraftMergeDeleteCommand(root, view, m.sourceTable, keyPairs)
        else lowerUpsertMerge(spark, m, root, view, keyPairs, bad, colName)
      }
    case _ => None
  }

  /** Matched-action classification for the general merge path —
    * also the shape of NOT MATCHED BY SOURCE actions (whose `set`, when
    * present, may reference only the target side): `delete` xor
    * assignments; `set = None` with `delete = false` is the star shape
    * (all source columns by name). Clauses are ORDERED — SQL MERGE's
    * first-matching-condition-wins rule. */
  final case class MatchedSpec(delete: Boolean,
      cond: Option[Raw], set: Option[Seq[(String, Raw)]])

  /** Not-matched INSERT spec; `cols = None` is `INSERT *`. Ordered,
    * first-match-wins, like [[MatchedSpec]]. */
  final case class InsertSpec(cond: Option[Raw], cols: Option[Seq[String]],
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

  private def lowerUpsertMerge(spark: SparkSession, m: MergeIntoTable,
      root: String, view: Option[String], keyPairs: Seq[(String, String)],
      bad: String => Nothing,
      colName: Expression => String): LogicalPlan = {
        val tAlias = topAlias(m.targetTable, "__t")
        val sAlias = topAlias(m.sourceTable, "__s")
        val tIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
          if (m.targetTable.resolved) m.targetTable.output.map(_.exprId).toSet
          else Set.empty
        val sIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
          if (m.sourceTable.resolved) m.sourceTable.output.map(_.exprId).toSet
          else Set.empty
        val sNames = {
          def names(pl: LogicalPlan): Set[String] = pl match {
            case a: SubqueryAlias =>
              Set(a.alias.toLowerCase(java.util.Locale.ROOT)) ++ names(a.child)
            case u: UnresolvedRelation =>
              Set(u.multipartIdentifier.last.toLowerCase(java.util.Locale.ROOT))
            case _ => Set.empty
          }
          names(m.sourceTable)
        }
        // a value "resolves to the source side" when its exprId belongs
        // to the resolved source output, or its qualifier names the
        // source alias; anything else (target refs, unqualified names,
        // computed expressions) is NOT star material
        def sourceSide(e: Expression): Boolean = e match {
          case a: AttributeReference => sIds(a.exprId)
          case a: UnresolvedAttribute if a.nameParts.size >= 2 =>
            sNames(a.nameParts(a.nameParts.size - 2)
              .toLowerCase(java.util.Locale.ROOT))
          case _ => false
        }
        // The committed column set — the coverage bar an expanded star
        // must clear. Lazy: only consulted when a same-named assignment
        // list must be classified.
        lazy val committedCols: Set[String] =
          GraftCatalog.snapshotSchema(spark, root)
            .getOrElse(GraftCatalog.readSnapshot(spark, root).schema)
            .fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
        // Builtin resolution may expand `UPDATE SET *` / `INSERT *`
        // into per-column assignment lists before this rule runs
        // (catalog-resolved targets resolve in the same analyzer
        // iteration). A list is that expansion — and ONLY that
        // expansion — when it covers EVERY committed column, each
        // assignment is a same-named copy, and every value resolves to
        // the SOURCE side. A partial `SET v = s.v` (1 of N columns)
        // must NOT classify as star: the star path would silently
        // overwrite the unassigned columns with source values.
        def starLike(assigns: Seq[Assignment]): Boolean =
          assigns.nonEmpty && assigns.forall { a =>
            scala.util.Try(
              colName(a.key).equalsIgnoreCase(colName(a.value))).getOrElse(false) &&
              sourceSide(a.value)
          } && {
            val assigned = assigns.map(a =>
              colName(a.key).toLowerCase(java.util.Locale.ROOT)).toSet
            committedCols.subsetOf(assigned)
          }
        def raw(e: Expression): Raw =
          Raw(unresolveSided(e, tIds, sIds, tAlias, sAlias))
        def setOf(as: Seq[Assignment]): Seq[(String, Raw)] =
          as.map(a => colName(a.key) -> raw(a.value))
        val matched: Seq[MatchedSpec] = m.matchedActions.map {
          case UpdateStarAction(c) =>
            MatchedSpec(delete = false, c.map(raw), None)
          case UpdateAction(c, as, fromStar) if fromStar || starLike(as) =>
            MatchedSpec(delete = false, c.map(raw), None)
          case UpdateAction(c, as, _) =>
            MatchedSpec(delete = false, c.map(raw), Some(setOf(as)))
          case DeleteAction(c) => MatchedSpec(delete = true, c.map(raw), None)
          case other => bad(s"matched action: $other")
        }
        val inserts: Seq[InsertSpec] = m.notMatchedActions.map {
          case InsertStarAction(c) => InsertSpec(c.map(raw), None, None)
          case InsertAction(c, as) if starLike(as) =>
            InsertSpec(c.map(raw), None, None)
          case InsertAction(c, as) =>
            InsertSpec(c.map(raw), Some(as.map(a => colName(a.key))),
              Some(as.map(a => raw(a.value))))
          case other => bad(s"not-matched action: $other")
        }
        // BY SOURCE actions see only the target row — DELETE or UPDATE
        // with target-side assignments (star is meaningless without a
        // source row and rejects)
        val bySource: Seq[MatchedSpec] = m.notMatchedBySourceActions.map {
          case DeleteAction(c) => MatchedSpec(delete = true, c.map(raw), None)
          case UpdateAction(c, as, false) if as.nonEmpty =>
            MatchedSpec(delete = false, c.map(raw), Some(setOf(as)))
          case other => bad(s"not-matched-by-source action: $other")
        }
        val plainStarUpsert =
          matched == Seq(MatchedSpec(delete = false, None, None)) &&
            inserts == Seq(InsertSpec(None, None, None)) &&
            (bySource.isEmpty ||
              bySource == Seq(MatchedSpec(delete = true, None, None)))
        if (plainStarUpsert)
          // the fast path: full-row upsert (optionally + sync delete)
          // on mergeSnapshot's single-join CoW/MoR machinery
          GraftMergeCommand(root, view, m.sourceTable, keyPairs,
            m.withSchemaEvolution, syncDelete = bySource.nonEmpty)
        else {
          // the GENERAL path: ordered conditional matched UPDATE/DELETE
          // clauses (first-match-wins), ordered conditional INSERTs,
          // and BY SOURCE UPDATE/DELETE clauses — computed as a U/D/I
          // batch over one aliased join (+ anti-joins for the unmatched
          // sides) and applied in ONE manifest flip by applyCdcSnapshot
          require(!m.withSchemaEvolution,
            "MERGE WITH SCHEMA EVOLUTION requires the star upsert shape")
          if (matched.isEmpty && inserts.isEmpty && bySource.isEmpty)
            bad("no actions")
          GraftMergeGeneralCommand(root, view, m.sourceTable, keyPairs,
            tAlias, sAlias,
            Raw(unresolveSided(m.mergeCondition, tIds, sIds, tAlias, sAlias)),
            matched, inserts, bySource)
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

/** The GENERAL merge: ordered `WHEN MATCHED [AND c] THEN UPDATE SET
  * x = expr…` / `THEN DELETE` clauses (arbitrary assignments mixing
  * `t.*`/`s.*`), ordered `WHEN NOT MATCHED [AND c] THEN INSERT`
  * clauses (explicit or star), and `WHEN NOT MATCHED BY SOURCE [AND c]
  * THEN UPDATE/DELETE` clauses. Semantics are standard SQL MERGE:
  * clause conditions evaluate in statement order and the FIRST holding
  * clause acts; a row matching no clause of its group stays untouched.
  *
  * Physics: ONE aliased inner join computes matched post-images (the
  * user's own statement aliases qualify the assignment expressions, so
  * `t.amount + s.amount` resolves exactly as written) with a
  * first-match-wins clause-index cascade selecting each row's acting
  * clause; two anti-joins shape the inserts and the by-source side;
  * [[GraftCatalog.applyCdcSnapshot]] lands the whole U/D/I batch in
  * one manifest flip with stats-nominated file pinning — cost ∝
  * touched files, never the table (except by-source clauses, whose
  * candidate set is every unmatched TABLE row — inherently statement-
  * sized). A source matching the same key twice aborts loudly (the
  * apply's pk-uniqueness contract — exactly SQL MERGE's cardinality
  * rule). */
case class GraftMergeGeneralCommand(root: String, view: Option[String],
    source: LogicalPlan, keyPairs: Seq[(String, String)],
    tAlias: String, sAlias: String, mergeCond: GraftDml.Raw,
    matched: Seq[GraftDml.MatchedSpec],
    inserts: Seq[GraftDml.InsertSpec],
    bySource: Seq[GraftDml.MatchedSpec] = Seq.empty)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val pks = keyPairs.map(_._1)
    def isKey(n: String): Boolean = pks.exists(_.equalsIgnoreCase(n))
    // the source key feeding a given target key column (INSERT * path)
    val srcKeyOf: Map[String, String] =
      keyPairs.map { case (p, s) =>
        p.toLowerCase(java.util.Locale.ROOT) -> s
      }.toMap
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
    // first-match-wins: index of the first clause whose condition
    // holds, -1 when none does (row untouched). Built right-to-left so
    // clause 0 tests first.
    def clauseIdx(specs: Seq[Option[GraftDml.Raw]]): Column =
      specs.zipWithIndex.foldRight(lit(-1)) { case ((c, i), acc) =>
        when(c.map(r => GraftColumnBridge.column(r.e)).getOrElse(lit(true)),
          lit(i)).otherwise(acc)
      }
    // one U-or-D image per acting row of a matched/by-source group,
    // over a frame already carrying the group's __clause column
    def actImage(df: org.apache.spark.sql.DataFrame,
        specs: Seq[GraftDml.MatchedSpec],
        starAllowed: Boolean): org.apache.spark.sql.DataFrame = {
      val acting = df.where(col("__clause") >= 0)
      val opCol = specs.zipWithIndex.foldRight(lit(null).cast("string")) {
        case ((ms, i), acc) =>
          when(col("__clause") === i, lit(if (ms.delete) "D" else "U"))
            .otherwise(acc)
      }
      acting.select(committed.fields.map { f =>
        val lc = f.name.toLowerCase(java.util.Locale.ROOT)
        val v = specs.zipWithIndex.foldRight(lit(null).cast(f.dataType): Column) {
          case ((ms, i), acc) =>
            val image: Column =
              if (ms.delete)
                if (isKey(f.name)) tCol(f.name)
                else lit(null).cast(f.dataType)
              else ms.set match {
                case Some(s) =>
                  s.collectFirst {
                    case (c, r) if c.equalsIgnoreCase(f.name) =>
                      GraftColumnBridge.column(r.e)
                  }.getOrElse(tCol(f.name))
                case None if starAllowed && lowerSrc(lc) => sDf.col(f.name)
                case None => tCol(f.name)
              }
            when(col("__clause") === i, image).otherwise(acc)
        }
        v.cast(f.dataType).as(f.name)
      }.toIndexedSeq :+ opCol.as("_op"): _*)
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    if (matched.nonEmpty) {
      val mdf = tDf.join(sDf, joinCond, "inner")
        .withColumn("__clause", clauseIdx(matched.map(_.cond)))
      parts += actImage(mdf, matched, starAllowed = true)
    }
    if (bySource.nonEmpty) {
      // unmatched TARGET rows — source columns are out of scope, so
      // conditions/assignments here resolve against tDf alone
      val bdf = tDf.join(sDf, joinCond, "left_anti")
        .withColumn("__clause", clauseIdx(bySource.map(_.cond)))
      parts += actImage(bdf, bySource, starAllowed = false)
    }
    if (inserts.nonEmpty) {
      keyPairs.foreach { case (p, s) =>
        if (inserts.exists(_.cols.isEmpty) && !s.equalsIgnoreCase(p))
          require(!lowerSrc(p.toLowerCase(java.util.Locale.ROOT)),
            s"MERGE source has both $s and $p columns - project one")
      }
      val unmatched0 = sDf.join(tDf, joinCond, "left_anti")
        .withColumn("__clause", clauseIdx(inserts.map(_.cond)))
        .where(col("__clause") >= 0)
      val idf = unmatched0.select(committed.fields.map { f =>
        val lc = f.name.toLowerCase(java.util.Locale.ROOT)
        val v = inserts.zipWithIndex.foldRight(lit(null).cast(f.dataType): Column) {
          case ((is, i), acc) =>
            val image: Column = is.cols match {
              case None => // INSERT * — table columns by name, srcKey → pk
                if (lowerSrc(lc)) sDf.col(f.name)
                else if (isKey(f.name)) sDf.col(srcKeyOf(lc))
                else lit(null).cast(f.dataType)
              case Some(cols) =>
                val provided = cols.map(_.toLowerCase(java.util.Locale.ROOT))
                  .zip(is.vals.get).toMap
                pks.foreach(p =>
                  require(provided.contains(p.toLowerCase(java.util.Locale.ROOT)),
                    s"MERGE INSERT column list must provide the key column $p"))
                provided.get(lc) match {
                  case Some(r) => GraftColumnBridge.column(r.e)
                  case None => lit(null).cast(f.dataType)
                }
            }
            when(col("__clause") === i, image).otherwise(acc)
        }
        v.cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
      parts += idf.withColumn("_op", lit("I"))
    }
    require(parts.nonEmpty, "MERGE with no actions")
    val batch = parts.reduce(_ unionByName _)
    val v = GraftCatalog.applyCdcSnapshotKeys(spark, root, batch, pks)
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
    source: LogicalPlan, keyPairs: Seq[(String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val pks = keyPairs.map(_._1)
    val keys = GraftColumnBridge.ofRows(spark, source)
      .select(keyPairs.map { case (p, s) => col(s).as(p) }: _*).distinct()
    // shape the batch like the table (the apply's upsert side is empty,
    // so the null fill never lands anywhere)
    val committed = GraftCatalog.snapshotSchema(spark, root).getOrElse(
      GraftCatalog.readSnapshot(spark, root).schema)
    val batch = committed.fields.foldLeft(keys) { (d, f) =>
      if (pks.exists(_.equalsIgnoreCase(f.name))) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }.withColumn("_op", lit("D"))
    val v = GraftCatalog.applyCdcSnapshotKeys(spark, root, batch, pks)
    view.foreach(GraftDml.refreshView(spark, _, root))
    Seq(Row(v))
  }
}

/** Upsert-form `MERGE INTO` (star update + star insert, optionally +
  * by-source sync delete) → [[GraftCatalog.mergeSnapshotKeys]]. The
  * source plan stays UNRESOLVED inside the command (not a child, so
  * the analyzer leaves it alone) and is analyzed at run time — it can
  * be a table, subquery, VALUES list, or a graft TVF. */
case class GraftMergeCommand(root: String, view: Option[String],
    source: LogicalPlan, keyPairs: Seq[(String, String)],
    schemaEvolution: Boolean, syncDelete: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val src0 = GraftColumnBridge.ofRows(spark, source)
    val pks = keyPairs.map(_._1)
    // differently-named source keys align to the target's (renaming
    // must not shadow an existing same-named source column)
    val src = keyPairs.foldLeft(src0) { case (d, (pk, srcKey)) =>
      if (srcKey.equalsIgnoreCase(pk)) d
      else {
        require(!d.columns.exists(_.equalsIgnoreCase(pk)),
          s"MERGE source has both $srcKey and $pk columns - project one")
        d.withColumnRenamed(srcKey, pk)
      }
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
        GraftCatalog.mergeSnapshotMorKeys(spark, root, src, pks)
      } else GraftCatalog.mergeSnapshotKeys(spark, root, src, pks,
        allowSchemaEvolution = schemaEvolution)
    view.foreach(GraftDml.refreshView(spark, _, root))
    Seq(Row(v))
  }
}
