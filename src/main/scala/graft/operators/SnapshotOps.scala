package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.GraftCatalog

/** Snapshot-table operators surfaced as driver queries: the manifest
  * format's row-level MERGE and DELETE reconciled against a plain
  * relational recompute in DuckDB — the end-to-end proof that the
  * copy-on-write composition (stats-pruned candidates → semi-join /
  * input_file_name pinning → single rewritten batch → manifest flip)
  * produces exactly the table a full-recompute upsert / anti-filter
  * would.
  *
  * Reference anchor: the reference's versioned-table ambitions live in
  * its docs (docs/9 roadmap items); the concrete semantics here are
  * the standard MERGE contract every lakehouse format implements.
  */
object SnapshotOps {

  /** q117 — copy-on-write MERGE, oracle-reconciled: orders lands as a
    * range-partitioned 4-file snapshot (ONE commit — each file gets a
    * tight orderkey envelope in the manifest stats); an update feed
    * RUSH-re-prices every 10th key in the first key quarter (so only
    * the file(s) covering that range are rewritten — the rest carry by
    * path) and appends brand-new synthetic keys; the merged head is
    * then aggregated per priority class. The DuckDB oracle never sees
    * the table format: it recomputes the post-merge state relationally
    * (base minus touched keys, union updates, union new rows), so a
    * hash match proves merge == full recompute row-for-row. Money sums
    * follow the SURVEY §5 decimal discipline. Rebuilt per run (root
    * wiped first) so the query is deterministic and self-contained;
    * the merge itself is metadata + one-batch I/O — the 100 TB shape. */
  private def q117(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snapmerge_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    val updates = orders
      .where(col("o_orderkey") % 10 === 0 && col("o_orderkey") <= mk / 4)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("price") + lit(100.0)).as("price"), lit("0-RUSH").as("pr"))
      .unionByName(orders.where(col("o_orderkey") % 1000 === 0)
        .select((col("o_orderkey") + lit(100000000L)).as("o_orderkey"),
          col("o_custkey"), col("price"), lit("9-NEW").as("pr")))
    GraftCatalog.mergeSnapshot(s, root, updates, "o_orderkey")
    GraftCatalog.readSnapshot(s, root)
      .groupBy("pr")
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)").as("total"),
        countDistinct(col("o_custkey")).as("nc"))
      .orderBy("pr")
  }

  private val q117Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |upd AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DOUBLE) + 100.0 AS price, '0-RUSH' AS pr
      |  FROM orders, mk WHERE o_orderkey % 10 = 0 AND o_orderkey <= mk // 4),
      |newr AS (
      |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DOUBLE) AS price, '9-NEW' AS pr
      |  FROM orders WHERE o_orderkey % 1000 = 0),
      |base AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
      |    o_orderpriority AS pr
      |  FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)),
      |fin AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM newr)
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS nc
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  /** q119 — copy-on-write DELETE, oracle-reconciled: the same 4-file
    * range-partitioned orders snapshot as q117, then
    * `DELETE WHERE o_orderkey ≤ max/4 AND o_custkey % 7 = 0` — the
    * orderkey envelope in the manifest stats prunes planning to the
    * FIRST file, `input_file_name` pinning confirms it truly holds
    * matching rows, and only that file rewrites (survivor rows minus
    * the deleted set); the other three carry by path. The head is then
    * aggregated per priority class and hash-matched against DuckDB's
    * relational `WHERE NOT(pred)` recompute — delete == anti-filter
    * row-for-row. Deterministic, self-contained (root wiped per run). */
  private def q119(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snapdel_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    GraftCatalog.deleteSnapshotWhere(s, root,
      col("o_orderkey") <= mk / 4 && col("o_custkey") % 7 === 0)
    GraftCatalog.readSnapshot(s, root)
      .groupBy("pr")
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)").as("total"),
        countDistinct(col("o_custkey")).as("nc"))
      .orderBy("pr")
  }

  private val q119Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |fin AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
      |    o_orderpriority AS pr
      |  FROM orders, mk
      |  WHERE NOT (o_orderkey <= mk // 4 AND o_custkey % 7 = 0))
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS nc
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  /** q122 — copy-on-write UPDATE, oracle-reconciled: the q117 4-file
    * range-partitioned orders snapshot, then `UPDATE SET price =
    * price + 50, pr = '0-RUSH' WHERE o_orderkey ≤ max/4 AND
    * pr = '1-URGENT'` — the orderkey envelope prunes planning to the
    * first file, pinning confirms it, only it rewrites (non-matching
    * rows of that file land byte-equal, matching rows with both
    * assignments applied against the PRE-update row); the other three
    * files carry by path. The head's per-priority aggregate
    * hash-matches DuckDB's relational CASE-WHEN recompute — update ==
    * full recompute row-for-row. Deterministic, root wiped per run. */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snapupd_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    GraftCatalog.updateSnapshotWhere(s, root,
      col("o_orderkey") <= mk / 4 && col("pr") === "1-URGENT",
      Seq("price" -> (col("price") + lit(50.0)), "pr" -> lit("0-RUSH")))
    GraftCatalog.readSnapshot(s, root)
      .groupBy("pr")
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)").as("total"),
        countDistinct(col("o_custkey")).as("nc"))
      .orderBy("pr")
  }

  private val q122Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |fin AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey <= mk // 4 AND o_orderpriority = '1-URGENT'
      |      THEN CAST(o_totalprice AS DOUBLE) + 50.0
      |      ELSE CAST(o_totalprice AS DOUBLE) END AS price,
      |    CASE WHEN o_orderkey <= mk // 4 AND o_orderpriority = '1-URGENT'
      |      THEN '0-RUSH' ELSE o_orderpriority END AS pr
      |  FROM orders, mk)
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS nc
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  /** q123 — INCREMENTAL MV maintenance from snapshot CDC: three
    * commits (base, append of new keys, copy-on-write delete), an
    * aggregate MV materialized at v1, then brought to the head by
    * folding `readChanges(v1, head)` — counts and decimal sums are
    * self-maintainable (insert adds, delete subtracts; a CoW rewrite's
    * unchanged rows appear as delete+insert pairs and cancel EXACTLY
    * because the fold stays in DECIMAL(18,2), never touching a float
    * accumulator). The MV update cost is ∝ the touched files, never
    * the table — at 100 TB the MV keeps pace with a CDC feed without
    * a single base rescan. The DuckDB oracle recomputes the final
    * state relationally and aggregates from scratch: a hash match
    * proves fold(MV@v1, CDC) == full recompute. */
  private def q123(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snapmv_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    val v1 = GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    GraftCatalog.commitSnapshot(
      orders.where(col("o_orderkey") % 1000 === 0)
        .select((col("o_orderkey") + lit(200000000L)).as("o_orderkey"),
          col("o_custkey"), col("price"), lit("9-NEW").as("pr")),
      root, append = true)
    val head = GraftCatalog.deleteSnapshotWhere(s, root,
      col("o_orderkey") <= mk / 4 && col("o_custkey") % 13 === 0)
    val dec = expr("CAST(price AS DECIMAL(18,2))")
    val mv1 = GraftCatalog.readSnapshot(s, root, version = Some(v1))
      .groupBy("pr")
      .agg(count(lit(1)).as("n"), sum(dec).as("total"))
    val sign = when(col("_change") === "insert", lit(1)).otherwise(lit(-1))
    val delta = GraftCatalog.readChanges(s, root, v1, head)
      .groupBy("pr")
      .agg(sum(sign).as("dn"), sum(sign * dec).as("dtotal"))
    mv1.join(delta, Seq("pr"), "full_outer")
      .select(col("pr"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0).cast("decimal(18,2)"))
          + coalesce(col("dtotal"), lit(0).cast("decimal(18,2)"))).as("t"))
      .where(col("n") > 0)
      .select(col("pr"), col("n"), col("t").cast("double").as("total"))
      .orderBy("pr")
  }

  private val q123Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |newr AS (
      |  SELECT o_orderkey + 200000000 AS o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DOUBLE) AS price, '9-NEW' AS pr
      |  FROM orders WHERE o_orderkey % 1000 = 0),
      |uni AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
      |    o_orderpriority AS pr
      |  FROM orders
      |  UNION ALL SELECT * FROM newr),
      |fin AS (
      |  SELECT * FROM uni, mk
      |  WHERE NOT (o_orderkey <= mk // 4 AND o_custkey % 13 = 0))
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  /** q124 — atomic slice OVERWRITE (replaceWhere), oracle-reconciled:
    * the q117 snapshot, then the first key quarter is REPLACED in one
    * commit by its recomputed backfill — only every-3rd-custkey rows
    * survive the recompute and their price is re-derived (+25.0), so
    * the overwrite both shrinks and rewrites the slice. Planning
    * touches only the file(s) whose key envelope overlaps the slice
    * (any fully-covered file drops with zero rewrite I/O) and lands
    * the backfill in the same single batch — the delete and the
    * insert are ONE version flip, so no reader ever sees the slice
    * absent.
    * Hash-matched against DuckDB's relational splice (outside-slice ∪
    * recomputed slice). */
  private def q124(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snaprw_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    val slice = col("o_orderkey") <= mk / 4
    val backfill = orders.where(slice && col("o_custkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("price") + lit(25.0)).as("price"), col("pr"))
    GraftCatalog.overwriteSnapshotWhere(s, root, slice, backfill)
    GraftCatalog.readSnapshot(s, root)
      .groupBy("pr")
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)").as("total"),
        countDistinct(col("o_custkey")).as("nc"))
      .orderBy("pr")
  }

  private val q124Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |outside AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
      |    o_orderpriority AS pr
      |  FROM orders, mk WHERE o_orderkey > mk // 4),
      |backfill AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DOUBLE) + 25.0 AS price, o_orderpriority AS pr
      |  FROM orders, mk
      |  WHERE o_orderkey <= mk // 4 AND o_custkey % 3 = 0),
      |fin AS (SELECT * FROM outside UNION ALL SELECT * FROM backfill)
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS nc
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  /** q126 — full CDC apply (I/U/D in ONE commit), oracle-reconciled:
    * the q117 4-file snapshot, then one mixed batch — deletes
    * (first-quarter keys with custkey%11=0), re-pricing updates
    * (first-quarter %10 keys, disjoint from the deletes so per-key op
    * is unambiguous), and inserts (new synthetic keys). One manifest
    * flip applies all three; the head's per-priority aggregate
    * hash-matches DuckDB's relational recompute (base minus deleted
    * minus updated-originals ∪ updates ∪ inserts) — apply == full
    * recompute row-for-row, and no reader could ever observe the
    * deleted-but-not-yet-upserted intermediate that a two-commit
    * delete+merge would expose. */
  private def q126(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snapcdc_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    val dels = orders
      .where(col("o_orderkey") <= mk / 4 && col("o_custkey") % 11 === 0)
      .withColumn("_op", lit("D"))
    val upds = orders
      .where(col("o_orderkey") <= mk / 4 && col("o_orderkey") % 10 === 0 &&
        col("o_custkey") % 11 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("price") + lit(100.0)).as("price"), lit("0-RUSH").as("pr"),
        lit("U").as("_op"))
    val ins = orders.where(col("o_orderkey") % 1000 === 0)
      .select((col("o_orderkey") + lit(300000000L)).as("o_orderkey"),
        col("o_custkey"), col("price"), lit("9-NEW").as("pr"),
        lit("I").as("_op"))
    GraftCatalog.applyCdcSnapshot(s, root,
      dels.unionByName(upds).unionByName(ins), "o_orderkey")
    GraftCatalog.readSnapshot(s, root)
      .groupBy("pr")
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)").as("total"),
        countDistinct(col("o_custkey")).as("nc"))
      .orderBy("pr")
  }

  private val q126Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |del AS (
      |  SELECT o_orderkey FROM orders, mk
      |  WHERE o_orderkey <= mk // 4 AND o_custkey % 11 = 0),
      |upd AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DOUBLE) + 100.0 AS price, '0-RUSH' AS pr
      |  FROM orders, mk
      |  WHERE o_orderkey <= mk // 4 AND o_orderkey % 10 = 0
      |    AND o_custkey % 11 <> 0),
      |ins AS (
      |  SELECT o_orderkey + 300000000 AS o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DOUBLE) AS price, '9-NEW' AS pr
      |  FROM orders WHERE o_orderkey % 1000 = 0),
      |base AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
      |    o_orderpriority AS pr
      |  FROM orders
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
      |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)),
      |fin AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM ins)
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS nc
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  /** q129 — the Catalyst-integrated snapshot read on the driver
    * surface: orders lands as the 4-file range snapshot, then the
    * aggregate runs over `readSnapshotAuto` with a PLAIN `.where` — no
    * predicate parameter anywhere — and the custom FileIndex prunes
    * the manifest to the first-quarter file(s) at scan planning
    * (pruning itself is metric-proven in SourcesCatalogSpec; this
    * query proves the auto path's ROW-LEVEL semantics against the
    * relational oracle at both SFs). */
  private def q129(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snapauto_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    GraftCatalog.readSnapshotAuto(s, root)
      .where(col("o_orderkey") <= mk / 4)
      .groupBy("pr")
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)").as("total"),
        countDistinct(col("o_custkey")).as("nc"))
      .orderBy("pr")
  }

  private val q129Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |fin AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
      |    o_orderpriority AS pr
      |  FROM orders, mk WHERE o_orderkey <= mk // 4)
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS nc
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  /** q130 — the snapshot table through PURE SQL: the aggregate is one
    * SQL text over the `graft_snapshot` table-valued function — no
    * DataFrame call site between the text and the versioned table —
    * with a WHERE that data-skips via the TVF's Catalyst-integrated
    * relation (metric-proven in SourcesCatalogSpec; here the
    * row-level semantics hash-match the relational oracle at both
    * SFs). The SQL a Thrift/notebook user would actually type. */
  private def q130(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snaptvf_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    graft.sources.GraftTvf.register(s)
    s.sql(
      s"""SELECT pr, COUNT(*) AS n,
         |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
         |  COUNT(DISTINCT o_custkey) AS nc
         |FROM graft_snapshot('$root')
         |WHERE o_orderkey <= ${mk / 4}
         |GROUP BY pr ORDER BY pr""".stripMargin)
  }

  private val q130Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |fin AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
      |    o_orderpriority AS pr
      |  FROM orders, mk WHERE o_orderkey <= mk // 4)
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS nc
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  /** q131 — the CDC changelog through PURE SQL: a 4-commit history
    * (base overwrite, two appends, a rollback) read back as one SQL
    * text over the `graft_snapshot_changes` TVF. The history is built
    * so every change set is RELATIONALLY identifiable (appends add
    * whole batches; the rollback's delete side is exactly the batch it
    * undoes), so DuckDB — which never sees the table format — recomputes
    * the per-(version, change) row counts and money sums from the
    * `orders` predicates alone. A hash match proves the file-level
    * changelog surfaces exactly the rows each commit added/removed. */
  private def q131(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snapchanges_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    GraftCatalog.commitSnapshot(orders.repartition(2), root, append = false)
    val batchA = orders.where(col("o_orderkey") % 7 === 0)
    val batchB = orders.where(col("o_orderkey") % 7 =!= 0 &&
      col("o_orderkey") % 13 === 0)
    GraftCatalog.commitSnapshot(batchA.repartition(1), root, append = true) // v2
    GraftCatalog.commitSnapshot(batchB.repartition(1), root, append = true) // v3
    GraftCatalog.rollbackSnapshot(s, root, 2L)                              // v4 undoes v3
    graft.sources.GraftTvf.register(s)
    s.sql(
      s"""SELECT _version, _change, COUNT(*) AS n,
         |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM graft_snapshot_changes('$root', 1, 4)
         |GROUP BY _version, _change ORDER BY _version, _change""".stripMargin)
  }

  private val q131Oracle: String =
    """WITH a AS (
      |  SELECT CAST(o_totalprice AS DOUBLE) AS price FROM orders
      |  WHERE o_orderkey % 7 = 0),
      |b AS (
      |  SELECT CAST(o_totalprice AS DOUBLE) AS price FROM orders
      |  WHERE o_orderkey % 7 <> 0 AND o_orderkey % 13 = 0)
      |SELECT CAST(2 AS BIGINT) AS _version, 'insert' AS _change,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total FROM a
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'insert', COUNT(*),
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) FROM b
      |UNION ALL
      |SELECT CAST(4 AS BIGINT), 'delete', COUNT(*),
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) FROM b
      |ORDER BY _version, _change""".stripMargin

  /** q132 — LAST-WINS CDC apply with multi-event keys, oracle-
    * reconciled: the 4-file orders snapshot takes ONE Debezium-shaped
    * batch in which some keys carry TWO events (a re-pricing U at
    * seq 1, then for every 20th key a D at seq 2) plus fresh inserts —
    * the shape a real replication feed delivers and the shape a naive
    * apply corrupts (landing both rows, or losing the delete).
    * `seqCol` reduces the batch to each key's final event before the
    * copy-on-write plan; the head's per-priority aggregate hash-matches
    * DuckDB's recompute of "delete the %20 keys, update the other %10
    * keys, insert the new ones" — i.e. last-wins apply == the feed's
    * sequential effect. */
  private def q132(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.df(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("price"),
      col("o_orderpriority").as("pr"))
    val root = s"/tmp/graft-index/snapseq_${math.abs(d.hashCode.toLong)}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(p, true)
    val mk = orders.agg(max("o_orderkey")).head().getLong(0)
    GraftCatalog.commitSnapshot(
      orders.repartitionByRange(4, col("o_orderkey")), root, append = false)
    val touched = orders.where(col("o_orderkey") % 10 === 0 &&
      col("o_orderkey") <= mk / 4)
    val upds = touched.select(col("o_orderkey"), col("o_custkey"),
      (col("price") + lit(50.0)).as("price"), lit("0-RUSH").as("pr"),
      lit("U").as("_op"), lit(1L).as("seq"))
    val lateDels = touched.where(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("price"), col("pr"),
        lit("D").as("_op"), lit(2L).as("seq"))
    val ins = orders.where(col("o_orderkey") % 1000 === 0)
      .select((col("o_orderkey") + lit(500000000L)).as("o_orderkey"),
        col("o_custkey"), col("price"), lit("9-NEW").as("pr"),
        lit("I").as("_op"), lit(1L).as("seq"))
    GraftCatalog.applyCdcSnapshot(s, root,
      upds.unionByName(lateDels).unionByName(ins), "o_orderkey",
      seqCol = Some("seq"))
    GraftCatalog.readSnapshot(s, root)
      .groupBy("pr")
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)").as("total"),
        countDistinct(col("o_custkey")).as("nc"))
      .orderBy("pr")
  }

  private val q132Oracle: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
      |del AS (
      |  SELECT o_orderkey FROM orders, mk
      |  WHERE o_orderkey % 20 = 0 AND o_orderkey <= mk // 4),
      |upd AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DOUBLE) + 50.0 AS price, '0-RUSH' AS pr
      |  FROM orders, mk
      |  WHERE o_orderkey % 10 = 0 AND o_orderkey % 20 <> 0
      |    AND o_orderkey <= mk // 4),
      |ins AS (
      |  SELECT o_orderkey + 500000000 AS o_orderkey, o_custkey,
      |    CAST(o_totalprice AS DOUBLE) AS price, '9-NEW' AS pr
      |  FROM orders WHERE o_orderkey % 1000 = 0),
      |base AS (
      |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
      |    o_orderpriority AS pr
      |  FROM orders
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
      |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)),
      |fin AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM upd
      |  UNION ALL SELECT * FROM ins)
      |SELECT pr, COUNT(*) AS n,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS nc
      |FROM fin GROUP BY pr ORDER BY pr""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q117_merge_cow", Some(q117Oracle), q117),
    Q("q119_delete_cow", Some(q119Oracle), q119),
    Q("q122_update_cow", Some(q122Oracle), q122),
    Q("q123_incr_mv", Some(q123Oracle), q123),
    Q("q124_replace_where", Some(q124Oracle), q124),
    Q("q126_cdc_apply", Some(q126Oracle), q126),
    Q("q129_auto_skip", Some(q129Oracle), q129),
    Q("q130_tvf_sql", Some(q130Oracle), q130),
    Q("q131_changes_tvf", Some(q131Oracle), q131),
    Q("q132_cdc_lastwins", Some(q132Oracle), q132))
}
