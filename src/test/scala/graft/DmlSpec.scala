package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, GraftDml}

/** SURVEY §2.A: SQL-parsed DML (`MERGE INTO` / `UPDATE` / `DELETE
  * FROM`) lowered onto the CoW verbs — the surface a pure-SQL client
  * needs to MUTATE versioned tables, not just read them via TVFs. */
class DmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val tmp = "/tmp/graft-dml"

  private def freshTable(prefix: String): String = {
    import spark.implicits._
    val root = s"$tmp/${prefix}_${System.nanoTime()}"
    GraftCatalog.commitSnapshot(
      spark.range(100).select(col("id"),
        (col("id") % 7).as("grp"), (col("id") * 10).as("amount")),
      root, append = false)
    root
  }

  test("DELETE FROM a backticked root path — registration-free SQL delete") {
    val root = freshTable("del")
    val out = GraftDml.sql(spark, s"DELETE FROM `$root` WHERE grp = 3")
    assert(out.columns.toSeq == Seq("version"))
    assert(out.head().getLong(0) == 2L, "delete publishes version 2")
    val left = GraftCatalog.readSnapshot(spark, root)
    assert(left.where(col("grp") === 3).count() == 0)
    assert(left.count() == 100 - 14) // ids ≡ 3 (mod 7): 14 of 0..99
    // time travel still serves the pre-delete rows
    assert(GraftCatalog.readSnapshot(spark, root, Some(1L)).count() == 100)
  }

  test("UPDATE with SET expressions over the pre-update row") {
    val root = freshTable("upd")
    GraftDml.sql(spark,
      s"UPDATE `$root` SET amount = amount + 1000, grp = 99 WHERE id < 10")
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.where(col("grp") === 99).count() == 10)
    assert(t.where(col("id") === 5).head().getLong(2) == 1050L)
    assert(t.where(col("id") === 50).head().getLong(2) == 500L,
      "non-matching rows untouched")
  }

  test("MERGE INTO upsert form with a VALUES source") {
    val root = freshTable("mrg")
    val out = GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (VALUES (5L, 0L, 999L), (200L, 1L, 111L) AS s(id, grp, amount)) AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(out.head().getLong(0) == 2L)
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 101, "one insert, one update")
    assert(t.where(col("id") === 5).head().getLong(2) == 999L)
    assert(t.where(col("id") === 200).head().getLong(2) == 111L)
  }

  test("registered name: DML by name and the read view tracks the head") {
    val root = freshTable("reg")
    GraftDml.registerSnapshotTable(spark, "dml_orders", root)
    assert(spark.table("dml_orders").count() == 100)
    GraftDml.sql(spark, "DELETE FROM dml_orders WHERE id >= 90")
    // the registered view was refreshed to the post-DML head
    assert(spark.table("dml_orders").count() == 90)
    GraftDml.sql(spark,
      """MERGE INTO dml_orders AS t
        |USING (SELECT 500L AS id, 2L AS grp, 42L AS amount) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("dml_orders").count() == 91)
    GraftDml.unregisterSnapshotTable(spark, "dml_orders")
  }

  test("INSERT INTO appends; INSERT OVERWRITE replaces; checks still gate") {
    val root = freshTable("ins")
    val v = GraftDml.sql(spark,
      s"INSERT INTO `$root` SELECT id, id % 7 AS grp, id * 10 AS amount FROM range(100, 120)")
    assert(v.head().getLong(0) == 2L)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 120)
    GraftDml.sql(spark,
      s"INSERT OVERWRITE `$root` SELECT id, id % 7 AS grp, id * 10 AS amount FROM range(50)")
    assert(GraftCatalog.readSnapshot(spark, root).count() == 50)
    // time travel across the SQL-ingested history
    assert(GraftCatalog.readSnapshot(spark, root, Some(2L)).count() == 120)
    // a CHECK constraint gates the SQL insert like any other writer
    GraftCatalog.addSnapshotCheck(spark, root, "amt-nonneg", "amount >= 0")
    intercept[graft.sources.SnapshotCheckViolation] {
      GraftDml.sql(spark,
        s"INSERT INTO `$root` SELECT 999L AS id, 0L AS grp, -5L AS amount")
    }
    // PARTITION clauses are refused: partitioning is hidden
    val e = intercept[IllegalArgumentException] {
      GraftDml.sql(spark,
        s"INSERT INTO `$root` PARTITION (grp=1) SELECT 1L AS id, 10L AS amount")
    }
    assert(e.getMessage.contains("HIDDEN partitioning"))
  }

  test("DELETE and UPDATE conditions may carry subqueries") {
    import spark.implicits._
    val root = freshTable("subq")
    Seq(1L, 3L, 5L).toDF("bad_id").createOrReplaceTempView("dml_bad_ids")
    GraftDml.sql(spark,
      s"DELETE FROM `$root` WHERE id IN (SELECT bad_id FROM dml_bad_ids)")
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 97)
    assert(t.where(col("id").isin(1L, 3L, 5L)).count() == 0)
    // scalar subquery in UPDATE's WHERE
    GraftDml.sql(spark,
      s"UPDATE `$root` SET amount = -1 WHERE id = (SELECT MAX(bad_id) + 1 FROM dml_bad_ids)")
    assert(GraftCatalog.readSnapshot(spark, root)
      .where(col("id") === 6L).head().getLong(2) == -1L)
  }

  test("MERGE ON with differently-named keys resolves by alias qualifier") {
    val root = freshTable("xkey")
    GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 7L AS src_id, 1L AS grp, 777L AS amount) AS s
         |ON t.id = s.src_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val tt = GraftCatalog.readSnapshot(spark, root)
    assert(tt.count() == 100)
    assert(tt.where(col("id") === 7L).head().getLong(2) == 777L)
    // flipped sides resolve too
    GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 900L AS k2, 2L AS grp, 9L AS amount) AS s
         |ON s.k2 = t.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(GraftCatalog.readSnapshot(spark, root).count() == 101)
    // unqualified different names are ambiguous → loud reject
    val e = intercept[IllegalArgumentException] {
      GraftDml.sql(spark,
        s"""MERGE INTO `$root` AS t
           |USING (SELECT 1L AS zz, 1L AS grp, 1L AS amount) AS s
           |ON id = zz
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("qualify both"))
  }

  test("MERGE full-sync shape: NOT MATCHED BY SOURCE DELETE mirrors the source") {
    val root = freshTable("sync")
    // source: ids 0..49 re-priced, plus a new key — everything else goes
    val out = GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT id, id % 7 AS grp, id * 100 AS amount
         |       FROM range(0, 50)
         |       UNION ALL SELECT 500L, 0L, 1L) AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(out.head().getLong(0) == 2L)
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 51, "table must BE the source after a full sync")
    assert(t.where(col("id") >= 50 && col("id") =!= 500).count() == 0,
      "rows absent from the source are deleted")
    assert(t.where(col("id") === 5).head().getLong(2) == 500L,
      "matched rows take the source image")
    assert(t.where(col("id") === 500).count() == 1)
    // time travel still serves the pre-sync state
    assert(GraftCatalog.readSnapshot(spark, root, Some(1L)).count() == 100)
    // a CONDITIONAL not-matched-by-source delete is NOT the sync shape
    // — it routes through the general path: only unmatched target rows
    // satisfying the condition delete, everything else stays
    val out2 = GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 1L AS id, 0L AS grp, 0L AS amount) AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND grp = 3 THEN DELETE""".stripMargin)
    assert(out2.head().getLong(0) == 3L)
    val t2 = GraftCatalog.readSnapshot(spark, root)
    // post-sync table was ids 0..49 (grp = id % 7) + (500, 0, 1);
    // unmatched rows with grp 3: ids 3,10,17,24,31,38,45 delete
    assert(t2.count() == 51 - 7)
    assert(t2.where(col("grp") === 3).count() == 0,
      "conditional by-source delete removes exactly the unmatched grp-3 rows")
    assert(t2.where(col("id") === 1).head().getLong(2) == 0L,
      "the one matched row takes the source image")
    assert(t2.where(col("id") === 500).count() == 1,
      "unmatched rows failing the by-source condition stay")
  }

  test("MERGE key-feed delete: WHEN MATCHED THEN DELETE removes listed keys") {
    val root = freshTable("kfd")
    // a bare key list (differently-named key) — absent keys no-op
    val out = GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT id * 2 AS victim FROM range(0, 10)
         |       UNION ALL SELECT 9999L) AS s
         |ON t.id = s.victim
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(out.head().getLong(0) == 2L)
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 90, "10 listed keys removed, absent 9999 no-ops")
    assert(t.where(col("id").isin(0L, 2L, 18L)).count() == 0)
    assert(t.where(col("id") === 1L).count() == 1)
    // time travel still serves the pre-delete rows
    assert(GraftCatalog.readSnapshot(spark, root, Some(1L)).count() == 100)
  }

  test("general MERGE: conditional assignments and an explicit INSERT list") {
    val root = freshTable("gen") // ids 0..99, grp = id%7, amount = id*10
    GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 3L AS key, 5L AS boost
         |       UNION ALL SELECT 5L, 9L
         |       UNION ALL SELECT 777L, 1L) AS s
         |ON t.id = s.key
         |WHEN MATCHED AND t.grp = 3 THEN UPDATE SET amount = t.amount + s.boost
         |WHEN NOT MATCHED THEN INSERT (id, grp, amount)
         |  VALUES (s.key, 0L, s.boost * 2)""".stripMargin)
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.where(col("id") === 3).head().getLong(2) == 35L,
      "matched row passing the condition takes the assignment")
    assert(t.where(col("id") === 5).head().getLong(2) == 50L,
      "matched row failing the condition stays untouched")
    assert(t.where(col("id") === 777).head() ==
      org.apache.spark.sql.Row(777L, 0L, 2L),
      "unmatched source row inserts via the explicit column list")
    assert(t.count() == 101)
  }

  test("general MERGE: conditional DELETE composed with star INSERT") {
    val root = freshTable("gendel")
    GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT id, id % 7 AS grp, 0L AS amount FROM range(0, 30)
         |       UNION ALL SELECT 600L, 1L, 11L) AS s
         |ON t.id = s.id
         |WHEN MATCHED AND t.amount < 100 THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.where(col("id") < 10).count() == 0,
      "matched rows passing the delete condition go")
    assert(t.where(col("id").between(10, 29)).count() == 20,
      "matched rows failing it stay")
    assert(t.where(col("id") === 600).head().getLong(2) == 11L)
    assert(t.count() == 91)
  }

  test("unsupported MERGE shapes are rejected loudly, not half-lowered") {
    val root = freshTable("shape")
    GraftDml.registerSnapshotTable(spark, "dml_shape", root)
    // a non-equality ON has no key to plan file nomination on
    val e = intercept[IllegalArgumentException] {
      GraftDml.sql(spark,
        """MERGE INTO dml_shape AS t
          |USING (SELECT 1L AS id, 0L AS grp, 0L AS amount) AS s
          |ON t.id > s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(e.getMessage.contains("MERGE ON"))
    // non-snapshot targets are not ours
    val e2 = intercept[IllegalArgumentException] {
      GraftDml.sql(spark, "DELETE FROM some_unknown_table WHERE x = 1")
    }
    assert(e2.getMessage.contains("not a snapshot-table DML"))
    GraftDml.unregisterSnapshotTable(spark, "dml_shape")
  }

  test("conditional INSERT alone, and a partial SET that must NOT classify as star") {
    val root = freshTable("cins")
    // conditional NOT MATCHED INSERT — previously rejected, now the
    // general path: only source rows passing the condition insert
    val out = GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT id + 200 AS id, id % 7 AS grp, id AS amount
         |       FROM range(0, 10)) AS s
         |ON t.id = s.id
         |WHEN NOT MATCHED AND s.amount > 5 THEN INSERT *""".stripMargin)
    assert(out.head().getLong(0) == 2L)
    val t = GraftCatalog.readSnapshot(spark, root)
    assert(t.count() == 104, "only the 4 rows with amount > 5 insert")
    assert(t.where(col("id") >= 200).agg(min("amount")).head().getLong(0) == 6L)
    // the HIGH-severity round-11 bug: `UPDATE SET amount = s.amount`
    // (1 of 3 columns, same-named) must be a PARTIAL update — grp must
    // keep the TARGET's value, not silently take the source's
    val out2 = GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 5L AS id, 999L AS grp, 777L AS amount) AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET amount = s.amount""".stripMargin)
    assert(out2.head().getLong(0) == 3L)
    val r5 = GraftCatalog.readSnapshot(spark, root).where(col("id") === 5).head()
    assert(r5.getLong(2) == 777L, "assigned column takes the source value")
    assert(r5.getLong(1) == 5L,
      "UNASSIGNED column keeps the target value — partial SET is not star")
  }

  test("multiple WHEN MATCHED clauses cascade first-match-wins; BY SOURCE UPDATE") {
    val root = freshTable("multi")
    val out = GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT id * 10 AS id, id AS delta FROM range(0, 8)) AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.delta >= 6 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET amount = t.amount + s.delta
         |WHEN NOT MATCHED BY SOURCE AND t.grp = 6 THEN UPDATE SET amount = -1
         |""".stripMargin)
    assert(out.head().getLong(0) == 2L)
    val t = GraftCatalog.readSnapshot(spark, root)
    // matched keys 0,10,…,70: delta>=6 → ids 60,70 delete (clause 1
    // NEVER sees them — first match wins); the rest add their delta
    assert(t.where(col("id").isin(60L, 70L)).count() == 0)
    assert(t.where(col("id") === 50).head().getLong(2) == 505L)
    assert(t.where(col("id") === 0).head().getLong(2) == 0L)
    // unmatched grp-6 rows (ids ≡ 6 mod 7, minus matched keys) take -1
    val g6 = t.where(col("grp") === 6 && !col("id").isin(20L))
    assert(g6.where(col("amount") =!= -1).count() == 0,
      "every unmatched grp-6 row takes the by-source update")
    assert(t.where(col("id") === 20).head().getLong(2) == 202L,
      "a MATCHED grp-6 row is NOT by-source material")
    assert(t.count() == 98)
  }

  test("composite-key MERGE: tuple identity, star upsert, key-feed delete, general path") {
    import spark.implicits._
    val root = s"$tmp/ck_${System.nanoTime()}"
    // (a, b) is the unique key tuple; v the payload
    GraftCatalog.commitSnapshot(
      spark.range(100).select((col("id") % 10).as("a"),
        expr("id DIV 10").as("b"), col("id").as("v")),
      root, append = false)
    // star upsert on the tuple: one matched update, one insert
    val out = GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 3L AS a, 2L AS b, 999L AS v
         |       UNION ALL SELECT 5L, 50L, 1L) AS s
         |ON t.a = s.a AND t.b = s.b
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(out.head().getLong(0) == 2L)
    val t1 = GraftCatalog.readSnapshot(spark, root)
    assert(t1.count() == 101)
    assert(t1.where(col("a") === 3 && col("b") === 2).head().getLong(2) == 999L,
      "the (3,2) tuple row takes the source image")
    assert(t1.where(col("a") === 3 && col("b") === 4).head().getLong(2) == 43L,
      "same a, different b is a DIFFERENT key — untouched")
    assert(t1.where(col("a") === 5 && col("b") === 50).count() == 1)
    // key-feed delete with differently-named composite keys
    GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 1L AS ka, 0L AS kb UNION ALL SELECT 9L, 99L) AS s
         |ON t.a = s.ka AND t.b = s.kb
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val t2 = GraftCatalog.readSnapshot(spark, root)
    assert(t2.count() == 100, "one listed tuple removed, absent (9,99) no-ops")
    assert(t2.where(col("a") === 1 && col("b") === 0).count() == 0)
    // general path on the tuple: conditional cross-side assignment
    GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 7L AS a, 3L AS b, 1000L AS v) AS s
         |ON t.a = s.a AND t.b = s.b
         |WHEN MATCHED AND t.v < s.v THEN UPDATE SET v = t.v + s.v""".stripMargin)
    assert(GraftCatalog.readSnapshot(spark, root)
      .where(col("a") === 7 && col("b") === 3).head().getLong(2) == 1037L)
    // non-conjunct ON still rejects
    val e = intercept[IllegalArgumentException](GraftDml.sql(spark,
      s"""MERGE INTO `$root` AS t
         |USING (SELECT 1L AS a, 1L AS b, 1L AS v) AS s
         |ON t.a = s.a OR t.b = s.b
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e.getMessage.contains("MERGE ON"))
  }

  test("composite-key nomination conjuncts per-column envelopes") {
    import graft.sources.{ColStat, FileStat}
    import spark.implicits._
    // f1: a∈[0,10] b∈[0,10]; f2: a∈[0,10] b∈[20,30]; f3: blind on b;
    // f4: all-NULL a (provably unmatchable); f5: no stats at all
    val stats = Map(
      "f1" -> FileStat("f1", 10, Seq(ColStat("a", "bigint", "0", "10", 0),
        ColStat("b", "bigint", "0", "10", 0))),
      "f2" -> FileStat("f2", 10, Seq(ColStat("a", "bigint", "0", "10", 0),
        ColStat("b", "bigint", "20", "30", 0))),
      "f3" -> FileStat("f3", 10, Seq(ColStat("a", "bigint", "5", "6", 0))),
      "f4" -> FileStat("f4", 10, Seq(ColStat("a", "bigint", null, null, 0),
        ColStat("b", "bigint", "0", "99", 0))))
    val files = Seq("f1", "f2", "f3", "f4", "f5")
    val keys = Seq((5L, 5L)).toDF("a", "b")
    // Below the small-table threshold the join short-circuits and every
    // enveloped file nominates (the pin scan resolves exactness more
    // cheaply than the join's fixed job) — f4 still drops, it is
    // PROVABLY unmatchable from the driver-held stats alone.
    val lazily = GraftCatalog.nominateFilesByKeys(spark, files, stats, keys,
      Seq("a", "b"))
    assert(lazily == Seq("f1", "f2", "f3", "f5"),
      s"short-circuit must nominate all enveloped + blind, minus " +
        s"impossible f4; got $lazily")
    // Force the envelope join (the ≥threshold big-table path) to test
    // the conjunct pruning itself.
    spark.conf.set("spark.graft.nominate.minEnvelopedFiles", "0")
    try {
      val got = GraftCatalog.nominateFilesByKeys(spark, files, stats, keys,
        Seq("a", "b"))
      assert(got == Seq("f1", "f3", "f5"),
        s"conjunct pruning: f2 (b out of range) and f4 (all-NULL a) drop; got $got")
      // a key tuple matching f2's b range keeps it
      val got2 = GraftCatalog.nominateFilesByKeys(spark, files, stats,
        Seq((5L, 25L)).toDF("a", "b"), Seq("a", "b"))
      assert(got2 == Seq("f2", "f3", "f5"), s"got $got2")
    } finally spark.conf.unset("spark.graft.nominate.minEnvelopedFiles")
  }

  test("property: multi-clause MERGE equals an independent reference over 5 seeds") {
    import spark.implicits._
    // the reference is a DRIVER-SIDE loop over collected rows — a
    // genuinely independent implementation of SQL MERGE semantics
    // (first-match-wins per group, by-source over unmatched target,
    // conditional insert over unmatched source), not a second Spark
    // plan that could share a bug with the engine under test
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed * 7919)
      val c1 = rnd.nextInt(400).toLong       // matched-delete threshold
      val c2 = rnd.nextInt(40).toLong        // insert threshold
      val c3 = rnd.nextInt(7).toLong         // by-source update group
      val c4 = rnd.nextInt(900).toLong       // by-source delete threshold
      val tRows = (0L until 60L).filter(_ => rnd.nextBoolean())
        .map(id => (id, id % 7, rnd.nextInt(1000).toLong))
      val sRows = (0L until 80L).filter(_ => rnd.nextInt(3) == 0)
        .map(id => (id, rnd.nextInt(60).toLong))
      val root = s"$tmp/prop_${seed}_${System.nanoTime()}"
      GraftCatalog.commitSnapshot(tRows.toDF("id", "grp", "amount")
        .repartitionByRange(3, col("id")), root, append = false)
      sRows.toDF("sid", "delta").createOrReplaceTempView(s"prop_feed_$seed")
      GraftDml.sql(spark,
        s"""MERGE INTO `$root` AS t USING prop_feed_$seed AS s
           |ON t.id = s.sid
           |WHEN MATCHED AND t.amount < $c1 THEN DELETE
           |WHEN MATCHED AND s.delta % 2 = 0 THEN
           |  UPDATE SET amount = t.amount + s.delta
           |WHEN MATCHED THEN UPDATE SET grp = -1
           |WHEN NOT MATCHED AND s.delta > $c2 THEN
           |  INSERT (id, grp, amount) VALUES (s.sid, 0, s.delta)
           |WHEN NOT MATCHED BY SOURCE AND t.grp = $c3 THEN
           |  UPDATE SET amount = 0
           |WHEN NOT MATCHED BY SOURCE AND t.amount > $c4 THEN DELETE
           |""".stripMargin)
      // reference
      val sMap = sRows.toMap
      val expected = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      tRows.foreach { case (id, g, a) =>
        sMap.get(id) match {
          case Some(dlt) =>
            if (a < c1) () // deleted
            else if (dlt % 2 == 0) expected(id) = (g, a + dlt)
            else expected(id) = (-1L, a)
          case None =>
            if (g == c3) expected(id) = (g, 0L)
            else if (a > c4) () // deleted
            else expected(id) = (g, a)
        }
      }
      val tKeys = tRows.map(_._1).toSet
      sRows.foreach { case (sid, dlt) =>
        if (!tKeys(sid) && dlt > c2) expected(sid) = (0L, dlt)
      }
      val got = GraftCatalog.readSnapshot(spark, root).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expected.toMap,
        s"seed $seed: MERGE diverged from the reference\n" +
          s"only-engine: ${(got.toSet -- expected.toSet).take(5)}\n" +
          s"only-ref: ${(expected.toSet -- got.toSet).take(5)}")
    }
  }

  test("pure spark.sql DML through GraftExtensions (Thrift-client wiring)") {
    // the production path: no Scala call site at all — the rule
    // injected at session construction lowers the parsed DML plans
    import org.apache.spark.sql.SparkSession
    val root = freshTable("ext")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dml-ext")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    try {
      val out = s2.sql(s"DELETE FROM `$root` WHERE grp = 0")
      assert(out.columns.toSeq == Seq("version") && out.head().getLong(0) == 2L)
      assert(GraftCatalog.readSnapshot(s2, root)
        .where(col("grp") === 0).count() == 0)
      s2.sql(s"UPDATE `$root` SET amount = 0 WHERE id = 99")
      assert(GraftCatalog.readSnapshot(s2, root)
        .where(col("id") === 99).head().getLong(2) == 0L)
      s2.sql(
        s"""MERGE INTO `$root` AS t
           |USING (SELECT 300L AS id, 1L AS grp, 7L AS amount) AS s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(GraftCatalog.readSnapshot(s2, root)
        .where(col("id") === 300).count() == 1)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      TestSpark.spark // restore the shared session as active
    }
  }
}
