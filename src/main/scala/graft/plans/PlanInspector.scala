package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan inspection — the Spark analog of the reference's EXPLAIN
  * workflows (reference docs/3_cli_query_plans.md: tree/indent explain,
  * explain analyze/verbose) plus the assertions the reference makes by
  * reading plans: pushdown reached the scan, the join chose
  * CollectLeft/broadcast, aggregation is two-phase, codegen covers the
  * hot path. Used by PlanSpec and by the bench tuning loop.
  */
object PlanInspector {

  /** EXPLAIN (tree format analog). */
  def formatted(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  /** EXPLAIN VERBOSE analog: parsed → analyzed → optimized → physical. */
  def extended(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExtendedMode)

  /** The physical plan with AQE's wrapper unwrapped (pre-execution
    * initial plan; AQE may re-plan at runtime). */
  def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(walk)
    walk(physical(df))
  }

  def nodeNames(df: DataFrame): Seq[String] = nodes(df).map(_.nodeName)

  /** PushedFilters strings from every parquet scan in the plan. */
  def pushedFilters(df: DataFrame): Seq[String] =
    "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(formatted(df)).toSeq

  /** ReadSchema strings — proves column pruning reached the scan. */
  def readSchemas(df: DataFrame): Seq[String] =
    "ReadSchema: [^\\n]*".r.findAllIn(formatted(df)).toSeq

  def usesBroadcastHashJoin(df: DataFrame): Boolean =
    nodeNames(df).exists(_.contains("BroadcastHashJoin"))

  def usesShuffleJoin(df: DataFrame): Boolean =
    nodeNames(df).exists(n => n.contains("SortMergeJoin") || n.contains("ShuffledHashJoin"))

  /** Two-phase aggregation (reference docs/7 Partial & Final): at least
    * two HashAggregate nodes on the path. */
  def hasTwoPhaseAgg(df: DataFrame): Boolean =
    nodeNames(df).count(_.contains("HashAggregate")) >= 2

  /** Number of WholeStageCodegen spans — wider is better for the hot
    * path (SURVEY.md §4). Forces codegen planning via CodegenMode: under
    * AQE the pre-execution plan string hides codegen wrapping. */
  def codegenSpans(df: DataFrame): Int =
    "WholeStageCodegen".r
      .findAllIn(df.queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode))
      .length

  /** Top-K plan check: sort+limit must collapse to TakeOrderedAndProject. */
  def usesTakeOrdered(df: DataFrame): Boolean =
    nodeNames(df).exists(_.contains("TakeOrderedAndProject"))

  final case class Analyzed(rows: Long, wallSec: Double, finalPlan: String)

  /** EXPLAIN ANALYZE analog (reference docs/3): execute, then report
    * row count, wall time, and the post-AQE final plan. */
  def analyze(df: DataFrame): Analyzed = {
    val t0 = System.nanoTime()
    val rows = df.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Analyzed(rows, wall, df.queryExecution.executedPlan.toString)
  }

  /** In-flight metric collection via Dataset.observe — the runtime half
    * of EXPLAIN ANALYZE: named aggregates are accumulated DURING the
    * run (zero extra passes, works identically under streaming) and
    * read back after the action. Returns the observed row as a map. */
  def observed(df: DataFrame, name: String,
      first: org.apache.spark.sql.Column,
      rest: org.apache.spark.sql.Column*): Map[String, Any] = {
    val obs = new org.apache.spark.sql.Observation(name)
    df.observe(obs, first, rest: _*).write.format("noop").mode("overwrite").save()
    obs.get
  }

  /** One row of the before/after-AQE plan diff. `kind` ∈ node_count
    * (a physical node whose count changed between the initial and the
    * runtime-re-planned tree), join_strategy (the join lineup flipped,
    * e.g. SortMergeJoin → BroadcastHashJoin), skew_split (an
    * AQEShuffleRead split a skewed partition into partial-reducer
    * reads), coalesce (an AQEShuffleRead merged small partitions). */
  final case class AqeDiffEntry(kind: String, before: String, after: String)

  private def walkAll(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: (kids ++ p.subqueries).flatMap(walkAll)
  }

  /** One scan's runtime partition-pruning outcome. `partitions_read`
    * and `files_read` are post-pruning actuals; `static_files` is the
    * file count after static filters alone (so files_read <
    * static_files is the DPP win); -1 = the metric does not exist on
    * this scan (e.g. unpartitioned). */
  final case class DppScanEntry(scan: String, dynamic: Boolean,
      partitions_read: Long, files_read: Long, static_files: Long,
      pruning_time_ms: Long)

  /** Runtime partition-pruning report — aqeDiff's sibling for DPP:
    * execute `df`, then report per file scan whether a dynamic-pruning
    * subquery was attached and what it actually read (partitions,
    * files, pruning wall time). EXPLAIN shows `dynamicpruning#N` as an
    * opaque placeholder; the interesting number — how many partitions
    * SURVIVED at runtime — only exists in post-execution metrics. */
  def dppReport(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
    import org.apache.spark.sql.execution.FileSourceScanExec
    val spark = df.sparkSession
    val root = df.queryExecution.executedPlan
    root.execute().foreachPartition(_ => ())
    val finalPlan = root match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val entries = walkAll(finalPlan).collect { case s: FileSourceScanExec =>
      def m(name: String): Long =
        s.metrics.get(name).map(_.value).getOrElse(-1L)
      DppScanEntry(
        s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?"),
        s.partitionFilters.exists(_.exists(_.isInstanceOf[DynamicPruningExpression])),
        m("numPartitions"), m("numFiles"), m("staticFilesNum"), m("pruningTime"))
    }
    spark.createDataFrame(entries)
  }

  /** One exchange's actual runtime volume. `records` / `bytes` are the
    * shuffle WRITE side (what crossed the wire); for broadcasts,
    * `records` is the broadcast row count and `bytes` its build size.
    * -1 = metric absent on this node. */
  final case class ExchangeEntry(kind: String, partitioning: String,
      out_partitions: Int, records: Long, bytes: Long)

  /** Exchange audit — dppReport's sibling for SHUFFLES: execute `df`,
    * then report what every Exchange actually moved (records, bytes,
    * partitioning). EXPLAIN shows that a shuffle exists; whether the
    * plan is 100 TB-viable is decided by its VOLUME — a two-phase
    * aggregate whose exchange carries |groups| records is fine, one
    * carrying |rows| is a full-table re-shuffle; a broadcast side
    * growing past memory is a flipped plan waiting to happen. This
    * surfaces those numbers post-execution, per exchange, as rows. */
  def shuffleReport(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val spark = df.sparkSession
    val root = df.queryExecution.executedPlan
    root.execute().foreachPartition(_ => ())
    val finalPlan = root match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val entries = walkAll(finalPlan).collect {
      case e: ShuffleExchangeExec =>
        def m(n: String): Long = e.metrics.get(n).map(_.value).getOrElse(-1L)
        ExchangeEntry("shuffle",
          e.outputPartitioning.getClass.getSimpleName,
          e.outputPartitioning.numPartitions,
          m("shuffleRecordsWritten"), m("shuffleBytesWritten"))
      case b: BroadcastExchangeExec =>
        def m(n: String): Long = b.metrics.get(n).map(_.value).getOrElse(-1L)
        ExchangeEntry("broadcast",
          b.outputPartitioning.getClass.getSimpleName,
          b.outputPartitioning.numPartitions,
          m("numOutputRows"), m("dataSize"))
    }
    spark.createDataFrame(entries)
  }

  /** EXPLAIN-diff (VERDICT r7 item 8): execute `df`, then diff AQE's
    * initial physical plan against the runtime-re-planned final tree as
    * one queryable DataFrame — what the reference's docs/3–8 narrative
    * walks through (plan before, plan after, what the optimizer did) as
    * a first-class surface instead of two walls of EXPLAIN text.
    * Runs the query (noop sink) because the final plan only exists
    * after execution. */
  def aqeDiff(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.{CoalescedPartitionSpec, PartialReducerPartitionSpec}
    import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, ShuffleQueryStageExec}
    val spark = df.sparkSession
    val entries: Seq[AqeDiffEntry] = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        // drive THIS plan's RDD (a noop-sink write would execute a
        // separate command QueryExecution and leave this one unplanned);
        // no rows reach the driver
        a.execute().foreachPartition(_ => ())
        val ini = walkAll(a.initialPlan)
        val fin = walkAll(a.executedPlan)
        def counts(ns: Seq[SparkPlan]): Map[String, Int] =
          ns.groupBy(_.nodeName).view.mapValues(_.size).toMap
        val (ci, cf) = (counts(ini), counts(fin))
        val nodeDeltas = (ci.keySet ++ cf.keySet).toSeq.sorted
          .filter(k => ci.getOrElse(k, 0) != cf.getOrElse(k, 0))
          .map(k => AqeDiffEntry("node_count",
            s"$k x${ci.getOrElse(k, 0)}", s"$k x${cf.getOrElse(k, 0)}"))
        def joinLineup(ns: Seq[SparkPlan]): String =
          ns.map(_.nodeName).filter(_.contains("Join")).sorted.mkString(", ")
        val joins = (joinLineup(ini), joinLineup(fin)) match {
          case (b, aft) if b != aft => Seq(AqeDiffEntry("join_strategy", b, aft))
          case _ => Nil
        }
        val reads = fin.collect { case r: AQEShuffleReadExec =>
          val mapPartitions = r.child match {
            case s: ShuffleQueryStageExec =>
              s"${s.shuffle.numPartitions} shuffle partitions"
            case other => other.nodeName
          }
          val skew = r.partitionSpecs.count(_.isInstanceOf[PartialReducerPartitionSpec])
          val coalesced = r.partitionSpecs.count(_.isInstanceOf[CoalescedPartitionSpec])
          AqeDiffEntry(if (skew > 0) "skew_split" else "coalesce",
            mapPartitions,
            s"${r.partitionSpecs.size} reads ($skew skew-split, $coalesced coalesced)")
        }
        nodeDeltas ++ joins ++ reads
      case p =>
        Seq(AqeDiffEntry("no_aqe", p.nodeName, p.nodeName))
    }
    spark.createDataFrame(entries)
  }

  final case class TaskSkewEntry(stage_id: Int, n_tasks: Int,
      max_run_ms: Long, p50_run_ms: Long,
      max_records: Long, p50_records: Long, record_skew: Option[Double])

  /** Per-stage TASK skew audit — the third leg of the runtime
    * observability trio (aqeDiff: what AQE re-planned; shuffleReport:
    * what the exchanges moved; this: how evenly the TASKS inside each
    * stage carried it). A plan can be shuffle-lean and still die at
    * 100 TB because one straggler task holds 100× the median's rows —
    * the number that exists nowhere in EXPLAIN and only per-task in the
    * UI. Executes the plan's own RDD (the aqeDiff gotcha) with a
    * listener attached, drains the async bus until every started job's
    * end event has arrived (bounded), and rolls task runtimes + input/
    * shuffle-read record counts up per stage. `record_skew`
    * (max/median records) is the DETERMINISTIC skew signal — assert on
    * it, not on wall-clock, which this report carries for humans. */
  def taskSkewReport(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val tasks = new scala.collection.concurrent.TrieMap[(Int, Long), (Long, Long)]
    @volatile var jobsStarted = 0
    @volatile var jobsDone = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobsStarted += 1
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobsDone += 1
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          tasks.update((t.stageId, t.taskInfo.taskId),
            (m.executorRunTime,
              m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // CONSUME each partition's iterator — a no-op foreachPartition
    // never pulls a row, so lazy final stages would report zero
    // shuffle-read records (and do zero work)
    try df.queryExecution.executedPlan.execute()
      .foreachPartition(it => it.foreach(_ => ()))
    finally {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while ((jobsStarted == 0 || jobsDone < jobsStarted) &&
        System.nanoTime() < deadline) Thread.sleep(20)
      spark.sparkContext.removeSparkListener(listener)
    }
    def med(a: Seq[Long]): Long = a.sorted.apply(a.size / 2)
    val entries = tasks.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).map {
      case (sid, xs) =>
        val runs = xs.map(_._2._1)
        val recs = xs.map(_._2._2)
        TaskSkewEntry(sid, xs.size, runs.max, med(runs), recs.max, med(recs),
          if (med(recs) > 0)
            Some(math.round(recs.max.toDouble / med(recs) * 100) / 100.0)
          else None)
    }
    spark.createDataFrame(entries)
  }
}
