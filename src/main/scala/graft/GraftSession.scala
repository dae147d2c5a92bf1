package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory — the Spark analog of the reference's
  * SessionConfig tuning (reference: tests/opt_parallel_execution.rs:17,
  * docs/1 "Configuration Parameters").
  *
  * The reference tunes target_partitions / batch_size / repartition_*
  * by hand; Spark-first, we set the equivalents once and let AQE re-plan
  * at runtime (partition coalescing, skew-join splitting, dynamic
  * broadcast decisions). At cluster scale the same knobs hold: shuffle
  * partitions ≈ 2-3× total cores, 256 MB scan splits, dims under 64 MB
  * broadcast.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // the full SQL surface is a construction-time opt-in on stock
      // Spark; graft sessions carry it by default (DML lowering,
      // catalog reads, TVFs, native functions)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Local session sized from the SPARK_GRAFT_CPUS env contract. */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
  }
}
