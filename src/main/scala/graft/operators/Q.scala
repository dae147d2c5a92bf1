package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coverage entry from SURVEY.md §2: a Spark-first implementation and,
  * when SQL-expressible, the equivalent DuckDB oracle SQL the driver runs
  * at sf0.01. `oracle = None` ⇒ driver records a rows-only check.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
