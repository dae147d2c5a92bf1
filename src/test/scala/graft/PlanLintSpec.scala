package graft

import org.scalatest.funsuite.AnyFunSuite

/** Corpus-wide plan lint: the regression guard over EVERY declared
  * query's physical plan. A CartesianProduct anywhere, or a
  * BroadcastNestedLoopJoin outside the pinned set of deliberate
  * 1-row-broadcast scalars, is how a 100 TB plan quietly goes
  * quadratic — this spec makes the set explicit and fails on growth.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("no cartesian products; nested-loop joins only where pinned") {
    // every entry here is a crossJoin(broadcast(<1-row aggregate>)) —
    // a corpus count / threshold / min-max scalar attached to each row.
    // Spark plans that as BroadcastNestedLoopJoin; with a 1-row build
    // side it is a constant attach, not a join explosion. Adding a
    // query to this set requires the same justification.
    val nlAllowed = Set(
      "q27_cross",              // the CROSS JOIN coverage op itself (5×5 dims)
      "q47_gap_fill",           // bounded calendar spine × keys
      "p06_sample_temperature", // broadcast per-source rate scalars
      "p07_e2e_pipeline",       // composes p06 — same broadcast rates
      "p14_oversample",         // broadcast multiplicity scalars
      "s01_ann_brute",          // broadcast single query vector
      "s04_ann_batch",          // broadcast 5-row query set
      "s06_ann_filtered",       // broadcast single query vector
      "s10_ann_recall_eval",    // s-family composition + 10-row truth
      "q19_subquery",           // scalar AVG subquery broadcast to every row
      "p11_mixture_weights",    // broadcast corpus-total token scalar
      "t20_tfidf",              // broadcast 1-row corpus doc count
      "t21_source_keyness",     // broadcast 1-row corpus token total
      "d19_incremental_verdicts", // broadcast 1-row id-space split scalar
      "t23_collocations",       // broadcast 1-row bigram/unigram totals
      "p23_alpha_mix",          // broadcast 1-row sqrt-size total scalar
      "s12_snapshot_ivf_maintain", // broadcast nlist(16)-row centroid model (assignment argmax)
      "t29_lm_perplexity")      // broadcast 1-row reference-vocab scalar
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val nl = plan.contains("BroadcastNestedLoop")
        if (cart) Some(s"$name: CartesianProduct")
        else if (nl && !nlAllowed(name)) Some(s"$name: unpinned BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty, s"plan lint:\n${offenders.mkString("\n")}")
  }

  test("declared-oracle queries emit only scalar top-level columns") {
    // The driver's comparison harness loads both sides into pandas and
    // sorts every column before hashing; an array/map/struct-typed
    // column is unhashable there (numpy.ndarray TypeError — the r8
    // q104 red row). Queries that WANT nested output either flatten it
    // (q44 array_join, q104 element_at) or declare no oracle. This
    // lint pins that contract corpus-wide at schema level — cheaper
    // than the driver round-trip and impossible to re-break silently.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val withOracle = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if withOracle(name) =>
        fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      case _ => Nil
    }
    assert(offenders.isEmpty,
      s"non-scalar columns in declared-oracle queries:\n${offenders.mkString("\n")}")
  }
}
