package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** MATCH_RECOGNIZE-style row-pattern matching over ordered event
  * streams (SQL:2016 row-pattern recognition, the sessionized-events
  * ask q73's fixed three-stage funnel cannot express).
  *
  * Execution model, Spark-first: classify each event into a single
  * SYMBOL character with ordinary codegen'd predicates, assemble one
  * ordered symbol STRING per partition key (the same per-key ordered
  * buffer MATCH_RECOGNIZE's engine builds), then run the PATTERN as a
  * regular expression over that string — quantifiers (`*` `+` `{n,}`),
  * alternation (`|`), and grouping come free from the regex engine,
  * with exactly MATCH_RECOGNIZE's default semantics: greedy
  * quantifiers, non-overlapping matches scanned left-to-right
  * (AFTER MATCH SKIP PAST LAST ROW). A `WITHIN gap` clause is encoded
  * structurally: a separator character is spliced between events whose
  * time delta exceeds the gap, so no match can span an inactivity
  * break — the pattern never mentions the separator, so it can never
  * cross one.
  *
  * Scale posture: one shuffle by partition key, one per-key ordered
  * array (bounded by per-user activity — the same state any
  * sessionization holds), all downstream work is codegen'd string
  * functions. Patterns must stay in the regex subset both Spark (Java
  * regex) and the DuckDB oracle (RE2) evaluate identically:
  * unambiguous concatenation/alternation/quantifiers, no lookaround,
  * no backreferences.
  *
  * Reference anchor: the reference's flagship is a time-ordered events
  * pipeline (tests/opt_parallel_execution.rs:33); this is its natural
  * sessionized-pattern extension (VERDICT r6 §next-3).
  */
object PatternMatch {

  /** One pattern symbol: a character and the row predicate that makes
    * an event that character. First matching symbol wins; rows
    * matching none become `other` (which patterns simply don't
    * mention). */
  final case class Sym(ch: Char, pred: Column)

  /** Per-key ordered symbol sequence.
    *
    * @param events    input rows
    * @param partCol   partition key (MATCH_RECOGNIZE PARTITION BY)
    * @param tsCol     timestamp column (ORDER BY, microsecond-floored)
    * @param tieCol    deterministic tie-break within equal timestamps
    * @param syms      symbol alphabet (first match wins)
    * @param other     character for rows matching no symbol
    * @param gapMicros WITHIN clause: splice a `-` between events whose
    *                  delta exceeds this, so matches cannot span it
    * @return one row per key: (pk, n_events, seq)
    */
  def symbolSequence(
      events: DataFrame,
      partCol: String,
      tsCol: String,
      tieCol: String,
      syms: Seq[Sym],
      other: Char = 'X',
      gapMicros: Option[Long] = None): DataFrame = {
    val symCol = syms.foldRight(lit(other.toString)) { case (sm, acc) =>
      when(sm.pred, lit(sm.ch.toString)).otherwise(acc)
    }
    val arr = events
      .select(col(partCol).as("pk"), unix_micros(col(tsCol)).as("t"),
        col(tieCol).as("tie"), symCol.as("sym"))
      .groupBy("pk")
      .agg(array_sort(collect_list(struct(col("t"), col("tie"), col("sym")))).as("evs"))
    val seq = gapMicros match {
      case None => expr("array_join(transform(evs, x -> x.sym), '')")
      case Some(g) => expr(
        s"""array_join(transform(sequence(0, size(evs) - 1),
           |  i -> case when i > 0 and evs[i].t - evs[i-1].t > ${g}L
           |            then concat('-', evs[i].sym) else evs[i].sym end), '')""".stripMargin)
    }
    arr.select(col("pk"), size(col("evs")).cast("long").as("n_events"), seq.as("seq"))
  }

  /** Non-overlapping match count of `pattern` over a symbol sequence
    * column (AFTER MATCH SKIP PAST LAST ROW). */
  def matchCount(seqCol: Column, pattern: String): Column =
    size(regexp_extract_all(seqCol, lit(pattern), lit(0))).cast("long")

  /** The first (leftmost) matched symbol substring, NULL when the
    * pattern never matches. */
  def firstMatch(seqCol: Column, pattern: String): Column =
    try_element_at(regexp_extract_all(seqCol, lit(pattern), lit(0)), lit(1))

  /** q96 — row-pattern recognition per user over events, WITHIN a
    * 24-hour inactivity bound: `S[CV]*P` (signup, any browse churn,
    * purchase — Kleene star + alternation-by-character-class) and
    * `E{2,}` (error bursts — bounded-repetition quantifier). Counts
    * are non-overlapping greedy matches; `first_funnel` shows the
    * actual matched step string. */
  private def q96(s: SparkSession, d: String): DataFrame = {
    val seqDf = symbolSequence(
      Tables.df(s, d, "events"),
      partCol = "user_id", tsCol = "ts", tieCol = "event_id",
      syms = Seq(
        Sym('S', col("event_type") === "signup"),
        Sym('C', col("event_type") === "click"),
        Sym('V', col("event_type") === "view"),
        Sym('P', col("event_type") === "purchase"),
        Sym('E', col("event_type") === "error")),
      gapMicros = Some(86400000000L))
    seqDf.select(
      col("pk").as("user_id"),
      col("n_events"),
      matchCount(col("seq"), "S[CV]*P").as("n_funnel"),
      matchCount(col("seq"), "E{2,}").as("n_bursts"),
      firstMatch(col("seq"), "S[CV]*P").as("first_funnel"))
      .orderBy("user_id")
  }

  private val q96Oracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, event_id,
      |    CASE event_type WHEN 'signup' THEN 'S' WHEN 'click' THEN 'C'
      |      WHEN 'view' THEN 'V' WHEN 'purchase' THEN 'P'
      |      WHEN 'error' THEN 'E' ELSE 'X' END AS sym
      |  FROM events),
      |p AS (
      |  SELECT user_id, t, event_id,
      |    CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
      |              > 86400000000
      |         THEN '-' || sym ELSE sym END AS piece
      |  FROM e),
      |s AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    string_agg(piece, '' ORDER BY t, event_id) AS seq
      |  FROM p GROUP BY user_id)
      |SELECT user_id, n_events,
      |  CAST(len(regexp_extract_all(seq, 'S[CV]*P')) AS BIGINT) AS n_funnel,
      |  CAST(len(regexp_extract_all(seq, 'E{2,}')) AS BIGINT) AS n_bursts,
      |  regexp_extract_all(seq, 'S[CV]*P')[1] AS first_funnel
      |FROM s ORDER BY user_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q96_pattern_match", Some(q96Oracle), q96))
}
