package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.PatternMatch
import graft.operators.PatternMatch.Sym

/** MATCH_RECOGNIZE semantics of the PatternMatch operator, pinned on
  * constructed sequences where the expected matches are hand-checkable:
  * greedy quantifiers, alternation, non-overlapping scan (AFTER MATCH
  * SKIP PAST LAST ROW), the WITHIN-gap separator, unclassified-row
  * exclusion, and deterministic tie-break ordering. */
class PatternMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def seqOf(events: Seq[(String, Long, Long, String)], gap: Option[Long]) = {
    val s = spark
    import s.implicits._
    val df = events.toDF("u", "tmicros", "eid", "etype")
      .select(col("u"), timestamp_micros(col("tmicros")).as("ts"), col("eid"), col("etype"))
    PatternMatch.symbolSequence(df, "u", "ts", "eid",
      Seq(Sym('A', col("etype") === "a"), Sym('B', col("etype") === "b"),
        Sym('C', col("etype") === "c")),
      other = 'X', gapMicros = gap)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
  }

  test("sequence assembly: order by (ts, tie), unknown rows become the other symbol") {
    val got = seqOf(Seq(
      ("u1", 30L, 1L, "c"), ("u1", 10L, 1L, "a"), ("u1", 20L, 1L, "b"),
      // tie on ts=40 broken by eid: b(eid 1) before a(eid 2)
      ("u1", 40L, 2L, "a"), ("u1", 40L, 1L, "b"),
      ("u1", 50L, 1L, "zzz")), gap = None)
    assert(got("u1") == ((6L, "ABCBAX")))
  }

  test("WITHIN gap splices a separator that patterns cannot cross") {
    val got = seqOf(Seq(
      ("u1", 0L, 1L, "a"), ("u1", 100L, 2L, "b"),
      ("u1", 10000L, 3L, "c"), // 9900 > gap 5000 => break before this c
      ("u2", 0L, 1L, "a"), ("u2", 100L, 2L, "c")), gap = Some(5000L))
    assert(got("u1")._2 == "AB-C")
    assert(got("u2")._2 == "AC")
    val s = spark
    import s.implicits._
    val df = Seq(("u1", "AB-C"), ("u2", "AC")).toDF("u", "seq")
    val m = df.select(col("u"), PatternMatch.matchCount(col("seq"), "AB*C").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // u1's A,B …gap… C must NOT match; u2's AC (B* empty) must
    assert(m == Map("u1" -> 0L, "u2" -> 1L))
  }

  test("greedy quantifiers and non-overlapping SKIP PAST LAST ROW scan") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("q1", "ABBBC"), // A B+ C: greedy consumes all Bs
      ("q2", "ACACAC"), // three disjoint AC matches
      ("q3", "AAAA"), // A{2,}: ONE greedy match of all four, not two pairs… and not three overlapping
      ("q4", "ABCABC")).toDF("k", "seq")
    def counts(p: String) = df.select(col("k"), PatternMatch.matchCount(col("seq"), p).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("AB+C") == Map("q1" -> 1L, "q2" -> 0L, "q3" -> 0L, "q4" -> 2L))
    assert(counts("AC") == Map("q1" -> 0L, "q2" -> 3L, "q3" -> 0L, "q4" -> 0L))
    assert(counts("A{2,}") == Map("q1" -> 0L, "q2" -> 0L, "q3" -> 1L, "q4" -> 0L))
    assert(counts("A(B|C)+") == Map("q1" -> 1L, "q2" -> 3L, "q3" -> 0L, "q4" -> 2L))
    val first = df.select(col("k"), PatternMatch.firstMatch(col("seq"), "A(B|C)+").as("m"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(first("q1").contains("ABBBC") && first("q4").contains("ABC") && first("q3").isEmpty)
  }

  test("q96 runs at sf0.001 and match counts are internally consistent") {
    val rows = SparkEntry.queries("q96_pattern_match")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val withFunnel = r.getAs[Long]("n_funnel") > 0
      assert(withFunnel == (r.getAs[String]("first_funnel") != null),
        s"first_funnel presence disagrees with n_funnel for ${r.getAs[Long]("user_id")}")
      if (withFunnel) {
        val m = r.getAs[String]("first_funnel")
        assert(m.matches("S[CV]*P"), s"bad funnel match $m")
      }
    }
  }
}
