package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.expr.Cleansing

/** Reference edge semantics preserved as-is (SURVEY.md §7.4 "Hard 3"). */
class CleansingSpec extends SparkSpec {
  import spark.implicits._

  test("E1: sec-vs-ms heuristic boundary at 1e11") {
    val df = Seq(
      1721033100.0, // seconds
      1721033100123.0, // milliseconds
      99999999999.0, // just below 1e11 → seconds
      100000000001.0 // just above → milliseconds
    ).toDF("epoch")
    val got = df.select(unix_timestamp(Cleansing.epochAutoToTs($"epoch")).as("s")).as[Long].collect()
    assert(got(0) == 1721033100L)
    assert(got(1) == 1721033100L)
    assert(got(2) == 99999999999L)
    assert(got(3) == 100000000L)
  }

  test("E6: trim-to-null — whitespace-only becomes null, padding stripped") {
    val df = Seq(" email ", "   ", "", "x").toDF("c")
    val got = df.select(Cleansing.trimToNull($"c")).collect().map(_.get(0))
    assert(got.toSeq == Seq("email", null, null, "x"))
  }

  test("P10: rating 0 and 6 null out; 1..5 kept (nulled, not rejected)") {
    val df = Seq(0, 1, 3, 5, 6).toDF("r")
    val got = df.select(Cleansing.cleanRating($"r")).collect().map(_.get(0))
    assert(got.toSeq == Seq(null, 1, 3, 5, null))
  }

  test("E8: deterministic anon id — 'anon' + 8 hex chars, stable per salt") {
    val df = Seq("s-001", "s-001", "s-002").toDF("salt")
    val got = df.select(Cleansing.anonId($"salt")).as[String].collect()
    assert(got(0) == got(1))
    assert(got(0) != got(2))
    assert(got.forall(_.matches("anon[0-9a-f]{8}")))
  }

  test("E9: engagement score taxonomy incl. else-branch") {
    val df = Seq("Click", "View", "Scroll", "Like", "Comment", "Search").toDF("e")
    val got = df.select(Cleansing.engagementScore($"e")).as[Int].collect()
    assert(got.toSeq == Seq(2, 1, 1, 3, 4, 1))
  }

  test("A5 semantics: entry/exit events are lexicographic min/max, not temporal") {
    // the reference's documented-odd behavior is replicated, not fixed
    val df = Seq(("s1", "View", 1L), ("s1", "Click", 2L), ("s1", "Scroll", 3L))
      .toDF("session_id", "event_type", "t")
    val got = df.groupBy($"session_id")
      .agg(min($"event_type").as("entry"), max($"event_type").as("exit"))
      .head()
    assert(got.getString(1) == "Click") // lexicographic, though View came first
    assert(got.getString(2) == "View")
  }

  test("E10: guarded percentage returns 0 for empty denominator") {
    val df = Seq((0L, 0L), (1L, 4L)).toDF("flag", "total")
    val got = df.select(Cleansing.guardedPct($"flag", $"total")).as[Double].collect()
    assert(got.toSeq == Seq(0.0, 25.0))
  }
}
