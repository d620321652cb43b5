package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("unpivot of pivot equals the direct groupBy (zero cells filtered)") {
    val dir = "/root/testdata/sf0.001"
    val got = Analytics.eventsUnpivot(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    val want = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"user_id", $"event_type")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // pivot manufactures zero cells for absent types; the melt must not
    // resurrect them as rows
    assert(!got.exists(_._3 == 0L))
  }

  test("sales anomalies: planted spike flags, warm-up days stay false") {
    // flat 100-a-day series with one 10x spike at day 20 and a mild
    // wiggle at day 25 that stays inside 3 sigma
    val daily = ((1L to 30L).map {
      case 20L => (20L, 1000L)
      case 25L => (25L, 101L)
      case d => (d, 100L)
    }).toDF("day", "x")
    val flags = graft.pipeline.Analytics.anomaliesFromDaily(daily)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert((1L to 7L).forall(!flags(_)), "warm-up days must be false")
    assert(flags(20L), "the 10x spike must flag")
    assert(!flags(25L), "a wiggle inside 3 sigma must not flag")
    // a flat window has sigma 0: the NEXT days after the spike rolls out
    // of frame are flat-on-flat -> (7x-s1)=0 >= 0 holds; days 21..27
    // still carry the spike in-frame with huge sigma -> false
    assert(!flags(21L) && !flags(24L))
  }

  test("event transitions: per-user sequencing, probabilities sum to 1 per from-state") {
    val got = Analytics.eventTransitions(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    // each from-row's probabilities sum to 1 (within the round(6) grain)
    got.groupBy(_._1).foreach { case (from, rows) =>
      val p = rows.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$from probabilities sum to $p")
      // counts and probabilities agree
      val n = rows.map(_._3).sum
      rows.foreach { r =>
        assert(math.abs(r._4 - r._3.toDouble / n) < 1e-6, r.toString) }
    }
    // transition count conservation: every user's k events yield k-1
    // transitions, so Σ n_trans = Σ_user (count - 1)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .agg(sum($"n" - 1)).as[Long].head()
    assert(got.map(_._3).sum == ev)
  }

  test("event transitions: sequencing window is per-user, never a global sort") {
    val plan = Analytics.eventTransitions(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
