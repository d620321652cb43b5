package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // left: observations; right: state changes for the same key
  private def obs = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
    (2L, 10L, ts("2024-01-01 10:05:00"), 2.0),
    (3L, 10L, ts("2024-01-01 09:00:00"), 3.0), // before any state row
    (4L, 20L, ts("2024-01-01 12:00:00"), 4.0)  // key with no state rows
  ).toDF("event_id", "user_id", "ts", "value")

  private def state = Seq(
    (10L, ts("2024-01-01 10:00:00"), 100.0, 50L), // simultaneous with obs 1
    (10L, ts("2024-01-01 10:03:00"), 103.0, 51L),
    (10L, ts("2024-01-01 10:03:00"), 104.0, 52L)  // equal-ts tie: higher id wins
  ).toDF("user_id", "ts", "value", "event_id")

  test("asOf: at-or-before, equal-ts inclusion, tie on tieCol, null when none") {
    val out = Joins.asOf(obs, state, "user_id", "ts", "event_id")
      .select($"event_id", $"asof.value".as[Option[Double]])
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(100.0)) // state at the same instant counts
    assert(out(2L) == Some(104.0)) // latest ts wins; tie broken by higher event_id
    assert(out(3L) == None)        // nothing precedes
    assert(out(4L) == None)        // key isolation
  }

  test("asOf: matched struct is atomic (fields come from one right row)") {
    // right rows with nulls in different attrs: a per-attr last() would mix
    val r = Seq(
      (10L, ts("2024-01-01 09:30:00"), Option(1.0), Option.empty[Long]),
      (10L, ts("2024-01-01 09:40:00"), Option.empty[Double], Option(7L))
    ).toDF("user_id", "ts", "a", "b")
      .withColumn("tie", monotonically_increasing_id())
    val out = Joins.asOf(
        obs.filter($"event_id" === 1L).withColumn("tie", lit(0L)),
        r, "user_id", "ts", "tie")
      .select($"asof.a", $"asof.b").collect().head
    assert(out.isNullAt(0) && out.getLong(1) == 7L) // both from the later row
  }

  test("asOf tolerance: stale matches null out, fresh ones survive") {
    val out = Joins.asOf(obs, state, "user_id", "ts", "event_id",
        tolerance = Some("3 MINUTES"))
      .select($"event_id", $"asof.value".as[Option[Double]])
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(100.0)) // age 0 — inside tolerance
    assert(out(2L) == Some(104.0)) // age 2 min — inside
    val tight = Joins.asOf(obs, state, "user_id", "ts", "event_id",
        tolerance = Some("1 MINUTES"))
      .select($"event_id", $"asof.value".as[Option[Double]])
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tight(2L) == None) // 2-min-old state is stale at 1-min bound
    assert(tight(1L) == Some(100.0))
  }

  test("asOf null semantics: null-ts/key state never matches; null-ts observation matches nothing") {
    val r = Seq(
      (Option(10L), Option(ts("2024-01-01 09:00:00")), 1.0, 1L),
      (Option(10L), Option.empty[Timestamp], 666.0, 2L),   // unordered state
      (Option.empty[Long], Option(ts("2024-01-01 09:30:00")), 667.0, 3L) // keyless state
    ).toDF("user_id", "ts", "value", "event_id")
    val l = Seq(
      (1L, Option(10L), Option(ts("2024-01-01 10:00:00")), 0.0),
      (2L, Option(10L), Option.empty[Timestamp], 0.0),     // null-ts observation
      (3L, Option.empty[Long], Option(ts("2024-01-01 10:00:00")), 0.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Joins.asOf(l, r, "user_id", "ts", "event_id")
      .select($"event_id", $"asof.value".as[Option[Double]])
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(out(1L) == Some(1.0))  // only the real state row matches
    assert(out(2L) == None)       // unordered observation matches nothing
    assert(out(3L) == None)       // keyless observation matches nothing
  }

  test("rangeJoin: boundary flags, bin-straddling points, key isolation") {
    val iv = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      (2L, 20L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"))
    ).toDF("iv_id", "user_id", "t0", "t1")
    val pts = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0),  // == start
      (10L, ts("2024-01-01 10:09:59"), 2.0),  // inside, later bin than t0
      (10L, ts("2024-01-01 10:10:00"), 3.0),  // == end
      (10L, ts("2024-01-01 10:10:01"), 4.0),  // past end
      (20L, ts("2024-01-01 10:05:00"), 5.0)   // other key
    ).toDF("user_id", "ts", "value")

    def vals(incStart: Boolean, incEnd: Boolean): Set[Double] =
      Joins.rangeJoin(iv, pts, "user_id", "t0", "t1", "user_id", "ts",
          binSeconds = 600, includeStart = incStart, includeEnd = incEnd)
        .filter($"iv_id" === 1L).select($"pt_value").as[Double].collect().toSet

    assert(vals(true, true) == Set(1.0, 2.0, 3.0))
    assert(vals(false, true) == Set(2.0, 3.0))
    assert(vals(false, false) == Set(2.0))
    // key isolation: interval 2 sees only its key's point
    val k2 = Joins.rangeJoin(iv, pts, "user_id", "t0", "t1", "user_id", "ts", 600)
      .filter($"iv_id" === 2L).select($"pt_value").as[Double].collect().toSet
    assert(k2 == Set(5.0))
  }

  test("rangeJoin: equals naive theta-join on a random-ish fixture, no dup pairs") {
    val iv = (0 until 40).map { i =>
      val start = ts(f"2024-01-01 ${10 + i % 4}%02d:${(i * 7) % 60}%02d:00")
      (i.toLong, (i % 3).toLong, start,
        new Timestamp(start.getTime + ((i % 5) + 1) * 240 * 1000L))
    }.toDF("iv_id", "k", "t0", "t1")
    val pts = (0 until 200).map { j =>
      (((j * 13) % 3).toLong,
        new Timestamp(ts("2024-01-01 10:00:00").getTime + ((j * 37) % 18000) * 1000L),
        j.toDouble)
    }.toDF("k", "ts", "value")
    val fast = Joins.rangeJoin(iv, pts, "k", "t0", "t1", "k", "ts", binSeconds = 300)
      .select($"iv_id", $"pt_value").as[(Long, Double)].collect().sorted.toSeq
    val naive = iv.join(pts.select($"k".as("pk"), $"ts", $"value"),
        $"k" === $"pk" && $"ts" >= $"t0" && $"ts" <= $"t1")
      .select($"iv_id", $"value").as[(Long, Double)].collect().sorted.toSeq
    assert(fast == naive)
    assert(fast.size == fast.distinct.size)
  }

  test("asOf equals the naive greatest-prior-row join on a random-ish fixture") {
    val rights = (0 until 120).map { i =>
      ((i % 5).toLong,
        new Timestamp(ts("2024-01-01 00:00:00").getTime + ((i * 37) % 7200) * 1000L),
        i.toDouble, (1000 + i).toLong)
    }.toDF("user_id", "ts", "value", "event_id")
    val lefts = (0 until 80).map { j =>
      (j.toLong, ((j * 13) % 5).toLong,
        new Timestamp(ts("2024-01-01 00:00:00").getTime + ((j * 91) % 7200) * 1000L))
    }.toDF("event_id", "user_id", "ts")
    val fast = Joins.asOf(lefts, rights, "user_id", "ts", "event_id")
      .select($"event_id", $"asof.event_id".as[Option[Long]])
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // naive: per left row, max-(ts, event_id) right row at-or-before
    val naive = lefts.as("l").join(rights.as("r"),
        $"l.user_id" === $"r.user_id" && $"r.ts" <= $"l.ts", "left")
      .groupBy($"l.event_id")
      .agg(max_by(struct($"r.ts", $"r.event_id"), struct($"r.ts", $"r.event_id")).as("m"))
      .select($"event_id", $"m.event_id".as[Option[Long]])
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fast == naive)
  }

  test("rangeJoin: reversed interval throws under strict, drops under strict=false") {
    val iv = Seq(
      (1L, 10L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:00:00")), // reversed
      (2L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"))
    ).toDF("iv_id", "user_id", "t0", "t1")
    val pts = Seq((10L, ts("2024-01-01 10:05:00"), 1.0)).toDF("user_id", "ts", "value")
    val ex = intercept[Exception] {
      Joins.rangeJoin(iv, pts, "user_id", "t0", "t1", "user_id", "ts", 600).count()
    }
    assert(ex.getMessage != null && ex.toString.contains("reversed interval")
      || Option(ex.getCause).exists(_.toString.contains("reversed interval")))
    val lax = Joins.rangeJoin(iv, pts, "user_id", "t0", "t1", "user_id", "ts", 600,
        strict = false)
      .select($"iv_id").as[Long].collect().toSeq
    assert(lax == Seq(2L)) // reversed interval dropped, valid one matches
  }

  test("scale shape: asOf is one shuffle and no join node; rangeJoin never cartesian") {
    val asofPlan = Joins.asOf(obs, state, "user_id", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(asofPlan).size == 1,
      s"asOf should shuffle exactly once:\n$asofPlan")
    assert(!asofPlan.contains("Join"), s"asOf must not plan a join:\n$asofPlan")
    val iv = Seq((1L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("iv_id", "user_id", "t0", "t1")
    val pts = Seq((10L, ts("2024-01-01 10:05:00"), 1.0)).toDF("user_id", "ts", "value")
    val rjPlan = Joins.rangeJoin(iv, pts, "user_id", "t0", "t1", "user_id", "ts", 600)
      .queryExecution.executedPlan.toString
    assert(!rjPlan.contains("CartesianProduct") && !rjPlan.contains("NestedLoop"),
      s"rangeJoin must stay an equi-join:\n$rjPlan")
  }
}
