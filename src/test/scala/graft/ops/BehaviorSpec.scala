package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions.when
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BehaviorSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // user 1 completes a->b->c in order; user 2 does b before a (b must not
  // count) then a, then c WITHOUT a middle b after a (c must not count);
  // user 3 only a; user 4 has a and b at the SAME ts — event_id breaks the
  // tie, so b (higher id) sees a strictly before it and counts.
  private def ev = Seq(
    (1L, 1L, "a", 10L), (2L, 1L, "b", 20L), (3L, 1L, "c", 30L),
    (4L, 2L, "b", 5L), (5L, 2L, "a", 10L), (6L, 2L, "c", 20L),
    (7L, 3L, "a", 10L),
    (8L, 4L, "a", 40L), (9L, 4L, "b", 40L)
  ).map { case (id, u, t, s) => (id, u, t, ts(s)) }
    .toDF("event_id", "user_id", "event_type", "ts")

  test("funnel: strict ordering, ties broken by event_id") {
    val out = Behavior.funnel(ev, Seq("a", "b", "c"))
      .orderBy("stage_idx")
      .select($"stage", $"n_users", $"conv_from_first", $"conv_from_prev")
      .as[(String, Long, Double, Double)].collect().toSeq
    // a: users 1,2,3,4; b in order: 1 (b after a) and 4 (tie, id-after);
    // user 2's b precedes its a. c in order: only user 1.
    assert(out == Seq(
      ("a", 4L, 1.0, 1.0),
      ("b", 2L, 0.5, 0.5),
      ("c", 1L, 0.25, 0.5)))
  }

  test("funnel: single stage degenerates to reach count") {
    val out = Behavior.funnel(ev, Seq("c")).select($"n_users")
      .as[Long].collect().toSeq
    assert(out == Seq(2L)) // users 1 and 2 have a c event
  }

  test("cohortRetention: epoch-week cohorts and offsets") {
    val wk = 604800L
    val e = Seq(
      (1L, 1L, wk * 100 + 5), (2L, 1L, wk * 101 + 6), (3L, 1L, wk * 103),
      (4L, 2L, wk * 101 + 1), (5L, 2L, wk * 101 + 2),
      (6L, 3L, wk * 100), (7L, 3L, wk * 101 - 1) // same week, offset 0 only
    ).map { case (id, u, s) => (id, u, "x", ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.cohortRetention(e)
      .orderBy("cohort_week", "week_offset")
      .select($"cohort_week", $"week_offset", $"n_users", $"retention")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (100L, 0L, 2L, 1.0), (100L, 1L, 1L, 0.5), (100L, 3L, 1L, 0.5),
      (101L, 0L, 1L, 1.0)))
  }

  test("transitions: per-user lag pairs, row-normalized probabilities") {
    val out = Behavior.transitions(ev)
      .orderBy("prev_type", "next_type")
      .select($"prev_type", $"next_type", $"n", $"prob")
      .as[(String, String, Long, Double)].collect().toSeq
    // user1: a->b, b->c; user2: b->a, a->c; user3: none; user4: a->b
    assert(out == Seq(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333),
      ("b", "a", 1L, 0.5), ("b", "c", 1L, 0.5)))
  }

  test("madOutliers: exact median/MAD per group, robust cut counts") {
    // group g: values 1..9 plus an extreme 1000 -> median 5.5 (interpolated
    // over 10 values), ad = |x-5.5| in {4.5,3.5,...,0.5, 994.5}, MAD =
    // median(0.5..4.5, 994.5) = 2.5; cut = 3*1.4826*2.5 = 11.1195 ->
    // only 1000 is an outlier. The z-score would have been wrecked by it.
    val d = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _))
      .toDF("grp", "v")
    val out = Behavior.madOutliers(d, Seq("grp"), "v")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(out == Seq(("g", 10L, 5.5, 2.5, 1L)))
  }

  test("rollingActive: sliding-window distinct users, windows clip nothing") {
    val day = 86400L
    val e = Seq(
      (1L, 1L, day * 10 + 5), (2L, 1L, day * 10 + 9),  // u1 day 10 (dup collapses)
      (3L, 1L, day * 12),                              // u1 day 12
      (4L, 2L, day * 13)                               // u2 day 13
    ).map { case (id, u, s) => (id, u, "x", ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.rollingActive(e, windowDays = 3)
      .orderBy("window_day")
      .as[(Long, Long)].collect().toSeq
    // u1 serves windows 10-12 (day10) and 12-14 (day12) -> 10,11,12,13,14
    // u2 serves windows 13,14,15
    assert(out == Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 2L),
      (14L, 2L), (15L, 1L)))
  }

  test("percentRankNormalize: rank-based, ties share a rank, single row -> 0") {
    val d = Seq(("g", 10L), ("g", 20L), ("g", 20L), ("g", 40L), ("h", 5L))
      .toDF("grp", "v")
    val out = Profile.percentRankNormalize(d, Seq("grp"), "v")
      .orderBy("grp", "v")
      .as[(String, Long, Double)].collect().toSeq
    // ranks in g over 4 rows: 10->0/3, 20->1/3 (both), 40->3/3
    assert(out == Seq(
      ("g", 10L, 0.0), ("g", 20L, 0.333333), ("g", 20L, 0.333333),
      ("g", 40L, 1.0), ("h", 5L, 0.0)))
  }

  test("quantileBins: equal-frequency bins with deterministic tie-break") {
    val d = (1 to 10).map(i => ("g", i.toLong, i.toLong))
      .toDF("grp", "v", "id")
    val out = Profile.quantileBins(d, Seq("grp"), "v", n = 2, tieCol = "id")
      .orderBy("bin")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("g", 1, 5L, 1L, 5L), ("g", 2, 5L, 6L, 10L)))
  }

  test("cusumChangePoint: finds the level shift at the regime boundary") {
    val day = 86400L
    // days 1-5 at 1.0/day, days 6-10 at 5.0/day -> mean 3, S bottoms at
    // -10 on day 5 (the last pre-shift day)
    val e = (1 to 10).map { d =>
      (d.toLong, 1L, "x", ts(day * d + 100), if (d <= 5) 1.0 else 5.0)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Behavior.cusumChangePoint(e, Seq("event_type"), "value")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("x", 10L, 5L, -10.0, 3.0)))
  }

  test("sessionLift: exact co-occurrence ratios over gap sessions") {
    // two users, one session each (all within the 30-min gap):
    // s1 = {a, b}, s2 = {a}; N=2, n_a=2, n_b=1, n_ab=1
    // lift(a,b) = 1*2/(2*1) = 1.0
    val e = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "b", 60L),
      (3L, 2L, "a", 0L), (4L, 2L, "a", 120L) // dup type collapses
    ).map { case (id, u, t0, s0) => (id, u, t0, ts(s0)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.sessionLift(e)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 1L, 1.0)))
  }

  test("funnelLatency: durations only for in-order completions") {
    // user 1 completes a->b in 10s; user 2's b precedes its a (no duration);
    // user 4's tie-broken b completes at 0s
    val out = Behavior.funnelLatency(ev, Seq("a", "b"))
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 2L, 5.0, 5.0))) // durations 10 and 0
  }

  test("rateAnomalies: deterministic peak, threshold strict") {
    val e = Seq(
      (1L, 1L, "x", 0L), (2L, 1L, "x", 10L), (3L, 1L, "x", 30L), // 3 in minute 0
      (4L, 1L, "x", 65L), (5L, 2L, "x", 0L), (6L, 2L, "x", 120L) // u2 max 1
    ).map { case (id, u, t0, s0) => (id, u, t0, ts(s0)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.rateAnomalies(e, threshold = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 3L)))
    assert(Behavior.rateAnomalies(e, threshold = 3).isEmpty)
  }

  test("bounceRate: single-event sessions per start day, exact ratio") {
    val day = 86400L
    val e = Seq(
      (1L, 1L, day * 5 + 10), (2L, 1L, day * 5 + 70),   // u1: 2-event session day 5
      (3L, 2L, day * 5 + 10),                            // u2: bounce day 5
      (4L, 3L, day * 6)                                  // u3: bounce day 6
    ).map { case (id, u, s0) => (id, u, "x", ts(s0)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.bounceRate(e).orderBy("day")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((5L, 2L, 1L, 0.5), (6L, 1L, 1L, 1.0)))
  }

  test("topPaths: first-k type sequences, short users keep short paths") {
    // fixture ev: u1 a,b,c; u2 b,a,c; u3 a; u4 a,b (tie by id)
    val out = Behavior.topPaths(ev, k = 3, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 1L), ("a > b", 1L), ("a > b > c", 1L), ("b > a > c", 1L)))
  }

  test("abTest: exact counts and the two-proportion z over them") {
    // control (even users 2,4): both convert (2/2); treatment (1,3): 1 of 2
    val e = Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "purchase", 10L),
      (3L, 2L, "purchase", 0L), (4L, 3L, "view", 0L),
      (5L, 4L, "purchase", 0L), (6L, 4L, "view", 10L)
    ).map { case (id, u, t0, s0) => (id, u, t0, ts(s0)) }
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("variant",
        when($"user_id" % 2 === 0, "control").otherwise("treatment"))
    val out = Behavior.abTest(e, "variant",
      org.apache.spark.sql.functions.col("event_type") === "purchase")
      .as[(String, Long, Long, Double, String, Long, Long, Double, Double, Double)]
      .collect().head
    val (va, na, ka, pa, vb, nb, kb, pb, diff, z) = out
    assert((va, na, ka, pa) == ("control", 2L, 2L, 1.0))
    assert((vb, nb, kb, pb) == ("treatment", 2L, 1L, 0.5))
    assert(diff == 0.5)
    // pooled p = 3/4; z = 0.5 / sqrt(0.75*0.25*(1))
    val expZ = BigDecimal(0.5 / math.sqrt(0.75 * 0.25 * (0.5 + 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(z == expZ)
  }

  test("abTestCuped: theta from exact moments, adjusted means, degenerate theta=0") {
    // users 1,3 = variant a; 2,4 = variant b. Pre-period (ts<100): x per
    // user; post (ts>=100): y. x = (2,4,6,8), y = x + noise(1,-1,1,-1):
    // perfectly correlated covariate -> theta near 1, adjustment removes
    // most of the x-driven spread
    val cut = 100L
    val rows = Seq(
      (1L, 1L, 2.0, 10L), (2L, 2L, 4.0, 20L),
      (3L, 3L, 6.0, 30L), (4L, 4L, 8.0, 40L),
      (5L, 1L, 3.0, 200L), (6L, 2L, 3.0, 210L),
      (7L, 3L, 7.0, 220L), (8L, 4L, 7.0, 230L))
      .map { case (id, u, v, s0) => (id, u, v, ts(s0)) }
      .toDF("event_id", "user_id", "value", "ts")
      .withColumn("variant", $"user_id" % 2)
    val out = Behavior.abTestCuped(rows, "variant", "value", cutoffEpoch = cut)
      .as[(String, Long, Double, Double, String, Long, Double, Double, Double)]
      .collect().head
    val (va, na, mya, maa, vb, nb, myb, myab, theta) = out
    assert((va, na) == ("0", 2L) && (vb, nb) == ("1", 2L))
    // replicate exactly: x=(2,4,6,8), y=(3,3,7,7); n=4, sx=20, sy=20,
    // sxx=120, sxy=116; theta=(4*116-400)/(4*120-400)=64/80=0.8; xbar=5
    assert(theta == 0.8)
    // yadj: u1: 3-0.8*(2-5)=5.4; u3: 7-0.8*1=6.2 -> variant 1 (users
    // 1,3) mean_adj=5.8; u2: 3-0.8*(-1)=3.8; u4: 7-0.8*3=4.6 ->
    // variant 0 (users 2,4) mean_adj=4.2; raw means 5.0 both
    assert((mya, myb) == (5.0, 5.0))
    assert((maa, myab) == (4.2, 5.8))
    // degenerate: identical pre-period -> var(x)=0 -> theta 0, adj == raw
    val flat = rows.withColumn("value",
      when(org.apache.spark.sql.functions.unix_timestamp($"ts") < cut, 1.0)
        .otherwise($"value"))
    val o2 = Behavior.abTestCuped(flat, "variant", "value", cutoffEpoch = cut)
      .as[(String, Long, Double, Double, String, Long, Double, Double, Double)]
      .collect().head
    assert(o2._9 == 0.0 && o2._3 == o2._4 && o2._7 == o2._8)
  }

  test("funnel plan: exactly one exchange up to the per-user aggregate") {
    val perUserPlan = Behavior.funnel(ev, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    // window pass + same-key reaggregation must share one user-hash
    // exchange; the stage summary adds only a single-partition exchange
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(perUserPlan).size
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$perUserPlan")
  }
}
