package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ResampleRangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // user 1: events in hours 0 and 3 (gap hours 1, 2); user 2: hour 1 only
  private def events = Seq(
    (1L, "2024-01-01 00:10:00", 10.0),
    (1L, "2024-01-01 00:40:00", 5.0),
    (1L, "2024-01-01 03:20:00", 7.0),
    (2L, "2024-01-01 01:05:00", 2.0))
    .toDF("user_id", "ts_s", "value")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  test("resample materializes gap buckets with n_events=0 and LOCF sums") {
    val out = Resample.locf(events, "user_id", "ts", "value")
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val u1 = out.filter(_._1 == 1L)
    assert(u1.length == 4, "hours 0..3 inclusive, gaps included")
    assert(u1.map(_._3).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(u1.map(_._4).toSeq == Seq(15.0, 15.0, 15.0, 7.0), "LOCF across the gap")
    val u2 = out.filter(_._1 == 2L)
    assert(u2.length == 1 && u2.head._3 == 1L && u2.head._4 == 2.0)
  }

  test("resample bucket ids are absolute epoch buckets, not per-key indexes") {
    val out = Resample.locf(events, "user_id", "ts", "value")
      .where(col("user_id") === 2L).select("bucket").as[Long].head()
    assert(out == java.sql.Timestamp.valueOf("2024-01-01 01:05:00").getTime / 1000 / 3600)
  }

  private def points = Seq(
    (1L, 10L, 100L), (2L, 10L, 250L), (3L, 10L, 9999L), (4L, 20L, 100L))
    .toDF("point_id", "k", "p")

  // interval spanning many bins (10..5000 at binSize=100 covers 50 bins):
  // the bin trick must still yield each match exactly ONCE
  private def intervals = Seq(
    (100L, 10L, 10L, 5000L), (200L, 10L, 240L, 260L), (300L, 20L, 90L, 110L))
    .toDF("iv_id", "ik", "lo", "hi")

  test("bucketed range join: containment with keys, each match exactly once") {
    val out = RangeJoin.bucketed(points, "p", intervals, "lo", "hi",
      keys = Seq("k" -> "ik"), binSize = 100L)
      .select("point_id", "iv_id").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 100L), (2L, 100L), (2L, 200L), (4L, 300L)))
  }

  test("bucketed range join: bounds are inclusive on both ends") {
    val pts = Seq((1L, 1L, 240L), (2L, 1L, 260L), (3L, 1L, 239L), (4L, 1L, 261L))
      .toDF("point_id", "k", "p")
    val ivs = Seq((9L, 1L, 240L, 260L)).toDF("iv_id", "ik", "lo", "hi")
    val out = RangeJoin.bucketed(pts, "p", ivs, "lo", "hi",
      keys = Seq("k" -> "ik"), binSize = 50L)
      .select("point_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("bucketed range join drops interval-side key and bin columns") {
    val out = RangeJoin.bucketed(points, "p", intervals, "lo", "hi",
      keys = Seq("k" -> "ik"), binSize = 100L)
    assert(!out.columns.contains("ik") && !out.columns.contains("__bin"))
  }

  test("overlap join: each intersecting pair exactly once, inclusive bounds, keyed") {
    val l = Seq(
      (1L, 1L, 100L, 450L),  // spans bins 1-4: overlaps r1 (once!), r2 touch
      (2L, 1L, 500L, 600L),  // disjoint from r1/r2, overlaps r3
      (3L, 2L, 100L, 450L)   // same span, OTHER key: only r4 matches
    ).toDF("l_id", "lk", "l_lo", "l_hi")
    val r = Seq(
      (10L, 1L, 150L, 400L), // inside l1 across 3 shared bins
      (20L, 1L, 450L, 470L), // touches l1 at exactly 450 (inclusive)
      (30L, 1L, 580L, 900L),
      (40L, 2L, 440L, 800L)
    ).toDF("r_id", "rk", "r_lo", "r_hi")
    val out = RangeJoin.overlapBucketed(l, "l_lo", "l_hi", r, "r_lo", "r_hi",
      keys = Seq("lk" -> "rk"), binSize = 100L)
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 10L), (1L, 20L), (2L, 30L), (3L, 40L)))
    // brute-force cross-check on the same data: identical pair set
    val brute = l.join(r, col("lk") === col("rk") &&
        col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted
    assert(out.toSeq == brute.toSeq)
  }

  test("topKPerGroup: dense 1-based ranks, groups smaller than k kept whole") {
    val df = Seq((1L, 30.0, "a"), (1L, 20.0, "b"), (1L, 10.0, "c"),
      (2L, 5.0, "d")).toDF("g", "v", "tag")
    val out = Ops.topKPerGroup(df, Seq("g"), Seq(col("v").desc, col("tag").asc), 2)
      .select("g", "rnk", "tag").as[(Long, Long, String)].collect().sorted
    assert(out.toSeq == Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "d")))
  }

  test("histogram clamps tails into the edge buckets and skips empty bins") {
    val df = Seq(-5.0, 1.0, 2.0, 55.0, 1000.0).toDF("x")
    val out = Profile.histogram(df, "x", width = 10.0, maxBucket = 3)
      .orderBy("bucket")
      .select("bucket", "n").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 3L), (3L, 2L)), "negatives→0, overflow→max")
  }

  test("quantileTrim keeps exactly the interpolated-quantile interior") {
    val df = (1 to 100).map(_.toLong).toDF("v")
    val out = Profile.quantileTrim(df, "v", 0.05, 0.95)
      .agg(min(col("v")), max(col("v")), count(lit(1)))
      .as[(Long, Long, Long)].head()
    // percentile(1..100, .05) = 5.95, (.95) = 95.05 → keep 6..95
    assert(out == ((6L, 95L, 90L)))
  }
}
