package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // user 1: clicks at 100, 200; purchases at 150 (-> click 100),
  //         200 (exact tie -> click 200), 9999 (beyond tolerance -> null)
  // user 2: purchase at 50 with no click at all -> null
  private def clicks = Seq((1L, 10L, ts(100)), (1L, 11L, ts(200)))
    .toDF("user_id", "c_id", "t")
  private def purchases = Seq(
    (1L, 20L, ts(150)), (1L, 21L, ts(200)), (1L, 22L, ts(9999)),
    (2L, 23L, ts(50))).toDF("user_id", "p_id", "t")

  test("latest at-or-before match, exact ties included") {
    val out = AsOfJoin.lastPrior(purchases, clicks, Seq("user_id"), "t",
      refPayloadCols = Seq("c_id"), lagCol = Some("lag_us"))
      .select("p_id", "c_id", "lag_us")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(20L) == (Some(10L), Some(50000000L)))
    assert(out(21L) == (Some(11L), Some(0L))) // tie: ref sorts first
    assert(out(22L) == (Some(11L), Some(9799000000L))) // no tolerance set
    assert(out(23L) == (None, None))
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.lastPrior(purchases, clicks, Seq("user_id"), "t",
      refPayloadCols = Seq("c_id"), toleranceSec = Some(3600))
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toMap
    assert(out(20L).contains(10L))
    assert(out(22L).isEmpty) // 9799s > 3600s
  }

  test("matches a brute-force reference on random event sets") {
    val rng = new scala.util.Random(31)
    val probes = Seq.tabulate(60)(i =>
      (rng.nextInt(4).toLong, 1000L + i, ts(rng.nextInt(500).toLong)))
    val refs = Seq.tabulate(40)(i =>
      (rng.nextInt(4).toLong, 2000L + i, ts(rng.nextInt(500).toLong)))
    // brute force: latest ref with rt <= pt per user; ties by max c_id
    // cannot occur (ref timestamps deduped per user below)
    val refsDedup = refs.groupBy(r => (r._1, r._3.getTime))
      .map(_._2.head).toSeq
    val expected = probes.map { case (u, pid, pt) =>
      val cands = refsDedup.filter(r => r._1 == u && !r._3.after(pt))
      pid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(_._3.getTime)._2))
    }.toMap
    val got = AsOfJoin.lastPrior(
      probes.toDF("user_id", "p_id", "t"), refsDedup.toDF("user_id", "c_id", "t"),
      Seq("user_id"), "t", refPayloadCols = Seq("c_id"))
      .select("p_id", "c_id").as[(Long, Option[Long])].collect().toMap
    assert(got == expected)
  }

  test("colliding payload names get the suffix") {
    val refWithClash = clicks.withColumnRenamed("c_id", "p_id")
    val cols = AsOfJoin.lastPrior(purchases, refWithClash, Seq("user_id"), "t",
      refPayloadCols = Seq("p_id")).columns.toSeq
    assert(cols == Seq("user_id", "p_id", "t", "p_id_ref"))
  }
}
