package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class Scd2Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // key 1: I then two U's; key 2: I then D; key 3: I, D, re-I; key 4: I only
  private def changes = Seq(
    (1L, 1L, "I", "a", 10.0), (1L, 3L, "U", "a1", 11.0), (1L, 5L, "U", "a2", 12.0),
    (2L, 1L, "I", "b", 20.0), (2L, 4L, "D", null, 0.0),
    (3L, 1L, "I", "c", 30.0), (3L, 2L, "D", null, 0.0), (3L, 6L, "I", "c2", 31.0),
    (4L, 2L, "I", "d", 40.0)
  ).toDF("id", "seq", "op", "tag", "v")

  private def hist = Scd2.buildHistory(changes, "id", "seq", "op")

  private type Row6 = (Long, String, Double, Long, Option[Long], Int)
  private def rows(df: DataFrame): Seq[Row6] =
    df.orderBy("id", "valid_from")
      .select($"id", $"tag", $"v", $"valid_from", $"valid_to", $"is_current")
      .as[Row6].collect().toSeq

  test("buildHistory: versions chain, deletes close, re-insert reopens") {
    assert(rows(hist) == Seq(
      (1L, "a", 10.0, 1L, Some(3L), 0), (1L, "a1", 11.0, 3L, Some(5L), 0),
      (1L, "a2", 12.0, 5L, None, 1),
      (2L, "b", 20.0, 1L, Some(4L), 0),
      (3L, "c", 30.0, 1L, Some(2L), 0), (3L, "c2", 31.0, 6L, None, 1),
      (4L, "d", 40.0, 2L, None, 1)))
  }

  test("asOf reconstructs every point-in-time snapshot") {
    def snap(t: Long): Set[(Long, String)] =
      Scd2.asOf(hist, lit(t)).select($"id", $"tag")
        .as[(Long, String)].collect().toSet
    assert(snap(1L) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(snap(2L) == Set((1L, "a"), (2L, "b"), (4L, "d"))) // 3 deleted, 4 born
    assert(snap(4L) == Set((1L, "a1"), (4L, "d")))           // 2 deleted
    assert(snap(9L) == Set((1L, "a2"), (3L, "c2"), (4L, "d")))
  }

  test("applyDelta == full rebuild at every changelog split point") {
    for (cut <- 1L to 6L) {
      val pre = changes.where($"seq" <= cut)
      val post = changes.where($"seq" > cut)
      val inc = Scd2.applyDelta(Scd2.buildHistory(pre, "id", "seq", "op"),
        post, "id", "seq", "op")
      assert(rows(inc) == rows(hist), s"split at seq=$cut")
    }
  }

  test("applyDelta leaves untouched keys byte-identical, shuffle-free path") {
    val pre = changes.where($"seq" <= 2L)
    val post = changes.where($"seq" > 2L)
    val inc = Scd2.applyDelta(Scd2.buildHistory(pre, "id", "seq", "op"),
      post, "id", "seq", "op")
    // key 4 has no post-cut changes: its version must pass through open
    assert(rows(inc.where($"id" === 4L)) ==
      Seq((4L, "d", 40.0, 2L, None, 1)))
    // the close-seq join must be broadcast (history never shuffles for
    // the close step); the delta's window + close-seq agg are the only
    // hash exchanges in the plan
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast close-seq join in:\n$plan")
  }

  test("result is partition-count invariant") {
    val a = Scd2.buildHistory(changes.repartition(1), "id", "seq", "op")
    val b = Scd2.buildHistory(changes.repartition(7), "id", "seq", "op")
    assert(rows(a) == rows(b))
  }
}
