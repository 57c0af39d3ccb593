package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ChangeApplySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("id", "tag", "v")

  test("insert, update, delete, passthrough — latest seq per key wins") {
    val changes = Seq(
      // two generations on key 2: seq 2 wins
      (2L, 1L, "U", "b1", 21.0),
      (2L, 2L, "U", "b2", 22.0),
      // delete key 3
      (3L, 1L, "D", null, 0.0),
      // insert new key 5
      (5L, 1L, "I", "e", 50.0)
    ).toDF("id", "seq", "op", "tag", "v")
    val got = ChangeApply(snap, changes, "id", "seq", "op")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("an 'I' on an existing key upserts (replaces), like SQL MERGE") {
    val changes = Seq((1L, 1L, "I", "a2", 11.0)).toDF("id", "seq", "op", "tag", "v")
    val got = ChangeApply(snap, changes, "id", "seq", "op")
      .where($"id" === 1L).as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a2", 11.0)))
  }

  test("a later delete beats an earlier update; a later upsert revives a delete") {
    val changes = Seq(
      (1L, 1L, "U", "a1", 11.0), (1L, 2L, "D", null, 0.0),
      (2L, 1L, "D", null, 0.0), (2L, 2L, "U", "b9", 29.0)
    ).toDF("id", "seq", "op", "tag", "v")
    val got = ChangeApply(snap, changes, "id", "seq", "op")
      .where($"id".isin(1L, 2L)).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "b9", 29.0)))
  }

  test("result is partition-count invariant") {
    val changes = Seq(
      (2L, 1L, "U", "b1", 21.0), (2L, 2L, "U", "b2", 22.0),
      (3L, 1L, "D", null, 0.0), (5L, 1L, "I", "e", 50.0)
    ).toDF("id", "seq", "op", "tag", "v")
    val a = ChangeApply(snap.repartition(1), changes.repartition(1),
      "id", "seq", "op").orderBy("id").collect().toSeq
    val b = ChangeApply(snap.repartition(7), changes.repartition(5),
      "id", "seq", "op").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("randomized changelogs match an in-memory model (5 seeds)") {
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val snapRows = (1L to 40L).map(k => (k, s"t$k", k * 1.5))
      // random changelog: up to 3 generations per touched key
      val changes = (1L to 60L).filter(_ => rng.nextBoolean()).flatMap { k =>
        (1 to 1 + rng.nextInt(3)).map { seq =>
          val op = rng.nextInt(3) match {
            case 0 => "I"; case 1 => "U"; case 2 => "D"
          }
          (k, seq.toLong, op, s"c$k-$seq", k * 10.0 + seq)
        }
      }
      // model: latest (seq, op) per key wins; D deletes, I/U upserts
      val model = scala.collection.mutable.Map(
        snapRows.map(r => r._1 -> (r._2, r._3)): _*)
      changes.groupBy(_._1).foreach { case (k, chs) =>
        val (_, _, op, tag, v) = chs.maxBy(c => (c._2, c._3))
        if (op == "D") model.remove(k) else model(k) = (tag, v)
      }
      val got = ChangeApply(
        snapRows.toDF("id", "tag", "v"),
        changes.toDF("id", "seq", "op", "tag", "v"),
        "id", "seq", "op")
        .as[(Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == model.toMap, s"seed=$seed")
    }
  }

  test("rejects changelogs missing snapshot columns and clashing seq/op names") {
    val bad = Seq((1L, 1L, "U")).toDF("id", "seq", "op") // no tag/v payload
    intercept[IllegalArgumentException] {
      ChangeApply(snap, bad, "id", "seq", "op")
    }
    intercept[IllegalArgumentException] {
      ChangeApply(snap.withColumn("seq", lit(1L)),
        Seq((1L, 1L, "U", "x", 1.0)).toDF("id", "seq", "op", "tag", "v"),
        "id", "seq", "op")
    }
  }
}
