package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SnapshotDiffSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("classifies added/removed/changed/unchanged over the id union") {
    val vOld = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val vNew = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val got = SnapshotDiff(vOld, vNew, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("join ships digests, not document bodies") {
    val vOld = Seq((1L, "x" * 1000)).toDF("id", "text")
    val vNew = Seq((1L, "x" * 1000)).toDF("id", "text")
    val plan = SnapshotDiff(vOld, vNew, "id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("text#") ||
      plan.indexOf("md5") < plan.indexOf("Join"),
      "md5 must be computed below the join")
  }
}
