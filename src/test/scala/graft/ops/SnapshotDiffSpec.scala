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
    // repartition blocks ConvertToLocalRelation from folding the projections
    // away, so the optimized plan keeps a real Join whose inputs we can check
    val vOld = Seq((1L, "x" * 1000)).toDF("id", "text").repartition(2)
    val vNew = Seq((1L, "x" * 1000)).toDF("id", "text").repartition(2)
    val plan = SnapshotDiff(vOld, vNew, "id", "text").queryExecution.optimizedPlan
    val join = plan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.getOrElse(fail("no Join in optimized plan"))
    join.children.foreach { side =>
      assert(side.output.forall(_.name != "text"),
        s"join input still carries the raw text column: ${side.output.map(_.name)}")
    }
  }
}
