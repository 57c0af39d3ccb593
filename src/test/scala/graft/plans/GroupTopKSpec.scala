package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Ops

class GroupTopKSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows = {
    val rnd = new scala.util.Random(7)
    (1 to 2000).map(i => (rnd.nextInt(40).toLong, rnd.nextDouble() * 100, i.toLong))
  }
  private def df = rows.toDF("g", "v", "id")

  test("native operator matches the window formulation exactly") {
    val native = GroupTopK(df, Seq("g"), Seq("v" -> false, "id" -> true), k = 5)
      .select("g", "rnk", "id").as[(Long, Long, Long)].collect().toSet
    val window = Ops.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), k = 5)
      .select("g", "rnk", "id").as[(Long, Long, Long)].collect().toSet
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("partition-invariant and groups smaller than k kept whole") {
    val small = Seq((1L, 1.0, 1L), (1L, 2.0, 2L), (2L, 9.0, 3L))
      .toDF("g", "v", "id")
    val out = GroupTopK(small.repartition(7), Seq("g"),
      Seq("v" -> true, "id" -> true), k = 5)
      .select("g", "rnk", "id").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 1L), (1L, 2L, 2L), (2L, 1L, 3L)))
  }

  test("plans as two heap phases around one exchange — no Window, no full Sort") {
    val q = GroupTopK(df, Seq("g"), Seq("v" -> false, "id" -> true), k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // nodeName drops the Exec suffix; both phases must be present and valid
    // (a "!" prefix would mean missingInput is non-empty)
    assert("(?<!!)GroupTopK \\[".r.findAllIn(plan).size >= 2, plan.take(600))
    assert(!plan.contains("!GroupTopK"), "node must not carry the invalid marker")
    assert(!plan.contains("Window"), "must not fall back to the window form")
    assert(!plan.contains("Sort "), "must not sort the full input")
  }

  test("null group keys form one group, like the window partitionBy") {
    val withNulls = Seq((Some(1L), 1.0, 1L), (None, 2.0, 2L), (None, 3.0, 3L))
      .toDF("g", "v", "id")
    val out = GroupTopK(withNulls, Seq("g"), Seq("v" -> false, "id" -> true), k = 1)
      .select("rnk", "id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (1L, 3L)))
  }

  test("unknown columns fail loudly") {
    intercept[IllegalArgumentException] {
      GroupTopK(df, Seq("nope"), Seq("v" -> true), k = 1)
    }
  }

  test("partial-phase group cap only reduces combining, never changes results") {
    // maxPartialGroups = 1 forces a drain on every new group — the partial
    // phase degenerates to a near-passthrough and the final phase must
    // still produce exactly the unbounded answer
    val capped = GroupTopK(df, Seq("g"), Seq("v" -> false, "id" -> true),
      k = 4, maxPartialGroups = 1)
      .select("g", "rnk", "id").as[(Long, Long, Long)].collect().toSet
    val unbounded = GroupTopK(df, Seq("g"), Seq("v" -> false, "id" -> true), k = 4)
      .select("g", "rnk", "id").as[(Long, Long, Long)].collect().toSet
    assert(capped == unbounded)
  }

  test("-0.0 and 0.0 group keys form one group, like normalized aggregates") {
    // Catalyst's NormalizeFloatingNumbers never visits custom nodes, so the
    // operator normalizes its own group keys; spread across partitions so
    // the exchange's hash partitioning is exercised too
    val zeros = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (-0.0, 4L))
      .toDF("g", "id").repartition(4)
    val native = GroupTopK(zeros, Seq("g"), Seq("id" -> true), k = 10)
      .select("rnk", "id").as[(Long, Long)].collect().toSet
    val window = Ops.topKPerGroup(zeros, Seq("g"), Seq(col("id").asc), k = 10)
      .select("rnk", "id").as[(Long, Long)].collect().toSet
    assert(native == window)
    assert(native == Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("resolution: case-insensitive, ambiguity and rank collision fail fast") {
    val out = GroupTopK(df, Seq("G"), Seq("V" -> false, "ID" -> true), k = 1)
    assert(out.count() > 0)
    intercept[IllegalArgumentException] { // ambiguous after a self-join shape
      GroupTopK(df.select(col("g"), col("v").as("g"), col("id")),
        Seq("g"), Seq("id" -> true), k = 1)
    }
    intercept[IllegalArgumentException] { // rank name already taken
      GroupTopK(df.withColumn("rnk", lit(0L)), Seq("g"),
        Seq("id" -> true), k = 1)
    }
  }
}
