package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IncrementalAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(count(lit(1)).as("n"),
      sum($"v".cast("decimal(27,4)")).cast("double").as("sum_value"))

  test("refresh equals full recompute, bit-exactly") {
    val rng = new scala.util.Random(7)
    val base = (1 to 500).map(i => (i.toLong, s"g${i % 7}", rng.nextDouble() * 1e6))
      .toDF("id", "g", "v")
    // remove every 9th row, add modified versions of every 13th + new rows
    val removed = base.where($"id" % 9 === 0)
    val added = base.where($"id" % 13 === 0)
      .withColumn("v", $"v" + 123.4567)
      .unionByName(Seq((9001L, "g_new", 55.5)).toDF("id", "g", "v"))
    val refreshed = IncrementalAgg.refresh(agg(base), removed, added,
      Seq("g"), "v").orderBy("g")
      .as[(String, Long, Double)].collect().toSeq
    val newTable = base.except(removed).unionByName(added)
    val recomputed = agg(newTable).orderBy("g")
      .as[(String, Long, Double)].collect().toSeq
    assert(refreshed == recomputed)
  }

  test("groups vanish at zero count and brand-new groups appear") {
    val base = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)).toDF("id", "g", "v")
    val refreshed = IncrementalAgg.refresh(
      agg(base),
      removed = base.where($"g" === "b"),
      added = Seq((4L, "c", 4.0)).toDF("id", "g", "v"),
      Seq("g"), "v")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(refreshed == Seq(("a", 2L, 3.0), ("c", 1L, 4.0)))
  }

  test("refreshes chain: two increments equal one combined increment") {
    val base = (1 to 100).map(i => (i.toLong, s"g${i % 3}", i * 1.5)).toDF("id", "g", "v")
    val r1 = base.where($"id" % 4 === 0)
    val a1 = Seq((201L, "g0", 9.25)).toDF("id", "g", "v")
    val r2 = base.where($"id" % 10 === 1)
    val a2 = Seq((202L, "g1", 3.75)).toDF("id", "g", "v")
    val chained = IncrementalAgg.refresh(
      IncrementalAgg.refresh(agg(base), r1, a1, Seq("g"), "v"),
      r2, a2, Seq("g"), "v").orderBy("g")
      .as[(String, Long, Double)].collect().toSeq
    val combined = IncrementalAgg.refresh(agg(base),
      r1.unionByName(r2), a1.unionByName(a2), Seq("g"), "v").orderBy("g")
      .as[(String, Long, Double)].collect().toSeq
    assert(chained == combined)
  }

  test("the base table is not an input — only agg and deltas are scanned") {
    val aggOld = Seq(("a", 5L, 100.0), ("b", 2L, 50.0)).toDF("g", "n", "sum_value")
    val out = IncrementalAgg.refresh(aggOld,
      removed = Seq((1L, "a", 10.0)).toDF("id", "g", "v"),
      added = Seq((2L, "b", 25.0)).toDF("id", "g", "v"),
      Seq("g"), "v")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 4L, 90.0), ("b", 3L, 75.0)))
  }
}
