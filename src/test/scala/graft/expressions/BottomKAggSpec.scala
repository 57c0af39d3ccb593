package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BottomKAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bottom-k = sorted distinct take(k), regardless of partitioning") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(500)((rng.nextInt(3).toString, rng.nextInt(100).toLong))
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(8)
    }
    // 7 partitions forces real partial-buffer merges
    val got = rows.toDF("g", "v").repartition(7)
      .groupBy("g").agg(BottomKAgg.bottomKHashes(col("v"), 8).as("bk"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got.view.mapValues(_.toSeq).toMap == expected)
  }

  test("groups smaller than k return all their distinct values") {
    val got = Seq(("a", 5L), ("a", 5L), ("a", 1L)).toDF("g", "v")
      .groupBy("g").agg(BottomKAgg.bottomKHashes(col("v"), 8).as("bk"))
      .as[(String, Seq[Long])].collect().head
    assert(got._2 == Seq(1L, 5L))
  }

  test("nulls are ignored") {
    val got = Seq(("a", Some(2L)), ("a", None), ("a", Some(1L)))
      .toDF("g", "v")
      .groupBy("g").agg(BottomKAgg.bottomKHashes(col("v"), 2).as("bk"))
      .as[(String, Seq[Long])].collect().head
    assert(got._2 == Seq(1L, 2L))
  }
}
