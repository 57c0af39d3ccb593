package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SplitsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = (1 to 1000).map(i => (i.toLong, s"document number $i"))
    .toDF("id", "text")

  test("split is a pure function of the key value (repartition-invariant)") {
    val a = Splits.byContentHash(docs, "text", Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test")).select("id", "split")
      .as[(Long, String)].collect().toMap
    val b = Splits.byContentHash(docs.repartition(7), "text", Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test")).select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.values.toSet == Set("train", "val", "test"))
  }

  test("proportions approximate the weights") {
    val counts = Splits.byContentHash(docs, "text", Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    assert(counts("test") > 50 && counts("test") < 160)
  }

  test("duplicate content always lands in one split (no leakage)") {
    val dup = docs.union(docs) // every text twice
    val bad = Splits.byContentHash(dup, "text", Seq(0.5, 0.5), Seq("a", "b"))
      .groupBy("text").agg(countDistinct("split").as("n"))
      .where(col("n") > 1).count()
    assert(bad == 0L)
  }

  test("weights validate") {
    intercept[IllegalArgumentException] {
      Splits.byContentHash(docs, "text", Seq(0.8), Seq("a", "b"))
    }
    intercept[IllegalArgumentException] {
      Splits.byContentHash(docs, "text", Seq(1.0, -0.1), Seq("a", "b"))
    }
  }

  test("sampleExact returns exactly n content-stable rows as TakeOrdered") {
    val a = Splits.sampleExact(docs, "text", "id", n = 50)
    assert(a.count() == 50)
    val b = Splits.sampleExact(docs.repartition(13), "text", "id", n = 50)
    assert(a.select("id").as[Long].collect().sorted.toSeq ==
      b.select("id").as[Long].collect().sorted.toSeq,
      "sample must be partition-invariant")
    assert(a.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "orderBy+limit must plan as per-partition top-n, not a global sort")
  }
}
