package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SelectionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // scores with ties, varied costs; ids unique
  private def fixture = (1 to 200).map { i =>
    (i.toLong, (i % 7).toDouble, (i % 13 + 1).toLong)
  }.toDF("id", "score", "cost")

  private def windowReference(budget: Long): Seq[Long] = {
    val w = Window.orderBy(col("score").desc, col("id").asc)
    fixture.withColumn("cum", sum(col("cost")).over(w))
      .where(col("cum") <= budget)
      .select("id").as[Long].collect().sorted.toSeq
  }

  test("budgetSelect equals the single-partition window form, ties broken by id") {
    for (budget <- Seq(0L, 37L, 500L, 100000L)) {
      val got = Selection.budgetSelect(fixture, "score", "cost", "id", budget)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == windowReference(budget), s"diverged at budget $budget")
    }
  }

  test("selection is invariant to the range-partition count") {
    val expected = windowReference(300L)
    for (parts <- Seq(1, 3, 16)) {
      val got = Selection
        .budgetSelect(fixture, "score", "cost", "id", 300L, partitions = parts)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == expected, s"diverged at $parts partitions")
    }
  }

  test("negative cost and negative budget fail loudly") {
    intercept[IllegalArgumentException] {
      Selection.budgetSelect(fixture, "score", "cost", "id", -1L)
    }
    val bad = Seq((1L, 1.0, -5L)).toDF("id", "score", "cost")
    val ex = intercept[Exception] {
      Selection.budgetSelect(bad, "score", "cost", "id", 10L).collect()
    }
    assert(ex.getMessage != null)
  }
}
