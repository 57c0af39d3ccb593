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

  test("budgetSelectByGroup applies the budget independently per group") {
    val df = Seq(
      ("a", 1L, 9.0, 4L), ("a", 2L, 8.0, 4L), ("a", 3L, 7.0, 4L),
      ("b", 4L, 1.0, 5L), ("b", 5L, 2.0, 5L)
    ).toDF("src", "id", "score", "cost")
    val got = Selection
      .budgetSelectByGroup(df, Seq("src"), "score", "cost", "id", 9L)
      .select("id").as[Long].collect().sorted.toSeq
    // a: 4+4 fits, third overflows; b: best-scored is id 5, then id 4 fits too (5+5>9 -> only id 5)
    assert(got == Seq(1L, 2L, 5L))
    assert(df.columns.toSeq ==
      Selection.budgetSelectByGroup(df, Seq("src"), "score", "cost", "id", 9L)
        .columns.toSeq)
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

  test("prioritySample: unbiased subset-sum estimator, exact below k") {
    // skewed weights (a few heavy rows) — the regime the scheme exists for
    val docs = (1 to 1000).map { i =>
      (i.toLong, if (i % 97 == 0) 5000L else (i % 50 + 1).toLong)
    }.toDF("id", "w")
    val trueSum = docs.agg(sum("w")).as[Long].head()
    val est = Selection.prioritySample(docs, "id", "w", k = 150)
      .agg(sum("est_weight")).as[Long].head()
    // one deterministic draw of a k=150 estimator; 20% is ~3x its relative
    // std dev on this fixture (not flaky: the md5 draw never changes)
    assert(math.abs(est - trueSum) < 0.2 * trueSum,
      s"estimate $est vs true $trueSum")
    // heavy rows enter with probability 1 and keep their exact weight
    val heavy = Selection.prioritySample(docs, "id", "w", k = 150)
      .where(col("w") === 5000L)
    assert(heavy.count() == 10)
    assert(heavy.where(col("est_weight") === 5000L).count() == 10)

    // k >= n: the sample IS the population, estimates are exact weights
    val all = Selection.prioritySample(docs, "id", "w", k = 2000)
    assert(all.count() == docs.where(col("w") > 0).count())
    assert(all.where(col("est_weight") =!= col("w")).count() == 0)
  }

  test("prioritySample: deterministic, partition-invariant, drops w<=0") {
    val docs = (1 to 300).map(i => (i.toLong, (i % 20).toLong))
      .toDF("id", "w") // ids with i%20==0 have weight 0 -> excluded
    val a = Selection.prioritySample(docs.repartition(1), "id", "w", 40)
      .orderBy("id").collect().toSeq
    val b = Selection.prioritySample(docs.repartition(11), "id", "w", 40)
      .orderBy("id").collect().toSeq
    assert(a == b)
    assert(a.size == 40)
    assert(a.forall(_.getLong(1) > 0))
    // est_weight >= w for every sampled row (tau floors the light rows)
    assert(a.forall(r => r.getLong(2) >= r.getLong(1)))
  }

  test("capPerGroup keeps <= cap per group in the md5 order, deterministically") {
    val docs = (1 to 90).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val capped = Selection.capPerGroup(docs, "g", "id", cap = 7)
    val got = capped.orderBy("g", "pick").collect().toSeq
    assert(got.size == 21)
    // picks are 1..cap per group
    val byG = got.groupBy(_.getString(1))
    assert(byG.values.forall(_.map(_.getLong(2)).sorted == (1L to 7L)))
    // the kept set is exactly the window-function reference on md5 order
    val ref = docs
      .withColumn("h", md5(col("id").cast("string")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(col("h"), col("id"))))
      .where(col("rn") <= 7)
      .select(col("id"), col("g"), col("rn").cast("long"))
      .orderBy("g", "rn").collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2))) ==
      ref.map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
    // partition-invariant
    val again = Selection.capPerGroup(docs.repartition(13), "g", "id", 7)
      .orderBy("g", "pick").collect().toSeq
    assert(again.map(_.toSeq) == got.map(_.toSeq))
    // cap >= group size: everything kept
    assert(Selection.capPerGroup(docs, "g", "id", 50).count() == 90)
  }
}
