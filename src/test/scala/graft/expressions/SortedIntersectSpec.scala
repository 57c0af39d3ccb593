package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SortedIntersectSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("matches size(array_intersect) on sorted distinct long arrays") {
    val rnd = new scala.util.Random(42)
    def set(): Seq[Long] =
      Seq.fill(rnd.nextInt(200))(rnd.nextInt(300).toLong).distinct.sorted
    val rows = Seq.fill(200)((set(), set())) ++ Seq(
      (Seq.empty[Long], Seq(1L, 2L)), (Seq(1L, 2L), Seq.empty[Long]),
      (Seq.empty[Long], Seq.empty[Long]), (Seq(5L), Seq(5L)))
    val df = rows.toDF("a", "b")
      .withColumn("native",
        SortedIntersect.sortedIntersectCount(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
    assert(df.where(col("native") =!= col("builtin")).isEmpty,
      "two-pointer count drifted from array_intersect")
  }

  test("union-size identity |a|+|b|-ic equals size(array_union) on distinct arrays") {
    val rnd = new scala.util.Random(7)
    def set(): Seq[Long] =
      Seq.fill(rnd.nextInt(150))(rnd.nextInt(200).toLong).distinct.sorted
    val df = Seq.fill(200)((set(), set())).toDF("a", "b")
      .withColumn("ic",
        SortedIntersect.sortedIntersectCount(col("a"), col("b")))
      .withColumn("derived", size(col("a")) + size(col("b")) - col("ic"))
      .withColumn("builtin", size(array_union(col("a"), col("b"))))
    assert(df.where(col("derived") =!= col("builtin")).isEmpty,
      "derived union size drifted from array_union — the verifyJaccard rewrite relies on it")
  }

  test("null on either side yields null") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]),
        (Option.empty[Seq[Long]], Some(Seq(1L))))
      .toDF("a", "b")
      .select(SortedIntersect.sortedIntersectCount(col("a"), col("b")).as("c"))
    assert(df.collect().forall(_.isNullAt(0)))
  }
}
