package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class OrdinalsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("withRowOrdinal: dense 0..n-1 regardless of partitioning") {
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v").repartition(7)
    val w = Ordinals.withRowOrdinal(df)
    val ords = w.select("_rowpos").as[Long].collect().sorted
    assert(ords.toSeq == (0L until 100L))
  }

  test("appendWithOrdinal continues the sequence contiguously") {
    val a = Ordinals.withRowOrdinal(Seq(("x", 1), ("y", 2)).toDF("v", "n"))
    val b = Seq(("z", 3), ("w", 4)).toDF("v", "n")
    val all = Ordinals.appendWithOrdinal(a, b)
    val ords = all.select("_rowpos").as[Long].collect().sorted
    assert(ords.toSeq == Seq(0L, 1L, 2L, 3L))
    // appended rows carry the later ordinals
    val zs = all.where($"v".isin("z", "w")).select("_rowpos").as[Long].collect().toSet
    assert(zs == Set(2L, 3L))
  }

  test("appendWithOrdinal onto an empty base starts at zero") {
    val emptyBase = Ordinals.withRowOrdinal(
      Seq(("x", 1)).toDF("v", "n").where($"n" < 0))
    val out = Ordinals.appendWithOrdinal(emptyBase, Seq(("y", 2)).toDF("v", "n"))
    assert(out.select("_rowpos").as[Long].collect().toSeq == Seq(0L))
  }

  test("ordinal preserves input order within original partitions") {
    val df = (1 to 50).map(i => Tuple1(i)).toDF("k").coalesce(1)
    val w = Ordinals.withRowOrdinal(df)
    val pairs = w.orderBy("_rowpos").select("k").as[Int].collect().toSeq
    assert(pairs == (1 to 50))
  }
}
