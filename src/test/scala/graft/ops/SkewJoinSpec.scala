package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => ((i % 10 + 2).toLong, s"cold$i"))).toDF("k", "lv")
    val right = (1 to 12).map(i => (i.toLong, s"r$i")).toDF("k2", "rv")

    val plain = left.join(right, $"k" === $"k2").select("k", "lv", "rv")
    val salted = SkewJoin.salted(left, right, Seq("k"), Seq("k2"))
      .select("k", "lv", "rv")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("left-outer salted join preserves unmatched rows") {
    val left = Seq((1L, "a"), (99L, "miss")).toDF("k", "lv")
    val right = Seq((1L, "r")).toDF("k2", "rv")
    val out = SkewJoin.salted(left, right, Seq("k"), Seq("k2"),
      saltFactor = 4, joinType = "left")
    assert(out.count() == 2)
    assert(out.where($"lv" === "miss").select("rv").head().isNullAt(0))
  }
}
