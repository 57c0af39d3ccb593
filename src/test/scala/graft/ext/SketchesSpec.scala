package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SketchesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("kmvDistinctCount: exact below k, estimate within KMV error above") {
    val small = (1 to 5).map(i => ("a", s"v$i")) ++ Seq(("a", "v1"), ("a", "v2"))
    val dfS = small.toDF("g", "v")
    val rS = Sketches.kmvDistinctCount(dfS, Seq("g"), "v", k = 16)
      .as[(String, Long, Long)].head()
    assert(rS == (("a", 5L, 5L))) // sketch not full -> estimate IS exact

    // 2000 distinct values, k=64: relative error ~ 1/sqrt(62) ~ 13%;
    // assert a loose 3-sigma band (deterministic fixture, not flaky)
    val big = (1 to 2000).map(i => ("b", s"value-$i"))
    val rB = Sketches.kmvDistinctCount(big.toDF("g", "v"), Seq("g"), "v", k = 64)
      .as[(String, Long, Long)].head()
    assert(rB._2 == 2000L)
    assert(rB._3 > 1200 && rB._3 < 2800, s"estimate ${rB._3} outside band")

    // withExact=false drops the audit column (the 100 TB shape)
    val cols = Sketches.kmvDistinctCount(dfS, Seq("g"), "v", k = 16,
      withExact = false).columns.toSeq
    assert(cols == Seq("g", "n_est"))
  }
}
