package graft.ext

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DupGraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    DupGraph.triangleCensus(edges.toDF("id_l", "id_r"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().head

  test("known shapes: K4, a path, and duplicate/reversed edges") {
    // K4 = 4 triangles, 6 edges, 12 wedges, clustering 1.0; plus a
    // dangling path 5-6-7 (no triangle, 1 wedge); edges arrive messy
    // (reversed + duplicated) and must normalize
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = k4 ++ Seq((6L, 5L), (6L, 7L), (5L, 6L), (1L, 2L))
    val (n, e, w, t, c) = census(edges)
    assert((n, e, w, t) == (7L, 8L, 13L, 4L))
    assert(c.contains(BigDecimal(12.0 / 13)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("oriented count equals brute force on random graphs") {
    val rnd = new Random(17)
    for (trial <- 1 to 5) {
      val nV = 30
      val edges = (for {
        a <- 1L to nV.toLong; b <- (a + 1) to nV.toLong
        if rnd.nextInt(100) < 18
      } yield (a, b)).toSeq
      val eset = edges.toSet
      val brute = (for {
        a <- 1L to nV.toLong; b <- (a + 1) to nV.toLong; c0 <- (b + 1) to nV.toLong
        if eset((a, b)) && eset((b, c0)) && eset((a, c0))
      } yield 1).size.toLong
      val (_, _, _, t, _) = census(edges)
      assert(t == brute, s"trial $trial")
    }
  }

  test("wedge-free graph reports null clustering") {
    val (n, e, w, t, c) = census(Seq((1L, 2L), (3L, 4L)))
    assert((n, e, w, t) == (4L, 2L, 0L, 0L))
    assert(c.isEmpty)
  }
}
