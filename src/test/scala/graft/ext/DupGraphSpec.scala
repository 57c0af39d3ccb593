package graft.ext

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DupGraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // every fixture fits the driver-side fast path, so each test runs BOTH
  // paths and asserts they agree — the distributed weighted-cluster
  // collapse is forced by zeroing the local threshold
  private def census(edges: Seq[(Long, Long)]) = {
    val df = edges.toDF("id_l", "id_r")
    val local = DupGraph.triangleCensus(df)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    val dist = DupGraph.triangleCensus(df, localEdgeLimit = -1L)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(local == dist,
      s"driver-side and distributed census disagree: $local vs $dist")
    local
  }

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

  test("non-numeric ids: driver-side and distributed census agree (ADVICE r11)") {
    // string doc ids (url hashes, uuids) hit the small-graph fast path
    // too — the old long cast nulled them out and NPE'd; the census must
    // be type-generic on BOTH paths. K4 on names + a pendant path.
    val names = Seq("alpha", "beta", "gamma", "delta")
    val k4 = for (a <- names.indices; b <- (a + 1) until names.size)
      yield (names(a), names(b))
    val edges = k4 ++ Seq(("zeta", "eta"), ("eta", "theta"))
    val df = edges.toDF("id_l", "id_r")
    val local = DupGraph.triangleCensus(df)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    val dist = DupGraph.triangleCensus(df, localEdgeLimit = -1L)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(local == dist, s"paths disagree on string ids: $local vs $dist")
    assert((local._1, local._2, local._4) == (7L, 8L, 4L))
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

  test("weighted-cluster collapse: clique + pendant cluster decomposes exactly") {
    // K3 {1,2,3} (one structural class, s=3), node 4 adjacent to all of
    // it, node 5 pendant on 4: T = C(3,3) within + C(3,2)*1 on the A~4
    // collapsed edge = 1 + 3 = 4; wedges = 3*C(3,2) + C(4,2) + 0 = 15
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 4L), (2L, 4L), (3L, 4L), (4L, 5L))
    val (n, e, w, t, c) = census(edges)
    assert((n, e, w, t) == (5L, 7L, 15L, 4L))
    assert(c.contains(0.8))
  }

  test("collapse handles a large clique via closed form (all three terms)") {
    // two stamped templates: K20 and K10, bridged by a full bipartite
    // K20xK10 link — the whole thing is one K30 (every node's closed
    // neighborhood is all 30), so T = C(30,3); plus a separate triangle
    // of three DISTINCT classes (pendants break the symmetry) exercising
    // the term-3 wedge join
    val k30 = for (a <- 1L to 30L; b <- (a + 1) to 30L) yield (a, b)
    // triangle 101-102-103 with distinct pendants 201, 202 on 101, 102
    val tri = Seq((101L, 102L), (102L, 103L), (101L, 103L),
      (101L, 201L), (102L, 202L))
    val (n, e, w, t, _) = census(k30 ++ tri)
    val c30 = 30L * 29 * 28 / 6
    assert(t == c30 + 1,
      s"expected ${c30 + 1} triangles, got $t")
    assert(n == 35L && e == k30.size + 5L)
    // degrees: 30 nodes of 29; 101,102 of 3; 103 of 2; pendants of 1
    assert(w == 30L * (29L * 28 / 2) + 2 * 3L + 1L)
  }

  test("wedge-free graph reports null clustering") {
    val (n, e, w, t, c) = census(Seq((1L, 2L), (3L, 4L)))
    assert((n, e, w, t) == (4L, 2L, 0L, 0L))
    assert(c.isEmpty)
  }
}
