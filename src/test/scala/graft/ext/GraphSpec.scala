package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the operator's exact decimal fixed-point walk
    * (same rounding at every step) — the brute-force reference.
    */
  private def refRanks(
      edges: Seq[(String, String)], iters: Int): Map[String, Double] = {
    def r12(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outDeg = es.groupBy(_._1).view.mapValues(_.size).toMap
    val n = nodes.size
    var rank = nodes.map(v => v -> r12(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val in = es.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        r12(rank(u).doubleValue() / outDeg(u))
      }.reduce(_ add _)).toMap
      rank = nodes.map { v =>
        val s = in.get(v).map(_.doubleValue()).getOrElse(0.0)
        v -> r12((1.0 - 0.85) / n + 0.85 * s)
      }.toMap
    }
    rank.map { case (k, v) => k -> v.doubleValue() }
  }

  test("symmetric cycle: every node holds rank 1/N at every iteration") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val out = Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters = 3)
      .orderBy("node").as[(String, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("a", "b", "c"))
    assert(out.forall(_._2 == 1L))
    val third = java.math.BigDecimal.valueOf(1.0 / 3)
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(out.forall(_._3 == third), s"expected uniform $third, got $out")
  }

  test("star + dangling: hub accumulates, dangling leaks, matches the exact walk") {
    // a->c, b->c, c dangling (out_deg 0): c's mass leaks each round
    val edges = Seq(("a", "c"), ("b", "c"))
    val got = Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters = 4)
      .orderBy("node").as[(String, Long, Double)].collect().toSeq
    val ref = refRanks(edges, 4)
    assert(got.map(r => r._1 -> r._3).toMap == ref)
    assert(got.find(_._1 == "c").get._2 == 0L) // dangling out_deg
    val (ra, rc) = (ref("a"), ref("c"))
    assert(rc > ra, "the sink must outrank its sources")
  }

  test("random digraph: local AND distributed paths equal the exact decimal walk") {
    val rnd = new scala.util.Random(23)
    val nodes = (0 until 12).map(i => s"n$i")
    val edges = (for {
      u <- nodes; v <- nodes if u != v && rnd.nextInt(100) < 20
    } yield (u, v)).toSeq
    val ref = refRanks(edges, 5)
    val local = Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters = 5)
      .select(col("node"), col("rank"))
      .as[(String, Double)].collect().toMap
    assert(local == ref)
    // zeroed threshold forces the distributed iterates — must agree
    val dist = Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters = 5,
        localEdgeLimit = -1L)
      .select(col("node"), col("rank"))
      .as[(String, Double)].collect().toMap
    assert(dist == ref)
  }

  test("parallel edges collapse; results are partition-invariant") {
    // distributed path (zeroed threshold): partition invariance is the
    // claim under test, which the driver-side walk would bypass
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"))
    val one = Graph.pageRank(edges.toDF("s", "d").repartition(1), "s", "d",
        localEdgeLimit = -1L)
      .orderBy("node").collect().toSeq
    val many = Graph.pageRank(edges.toDF("s", "d").repartition(9), "s", "d",
        localEdgeLimit = -1L)
      .orderBy("node").collect().toSeq
    assert(one.map(_.toSeq) == many.map(_.toSeq))
    // a's out_deg counts the collapsed edge once
    assert(one.find(_.getString(0) == "a").get.getLong(1) == 2L)
  }
}
