package graft

import org.scalatest.funsuite.AnyFunSuite

class RecallBenchSpec extends AnyFunSuite {

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
  }

  test("plantedTwins: deterministic, graded, id-disjoint") {
    val v = (0 until 64).map(i => math.sin(i + 1) + 1.5)
    val qs = Seq(3L -> v, 7L -> v.map(_ * 2))
    val a = RecallBench.plantedTwins(qs)
    val b = RecallBench.plantedTwins(qs)
    assert(a == b) // no PRNG anywhere
    assert(a.size == qs.size * RecallBench.PlantEps.size)
    // ids land past every replica offset and never collide
    assert(a.map(_._1).distinct.size == a.size)
    assert(a.forall(_._1 >= RecallBench.PlantBase))
    // noise grades produce strictly decreasing cosine to the source
    val cosines = RecallBench.PlantEps.indices.map { g =>
      cos(v, a.find(_._1 == RecallBench.PlantBase + 300 + g).get._2)
    }
    assert(cosines == cosines.sorted.reverse)
    assert(cosines.head > 0.999 && cosines.last < 0.99)
  }

  test("recallOf: truth-denominated intersection") {
    val truth = Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
    assert(RecallBench.recallOf(truth, truth) == 1.0)
    assert(RecallBench.recallOf(truth, Set((1L, 10L), (2L, 12L))) == 0.5)
    // extra returned pairs gain nothing
    assert(RecallBench.recallOf(truth,
      truth ++ Set((9L, 9L), (8L, 8L))) == 1.0)
    assert(RecallBench.recallOf(Set.empty, Set((1L, 1L))) == 1.0)
  }
}
