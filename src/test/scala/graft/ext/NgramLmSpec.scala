package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class NgramLmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ref: uni a:2 b:2 c:1 (V=3); bi (a,b):2 (b,a):1 (b,c):1
  private def refDf = Seq((1L, "a b a b c")).toDF("doc_id", "text")

  test("sufficient statistics and the smoothed score on a hand fixture") {
    val model = NgramLm.fit(refDf, "text", maxBigrams = 100)
    assert(model.vocabSize == 3L)
    val got = NgramLm.score(
      Seq((10L, "a b z a")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    // pairs: (a,b) cb=2 cu=2; (b,z) cb=0 cu=2; (z,a) cb=0 cu=0
    assert(got._1 == 10L && got._2 == 3L && got._3 == 1L &&
      got._4 == 2L && got._5 == 4L)
    val want = (math.log(3.0 / 5) + math.log(1.0 / 5) + math.log(1.0 / 3)) / 3
    assert(math.abs(got._6 - want) < 1e-9, s"avg_logp ${got._6} != $want")
  }

  test("the model cut is deterministic: count desc, then bigram asc") {
    val m1 = NgramLm.fit(refDf, "text", maxBigrams = 1)
    assert(m1.bigrams.as[(String, String, Long)].collect().toSet ==
      Set(("a", "b", 2L)))
    // tie at count 1 between (b,a) and (b,c): lexicographic keeps (b,a)
    val m2 = NgramLm.fit(refDf, "text", maxBigrams = 2)
    assert(m2.bigrams.as[(String, String, Long)].collect().toSet ==
      Set(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("higher reference-likeness scores higher (the filter direction)") {
    val model = NgramLm.fit(refDf, "text", maxBigrams = 100)
    val got = NgramLm.score(
      Seq((1L, "a b a b"), (2L, "z q w x")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._6).toMap
    assert(got(1L) > got(2L))
  }

  test("documents with fewer than two tokens emit no row") {
    val model = NgramLm.fit(refDf, "text", maxBigrams = 100)
    val got = NgramLm.score(
      Seq((1L, "a"), (2L, ""), (3L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("score is partition-count invariant (the decimal-routed sum)") {
    val model = NgramLm.fit(refDf, "text", maxBigrams = 100)
    val target = (1 to 50).map(i => (i.toLong, "a b c a b z " * (i % 5 + 1)))
    val r1 = NgramLm.score(target.toDF("doc_id", "text").repartition(1),
      "doc_id", "text", model).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val r13 = NgramLm.score(target.toDF("doc_id", "text").repartition(13),
      "doc_id", "text", model).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(r1 == r13)
  }
}
