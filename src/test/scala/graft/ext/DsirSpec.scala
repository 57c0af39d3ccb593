package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DsirSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("importanceScores ranks target-like docs above off-target docs") {
    // two disjoint vocabularies; target = the "english" half. Every
    // english doc must outscore every german doc, featureless text is 0.
    val en = (1L to 10L).map(i => (i, s"the quick brown fox number $i jumps over"))
    val de = (21L to 30L).map(i => (i, s"der schnelle braune fuchs nummer $i springt"))
    val corpus = (en ++ de :+ ((99L, "!!! ???"))).toDF("doc_id", "text")
    val target = corpus.where(col("doc_id") <= 10)
    val scores = Dsir.importanceScores(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(99L) == 0L) // no [a-z0-9] features at all
    val minEn = (1L to 10L).map(scores).min
    val maxDe = (21L to 30L).map(scores).max
    assert(minEn > maxDe, s"minEn=$minEn maxDe=$maxDe")
    // the top-10 cut is exactly the 10 best (score desc, id asc) — and
    // never contains an off-target doc (they all sit far below zero)
    val expected = scores.toSeq.sortBy { case (id, sc2) => (-sc2, id) }
      .take(10).map(_._1).toSet
    val top = Dsir.selectTopK(
      Dsir.importanceScores(corpus, target, "doc_id", "text"), "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(top == expected)
    assert(top.intersect((21L to 30L).toSet).isEmpty)

    // the native (production) feature path must separate just as cleanly
    val nScores = Dsir.importanceScores(corpus, target, "doc_id", "text",
        native = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nScores(99L) == 0L)
    assert((1L to 10L).map(nScores).min > (21L to 30L).map(nScores).max)
  }

  test("null-text rows are excluded from the score output (doc contract)") {
    val corpus = Seq((1L, "the quick fox"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val target = corpus.where(col("doc_id") === 1)
    val got = Dsir.importanceScores(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null text dropped (not surfaced as a NULL score); empty text scores 0
    assert(got.keySet == Set(1L, 3L))
    assert(got(3L) == 0L)
  }

  test("native feature map: 2n-1 multiset features, bucket range, repetition") {
    val feats = Seq("one two three", "one one", "x", "")
      .toDF("t")
      .select(Dsir.nativeFeatures(col("t"), 64).as("f"))
      .as[Seq[Int]].collect().toSeq
    assert(feats(0).length == 5 && feats(1).length == 3 && feats(2).length == 1)
    assert(feats(3).isEmpty)
    assert(feats.flatten.forall(b => b >= 0 && b < 64))
    // "one one": both unigram instances hash to the SAME bucket (multiset)
    assert(feats(1)(0) == feats(1)(1))
  }
}
