package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.text

class PhraseMatchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def hits(s: String, phrases: Seq[String]): Int =
    Seq(s).toDF("t").select(text.phraseHits(col("t"), phrases).as("x"))
      .as[Int].collect().head

  test("counts DISTINCT phrases present, not occurrences") {
    assert(hits("scan scan scan", Seq("scan", "zzz")) == 1)
    assert(hits("the slow scan", Seq("slow scan", "scan", "the")) == 3)
    assert(hits("nothing here", Seq("zzz", "qqq")) == 0)
  }

  test("fail-link outputs: a phrase inside another phrase still hits") {
    // matching 'slow scan' must also surface 'scan' (suffix output) and
    // 'an' (deeper suffix) without rescanning
    assert(hits("slow scan", Seq("slow scan", "scan", "an", "ow sc")) == 4)
    // overlapping matches: aba twice, ababa once, all distinct
    assert(hits("ababa", Seq("aba", "ababa", "bab")) == 3)
  }

  test("substring semantics: case-sensitive, crosses word boundaries") {
    assert(hits("Scan", Seq("scan")) == 0)
    assert(hits("thescan", Seq("scan", "the")) == 2) // no word boundary
    assert(hits("a b", Seq("a b")) == 1) // phrases may span whitespace
  }

  test("unicode: surrogate-pair phrases match exactly") {
    val emoji = "😀"
    assert(hits(s"x${emoji}y", Seq(emoji, s"x$emoji")) == 2)
    assert(hits("xy", Seq(emoji)) == 0)
  }

  test("null stays null; empty doc hits nothing; hygiene is loud") {
    val n = Seq(Option.empty[String]).toDF("t")
      .select(text.phraseHits(col("t"), Seq("a"))).collect().head
    assert(n.isNullAt(0))
    assert(hits("", Seq("a")) == 0)
    assert(intercept[Exception] {
      hits("x", Seq("a", "a"))
    }.getMessage.contains("duplicate"))
    assert(intercept[Exception] {
      hits("x", Seq(""))
    }.getMessage.contains("non-empty"))
    assert(intercept[Exception] {
      hits("x", Seq.empty)
    }.getMessage.contains("non-empty"))
  }
}
