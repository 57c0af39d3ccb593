package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.Unigram

class UnigramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // the q172 vocabulary: Viterbi-beats-greedy cases (merge/stream/window
  // split cheaper than their whole-word piece), whole-word-wins cases
  // (customer/batch/the/row, the latter two on the fewer-tokens
  // tie-break), and unk fallback (f/j/q/v/x/z have no single-cp piece)
  private val vocab: Seq[(String, Long)] = Seq(
    "a" -> 2L, "b" -> 3L, "c" -> 3L, "d" -> 3L, "e" -> 2L, "g" -> 3L,
    "h" -> 3L, "i" -> 3L, "k" -> 4L, "l" -> 3L, "m" -> 3L, "n" -> 3L,
    "o" -> 2L, "p" -> 3L, "r" -> 3L, "s" -> 2L, "t" -> 2L, "u" -> 4L,
    "w" -> 4L, "y" -> 5L,
    "join" -> 4L, "scan" -> 9L, "sc" -> 2L, "an" -> 3L, "can" -> 3L,
    "the" -> 7L, "row" -> 5L, "ro" -> 2L, "ow" -> 2L,
    "merge" -> 9L, "mer" -> 3L, "ge" -> 3L,
    "stream" -> 6L, "st" -> 2L, "ream" -> 3L,
    "window" -> 7L, "win" -> 3L, "dow" -> 3L,
    "customer" -> 8L, "cust" -> 4L, "omer" -> 5L,
    "batch" -> 6L, "bat" -> 4L, "ch" -> 3L,
    "val" -> 4L, "ue" -> 4L, "fil" -> 5L, "ter" -> 4L, "qu" -> 6L)

  private def enc(s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(Unigram.tokens(col("t"), vocab, unkCost = 12L).as("x"))
      .as[Seq[String]].collect().head

  private def stats(s: String): (Int, Long) =
    Seq(s).toDF("t")
      .select(Unigram.stats(col("t"), vocab, unkCost = 12L).as("x"))
      .select(col("x.n_tokens"), col("x.cost"))
      .as[(Int, Long)].collect().head

  test("Viterbi beats greedy longest-match when the split is cheaper") {
    // greedy (WordPiece-style) would take the whole-word piece; the
    // optimal segmentation splits because the parts cost less in total
    assert(enc("merge") == Seq("mer", "ge")) // 3+3=6 < merge 9
    assert(enc("stream") == Seq("st", "ream")) // 2+3=5 < stream 6
    assert(enc("window") == Seq("win", "dow")) // 3+3=6 < window 7
    assert(stats("merge") == ((2, 6L)))
  }

  test("whole-word piece wins when it is the cheapest path") {
    assert(enc("customer") == Seq("customer")) // 8 < cust+omer 9
    assert(enc("batch") == Seq("batch")) // 6 < bat+ch 7
    assert(stats("customer") == ((1, 8L)))
  }

  test("equal-cost tie breaks to FEWER tokens") {
    // the=7 == t+h+e=2+3+2: composite (cost, count) picks the 1-token path
    assert(enc("the") == Seq("the"))
    // row=5 == r+ow=3+2: same
    assert(enc("row") == Seq("row"))
    assert(stats("the") == ((1, 7L)))
  }

  test("equal-(cost, count) tie breaks to the longest last piece") {
    // scan: s+can and sc+an both cost 5 in 2 tokens; the DP accepts the
    // later (longer) candidate on equality, so the LAST piece maximizes
    assert(enc("scan") == Seq("s", "can"))
    assert(stats("scan") == ((2, 5L)))
  }

  test("single code points without a piece fall back to <unk>, per cp") {
    // f is uncovered; the rest still optimizes ("st" beats s+t)
    assert(enc("fast") == Seq("<unk>", "a", "st"))
    assert(stats("fast") == ((3, 12L + 2L + 2L)))
    // consecutive unknowns each emit one <unk> (no fusing)
    assert(enc("fj") == Seq("<unk>", "<unk>"))
    assert(stats("fj")._1 == 2)
  }

  test("multi-cp pieces bridge over characters with no single piece") {
    assert(enc("query") == Seq("qu", "e", "r", "y")) // q alone is unk-only
    assert(enc("value") == Seq("val", "ue")) // v alone is unk-only
    assert(stats("query") == ((4, 6L + 2L + 3L + 5L)))
  }

  test("word over maxWordChars code points is ONE <unk>") {
    val df = Seq(("a" * 1001), ("a" * 1000)).toDF("t")
    val out = df.select(Unigram.tokens(col("t"), Seq("a" -> 1L)).as("x"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("<unk>"))
    assert(out(1) == Seq.fill(1000)("a"))
  }

  test("documents sum per-word stats; count twin equals array length") {
    val docs = Seq("the scan join", "fast zzz", "merge the stream").toDF("t")
    val both = docs.select(
      size(Unigram.tokens(col("t"), vocab)).as("n1"),
      Unigram.tokenCount(col("t"), vocab, unkCost = 12L).as("n2"))
      .as[(Int, Int)].collect()
    both.foreach { case (n1, n2) => assert(n1 == n2) }
    assert(stats("the scan join") == ((4, 7L + 5L + 4L)))
  }

  test("null input stays null; empty and whitespace-only docs are zero") {
    val n = Seq(Option.empty[String]).toDF("t")
      .select(Unigram.stats(col("t"), vocab, unkCost = 12L)).collect().head
    assert(n.isNullAt(0))
    assert(stats("") == ((0, 0L)))
    assert(stats("  \t\n ") == ((0, 0L)))
  }

  test("vertical tab is NOT a word separator (RE2 \\s contract)") {
    // the oracles split with RE2 \s+, which excludes U+000B - so must
    // the kernel: VT stays INSIDE the word and, uncovered, costs one <unk>
    assert(enc("the\u000Bscan") == Seq("the", "<unk>", "s", "can"))
    assert(enc("the scan") == Seq("the", "s", "can"))
  }

  test("matching is per code point, never inside a surrogate pair") {
    val emoji = "😀" // U+1F600, two UTF-16 chars
    val v = Seq("x" -> 1L, "\ud83d".toString -> 1L, emoji -> 2L)
    val out = Seq(s"x$emoji").toDF("t")
      .select(Unigram.tokens(col("t"), v).as("x"))
      .as[Seq[String]].collect().head
    assert(out == Seq("x", emoji))
  }

  test("vocab hygiene is enforced loudly") {
    val df = Seq("x").toDF("t")
    def run(v: Seq[(String, Long)]): Unit =
      df.select(Unigram.tokenCount(col("t"), v)).collect()
    assert(intercept[Exception] { run(Seq("a" -> 1L, "a" -> 2L)) }
      .getMessage.contains("duplicate"))
    assert(intercept[Exception] { run(Seq("a b" -> 1L)) }
      .getMessage.contains("whitespace"))
    assert(intercept[Exception] { run(Seq("a" -> -1L)) }
      .getMessage.contains("[0, 2^20)"))
    assert(intercept[Exception] { run(Seq("a" -> (1L << 20))) }
      .getMessage.contains("[0, 2^20)"))
    assert(intercept[Exception] { run(Seq.empty) }
      .getMessage.contains("non-empty"))
  }

  test("parseVocabTsv scales scores to exact integer costs and fails loudly") {
    val v = Unigram.parseVocabTsv(Seq("the\t-0.07", "a\t-0.02", "<s>\t0"))
    assert(v == Seq("the" -> 7L, "a" -> 2L, "<s>" -> 0L))
    assert(intercept[IllegalArgumentException] {
      Unigram.parseVocabTsv(Seq("nofield"))
    }.getMessage.contains("piece<TAB>score"))
    assert(intercept[IllegalArgumentException] {
      Unigram.parseVocabTsv(Seq("a\tNaNope"))
    }.getMessage.contains("non-numeric"))
    assert(intercept[IllegalArgumentException] {
      Unigram.parseVocabTsv(Seq("a\t-99999"), scale = 100.0)
    }.getMessage.contains("outside"))
  }
}
