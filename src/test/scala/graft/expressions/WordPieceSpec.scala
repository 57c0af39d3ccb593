package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.WordPiece

class WordPieceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // the q163 vocabulary: whole-word vs piece-chain longest-match cases
  private val vocab = Seq(
    "a", "the", "t", "##he", "##able", "join", "jo", "win", "##in",
    "##dow", "st", "##ream", "b", "##atch", "cust", "##omer", "s", "sc",
    "##an", "##can", "##ort", "me", "##rge", "fi", "##lter", "da", "##ta")

  private def enc(s: String): Seq[String] =
    Seq(s).toDF("t").select(WordPiece.tokens(col("t"), vocab).as("x"))
      .as[Seq[String]].collect().head

  private def cnt(s: String): Int =
    Seq(s).toDF("t").select(WordPiece.tokenCount(col("t"), vocab).as("x"))
      .as[Int].collect().head

  test("greedy longest-match: whole word beats its own piece chain") {
    assert(enc("join") == Seq("join")) // not jo + ##in
    assert(enc("the") == Seq("the")) // not t + ##he
    assert(enc("scan") == Seq("sc", "##an")) // sc (2) beats s (1)
    assert(enc("sort") == Seq("s", "##ort"))
    assert(enc("table") == Seq("t", "##able"))
    assert(enc("customer") == Seq("cust", "##omer"))
  }

  test("no match at any position makes the WHOLE word [UNK]") {
    assert(enc("fast") == Seq("[UNK]"))
    // prefix matches but the tail dies: still one [UNK], not s + [UNK]
    assert(enc("sz") == Seq("[UNK]"))
    assert(enc("window stream zzz") ==
      Seq("win", "##dow", "st", "##ream", "[UNK]"))
  }

  test("word over maxWordChars code points is [UNK] without scanning") {
    // with ##a in vocab the word IS encodable — only the cap stops it
    val vcap = Seq("a", "##a")
    def e(s: String): Seq[String] =
      Seq(s).toDF("t").select(WordPiece.tokens(col("t"), vcap).as("x"))
        .as[Seq[String]].collect().head
    assert(e("a" * 101) == Seq("[UNK]"))
    assert(e("a" * 100) == "a" +: Seq.fill(99)("##a"))
  }

  test("count twin equals the token array length, nulls stay null") {
    val docs = Seq("the scan join", "fast zzz", "customer table").toDF("t")
    val both = docs.select(
      size(WordPiece.tokens(col("t"), vocab)).as("n1"),
      WordPiece.tokenCount(col("t"), vocab).as("n2"))
      .as[(Int, Int)].collect()
    both.foreach { case (n1, n2) => assert(n1 == n2) }
    val n = Seq(Option.empty[String]).toDF("t")
      .select(WordPiece.tokenCount(col("t"), vocab)).collect().head
    assert(n.isNullAt(0))
  }

  test("a literal ##-prefixed word start matches a ##-piece at full length") {
    // the scan cap must be the FULL piece length: '##dow' is 5 code
    // points, its body 3 — a body-length cap would never try it at pos 0
    val v = Seq("##dow", "##an")
    val out = Seq("##dowan").toDF("t")
      .select(WordPiece.tokens(col("t"), v).as("x"))
      .as[Seq[String]].collect().head
    assert(out == Seq("##dow", "##an"))
  }

  test("vertical tab is NOT a word separator (RE2 \\s contract)") {
    // the oracles split with RE2 \s+, which excludes U+000B - so must
    // the kernel: a VT-joined 'the<VT>join' is ONE unmatchable word
    assert(enc("the\u000Bjoin") == Seq("[UNK]"))
    assert(enc("the join") == Seq("the", "join"))
  }

  test("matching is per code point, never inside a surrogate pair") {
    // U+1F600 is two UTF-16 chars; a vocab of its halves must not match
    val emoji = "😀"
    val v = Seq("x", "\ud83d".toString)
    val out = Seq(s"x$emoji").toDF("t")
      .select(WordPiece.tokens(col("t"), v ++ Seq(emoji, "##" + emoji)).as("x"))
      .as[Seq[String]].collect().head
    assert(out == Seq("x", "##" + emoji))
  }

  test("empty and whitespace-only documents encode to zero tokens") {
    assert(enc("") == Seq.empty)
    assert(enc("  \t\n ") == Seq.empty)
    assert(cnt("   ") == 0)
  }

  test("vocab hygiene is enforced loudly") {
    val df = Seq("x").toDF("t")
    def run(v: Seq[String]): Unit =
      df.select(WordPiece.tokenCount(col("t"), v)).collect()
    assert(intercept[Exception] { run(Seq("a", "a")) }
      .getMessage.contains("duplicate"))
    assert(intercept[Exception] { run(Seq("##")) }
      .getMessage.contains("non-empty body"))
    assert(intercept[Exception] { run(Seq("a b")) }
      .getMessage.contains("whitespace"))
    assert(intercept[Exception] { run(Seq.empty) }
      .getMessage.contains("non-empty"))
  }

  test("parseVocabText keeps every line as data and rejects blanks") {
    // '#'-prefixed lines are pieces, not comments (the merges.txt trap)
    assert(WordPiece.parseVocabText(Seq("[UNK]", "##s", "#", "a")) ==
      Seq("[UNK]", "##s", "#", "a"))
    assert(intercept[IllegalArgumentException] {
      WordPiece.parseVocabText(Seq("a", "", "b"))
    }.getMessage.contains("blank"))
  }
}
