package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.Bpe

class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // the q151/q152 frozen merge list: chains (scan, the, row, order) plus
  // rank-priority interplay — in "order" the (e,r) merge at rank 7 must
  // fire BEFORE (o,r) at rank 8 even though (o,r) sits further left
  private val merges = Seq(
    ("a", "n"), ("t", "h"), ("th", "e"), ("s", "c"), ("sc", "an"),
    ("r", "o"), ("ro", "w"), ("e", "r"), ("o", "r"), ("or", "d"),
    ("ord", "er"))

  private def enc(s: String): Seq[String] =
    Seq(s).toDF("t").select(Bpe.tokens(col("t"), merges).as("x"))
      .as[Seq[String]].collect().head

  test("greedy merge chains collapse words the merge list spells out") {
    assert(enc("the") == Seq("the"))
    assert(enc("scan") == Seq("scan"))
    assert(enc("row") == Seq("row"))
    // order: (e,r)@7 fires before (o,r)@8 (lowest rank, not leftmost pair),
    // then (o,r), (or,d), (ord,er) — the full rank-priority chain
    assert(enc("order") == Seq("order"))
    // partial coverage: only some merges apply
    assert(enc("sort") == Seq("s", "or", "t"))
    assert(enc("query") == Seq("q", "u", "er", "y"))
    assert(enc("window") == Seq("w", "i", "n", "d", "o", "w"))
  }

  test("document-level: whitespace split, case-sensitive, counts match arrays") {
    val df = Seq("the scan  row", "THE the", "", "   ", "a").toDF("t")
      .select(Bpe.tokens(col("t"), merges).as("toks"),
        Bpe.tokenCount(col("t"), merges).as("n"))
    val got = df.as[(Seq[String], Int)].collect().toSeq
    assert(got(0) == ((Seq("the", "scan", "row"), 3)))
    // case-sensitive: "THE" has no lowercase merges
    assert(got(1) == ((Seq("T", "H", "E", "the"), 4)))
    assert(got(2) == ((Seq(), 0)) && got(3) == ((Seq(), 0)))
    assert(got(4) == ((Seq("a"), 1)))
    // null in, null out
    val n = Seq[Option[String]](None).toDF("t")
      .select(Bpe.tokenCount(col("t"), merges)).collect().head
    assert(n.isNullAt(0))
  }

  test("leftmost occurrence of the best-ranked pair merges first") {
    // "anan": (a,n)@0 appears twice; leftmost merges first -> an,a,n ->
    // an,an. No (an,an) merge, so it stays two tokens.
    assert(enc("anan") == Seq("an", "an"))
  }

  test("learnMerges is deterministic and reproduces the expected merges") {
    // corpus engineered so pair counts are unambiguous: "aa ab aa" ->
    // (a,a)x2, (a,b)x1 -> first merge (a,a); then (aa from merged words)...
    val df = Seq("aa ab aa aa", "ab aa").toDF("text")
    val m1 = Bpe.learnMerges(df, "text", numMerges = 2)
    val m2 = Bpe.learnMerges(df.repartition(7), "text", numMerges = 2)
    assert(m1 == m2, "learned merges must not depend on partitioning")
    // histogram: aa x4, ab x2 -> pairs (a,a)=4, (a,b)=2 -> merge (a,a);
    // then words are [aa] x4, [a,b] x2 -> only pair (a,b) -> merge (a,b)
    assert(m1 == Seq(("a", "a"), ("a", "b")))
    // exhaustion: no pairs left after every word is one symbol
    val m3 = Bpe.learnMerges(df, "text", numMerges = 100)
    assert(m3 == Seq(("a", "a"), ("a", "b")))
  }

  test("learned merges thread through packing: blocks in tokenizer tokens") {
    val docs = Seq((1L, "s1", "the scan the scan"), (2L, "s1", "row order row"))
      .toDF("doc_id", "source", "text")
    val withToks = docs.select(col("source"), col("doc_id"),
      Bpe.tokens(col("text"), merges).as("toks"))
    val blocks = graft.ext.Packing.materializeBlocks(withToks, "toks",
        "doc_id", budget = 3, groupCols = Seq("source"))
      .orderBy("block_id")
      .select("block_id", "tokens").as[(Long, Seq[String])].collect().toSeq
    // doc 1 -> [the, scan, the, scan], doc 2 -> [row, order, row]:
    // 7 tokenizer tokens cut every 3 — blocks cross the doc boundary
    assert(blocks == Seq(
      (0L, Seq("the", "scan", "the")),
      (1L, Seq("scan", "row", "order")),
      (2L, Seq("row"))))
  }

  test("duplicate and whitespace-bearing merge pairs are rejected") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t")
        .select(Bpe.tokens(col("t"), Seq(("a", "b"), ("a", "b"))))
        .collect()
    }
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t")
        .select(Bpe.tokens(col("t"), Seq(("a", "b c"))))
        .collect()
    }
  }

  test("word memo on/off encodes identically (Zipfian repeats included)") {
    // heavy repetition (the memo's hot path) + singletons (the cold path)
    val docs = (1 to 50).map(_ => "the scan order the row") ++
      Seq("query window sort", "the", "unseen singleton tokens here")
    val df = docs.toDF("t")
    def run(entries: Int) = df.select(
        BpeExpressions.bpeTokens(col("t"), merges, entries).as("toks"),
        BpeExpressions.bpeTokenCount(col("t"), merges, entries).as("n"))
      .as[(Seq[String], Int)].collect().toSeq
    val on = run(1 << 16)
    val off = run(0)
    assert(on == off)
    assert(on.forall { case (toks, n) => toks.size == n })
    // a memo smaller than the distinct-word count still agrees (cap path)
    assert(run(2) == off)
  }

  test("parseMergesText reads the published merges.txt format") {
    val lines = Seq("#version: 0.2", "", "t h", "th e", "s c")
    assert(Bpe.parseMergesText(lines) == Seq(("t", "h"), ("th", "e"), ("s", "c")))
    // '#' is a merge symbol, not a comment marker: GPT-2's vocab contains
    // the line "# #" (building the "##" token) — it must parse as data;
    // only the leading #version header is non-data
    assert(Bpe.parseMergesText(Seq("#version: 0.2", "# #", "## #")) ==
      Seq(("#", "#"), ("##", "#")))
    // a #version line NOT at the head is two space-separated fields like
    // any other line — it parses as data rather than silently vanishing
    assert(Bpe.parseMergesText(Seq("t h", "#version: 0.2")) ==
      Seq(("t", "h"), ("#version:", "0.2")))
    // rank order must follow line order when encoding
    val viaText = Seq("the").toDF("t")
      .select(Bpe.tokens(col("t"), Bpe.parseMergesText(lines)).as("x"))
      .as[Seq[String]].collect().head
    assert(viaText == Seq("the"))
    intercept[IllegalArgumentException] {
      Bpe.parseMergesText(Seq("t h", "malformed line with extras"))
    }
    intercept[IllegalArgumentException](Bpe.parseMergesText(Seq("lonely")))
  }
}
