package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.text

class DecontaminateVocabSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val bench = "alpha beta gamma delta epsilon zeta eta theta"

  test("decontaminate drops docs sharing a benchmark shingle, keeps the rest") {
    val docs = Seq(
      (1L, s"intro words then $bench and a tail"), // contains the benchmark 8-gram
      (2L, "alpha beta gamma unrelated delta epsilon zeta eta"), // reordered: no shared 4-shingle... but short doc
      (3L, "completely disjoint content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val benchmark = Seq(bench).toDF("text")
    val kept = Decontaminate(docs, "doc_id", "text", benchmark, "text", n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(1L), "doc embedding a benchmark 4-shingle must drop")
    assert(kept.contains(3L), "disjoint doc must survive")
  }

  test("contaminationHits counts distinct shared shingles") {
    val docs = Seq((1L, bench)).toDF("doc_id", "text")
    val benchmark = Seq(bench).toDF("text")
    // 8 tokens, shingle n=4 -> 5 shingles, all shared
    val hits = Decontaminate.contaminationHits(docs, "doc_id", "text",
      benchmark, "text", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(hits(1L) == 5L)
  }

  test("semanticHits flags the rounded-cosine neighborhood, one row per corpus vector") {
    val ev = Seq((100L, Array(1.0, 0.0, 0.0)), (101L, Array(0.0, 1.0, 0.0)))
      .toDF("vec_id", "v")
    val corpus = Seq(
      (1L, Array(0.999, 0.01, 0.0)),   // ~eval 100 -> contaminated
      (2L, Array(0.0, 0.0, 1.0)),      // orthogonal to both -> clean
      (3L, Array(0.1, 0.99, 0.0))      // ~eval 101 -> contaminated
    ).toDF("vec_id", "v")
    val out = Decontaminate.semanticHits(
        corpus, "vec_id", "v", ev, "vec_id", "v", tau = 0.95)
      .orderBy("vec_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._4)) ==
      Seq((1L, 100L, true), (2L, 100L, false), (3L, 101L, true)))
    assert(out.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
    // every corpus vector reports exactly once, flagged or not
    assert(out.size == 3)
  }

  test("semanticHitsLiteral equals the broadcast-join screen row for row") {
    val rnd = new scala.util.Random(41)
    def vec() = Array.fill(8)(rnd.nextDouble() - 0.5)
    val ev = (100L to 104L).map(i => (i, vec())).toDF("vec_id", "v")
    val corpus = (1L to 40L).map(i => (i, vec())).toDF("vec_id", "v")
    val evals = ev.select(col("vec_id"), col("v").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val viaJoin = Decontaminate.semanticHits(
        corpus, "vec_id", "v", ev, "vec_id", "v", tau = 0.5)
      .orderBy("vec_id").collect().toSeq
    val viaLiteral = Decontaminate.semanticHitsLiteral(
        corpus, "vec_id", "v", evals, tau = 0.5)
      .orderBy("vec_id").collect().toSeq
    assert(viaJoin.map(_.toSeq) == viaLiteral.map(_.toSeq))
    assert(viaJoin.size == 40)
  }

  test("contaminationSpans reports (doc, example) pairs with span counts and offsets") {
    val docs = Seq(
      (1L, s"two lead tokens $bench trailing words here"),   // bench at offset 3
      (2L, s"$bench immediately then later again $bench"),   // twice: offsets 0 and 13
      (3L, "no overlap with any benchmark example content at all")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, bench), (200L, "utterly different example text"))
      .toDF("bench_id", "text")
    val spans = Decontaminate.contaminationSpans(docs, "doc_id", "text",
        benchmark, "bench_id", "text", n = 8)
      .orderBy("doc_id", "bench_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // the 8-token example matches as ONE full window per occurrence
    assert(spans == Seq((1L, 100L, 1L, 3L), (2L, 100L, 2L, 0L)),
      s"got $spans")
    // aliasing guard: same-named id columns must be rejected loudly
    intercept[IllegalArgumentException] {
      Decontaminate.contaminationSpans(docs, "doc_id", "text",
        docs, "doc_id", "text", n = 8)
    }
  }

  test("decontaminate of an empty/overlap-free corpus is the identity") {
    val docs = Seq((1L, "only here"), (2L, "")).toDF("doc_id", "text")
    val benchmark = Seq("nothing in common").toDF("text")
    val kept = Decontaminate(docs, "doc_id", "text", benchmark, "text", n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("oovStats counts occurrences outside the vocab; empty docs report zeros") {
    val docs = Seq(
      (1L, "aa bb aa cc"),      // cc + second aa occurrence still counts
      (2L, "aa aa aa"),         // fully in-vocab
      (3L, ""),                 // zero tokens
      (4L, "zz yy xx")          // fully OOV
    ).toDF("doc_id", "text")
    val vocab = Seq("aa", "bb").toDF("token")
    val out = Vocab.oovStats(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 4L, 1L), (2L, 3L, 0L), (3L, 0L, 0L), (4L, 3L, 3L)))
    intercept[IllegalArgumentException] {
      Vocab.oovStats(docs, "doc_id", "text", docs)
    }
  }

  test("topTokens orders by count desc then token, with exact counts") {
    val docs = Seq(
      (1L, "b b a a a c"),
      (2L, "b c c a")
    ).toDF("doc_id", "text")
    val top = Vocab.topTokens(docs, "text", 2)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 4L), ("b", 3L))) // c=3 loses the tie to b
  }

  test("postingLists: sorted capped postings, distinct doc counts, minDf cut") {
    val docs = Seq(
      (30L, "apple banana apple"), // dup token in one doc counts once
      (10L, "apple cherry"),
      (20L, "apple banana")
    ).toDF("doc_id", "text")
    val got = Vocab.postingLists(docs, "doc_id", "text", minDf = 2, maxPostings = 2)
      .orderBy("token").as[(String, Long, String)].collect().toSeq
    // df counts ALL docs; postings capped at the 2 smallest ids, ascending
    assert(got == Seq(("apple", 3L, "10,20"), ("banana", 2L, "20,30")))
  }

  test("scrub redacts URLs before emails and counts on redacted text") {
    val df = Seq(
      (1L, "mail me@x.org or see https://me@host.example/path ok"),
      (2L, "no pii here")
    ).toDF("id", "text")
    val out = df.select(
      col("id"),
      text.matchCount(col("text"), text.urlPattern).as("n_urls"),
      text.matchCount(text.redactUrls(col("text")), text.emailPattern).as("n_emails"),
      text.scrubPII(col("text")).as("clean"))
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    // the URL containing '@' is ONE url, not an email
    assert(out(0) == ((1L, 1, 1, "mail <EMAIL> or see <URL> ok")))
    assert(out(1) == ((2L, 0, 0, "no pii here")))
  }

  test("portable simhash matches an independent JVM-side computation") {
    val docs = Seq(
      (1L, "the quick brown fox the quick"),
      (2L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashPortable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // independent reimplementation: md5 via java.security, 60-bit prefix
    def md5hash60(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val toks = Seq("the", "quick", "brown", "fox", "the", "quick")
    val expected = (0 until 60).map { b =>
      val vote = toks.map(t => if (((md5hash60(t) >> b) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) 1L << b else 0L
    }.sum
    assert(got(1L) == expected)
    assert(got(2L) == 0L, "tokenless doc must get simhash 0, not be dropped")
  }

  test("ngramFrequencies: bigrams never cross document boundaries") {
    val docs = Seq((1L, "a b c"), (2L, "c a"), (3L, "solo")).toDF("doc_id", "text")
    val got = Vocab.ngramFrequencies(docs, "doc_id", "text", n = 2)
      .as[(String, Long)].collect().toMap
    // "c a" exists only inside doc 2 — doc 1 ending in c and doc 2 starting
    // with a must not fabricate another; doc 3 has no bigram at all
    assert(got == Map("a b" -> 1L, "b c" -> 1L, "c a" -> 1L))
  }

  test("trigram counts and deterministic top ordering") {
    val docs = Seq((1L, "x y z x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val top = Vocab.topNgrams(docs, "doc_id", "text", n = 3, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("x y z", 3L), ("y z x" -> 1L)))
  }

  test("tfidfTopTerms ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare1 common"), (2L, "common rare2"), (3L, "common")
    ).toDF("doc_id", "text")
    val got = Vocab.tfidfTopTerms(docs, "doc_id", "text", nDocs = 3, k = 2)
      .select("doc_id", "rnk", "token").as[(Long, Long, String)]
      .collect().toSet
    // rare terms: df=1 → score 2.0; common in doc1: tf=2, df=3 → 2.0;
    // ties break on token asc ("common" < "rare1")
    assert(got == Set((1L, 1L, "common"), (1L, 2L, "rare1"),
      (2L, 1L, "rare2"), (2L, 2L, "common"), (3L, 1L, "common")))
  }

  test("lexicalDiversity: exact pair counts, ppm TTR, null simpson at one token") {
    val docs = Seq(
      ("g1", "a a b"),        // types 2, tokens 3, rep = 2*1 = 2, tot = 6
      ("g2", "x"),            // tokens 1 -> simpson null
      ("g3", "t t t t")       // types 1, tokens 4, rep = 12, tot = 12
    ).toDF("source", "text")
    val out = Vocab.lexicalDiversity(docs, "source", "text").orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(out == Seq(
      ("g1", 2L, 3L, 666666L, 2L, 6L, Some(0.333333)),
      ("g2", 1L, 1L, 1000000L, 0L, 0L, None),
      ("g3", 1L, 4L, 250000L, 12L, 12L, Some(1.0))))
    // partition-invariant (one combinable aggregation chain)
    val p9 = Vocab.lexicalDiversity(docs.repartition(9), "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().toSeq
    assert(p9 == out)
  }

  test("tokenDispersion: bursty tokens score high, uniform near zero, zeros implicit") {
    import org.apache.spark.sql.functions.col
    // 4 sources; "even" appears 8x in ONE source (bursty); "spread"
    // appears 2x in each of the 4 (uniform)
    val docs = Seq(
      ("s1", ("even " * 8) + ("spread " * 2)),
      ("s2", "spread spread"), ("s3", "spread spread"), ("s4", "spread spread"))
      .toDF("source", "text")
    val out = Vocab.tokenDispersion(docs, "source", "text", minTotal = 8)
      .orderBy("token")
      .as[(String, Long, Long, Double)].collect().toSeq
    // even: c=(8,0,0,0): sum c2=64, T=8, S=4 -> 64/8 - 8/4 = 6.0
    // spread: c=(2,2,2,2): 16/8 - 2 = 0.0
    assert(out == Seq(("even", 8L, 1L, 6.0), ("spread", 8L, 4L, 0.0)))
    // minTotal prunes the tail
    assert(Vocab.tokenDispersion(docs, "source", "text", minTotal = 9).isEmpty)
  }

  test("shardAssign: duplicate content co-shards, ordinals dense per shard") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"),
      (4L, "third")).toDF("doc_id", "text")
    val out = Splits.shardAssign(docs, "text", "doc_id", nShards = 4)
      .select("doc_id", "shard", "ordinal")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == byId(2L)._2, "identical content must share a shard")
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        "ordinals must be dense 1..n within each shard")
    }
    assert(out.forall(r => r._2 >= 0 && r._2 < 4))
  }

  test("distinctNgramRatios: template collapse shows in distinct-2 first") {
    val docs = Seq(
      ("fresh", "alpha beta gamma delta"),     // all grams unique
      ("fresh", "epsilon zeta eta theta"),
      ("stamp", "click here to win"),          // the same template stamped
      ("stamp", "click here to win")
    ).toDF("source", "text")
    val got = Vocab.distinctNgramRatios(docs, Seq("source"), "text", Seq(1, 2))
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("fresh", 1)) == (("fresh", 1, 8L, 8L, 1.0)))
    assert(got(("fresh", 2)) == (("fresh", 2, 6L, 6L, 1.0)))
    assert(got(("stamp", 1)) == (("stamp", 1, 8L, 4L, 0.5)))
    assert(got(("stamp", 2)) == (("stamp", 2, 6L, 3L, 0.5)))
    // partition invariance
    val a = Vocab.distinctNgramRatios(docs.repartition(1), Seq("source"),
      "text", Seq(2)).collect().toSet
    val b = Vocab.distinctNgramRatios(docs.repartition(7), Seq("source"),
      "text", Seq(2)).collect().toSet
    assert(a == b)
    // docs shorter than n contribute nothing to that n's row
    val short = Seq(("s", "one")).toDF("source", "text")
    assert(Vocab.distinctNgramRatios(short, Seq("source"), "text", Seq(2))
      .count() == 0)
  }

  test("noveltyScores: copy scores 0, fresh text 1, empties absent") {
    val ref = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "one two three four five six"),        // verbatim copy -> 0
      (2L, "alpha beta gamma delta epsilon zeta"), // fully new -> 1
      (3L, ""),                                    // no grams -> absent
      (4L, "one two three four five six alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val got = Decontaminate.noveltyScores(docs, "doc_id", "text",
        ref, "text", n = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 4L))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == 0.0)
    assert(byId(2L)._4 == 1.0)
    // doc 4: 10 trigrams, 4 seen (the windows inside the copied prefix)
    assert(byId(4L)._2 == 10L && byId(4L)._3 == 4L)
    assert(byId(4L)._4 == 0.6)
  }

  test("bm25Search: coverage beats repetition, tf saturates, dl normalizes") {
    val docs = Seq(
      (1L, "alpha beta"),                    // both query terms once, short
      (2L, "alpha alpha alpha alpha"),       // one term repeated (saturation)
      (3L, "alpha filler filler filler filler filler filler filler"), // long
      (4L, "filler gamma")                   // no query term
    ).toDF("doc_id", "text")
    val q = Seq((1L, "alpha beta")).toDF("query_id", "qtext")
    val dlSum = 2L + 4L + 8L + 2L
    val got = Vocab.bm25Search(docs, "doc_id", "text", q, "query_id", "qtext",
        nDocs = 4L, dlSum = dlSum, k = 10)
      .orderBy("rnk").select("doc_id").as[Long].collect().toSeq
    // doc1 matches BOTH terms (beta df=1 is steeply idf-weighted) -> first;
    // doc2's repeated alpha saturates past doc3's long-doc-penalized one;
    // doc4 never scores
    assert(got == Seq(1L, 2L, 3L))

    // partition invariance of ranks AND scores (decimal-routed sum)
    val a = Vocab.bm25Search(docs.repartition(1), "doc_id", "text",
      q, "query_id", "qtext", 4L, dlSum, 10).orderBy("rnk").collect().toSeq
    val b = Vocab.bm25Search(docs.repartition(7), "doc_id", "text",
      q, "query_id", "qtext", 4L, dlSum, 10).orderBy("rnk").collect().toSeq
    assert(a == b)

    // k bounds the per-query result
    assert(Vocab.bm25Search(docs, "doc_id", "text", q, "query_id", "qtext",
      4L, dlSum, k = 2).count() == 2)
  }

  test("cooccurrenceLift: exact pair counts and lift ratios") {
    import spark.implicits._
    // one doc "a b c", window 2: pairs (a,b),(a,c),(b,c) once each;
    // U = 3 tokens, W = 3 pairs, every unigram count 1 ->
    // lift = (1/3) / ((1/3)*(1/3)) = 3.0
    val out = Vocab.cooccurrenceLift(Seq("a b c").toDF("text"), "text",
        window = 2, topK = 10)
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(("a", "b", 1L, 3.0), ("a", "c", 1L, 3.0), ("b", "c", 1L, 3.0)))
    // window 1 drops the distance-2 (a,c) pair
    val w1 = Vocab.cooccurrenceLift(Seq("a b c").toDF("text"), "text",
        window = 1, topK = 10)
      .select($"t_a", $"t_b").as[(String, String)].collect().toSet
    assert(w1 == Set(("a", "b"), ("b", "c")))
  }
}
