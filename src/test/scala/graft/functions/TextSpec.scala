package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, s: String): T =
    Seq(s).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("tokenCount: whitespace tokens, 0 for blank") {
    assert(one[Int](text.tokenCount(col("t")), "a b  c") == 3)
    assert(one[Int](text.tokenCount(col("t")), "   ") == 0)
    assert(one[Int](text.tokenCount(col("t")), "") == 0)
    assert(one[Int](text.tokenCount(col("t")), "one") == 1)
  }

  test("punct and digit ratios") {
    assert(one[Double](text.punctRatio(col("t")), "ab,.") == 0.5)
    assert(one[Double](text.digitRatio(col("t")), "a1b2") == 0.5)
    assert(one[Double](text.punctRatio(col("t")), "") == 0.0)
  }

  test("langId picks the language with most stopword hits") {
    assert(one[String](text.langId(col("t")),
      "the cat is in the house and it was not there") == "en")
    assert(one[String](text.langId(col("t")),
      "der Hund ist nicht mit der Katze und auch nicht im Haus") == "de")
    assert(one[String](text.langId(col("t")),
      "le chat est dans la maison avec les enfants pour une heure") == "fr")
    assert(one[String](text.langId(col("t")), "zzz qqq xxx") == "und")
  }

  test("domainBlocked: parent-domain suffix semantics, port-stripped host") {
    val bl = Seq("blocked.com", "bad.example.org")
    def blocked(u: String): Boolean =
      one[Boolean](text.domainBlocked(col("t"), bl), u)
    assert(blocked("https://blocked.com/x"))
    assert(blocked("https://cdn.sub.blocked.com/x"))       // parent suffix
    assert(blocked("http://WWW.Bad.Example.ORG:8080/y"))   // case + port
    assert(!blocked("https://notblocked.com/x"))
    assert(!blocked("https://blocked.com.evil.net/x"))     // suffix, not substring
    assert(!blocked("no url here"))
    assert(one[String](text.hostOf(col("t")), "https://A.B.C:9090/z") == "a.b.c")
  }

  test("filterShortSegments drops sub-minWords segments, keeps order") {
    def clean(s: String): String =
      one[String](text.filterShortSegments(col("t"), minWords = 3), s)
    assert(clean("click here. this one has words. menu. another real sentence here")
      == "this one has words. another real sentence here")
    assert(clean("a. b. c") == "")
    assert(clean("exactly three words") == "exactly three words")
    // runs of spaces don't fake extra words
    assert(clean("two  words") == "")
  }

  test("dropRepeatedSegments keeps first occurrence in document order") {
    def clean(s: String): String =
      one[String](text.dropRepeatedSegments(col("t")), s)
    assert(clean("a b. c d. a b. e") == "a b. c d. e")
    assert(clean("x. x. x") == "x")
    assert(clean("no repeats here") == "no repeats here")
    assert(clean("") == "")
    // later duplicates vanish but first-seen ORDER is preserved
    assert(clean("b. a. b. a. c") == "b. a. c")
  }

  test("hashedLinearScore: bias on empty, exact integer fold, case-folded") {
    val w = Array.tabulate(64)(b => b - 32)
    def bucketOf(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(8), 16) % w.length).toInt
    }
    def score(s: String): Long =
      one[Long](text.hashedLinearScore(col("t"), w, bias = 7L), s)
    assert(score("") == 7L)
    assert(score("   ") == 7L)
    val expected = 7L + 2L * w(bucketOf("tok")) + w(bucketOf("other"))
    assert(score("tok tok other") == expected)
    // tokenizer lowercases and strips non-alnum before hashing
    assert(score("TOK, tok! OTHER?") == expected)
  }

  test("canonicalizeUrl: case/www/default-port/fragment/tracking noise folds") {
    def canon(s: String): String =
      one[String](text.canonicalizeUrl(col("t")), s)
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=1&gclid=z#frag")
      == "https://example.com/A/b?id=1")
    // adjacent tracking params, including a leading one, all strip
    assert(canon("http://a.com/p?utm_a=1&utm_b=2&q=3") == "http://a.com/p?q=3")
    assert(canon("http://a.com/p?utm_a=1&utm_b=2") == "http://a.com/p")
    // non-default port survives; default port for the OTHER scheme survives
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    // root slash and bare host are the same page
    assert(canon("https://a.com/") == "https://a.com")
    assert(canon("https://a.com") == "https://a.com")
    // path case is SIGNIFICANT (only scheme+host lowercase)
    assert(canon("https://a.com/Path") == "https://a.com/Path")
    // non-URL strings pass through untouched
    assert(canon("not a url") == "not a url")
  }

  test("normalizeNFC composes decomposed accents; ASCII passes through") {
    val decomposed = "cafe\u0301" // e + combining acute
    val composed = "caf\u00e9"
    assert(decomposed != composed) // the fixture really is decomposed
    assert(one[String](text.normalizeNFC(col("t")), decomposed) == composed)
    assert(one[String](text.normalizeNFC(col("t")), "plain ascii") == "plain ascii")
  }

  test("stripHtml drops tags, decodes entities, collapses whitespace") {
    val html = "<p>Hello <b>world</b> &amp; friends &lt;3</p>"
    assert(one[String](text.stripHtml(col("t")), html) == "Hello world & friends <3")
    // nested entity: "&amp;lt;" is the literal text "&lt;" — no double decode
    assert(one[String](text.stripHtml(col("t")), "5 &amp;lt; 6") == "5 &lt; 6")
  }

  test("stripControl removes control chars but keeps tab/newline") {
    assert(one[String](text.stripControl(col("t")), "a\u0000b\u0007c\td\ne") == "abc\td\ne")
  }

  test("repetition signals: duplicate segments and dominant token") {
    val looped = "the cat sat. the cat sat. the dog ran. "
    assert(math.abs(one[Double](text.duplicateSegmentRatio(col("t")), looped)
      - (1.0 - 2.0 / 3.0)) < 1e-12)
    assert(one[Double](text.duplicateSegmentRatio(col("t")), "") == 0.0)
    // "spam spam spam eggs": max multiplicity 3 of 4 tokens
    assert(one[Double](text.maxTokenRatio(col("t")), "spam spam spam eggs") == 0.75)
    assert(one[Double](text.maxTokenRatio(col("t")), "") == 0.0)
  }

  test("tokens are Unicode-aware: accented words stay whole") {
    val toks = Seq("Über die Brücke, più o meno!").toDF("t")
      .select(text.tokens(col("t")).as("r")).collect().head.getSeq[String](0)
    assert(toks == Seq("über", "die", "brücke", "più", "o", "meno"))
  }

  test("fingerprint is whitespace-normalization invariant") {
    val a = one[Long](text.fingerprint(col("t")), "Hello   World Foo")
    val b = one[Long](text.fingerprint(col("t")), "hello world foo")
    assert(a == b)
    val c = one[Long](text.fingerprint(col("t")), "hello world bar")
    assert(a != c)
  }

  test("tokenSetFingerprint is word-order invariant") {
    val a = one[Long](text.tokenSetFingerprint(col("t")), "alpha beta gamma")
    val b = one[Long](text.tokenSetFingerprint(col("t")), "gamma alpha beta")
    assert(a == b)
  }

  test("qualityScore ranks clean prose above junk") {
    val clean = "The researchers published their findings in the journal " +
      "and the results were discussed widely in the community for weeks."
    val junk = "@@@@ 1234 5678 #### !!!! 9999 %%%% 0000 &&&& ****"
    val q1 = one[Double](text.qualityScore(col("t")), clean)
    val q2 = one[Double](text.qualityScore(col("t")), junk)
    assert(q1 > q2)
    assert(q1 >= 0.0 && q1 <= 1.0 && q2 >= 0.0 && q2 <= 1.0)
  }

  test("subwordCount splits letter runs, digits, punctuation") {
    assert(one[Int](text.subwordCount(col("t")), "hello world42!") == 4)
    assert(one[Int](text.subwordCount(col("t")), "") == 0)
    assert(one[Int](text.subwordCount(col("t")), "  \t ") == 0)
    // mixed-boundary splits: abc|123|-|def -> 4
    assert(one[Int](text.subwordCount(col("t")), "abc123-def") == 4)
  }

  test("tokenSetFingerprintHex equals md5 of the sorted distinct token set") {
    val a = one[String](text.tokenSetFingerprintHex(col("t")), "beta alpha beta")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(a == md)
    // order invariant, like the xxhash64 fast path
    val b = one[String](text.tokenSetFingerprintHex(col("t")), "alpha beta")
    assert(a == b)
  }

  test("textStats matches the composable regex formulations exactly") {
    val tricky = Seq(
      "", " ", "  \t\n ", "plain words here", "a  b\tc", " lead and trail ",
      "ab-cd 12x 'quote'!", "MiXeD CASE 42 Upper", "naïve café über",
      "日本語 テスト 123", "a b", "emoji 😀 ok", "x" * 500,
      "num1num 123abc ...", "päx—dash", "\t", "a b\t", "Ⅻ ① ５")
    val df = tricky.toDF("t")
    val c = col("t")
    val legacy = df.select(
      size(array_remove(split(c, "\\s+"), "")).as("tc"),
      size(regexp_extract_all(regexp_replace(c, "\\s+", " "),
        lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N} ]"), lit(0))).as("sw"),
      (length(c) - length(regexp_replace(c, "\\p{Punct}", ""))).as("np"),
      (length(c) - length(regexp_replace(c, "[0-9]", ""))).as("nd"),
      (length(c) - length(regexp_replace(c, "[A-Z]", ""))).as("nu"),
      length(regexp_replace(c, "\\s", "")).as("nonws"),
      length(c).as("nc")).collect()
    val native = df.select(text.textStats(c).as("s")).select(
      col("s.n_tokens"), col("s.n_subwords"), col("s.n_punct"),
      col("s.n_digit"), col("s.n_upper"), col("s.n_nonws"),
      col("s.n_chars")).collect()
    legacy.zip(native).zip(tricky).foreach { case ((l, n), t) =>
      assert(l.toSeq == n.toSeq, s"mismatch for ${t.take(30)}")
    }
  }

  test("script awareness: unspaced counts, seg tokens, routing ratio") {
    def triple(s: String): (Int, Int, Double) = {
      val r = Seq(s).toDF("t").select(
        text.unspacedCount(col("t")).as("u"),
        text.segTokenCount(col("t")).as("g"),
        text.unspacedRatio(col("t")).as("r")).head()
      (r.getInt(0), r.getInt(1), r.getDouble(2))
    }
    // spaced scripts: unspaced 0, seg tokens == whitespace tokens, ratio 0
    assert(triple("hello world") == ((0, 2, 0.0)))
    assert(triple("") == ((0, 0, 0.0)))
    assert(triple("  \t ") == ((0, 0, 0.0)))
    // pure Han paragraph: every code point its own token, ratio 1
    assert(triple("春眠不覚暁処処聞啼鳥") == ((10, 10, 1.0)))
    // mixed doc: CJK chars break and count between latin words
    assert(triple("hello 世界 world") == ((2, 4, 2.0 / 12)))
    // run-internal mixing: abc|世|界|def = 4 seg tokens from 1 ws token
    val m = triple("abc世界def")
    assert(m._1 == 2 && m._2 == 4)
    // Thai (block includes its combining vowels) routes; Hangul does NOT
    // (Korean is space-segmented — it must stay on the word path)
    assert(triple("สวัสดีครับ")._3 == 1.0)
    assert(triple("안녕하세요") == ((0, 1, 0.0)))
    // astral Han (CJK Extension B, 4-byte UTF-8): decoded, not mangled
    val ext = "𠀀" * 3 // U+20000 three times
    assert(triple(ext) == ((3, 3, 1.0)))
    // ASCII punctuation between ideographs is its own spaced-run token
    assert(triple("你好,世界") == ((4, 5, 4.0 / 5)))
    // seg tokens == whitespace tokens on EVERY unspaced-free doc
    val tricky = Seq("ab-cd 12x 'quote'!", "MiXeD CASE 42 Upper",
      "naïve café über", "num1num 123abc ...", "x" * 500, "a b\t")
    tricky.foreach { s =>
      val r = Seq(s).toDF("t").select(
        text.tokenCount(col("t")).as("a"),
        text.segTokenCount(col("t")).as("b")).head()
      assert(r.getInt(0) == r.getInt(1), s"seg != ws tokens for $s")
    }
  }

  test("gopher on CJK: aware signals count content where plain ones collapse") {
    // a content-rich unspaced doc: 40 distinct-ish ideographs
    val han = "春眠不覚暁処処聞啼鳥夜来風雨声花落知多少床前明月光疑是地上霜挙頭望明月低頭思故郷"
    val plain = Seq(han).toDF("t")
      .select(text.gopherSignals(col("t")).as("s")).select(
        col("s.n_tok"), col("s.max_share")).head()
    // the whitespace tokenizer's artifact: ONE token owning 100% share —
    // the doc with the most content reads as both too-short and repetitive
    assert(plain.getLong(0) == 1L && plain.getDouble(1) == 1.0)
    val aware = Seq(han).toDF("t")
      .select(text.gopherSignalsAware(col("t")).as("s")).select(
        col("s.n_tok"), col("s.avg_len"), col("s.max_share")).head()
    assert(aware.getLong(0) == han.length.toLong, "seg tokens must count content")
    assert(aware.getDouble(1) == 1.0, "one non-ws char per seg token")
    assert(aware.getDouble(2) < 0.5, s"varied text must not read repetitive: $aware")
    // under script-adjusted thresholds the aware signals PASS the doc the
    // plain ones reject (stopword rule dropped: inventories are European)
    val reasons = Seq(han).toDF("t").select(
      text.gopherReasonsOf(text.gopherSignalsAware(col("t")),
        minTokens = 20, minAvgLen = 0.5, maxAvgLen = 10.0,
        minStopwords = 0).as("r"),
      text.gopherReasonsOf(text.gopherSignals(col("t")),
        minTokens = 20, minAvgLen = 0.5, maxAvgLen = 10.0,
        minStopwords = 0).as("p")).head()
    assert(reasons.getLong(0) == 0L, s"aware must pass: bits ${reasons.getLong(0)}")
    assert((reasons.getLong(1) & 1L) == 1L, "plain trips the min-tokens rule")
    // an actually-repetitive CJK doc still trips the repetition rule
    val rep = Seq("好" * 120).toDF("t")
      .select(text.gopherSignalsAware(col("t")).as("s"))
      .select(col("s.max_share")).head().getDouble(0)
    assert(rep > 0.9, s"byte-gram duplication must expose repetition: $rep")
    // spaced-script text: aware == plain, field for field (drop-in claim)
    val docs = Seq("The quick brown fox jumps over the lazy dog",
      "ab-cd 12x 'quote'!", "naïve café über 123", "", "x" * 80)
    docs.foreach { s =>
      val r = Seq(s).toDF("t").select(
        text.gopherSignals(col("t")).as("p"),
        text.gopherSignalsAware(col("t")).as("a")).head()
      assert(r.get(0) == r.get(1), s"aware diverged on spaced text: $s")
    }
  }

  test("langIdAware: script rules on unspaced text, stopword fallback elsewhere") {
    def lid(s: String) = one[String](text.langIdAware(col("t")), s)
    // every one of these scored "und" under the stopword heuristic
    assert(one[String](text.langId(col("t")), "春眠不覚暁処処聞啼鳥") == "und")
    assert(lid("春眠不覚暁処処聞啼鳥") == "zh", "pure Han reads Chinese")
    // ANY Kana makes it Japanese — Japanese text mixes Kanji and Kana,
    // and Kana appears in no other language
    assert(lid("合成された日本語の文章で漢字と仮名が混在する") == "ja")
    assert(lid("カタカナだけのテキスト") == "ja")
    assert(lid("สวัสดีครับยินดีต้อนรับ") == "th")
    assert(lid("សួស្តីពិភពលោក") == "km")
    assert(lid("ສະບາຍດີໂລກກວ້າງ") == "lo")
    assert(lid("မင်္ဂလာပါကမ္ဘာလောက") == "my")
    // spaced-script text: EXACTLY langId (drop-in claim), incl. und + Hangul
    Seq("the cat is in the house and it was not there",
      "der Hund ist nicht mit der Katze und auch nicht im Haus",
      "zzz qqq xxx", "안녕하세요 만나서 반갑습니다", "").foreach { s =>
      assert(lid(s) == one[String](text.langId(col("t")), s),
        s"aware diverged on spaced text: $s")
    }
    // mixed doc below the routing threshold stays on the stopword path
    assert(lid("the cat is in the house and it was not there 中") == "en")
  }

  test("gopherReasons sets the violated-rule bits") {
    // 30 English filler tokens: passes every rule
    val good = (Seq.fill(6)("the and of that with") ).mkString(" ")
    assert(one[Long](text.gopherReasons(col("t")), good) == 0L)
    // short doc (bit 1) with no stopwords (bit 8) and one dominant token
    // (bit 16): "zz" repeated — avg len 2 also trips bit 2
    val bad = "zz zz zz zz zz"
    assert(one[Long](text.gopherReasons(col("t")), bad) == (1L | 2L | 8L | 16L))
    // digit soup trips the digit-ratio bit on an otherwise-keepable doc
    val digits = (Seq.fill(6)("the and of that with9999999") ).mkString(" ")
    assert((one[Long](text.gopherReasons(col("t")), digits) & 4L) == 4L)
    // null text violates every rule — the filter must not pass what it
    // cannot inspect
    val nullReasons = Seq(Option.empty[String]).toDF("t")
      .select(text.gopherReasons(col("t"))).as[Long].head()
    assert(nullReasons == 31L)
  }

  test("vectors: cosine/dot/norm basics") {
    val df = Seq((Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).toDF("a", "b")
    val r = df.select(
      vectors.cosine(col("a"), col("b")).as("c"),
      vectors.cosine(col("a"), col("a")).as("self"),
      vectors.dot(col("a"), col("b")).as("d"),
      vectors.norm(col("a")).as("n")).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 1.0)
  }

  test("hyperplaneBucket: identical vectors share buckets, deterministic") {
    val df = Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(1f, 2f, 3f, 4f)))
      .toDF("id", "v")
    val b = df.select(vectors.hyperplaneBucket(col("v"), 4, 8, 42L).as("b"))
      .as[Long].collect()
    assert(b(0) == b(1))
    assert(b(0) >= 0 && b(0) < 256)
  }
}
