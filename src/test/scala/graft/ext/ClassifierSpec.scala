package graft.ext

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.text

class ClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val A = Seq("quasar", "nebula", "photon", "cosmic", "stellar", "galaxy")
  private val B = Seq("turnip", "carrot", "potato", "radish", "cabbage", "celery")

  /** Seeded separable corpus: positives speak vocabulary A, negatives B. */
  private def fixture(n: Int = 30, seed: Int = 41) = {
    val rnd = new Random(seed)
    def doc(v: Seq[String]) = Iterator.fill(6)(v(rnd.nextInt(v.size))).mkString(" ")
    val rows = (0 until n).map(i => (i.toLong, doc(A), 1)) ++
      (0 until n).map(i => ((n + i).toLong, doc(B), 0))
    rows.toDF("doc_id", "text", "y")
  }

  /** The scorer's bucket map replicated driver-side: first 8 hex chars of
    * md5(token) as a long, mod buckets.
    */
  private def bucketOf(tok: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    (java.lang.Long.parseLong(hex, 16) % buckets).toInt
  }

  test("suffStats: exact per-bucket counts + class-size marker rows") {
    val df = Seq(
      (1L, "aa bb aa", Some(1)), (2L, "bb cc", Some(0)), (3L, "aa", Some(1)),
      (4L, null.asInstanceOf[String], Some(0)), // null text excluded entirely
      (5L, "dd", None) // NULL label counts as negative (the oracle's CASE)
    ).toDF("doc_id", "text", "y")
    val out = Classifier.suffStats(df, "text", "y", buckets = 64)
      .as[(Int, Long, Long)].collect()
      .map { case (b, n, p) => b -> ((n, p)) }.toMap
    val (ba, bb, bc, bd) = (bucketOf("aa", 64), bucketOf("bb", 64),
      bucketOf("cc", 64), bucketOf("dd", 64))
    assert(Set(ba, bb, bc, bd).size == 4, "fixture tokens must not collide")
    assert(out(ba) == ((3L, 3L))) // aa: 3 occurrences, all in positives
    assert(out(bb) == ((2L, 1L))) // bb: one in doc1 (pos), one in doc2 (neg)
    assert(out(bc) == ((1L, 0L)))
    assert(out(bd) == ((1L, 0L))) // null-label doc5 lands in the negatives
    assert(out(-1) == ((2L, 0L))) // negative docs with text: doc2, doc5
    assert(out(-2) == ((2L, 2L))) // positive docs: doc1, doc3
    assert(out.keySet.forall(_ >= -2), "no NULL/stray marker bucket may appear")
    // and the model build survives the null-label corpus (no NPE)
    val (_, bias) = Classifier.nbModel(
      Classifier.suffStats(df, "text", "y", buckets = 64), buckets = 64)
    assert(bias == math.floor(1000.0 * math.log(3.0 / 3.0)).toLong)
  }

  test("fit separates a separable corpus and feeds the q128 scorer end-to-end") {
    val df = fixture()
    val (w, bias) = Classifier.fit(df, "text", "y", buckets = 4096, rounds = 4)
    // the fitted weights drop straight into the shipped scorer — the
    // fit -> filter loop closed with NO re-featurization step between
    val scored = df.select($"doc_id", $"y",
        text.hashedLinearScore($"text", w, bias).as("score"))
      .as[(Long, Int, Long)].collect()
    assert(scored.length == 60)
    scored.foreach { case (id, y, s) =>
      if (y == 1) assert(s > 0, s"positive doc $id scored $s")
      else assert(s < 0, s"negative doc $id scored $s")
    }
    // vocabulary weights moved in opposite directions
    val wa = A.map(t => w(bucketOf(t, 4096)))
    val wb = B.map(t => w(bucketOf(t, 4096)))
    assert(wa.forall(_ > 0) && wb.forall(_ < 0),
      s"vocab weights must split by class: A=$wa B=$wb")
  }

  test("fit is deterministic across partitionings (exact-decimal gradients)") {
    val df = fixture()
    val (w1, b1) = Classifier.fit(df, "text", "y", buckets = 512, rounds = 3)
    val (w2, b2) = Classifier.fit(df.repartition(7), "text", "y",
      buckets = 512, rounds = 3)
    assert(b1 == b2)
    assert(w1.toSeq == w2.toSeq,
      "quantized weights must not depend on partitioning/aggregation order")
  }

  test("naiveBayesScores matches a driver-side reference and separates the fixture") {
    val df = fixture(n = 15, seed = 13)
    val out = Classifier.naiveBayesScores(df, "doc_id", "text", "y",
        buckets = 4096)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // independent reference: counts + floor-ln weights computed driver-side
    val docs = df.as[(Long, String, Int)].collect().sortBy(_._1)
    val toks = docs.map { case (id, t, y) =>
      (id, t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(bucketOf(_, 4096)), y) }
    val cnt = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    toks.foreach { case (_, bs, y) => bs.foreach { b =>
      val (n, p) = cnt.getOrElse(b, (0L, 0L)); cnt(b) = (n + 1, p + y) } }
    def qln(num: Long, den: Long) =
      math.floor(1000.0 * math.log(num.toDouble / den)).toLong
    val nPos = docs.count(_._3 == 1).toLong
    val bias = qln(nPos + 1, docs.length - nPos + 1)
    val expected = toks.map { case (id, bs, _) =>
      id -> (bias + bs.map { b =>
        val (n, p) = cnt(b); qln(p + 1, n - p + 1) }.sum) }.toMap
    out.foreach { case (id, s, lbl) =>
      assert(s == expected(id), s"doc $id: engine $s vs reference ${expected(id)}")
      assert(lbl == (if (s >= 0) "keep" else "drop"))
    }
    // and the trained model actually separates the two vocabularies
    val byClass = out.map(r => r._1 -> r._2).toMap
    docs.foreach { case (id, _, y) =>
      if (y == 1) assert(byClass(id) > 0) else assert(byClass(id) < 0) }
  }

  test("mergeSuffStats: sharded stats merge to the one-shot stats; model identical") {
    val df = fixture(n = 12, seed = 19)
    val full = Classifier.suffStats(df, "text", "y", buckets = 256)
      .as[(Int, Long, Long)].collect().toSet
    // 3-way chain: (shard1 + shard2) + shard3
    val merged = Classifier.mergeSuffStats(
        Classifier.mergeSuffStats(
          Classifier.suffStats(df.where($"doc_id" < 8), "text", "y", 256),
          Classifier.suffStats(
            df.where($"doc_id" >= 8 && $"doc_id" < 16), "text", "y", 256)),
        Classifier.suffStats(df.where($"doc_id" >= 16), "text", "y", 256))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == full, "additive stats must merge exactly")
    // and the rebuilt model equals the one-shot model
    val (w1, b1) = Classifier.nbModel(
      Classifier.suffStats(df, "text", "y", 256), buckets = 256)
    val (w2, b2) = Classifier.nbModel(Classifier.mergeSuffStats(
      Classifier.suffStats(df.where($"doc_id" % 2 === 0), "text", "y", 256),
      Classifier.suffStats(df.where($"doc_id" % 2 === 1), "text", "y", 256)),
      buckets = 256)
    assert(w1.toSeq == w2.toSeq && b1 == b2)
  }

  test("fit reduces logistic loss round over round on the fixture") {
    val df = fixture(n = 20, seed = 7)
    def loss(w: Array[Int], bias: Long, scale: Double = 1000.0): Double = {
      val rows = df.select($"y",
          text.hashedLinearScore($"text", w, bias).as("s"))
        .as[(Int, Long)].collect()
      rows.map { case (y, s) =>
        val p = 1.0 / (1.0 + math.exp(-s / scale))
        -(y * math.log(p max 1e-12) + (1 - y) * math.log((1 - p) max 1e-12))
      }.sum / rows.length
    }
    val l0 = loss(new Array[Int](4096), 0L) // ln 2 at the origin
    val (w2, b2) = Classifier.fit(df, "text", "y", buckets = 4096, rounds = 2)
    val (w4, b4) = Classifier.fit(df, "text", "y", buckets = 4096, rounds = 4)
    val l2 = loss(w2, b2)
    val l4 = loss(w4, b4)
    assert(l2 < l0, s"2 rounds must beat the origin: $l2 vs $l0")
    assert(l4 < l2, s"4 rounds must beat 2: $l4 vs $l2")
  }

  test("chiSquareTokens matches a driver-side reference; screens df bounds") {
    // 8 pos + 8 neg; 'alpha' pure-positive, 'beta' pure-negative,
    // 'common' in every doc (screened: df = N), 'rare' once (screened:
    // df < minDf), 'mid' mixed
    val rows =
      (1L to 8L).map(i => (i, "alpha common " + (if (i <= 5) "mid" else ""), 1)) ++
      (9L to 16L).map(i => (i, "beta common " + (if (i <= 11) "mid" else "") +
        (if (i == 9L) " rare" else ""), 0))
    val df = rows.toDF("doc_id", "text", "y").repartition(5)
    val out = Classifier.chiSquareTokens(df, "text", "y", k = 10, minDf = 2)
      .orderBy("rank")
      .as[(Int, String, Long, Long, Double)].collect()
    val toks = out.map(_._2).toSeq
    assert(!toks.contains("common") && !toks.contains("rare"), toks.toString)
    assert(toks.take(2).toSet == Set("alpha", "beta"), toks.toString)
    // driver-side chi2 reference on the exact same tree
    val n = 16.0; val np = 8.0; val nn = 8.0
    def chi2(a: Double, b: Double): Double = {
      val c = np - a; val d = nn - b
      n * (a * d - b * c) * (a * d - b * c) / ((a + b) * (c + d) * np * nn)
    }
    val byTok = out.map(r => r._2 -> r).toMap
    // alpha: in all 8 positives, 0 negatives
    assert(byTok("alpha")._3 == 8L && byTok("alpha")._4 == 8L)
    assert(byTok("alpha")._5 ==
      BigDecimal(chi2(8, 0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // mid: 5 of 8 positives, 3 of 8 negatives
    assert(byTok("mid")._3 == 8L && byTok("mid")._4 == 5L)
    assert(byTok("mid")._5 ==
      BigDecimal(chi2(5, 3)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // ties break token-asc: alpha and beta have identical chi2
    assert(byTok("alpha")._5 == byTok("beta")._5)
    assert(toks.take(2) == Seq("alpha", "beta"))
    // single-class corpus fails loudly
    val oneClass = Seq((1L, "a b", 1), (2L, "b c", 1)).toDF("doc_id", "text", "y")
    val e = intercept[IllegalArgumentException] {
      Classifier.chiSquareTokens(oneClass, "text", "y")
    }
    assert(e.getMessage.contains("single-class"))
  }
}
