package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ReportSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dataCard: volume, quality and CORPUS-WIDE duplicate membership per group") {
    // a 25-token stopword-bearing text passes the gopher rules at
    // minStopwords=1; the duplicated text spans BOTH sources, which is
    // exactly what a per-source card must surface
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "walks back home with a very calm and entirely unhurried little stride today"
    val d = Seq(
      ("web", 1L, good),
      ("web", 2L, good),              // dup within web
      ("books", 3L, good),            // dup ACROSS sources
      ("books", 4L, "short junk 123") // fails quality, unique
    ).toDF("source", "doc_id", "text")
    val card = Report.dataCard(d, Seq("source"), "text")
      .orderBy("source").as[(String, Long, Long, Long, Long)].collect().toSeq
    val nTok = good.split("\\s+").length.toLong
    assert(card == Seq(
      ("books", 2L, nTok + 3L, 1L, 1L),
      ("web", 2L, 2 * nTok, 2L, 2L)), s"got $card")
  }

  test("dataCard requires group columns") {
    val d = Seq(("a", "x")).toDF("source", "text")
    intercept[IllegalArgumentException] {
      Report.dataCard(d, Nil, "text")
    }
  }

  test("embeddingDrift: zero on identical slices, exact shift, bad rows out") {
    val a = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((3L, Seq(2.0f, 2.0f)), (4L, Seq(4.0f, 8.0f)))
      .toDF("vec_id", "embedding")
    val got = Report.embeddingDrift(a, b, "embedding", dims = 2)
      .orderBy("dim").as[(Int, Double, Double, Double)].collect().toSeq
    // centroids: a = (2, 3), b = (3, 5) -> d2 = (1, 4)
    assert(got == Seq((0, 2.0, 3.0, 1.0), (1, 3.0, 5.0, 4.0)))

    val same = Report.embeddingDrift(a, a, "embedding", 2)
      .as[(Int, Double, Double, Double)].collect()
    assert(same.forall(_._4 == 0.0))

    // wrong-length and null vectors are excluded, not dimension-skewed
    val dirty = a.union(Seq((9L, Seq(100.0f)), (10L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding"))
    assert(Report.embeddingDrift(dirty, b, "embedding", 2)
      .orderBy("dim").as[(Int, Double, Double, Double)].collect().toSeq == got)

    // partition invariance of the decimal-routed sums
    val big = (1 to 500).map(i => (i.toLong, Seq(i * 0.001f, 1.0f / i)))
      .toDF("vec_id", "embedding")
    val x = Report.embeddingDrift(big.repartition(1), b, "embedding", 2)
      .orderBy("dim").collect().toSeq
    val y = Report.embeddingDrift(big.repartition(13), b, "embedding", 2)
      .orderBy("dim").collect().toSeq
    assert(x == y)
  }

  test("tokenDrift: hand-computed chi-square, one-sided tokens kept, invariant") {
    // A: 3x shared + 1x only_a; B: 1x shared + 3x only_b -> NA = NB = 4
    val a = Seq("shared shared shared only_a").toDF("text")
    val b = Seq("shared only_b only_b only_b").toDF("text")
    val got = Report.tokenDrift(a, b, "text", k = 10)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // shared: a=3,b=1, e=2 each -> 1/2 + 1/2 = 1.0
    assert(got("shared") == (("shared", 3L, 1L, 1.0)))
    // only_a: a=1,b=0, eA=eB=0.5 -> 0.25/0.5 + 0.25/0.5 = 1.0 (one-sided
    // tokens are the interesting drift case and must survive the join)
    assert(got("only_a") == (("only_a", 1L, 0L, 1.0)))
    assert(got("only_b") == (("only_b", 0L, 3L, 3.0)))

    // identical slices -> zero drift everywhere
    val same = Report.tokenDrift(a, a, "text", 10)
      .as[(String, Long, Long, Double)].collect()
    assert(same.forall(_._4 == 0.0))

    // partition invariance and the k bound
    val big = (1 to 400).map(i => s"tok${i % 37} filler").toDF("text")
    val x = Report.tokenDrift(big.repartition(1), a, "text", 5)
      .collect().toSeq
    val y = Report.tokenDrift(big.repartition(13), a, "text", 5)
      .collect().toSeq
    assert(x == y)
    assert(x.size == 5)
  }

  test("boilerplatePrefix: LCP(min,max) identity, null-only groups, cap") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "HEADER: alpha body"), ("s1", "HEADER: beta body"),
      ("s1", "HEADER: gamma"),
      ("s2", "no"), ("s2", "overlap"),
      ("s3", "identical full text"), ("s3", "identical full text"),
      ("s4", null.asInstanceOf[String]), ("s4", "solo text")
    ).toDF("source", "text")
    val out = Report.boilerplatePrefix(docs, "source", "text", maxPrefix = 6)
      .orderBy("source")
      .as[(String, Long, Long, String)].collect().toSeq
    // s1: min="HEADER: alpha...", max="HEADER: gamma" -> LCP "HEADER: "
    // (8 chars), prefix capped at 6; s2: "no" vs "overlap" -> 0;
    // s3: identical -> full length 19; s4: the null drops, single doc
    // -> min==max -> full length
    assert(out == Seq(
      ("s1", 3L, 8L, "HEADER"),
      ("s2", 2L, 0L, ""),
      ("s3", 2L, 19L, "identi"),
      ("s4", 1L, 9L, "solo t")))
  }

  test("manifestDiff: statuses localize to the touched shards") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // drop shard 1 entirely, edit doc 2 (shard 2), add doc 100 (shard 0)
    val next = docs.where($"doc_id" % 4 =!= 1)
      .withColumn("text",
        org.apache.spark.sql.functions.when($"doc_id" === 2L, "EDIT")
          .otherwise($"text"))
      .unionByName(Seq((100L, "new doc")).toDF("doc_id", "text"))
    val out = Report.manifestDiff(docs, next, "doc_id", "text", shards = 4)
      .orderBy("shard")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (-1L, 40L, 31L, "changed"),
      (0L, 10L, 11L, "changed"),
      (1L, 10L, 0L, "removed"),
      (2L, 10L, 10L, "changed"),
      (3L, 10L, 10L, "same")))
  }

  test("manifest: partition-invariant digests; an edit localizes to its shard + root") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"doc number $i body")).toDF("doc_id", "text")
    val m1 = Report.manifest(docs, "doc_id", "text", shards = 4)
      .orderBy("shard").collect().toSeq
    val m2 = Report.manifest(docs.repartition(11), "doc_id", "text", shards = 4)
      .orderBy("shard").collect().toSeq
    assert(m1.map(_.toSeq) == m2.map(_.toSeq))
    assert(m1.size == 5 && m1.last.getLong(0) == -1L
      || m1.head.getLong(0) == -1L)
    val byShard = m1.map(r => r.getLong(0) -> r.getString(3)).toMap
    // edit one doc (id 6 -> shard 2): only shard 2 and the root move
    val edited = docs.withColumn("text",
      org.apache.spark.sql.functions.when($"doc_id" === 6L,
        org.apache.spark.sql.functions.lit("CHANGED")).otherwise($"text"))
    val m3 = Report.manifest(edited, "doc_id", "text", shards = 4)
      .orderBy("shard").collect().toSeq
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(m3(2L) != byShard(2L) && m3(-1L) != byShard(-1L))
    assert(Seq(0L, 1L, 3L).forall(s => m3(s) == byShard(s)))
    // null text still contributes presence
    val withNull = docs.withColumn("text",
      org.apache.spark.sql.functions.when($"doc_id" === 6L,
        org.apache.spark.sql.functions.lit(null).cast("string"))
        .otherwise($"text"))
    val m4 = Report.manifest(withNull, "doc_id", "text", shards = 4)
      .orderBy("shard").collect().toSeq
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(m4(2L) != byShard(2L) && m4(2L) != m3(2L))
  }
}
