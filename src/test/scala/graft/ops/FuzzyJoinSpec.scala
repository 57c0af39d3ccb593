package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FuzzyJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def link(
      l: Seq[(Long, String)], r: Seq[(Long, String)],
      maxBlock: Int = 1000, maxEdits: Int = 1): Set[(Long, Long, Int)] =
    FuzzyJoin.symspellJoin(
        l.toDF("lid", "lv"), "lid", "lv",
        r.toDF("rid", "rv"), "rid", "rv",
        maxEdits = maxEdits, maxBlock = maxBlock)
      .select($"lid", $"rid", $"edit_distance")
      .as[(Long, Long, Int)].collect().toSet

  test("finds exact, substitution, insertion and deletion matches") {
    val got = link(
      Seq((1L, "kitten"), (2L, "apple"), (3L, "zz")),
      Seq((10L, "kitten"),   // distance 0
          (11L, "kittan"),   // substitution
          (12L, "kitteen"),  // insertion
          (13L, "kittn"),    // deletion
          (14L, "mitten"),   // substitution at pos 1
          (15L, "banana")))  // no match
    assert(got == Set(
      (1L, 10L, 0), (1L, 11L, 1), (1L, 12L, 1), (1L, 13L, 1), (1L, 14L, 1)))
  }

  test("shared-variant false positives are verified away (ab vs ba)") {
    // "ab" and "ba" share deletion variants {a, b} but sit at distance 2
    assert(link(Seq((1L, "ab")), Seq((2L, "ba"))).isEmpty)
  }

  test("single chars match through the empty-string variant; nulls drop") {
    val got = link(Seq((1L, "a"), (2L, null)), Seq((3L, "b"), (4L, "a")))
    assert(got == Set((1L, 3L, 1), (1L, 4L, 0)))
  }

  test("empty strings never match — not even 1-char strings at distance 1") {
    // without the length>0 filter, ""'s variant set {""} intersects every
    // 1-char string's variants, so "" would match "a" against the contract
    val got = link(Seq((1L, ""), (2L, "a")), Seq((3L, ""), (4L, "a")))
    assert(got == Set((2L, 4L, 0)))
  }

  test("maxBlock caps a hot variant block from both sides") {
    // 30x30 identical values share every variant: blocks of 900 pairs
    // exceed maxBlock=100 and the pairs are dropped (documented recall
    // trade); a quiet value still matches
    val l = (1L to 30L).map(i => (i, "hot")) :+ (99L, "quiet")
    val r = (101L to 130L).map(i => (i, "hot")) :+ (199L, "quiet")
    val got = link(l, r, maxBlock = 100)
    assert(got == Set((99L, 199L, 0)))
  }

  test("equals the brute-force distance<=1 join on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val words = (1L to 60L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(4))(('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val l = words
    val r = words.map { case (i, w) => (i + 1000L, w.reverse) }
    val brute = l.toDF("lid", "lv").crossJoin(r.toDF("rid", "rv"))
      .where(levenshtein($"lv", $"rv") <= 1)
      .select($"lid", $"rid", levenshtein($"lv", $"rv").as("d"))
      .as[(Long, Long, Int)].collect().toSet
    assert(link(l, r, maxBlock = 1 << 20) == brute)
  }

  test("maxEdits=2: equals the brute-force distance<=2 join on a randomized corpus") {
    // small alphabet + short words = dense distance-2 neighborhoods, the
    // hard case for blocking completeness (substitution+substitution,
    // insert+delete, transposition-as-two-subs all occur)
    val rnd = new scala.util.Random(11)
    val words = (1L to 50L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(4))(('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val l = words
    val r = words.map { case (i, w) => (i + 1000L, w.reverse) }
    val brute = l.toDF("lid", "lv").crossJoin(r.toDF("rid", "rv"))
      .where(levenshtein($"lv", $"rv") <= 2)
      .select($"lid", $"rid", levenshtein($"lv", $"rv").as("d"))
      .as[(Long, Long, Int)].collect().toSet
    assert(link(l, r, maxBlock = 1 << 20, maxEdits = 2) == brute)
    // the d<=1 subset is unchanged by widening the radius
    val d1 = brute.filter(_._3 <= 1)
    assert(link(l, r, maxBlock = 1 << 20, maxEdits = 1) == d1)
  }

  test("maxEdits=2 finds two-substitution and insert+delete pairs d=1 misses") {
    val got2 = link(Seq((1L, "kitten")), Seq((2L, "mutten"), (3L, "kittens!"),
      (4L, "ktiten")), maxEdits = 2)
    // mutten: 2 substitutions; ktiten: transposition = 2 edits here;
    // kittens!: 2 insertions
    assert(got2 == Set((1L, 2L, 2), (1L, 3L, 2), (1L, 4L, 2)))
    assert(link(Seq((1L, "kitten")), Seq((2L, "mutten")), maxEdits = 1).isEmpty)
  }

  test("maxEdits=2: maxBlock still caps hot variant blocks from both sides") {
    val l = (1L to 30L).map(i => (i, "hot")) :+ (99L, "quiet")
    val r = (101L to 130L).map(i => (i, "hot")) :+ (199L, "quiet")
    assert(link(l, r, maxBlock = 100, maxEdits = 2) == Set((99L, 199L, 0)))
  }

  test("maxEdits outside 1..2 is rejected") {
    intercept[IllegalArgumentException](link(Seq((1L, "a")), Seq((2L, "b")), maxEdits = 3))
    intercept[IllegalArgumentException](link(Seq((1L, "a")), Seq((2L, "b")), maxEdits = 0))
  }

  test("symspellJoinAudit surfaces exactly what the maxBlock cap drops") {
    // synthetic hot key: 30x30 "hot" would emit 900 candidates through the
    // exact-string variant — over a cap of 100 — while "quiet" survives
    val l = ((1L to 30L).map(i => (i, "hot")) :+ (99L, "quiet")).toDF("lid", "lv")
    val r = ((101L to 130L).map(i => (i, "hot")) :+ (199L, "quiet")).toDF("rid", "rv")
    val audit = FuzzyJoin.symspellJoinAudit(
        l, "lid", "lv", r, "rid", "rv", maxEdits = 1, maxBlock = 100)
      .as[(String, Long, Long, Long)].collect().toSet
    // every variant of "hot" (itself + 3 deletions) is a 30x30 block;
    // no "quiet" variant appears
    assert(audit == Set("hot", "ot", "ht", "ho").map(v => (v, 30L, 30L, 900L)),
      s"got $audit")
    // and the join under the same cap indeed dropped those matches
    assert(link(
      (1L to 30L).map(i => (i, "hot")) :+ (99L, "quiet"),
      (101L to 130L).map(i => (i, "hot")) :+ (199L, "quiet"),
      maxBlock = 100) == Set((99L, 199L, 0)))
    // a cap the data never hits audits empty
    assert(FuzzyJoin.symspellJoinAudit(
      l, "lid", "lv", r, "rid", "rv", maxEdits = 1, maxBlock = 1000)
      .isEmpty)
  }
}
