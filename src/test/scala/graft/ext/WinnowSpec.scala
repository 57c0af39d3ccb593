package graft.ext

import scala.util.Random

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.expressions.GramHashRuntime

class WinnowSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = 7
  private val W = 5

  /** Brute-force reference: positional gram hashes, naive O(n*w) window
    * minima, distinct sorted — what the deque kernel must equal.
    */
  private def reference(s: String, n: Int, w: Int, seed: Long = 42L): Seq[Long] = {
    val bytes = UTF8String.fromString(s).getBytes
    if (bytes.length <= n)
      return Seq(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed))
    val cnt = bytes.length - n + 1
    val hs = (0 until cnt).map(i =>
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, n, seed))
    val nw = math.max(cnt - w + 1, 1)
    (0 until nw).map(j => hs.slice(j, math.min(j + w, cnt)).min).distinct.sorted
  }

  private def kernel(s: String, n: Int = K, w: Int = W): Seq[Long] =
    GramHashRuntime.winnowFingerprintSet(UTF8String.fromString(s), n, w, 42L)
      .toLongArray().toSeq

  test("kernel equals brute-force reference on random strings") {
    val rnd = new Random(7)
    for (len <- Seq(0, 1, 3, K - 1, K, K + 1, K + W - 2, K + W - 1, 40, 200, 1000)) {
      val s = Iterator.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString // small alphabet: repeated grams, tie-heavy
      assert(kernel(s) == reference(s, K, W), s"len=$len s=$s")
    }
    for (_ <- 1 to 50) {
      val s = Iterator.fill(30 + rnd.nextInt(300))(('a' + rnd.nextInt(6)).toChar).mkString
      assert(kernel(s) == reference(s, K, W))
    }
  }

  test("winnowing guarantee: shared substring of k+w-1 chars shares a fingerprint") {
    val rnd = new Random(11)
    def randStr(n: Int) = Iterator.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val common = randStr(K + W - 1)
    for (_ <- 1 to 20) {
      val a = randStr(50) + common + randStr(50)
      val b = randStr(80) + common + randStr(20)
      assert(kernel(a).toSet.intersect(kernel(b).toSet).nonEmpty)
    }
  }

  test("short documents still fingerprint") {
    assert(kernel("ab").size == 1)              // shorter than a gram
    assert(kernel("abcdefgh").nonEmpty)         // fewer grams than the window
    assert(kernel("").size == 1)                // empty: whole-string hash
  }

  test("candidate pairs: planted near-copy found, unrelated not; portable agrees") {
    val rnd = new Random(23)
    def randText(n: Int) =
      Iterator.fill(n)(if (rnd.nextInt(5) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar).mkString
    val core = randText(300)
    val docs = Seq(
      (1L, core), (2L, core + " extra tail of new material here"),
      (3L, randText(300)), (4L, randText(300)), (5L, randText(300))
    ).toDF("doc_id", "text")
    def pairSet(portable: Boolean) =
      Dedup.winnowCandidatePairs(docs, "doc_id", "text",
          k = K, w = W, maxPostings = 4, minShared = 8, portable = portable)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(pairSet(portable = false) == Set((1L, 2L)))
    // different hash family, same algorithm -> same decisions on this margin
    assert(pairSet(portable = true) == Set((1L, 2L)))
  }

  test("candidate pairs robust to duplicate-id input rows: no self-pairs") {
    // the same (id, text) row ingested twice (a re-crawled shard, a bad
    // upstream union) used to yield duplicate posting-list entries and
    // (x,x) self-pairs from the strictly-after expansion — the posting
    // SET must make the duplicated corpus behave exactly like the clean one
    val rnd = new Random(29)
    def randText(n: Int) =
      Iterator.fill(n)(if (rnd.nextInt(5) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar).mkString
    val core = randText(300)
    val clean = Seq((1L, core), (2L, core + " fresh tail"), (3L, randText(300)))
    val doubled = clean ++ clean // every row twice
    def pairs(rows: Seq[(Long, String)]) =
      Dedup.winnowCandidatePairs(rows.toDF("doc_id", "text"), "doc_id", "text",
          k = K, w = W, maxPostings = 4, minShared = 8)
        .select("id_l", "id_r", "shared").as[(Long, Long, Long)].collect().toSet
    val dup = pairs(doubled)
    assert(dup.forall { case (l, r, _) => l < r }, s"self/misordered pair in $dup")
    assert(dup == pairs(clean))
  }
}
