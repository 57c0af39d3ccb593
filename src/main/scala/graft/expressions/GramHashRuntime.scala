package graft.expressions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shared evaluation kernels for the shingling expressions — called from
  * BOTH the interpreted path (`nullSafeEval`) and the generated code
  * (`doGenCode` emits a static call; a top-level Scala object exposes static
  * forwarders, so `graft.expressions.GramHashRuntime.m(...)` is valid Java).
  * Keeping one kernel per operation guarantees the two paths cannot drift.
  */
object GramHashRuntime {

  private def sortedDistinct(arr: Array[Long], n: Int): GenericArrayData = {
    java.util.Arrays.sort(arr, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, w))
  }

  /** Sorted distinct xxhash64 of every `n`-byte window (whole string if
    * shorter).
    */
  def charNgramHashSet(s: UTF8String, n: Int, seed: Long): ArrayData = {
    val bytes = s.getBytes
    if (bytes.length <= n) {
      new GenericArrayData(Array(
        XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)))
    } else {
      val cnt = bytes.length - n + 1
      val hashes = new Array[Long](cnt)
      var i = 0
      while (i < cnt) {
        hashes(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, n, seed)
        i += 1
      }
      sortedDistinct(hashes, cnt)
    }
  }

  private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b < 0 // multi-byte UTF-8 continuation/lead

  /** One-pass tokenize (lower-cased alnum/non-ASCII byte runs) + xxhash64
    * per token; shared by word shingles and simhash.
    */
  private def tokenHashes(bytes: Array[Byte], seed: Long): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    val buf = new Array[Byte](bytes.length max 1)
    var i = 0
    while (i < bytes.length) {
      if (isTokenByte(bytes(i))) {
        var w = 0
        while (i < bytes.length && isTokenByte(bytes(i))) {
          val b = bytes(i)
          buf(w) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          w += 1; i += 1
        }
        out += XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, w, seed)
      } else i += 1
    }
    out.toArray
  }

  /** Sorted distinct rolling hash of `k`-token word shingles (one shingle
    * over all tokens when fewer than `k`; empty array for zero tokens).
    */
  def wordShingleHashSet(s: UTF8String, k: Int, seed: Long): ArrayData = {
    val th = tokenHashes(s.getBytes, seed)
    val nt = th.length
    if (nt == 0) return new GenericArrayData(Array.empty[Long])
    if (nt < k) {
      var h = seed
      var j = 0
      while (j < nt) { h = XXH64.hashLong(th(j), h); j += 1 }
      return new GenericArrayData(Array(h))
    }
    val cnt = nt - k + 1
    val shingles = new Array[Long](cnt)
    var p = 0
    while (p < cnt) {
      var h = seed
      var j = 0
      while (j < k) { h = XXH64.hashLong(th(p + j), h); j += 1 }
      shingles(p) = h
      p += 1
    }
    sortedDistinct(shingles, cnt)
  }

  /** Unicode NFC normalization (canonical composition) — corpus-cleaning
    * primitive; pass-through for ASCII, composes decomposed accents
    * ("e" + U+0301 -> "é") so visually identical text hashes identically.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** MinHash signature over a hashed gram set: `out(i) = min_g
    * hashLong(g, seeds(i))` — every permutation's min in ONE pass over the
    * row's grams, no explode, no shuffle. Returns null for an empty gram
    * set (the doc simply has no signature, matching the explode
    * formulation where it produced no rows).
    */
  def minhashSignature(grams: ArrayData, seeds: Array[Long]): ArrayData = {
    val g = grams.toLongArray()
    if (g.length == 0) return null
    val out = new Array[Long](seeds.length)
    var i = 0
    while (i < seeds.length) {
      val s = seeds(i)
      var m = Long.MaxValue
      var j = 0
      while (j < g.length) {
        val h = XXH64.hashLong(g(j), s)
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `(max single-token multiplicity, token count)` in one pass — numerator
    * AND denominator of the most-common-word repetition ratio from the SAME
    * tokenizer (mixing tokenizers yields >1 or divide-by-zero ratios on
    * text where their token sets differ). Returns (0, 0) for no tokens.
    */
  def tokenMultiplicityStats(s: UTF8String, seed: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val th = tokenHashes(s.getBytes, seed)
    var best = 0
    if (th.length > 0) {
      val counts = new java.util.HashMap[java.lang.Long, Integer](th.length * 2)
      var i = 0
      while (i < th.length) {
        val c = counts.merge(th(i), Integer.valueOf(1), (a, b) => a + b)
        if (c > best) best = c
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, th.length))
  }

  /** 64-bit SimHash: per-bit majority vote over the token hash multiset. */
  def simhash64(s: UTF8String, seed: Long): Long = {
    val th = tokenHashes(s.getBytes, seed)
    val votes = new Array[Int](64)
    var t = 0
    while (t < th.length) {
      val h = th(t)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}
