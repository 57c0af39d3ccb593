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

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS local fingerprinting scheme): the sorted distinct MINIMA of
    * every `w`-window over the positional `n`-byte-gram hash sequence.
    * Guarantee: two documents sharing any substring of at least
    * `n + w - 1` bytes share at least one fingerprint. Strings shorter
    * than `n` yield the whole-string hash; gram sequences shorter than
    * `w` yield one fingerprint (the global min) — no document is ever
    * fingerprint-free.
    *
    * One pass: positional gram hashes (NOT deduped — winnowing needs the
    * sequence), then sliding-window minima via a monotonic index deque
    * (amortized O(1) per gram, independent of `w`), then sort+dedup of
    * the ~len/w selected values.
    */
  def winnowFingerprintSet(s: UTF8String, n: Int, w: Int, seed: Long): ArrayData = {
    val bytes = s.getBytes
    if (bytes.length <= n) {
      return new GenericArrayData(Array(
        XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)))
    }
    val cnt = bytes.length - n + 1
    val hashes = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      hashes(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, n, seed)
      i += 1
    }
    val out = new Array[Long](math.max(cnt - w + 1, 1))
    val dq = new Array[Int](cnt) // monotonic index deque: dq[head..tail)
    var head = 0
    var tail = 0
    var outN = 0
    i = 0
    while (i < cnt) {
      while (tail > head && hashes(dq(tail - 1)) >= hashes(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) { out(outN) = hashes(dq(head)); outN += 1 }
      i += 1
    }
    if (outN == 0) { out(0) = hashes(dq(head)); outN = 1 } // cnt < w
    sortedDistinct(out, outN)
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

  /** Unigram + bigram feature BUCKETS (multiset, document order) — the
    * DSIR hashed feature map in one native pass: token hashes once, then
    * each unigram and each adjacent-pair chain hash reduced mod `buckets`.
    * NOT deduplicated (importance scores weight by multiplicity), which is
    * what separates this from [[wordShingleHashSet]].
    */
  def ngramFeatureBuckets(s: UTF8String, buckets: Int, seed: Long): ArrayData = {
    val th = tokenHashes(s.getBytes, seed)
    val nt = th.length
    if (nt == 0) return new GenericArrayData(Array.empty[Int])
    val out = new Array[Int](nt + (nt - 1))
    var i = 0
    while (i < nt) {
      out(i) = (((th(i) % buckets) + buckets) % buckets).toInt
      i += 1
    }
    var j = 0
    while (j < nt - 1) {
      val h = XXH64.hashLong(th(j + 1), th(j))
      out(nt + j) = (((h % buckets) + buckets) % buckets).toInt
      j += 1
    }
    new GenericArrayData(out)
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

  // ASCII whitespace exactly as Java regex \s: [ \t\n\x0B\f\r]
  @inline private def isAsciiWs(cp: Int): Boolean =
    cp == ' ' || (cp >= '\t' && cp <= '\r') // 0x09-0x0D covers \t\n\x0B\f\r

  // POSIX/Java \p{Punct}: the 32 ASCII punctuation chars
  @inline private def isAsciiPunct(cp: Int): Boolean =
    (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
      (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~')

  // Java regex \p{N}: Unicode categories Nd, Nl, No
  @inline private def isUnicodeNumber(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  /** Code points of scripts written WITHOUT word-separating whitespace —
    * the scripts where a whitespace tokenizer collapses a whole document
    * into one "token". Blocks (not exhaustive Unicode script data, but
    * the high-coverage set real crawl corpora carry): Han (unified +
    * extension A, compatibility, and the astral extensions B-),
    * Hiragana, Katakana (+ phonetic extensions), Thai, Lao, Khmer,
    * Myanmar. Hangul is EXCLUDED: Korean is space-segmented. CJK
    * punctuation/symbol blocks are excluded too — they separate, not
    * carry, content.
    */
  @inline private[expressions] def isUnspacedScript(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || // CJK Unified Ideographs
      (cp >= 0x3400 && cp <= 0x4DBF) || // CJK Extension A
      (cp >= 0x3040 && cp <= 0x30FF) || // Hiragana + Katakana
      (cp >= 0x31F0 && cp <= 0x31FF) || // Katakana Phonetic Extensions
      (cp >= 0x0E00 && cp <= 0x0EFF) || // Thai + Lao
      (cp >= 0x1000 && cp <= 0x109F) || // Myanmar
      (cp >= 0x1780 && cp <= 0x17FF) || // Khmer
      (cp >= 0xF900 && cp <= 0xFAFF) || // CJK Compatibility Ideographs
      (cp >= 0x20000 && cp <= 0x2FFFF) // CJK Extensions B+ (astral)

  /** One code-point pass computing per-script counts for the unspaced
    * scripts [[isUnspacedScript]] routes on — the signal behind
    * script-aware language ID: Kana is uniquely Japanese (Han alone
    * reads Chinese), and Thai/Lao/Khmer/Myanmar are one-script-one-
    * language to this heuristic's precision. Fields (all `int`):
    * `n_han`, `n_kana`, `n_thai`, `n_lao`, `n_khmer`, `n_myanmar`.
    */
  def scriptCounts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    var i = 0
    var han = 0; var kana = 0; var thai = 0
    var lao = 0; var khmer = 0; var myanmar = 0
    while (i < b.length) {
      var cp = b(i) & 0xFF
      var width = 1
      if (cp < 0x80) ()
      else if ((cp & 0xE0) == 0xC0 && i + 1 < b.length) {
        cp = ((cp & 0x1F) << 6) | (b(i + 1) & 0x3F); width = 2
      } else if ((cp & 0xF0) == 0xE0 && i + 2 < b.length) {
        cp = ((cp & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        width = 3
      } else if ((cp & 0xF8) == 0xF0 && i + 3 < b.length) {
        cp = ((cp & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        width = 4
      }
      if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
        (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x20000 && cp <= 0x2FFFF))
        han += 1
      else if ((cp >= 0x3040 && cp <= 0x30FF) || (cp >= 0x31F0 && cp <= 0x31FF))
        kana += 1
      else if (cp >= 0x0E00 && cp <= 0x0E7F) thai += 1
      else if (cp >= 0x0E80 && cp <= 0x0EFF) lao += 1
      else if (cp >= 0x1780 && cp <= 0x17FF) khmer += 1
      else if (cp >= 0x1000 && cp <= 0x109F) myanmar += 1
      i += width
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](han, kana, thai, lao, khmer, myanmar))
  }

  /** One code-point pass over a string computing every char-class count the
    * text-quality signals need — replaces five separate regex passes
    * (punct/digit/upper `regexp_replace` diffs, whitespace `split`, and the
    * subword `regexp_extract_all`) with a single scan and NO allocation.
    *
    * Fields (all `int`): `n_chars` code points (== Spark `length`);
    * `n_tokens` maximal runs of non-ASCII-whitespace (== `size(split(trim,
    * '\s+'))` on non-blank input, 0 on blank); `n_nonws` non-whitespace
    * code points; `n_punct` ASCII `\p{Punct}`; `n_digit` `[0-9]`;
    * `n_upper` `[A-Z]`; `n_subwords` `\p{L}+|\p{N}+|[^\p{L}\p{N} ]` matches
    * after whitespace collapse — each class definition is exactly the Java
    * regex the composable formulation used, asserted by parity tests.
    *
    * Script-awareness fields (round 15): `n_unspaced` code points in
    * unsegmented scripts ([[isUnspacedScript]]); `n_seg_tokens` the
    * SEGMENTATION-AWARE token count — each unspaced-script code point is
    * its own token and maximal runs of other non-whitespace characters
    * are one token, so "hello 世界" counts 3 where the whitespace count
    * says 2 and a fully unspaced document counts its content instead of
    * collapsing to 1. Equals `n_tokens` exactly when `n_unspaced` is 0.
    */
  def charClassStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    var i = 0
    var nChars = 0; var nTokens = 0; var nNonWs = 0
    var nPunct = 0; var nDigit = 0; var nUpper = 0; var nSub = 0
    var nUnspaced = 0; var nSeg = 0
    // token / subword run states: 0 = none/separator, 1 = letter run,
    // 2 = number run (an "other" char both counts itself and breaks runs)
    var inToken = false
    var inSegRun = false
    var runState = 0
    while (i < b.length) {
      var cp = b(i) & 0xFF
      var width = 1
      if (cp < 0x80) ()
      else if ((cp & 0xE0) == 0xC0 && i + 1 < b.length) {
        cp = ((cp & 0x1F) << 6) | (b(i + 1) & 0x3F); width = 2
      } else if ((cp & 0xF0) == 0xE0 && i + 2 < b.length) {
        cp = ((cp & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        width = 3
      } else if ((cp & 0xF8) == 0xF0 && i + 3 < b.length) {
        cp = ((cp & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        width = 4
      }
      nChars += 1
      if (isAsciiWs(cp)) { inToken = false; inSegRun = false; runState = 0 }
      else {
        nNonWs += 1
        if (!inToken) { nTokens += 1; inToken = true }
        if (cp < 0x80) {
          if (isAsciiPunct(cp)) nPunct += 1
          if (cp >= '0' && cp <= '9') nDigit += 1
          if (cp >= 'A' && cp <= 'Z') nUpper += 1
        }
        if (isUnspacedScript(cp)) {
          nUnspaced += 1
          nSeg += 1 // each unspaced-script code point is its own token
          inSegRun = false // ...and breaks any surrounding spaced run
        } else if (!inSegRun) { nSeg += 1; inSegRun = true }
        if (Character.isLetter(cp)) {
          if (runState != 1) { nSub += 1; runState = 1 }
        } else if (isUnicodeNumber(cp)) {
          if (runState != 2) { nSub += 1; runState = 2 }
        } else { nSub += 1; runState = 0 }
      }
      i += width
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nTokens, nNonWs, nPunct, nDigit, nUpper, nSub,
        nUnspaced, nSeg))
  }
}
