package graft.expressions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Evaluation kernel for deterministic greedy BPE encoding — called from
  * both the interpreted path and generated code (the [[GramHashRuntime]]
  * contract: one kernel, two callers, no drift).
  *
  * Encode semantics (the documented, oracle-replayable contract):
  *  - pre-tokens are maximal runs of non-whitespace (RE2-`\s+` split,
  *    empties dropped) — case-SENSITIVE, unlike the hashed-feature ops:
  *    real tokenizer vocabs are case-sensitive, and the SQL replay
  *    (`regexp_split_to_array(text, '\s+')`) matches exactly;
  *  - each pre-token starts as one symbol per Unicode code point;
  *  - repeat: among all adjacent symbol pairs present in the merge table,
  *    merge the LEFTMOST occurrence of the LOWEST-ranked pair; stop when
  *    no adjacent pair is in the table.
  * One merge per step keeps the loop replayable as a DuckDB recursive CTE
  * (find min rank, `list_position`, splice) — which is how q151/q152
  * hash-oracle the encode. Strict `<` in the scan = leftmost wins ties,
  * matching `list_position(ranks, min(ranks))`.
  *
  * Cost: O(L²) worst case per pre-token (L = symbols); pre-tokens are
  * whitespace-bounded words, so L is small in practice and the pass stays
  * row-local — no shuffle, no UDF, inside whole-stage codegen.
  */
object BpeRuntime {

  /** Merge-table key for the adjacent pair (l, r): `l + " " + r` — a space
    * can never occur inside a symbol (pre-tokens are whitespace-free), so
    * keys cannot collide; the SQL replay builds the same key with `|| ' ' ||`.
    */
  def pairKey(l: String, r: String): String = l + " " + r

  /** Final BPE symbols of one whitespace-free word. */
  def encodeWord(
      word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    val syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      syms.add(word.substring(i, i + w))
      i += w
    }
    var done = syms.size <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(pairKey(syms.get(j), syms.get(j + 1)))
        if (r != null && r < bestRank) { bestRank = r; bestPos = j }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
        done = syms.size <= 1
      }
    }
    val out = new Array[String](syms.size)
    syms.toArray(out)
    out
  }

  // ASCII whitespace exactly as RE2/DuckDB regex \s: [ \t\n\f\r] — the
  // oracle replays the split with regexp_split_to_array(text, '\s+'),
  // and RE2's \s EXCLUDES vertical tab \x0B (Java's \s includes it), so
  // the kernel must too or \v-containing documents tokenize differently
  // in the two engines
  @inline private[expressions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** BPE token array of a document (all words' symbols in document order). */
  def bpeTokens(s: UTF8String, memo: BpeMemo): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    var i = 0
    while (i < str.length) {
      if (isWs(str.charAt(i))) i += 1
      else {
        val start = i
        while (i < str.length && !isWs(str.charAt(i))) i += 1
        val toks = memo.encode(str.substring(start, i))
        var k = 0
        while (k < toks.length) { out += UTF8String.fromString(toks(k)); k += 1 }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Exact BPE token count — same loop, no token materialization. */
  def bpeTokenCount(s: UTF8String, memo: BpeMemo): Int = {
    val str = s.toString
    var n = 0
    var i = 0
    while (i < str.length) {
      if (isWs(str.charAt(i))) i += 1
      else {
        val start = i
        while (i < str.length && !isWs(str.charAt(i))) i += 1
        n += memo.encode(str.substring(start, i)).length
      }
    }
    n
  }
}

/** Word-level encode memo. Corpora are Zipfian: the head few thousand
  * words cover most token mass, so most [[BpeRuntime.encodeWord]] calls
  * recompute an already-seen word — the memo makes the common case one
  * hash lookup. The instance rides into generated code via
  * `addReferenceObj`; Spark serializes the references array into the task
  * binary and deserializes it PER TASK, so each task holds its own
  * BpeMemo (memoization still pays off within a task — one task scans
  * many rows). The ConcurrentHashMap is kept as cheap insurance in case a
  * runtime ever does share the instance across threads; entries are pure
  * functions of the word under a frozen merge table, so sharing could
  * only ever save work. Insertion stops at `maxEntries` (the Zipf head is
  * cached, the long tail computes) — the size check races benignly by a
  * handful of entries. Top-level class so generated Java can name it
  * directly.
  */
final class BpeMemo(
    ranks: java.util.HashMap[String, Integer], maxEntries: Int)
    extends Serializable {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  def encode(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) hit
    else {
      val enc = BpeRuntime.encodeWord(word, ranks)
      if (cache.size < maxEntries) cache.put(word, enc)
      enc
    }
  }
}
