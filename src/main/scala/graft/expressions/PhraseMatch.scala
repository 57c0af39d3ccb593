package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase substring matching in ONE text pass — the banned-phrase /
  * contamination-marker filter at blocklist scale. A naive
  * `phrases.count(text.contains)` is O(|phrases| * |text|); the
  * Aho-Corasick automaton (Aho & Corasick 1975, CACM 18(6)) is
  * O(|text| + matches) regardless of how many phrases the blocklist
  * holds, which is the difference between usable and not at a 10k-phrase
  * blocklist over 100 TB. Same design as the tokenizer kernels: the
  * automaton is built ONCE on the driver, rides into generated code as a
  * reference object, and the per-row walk is a tight JVM loop inside
  * whole-stage codegen.
  *
  * Semantics (the oracle-replayable contract): a phrase HITS iff it
  * occurs as a plain case-sensitive substring — exactly SQL
  * `contains(text, phrase)` (valid UTF-8 is self-synchronizing, so byte
  * containment == code-unit containment; the automaton walks UTF-16
  * chars and finds the same occurrences). The count is the number of
  * DISTINCT phrases present (each counted once however often it
  * repeats) — the shape both a keep/drop gate (`hits == 0`) and a
  * severity score use.
  */
object PhraseMatchRuntime {

  /** Distinct phrases of `trie` present in `s`. */
  def phraseHits(s: UTF8String, trie: PhraseTrie): Int = {
    val str = s.toString
    val seen = new Array[Boolean](trie.nPhrases)
    var found = 0
    var state = 0
    var i = 0
    while (i < str.length && found < trie.nPhrases) {
      state = trie.step(state, str.charAt(i))
      val out = trie.outputs(state)
      if (out != null) {
        var k = 0
        while (k < out.length) {
          val p = out(k)
          if (!seen(p)) { seen(p) = true; found += 1 }
          k += 1
        }
      }
      i += 1
    }
    found
  }
}

/** The frozen Aho-Corasick automaton. Goto edges live in one shared
  * HashMap keyed by `state * 2^16 + char` (one boxed lookup per text
  * char; states and chars are both 16-bit-safe because states are
  * bounded by total phrase length < 2^31 — the long key keeps them
  * collision-free at any size), fail links in an int array, and each
  * node's COMPLETE output set (its own phrase ends plus everything
  * reachable through fail links) is precomputed so the text walk never
  * chases fail chains for output — the standard space-for-time trade,
  * quadratic only in the pathological all-suffixes-of-one-phrase
  * blocklist. Top-level class so generated Java can name it.
  */
final class PhraseTrie(phrases: Seq[String]) extends Serializable {
  require(phrases.nonEmpty, "phrases must be non-empty")
  phrases.foreach(p => require(p.nonEmpty, "phrases must be non-empty strings"))
  require(phrases.distinct.length == phrases.length,
    "duplicate phrases (each would double-count a hit)")

  val nPhrases: Int = phrases.length

  private val goto_ = new java.util.HashMap[Long, Integer]()

  private val built: (Array[Int], Array[Array[Int]]) = {
    // pass 1: the trie
    var nStates = 1
    val endsAt = new java.util.HashMap[Integer, java.util.ArrayList[Integer]]()
    phrases.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val key = s.toLong << 16 | p.charAt(i)
        val nxt = goto_.get(key)
        if (nxt == null) { goto_.put(key, nStates); s = nStates; nStates += 1 }
        else s = nxt.intValue()
        i += 1
      }
      endsAt.computeIfAbsent(s, _ => new java.util.ArrayList[Integer]()).add(pi)
    }
    // per-state child lists for the BFS (derived once from the flat map)
    val kids = new Array[java.util.ArrayList[(Char, Int)]](nStates)
    goto_.forEach { (k, v) =>
      val s = (k >>> 16).toInt
      if (kids(s) == null) kids(s) = new java.util.ArrayList[(Char, Int)]()
      kids(s).add(((k & 0xffff).toChar, v.intValue()))
    }
    // pass 2: BFS fail links + merged output sets
    val f = new Array[Int](nStates)
    val outSets = new Array[java.util.LinkedHashSet[Integer]](nStates)
    endsAt.forEach { (s, list) =>
      outSets(s.intValue()) = new java.util.LinkedHashSet[Integer](list)
    }
    val queue = new java.util.ArrayDeque[Integer]()
    if (kids(0) != null) kids(0).forEach { case (_, v) =>
      f(v) = 0
      queue.add(v)
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      if (kids(s) != null) kids(s).forEach { case (c, nxt) =>
        // fail(nxt) = state reached on c from the deepest proper-suffix
        // state of s (0 if none)
        var t = f(s)
        var hop = goto_.get(t.toLong << 16 | c)
        while (hop == null && t != 0) {
          t = f(t)
          hop = goto_.get(t.toLong << 16 | c)
        }
        f(nxt) = if (hop == null) 0 else hop.intValue()
        if (outSets(f(nxt)) != null) {
          if (outSets(nxt) == null)
            outSets(nxt) = new java.util.LinkedHashSet[Integer]()
          outSets(nxt).addAll(outSets(f(nxt)))
        }
        queue.add(nxt)
      }
    }
    (f, outSets.map { s =>
      if (s == null) null
      else {
        val a = new Array[Int](s.size)
        var i = 0
        val it = s.iterator()
        while (it.hasNext) { a(i) = it.next().intValue(); i += 1 }
        a
      }
    })
  }

  private val fail: Array[Int] = built._1
  private val outs: Array[Array[Int]] = built._2

  /** Complete output set of `state` (null = none). */
  def outputs(state: Int): Array[Int] = outs(state)

  /** One automaton step: follow goto, chasing fail links on miss. */
  def step(state: Int, c: Char): Int = {
    var s = state
    var nxt = goto_.get(s.toLong << 16 | c)
    while (nxt == null && s != 0) {
      s = fail(s)
      nxt = goto_.get(s.toLong << 16 | c)
    }
    if (nxt == null) 0 else nxt.intValue()
  }
}

object PhraseMatchExpressions {

  /** Distinct-phrases-present count (`int`) under the frozen blocklist. */
  case class PhraseHits(child: Expression, phrases: Seq[String])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "phrase_hits"

    @transient private lazy val trie = new PhraseTrie(phrases)

    override def nullSafeEval(input: Any): Any =
      PhraseMatchRuntime.phraseHits(input.asInstanceOf[UTF8String], trie)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("phraseTrie", trie,
        "graft.expressions.PhraseTrie")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.PhraseMatchRuntime.phraseHits($c, $ref);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def phraseHits(c: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(PhraseHits(ColumnBridge.expression(c), phrases))
}
