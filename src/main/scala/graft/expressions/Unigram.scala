package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM encoding over a frozen scored vocabulary — the THIRD
  * tokenizer family next to BPE ([[BpeExpressions]], merge lists) and
  * WordPiece ([[WordPieceExpressions]], greedy piece lists): SentencePiece
  * unigram models (Kudo 2018, arXiv:1804.10959) ship pieces WITH SCORES
  * and encode by choosing the GLOBALLY OPTIMAL segmentation (Viterbi), not
  * a greedy scan. Same design as the other two: one native kernel called
  * from both the interpreted path and generated code, the scored
  * vocabulary riding into codegen as one reference object.
  *
  * Encode semantics (the documented, oracle-replayable contract — q172):
  *  - pre-tokens are maximal runs of non-RE2-whitespace (the
  *    [[BpeRuntime]] split, case-sensitive);
  *  - each vocab piece carries an integer COST in `[0, 2^20)` (published
  *    float log-probs are scaled to integers at ingestion —
  *    [[graft.ext.Unigram.parseVocabTsv]] — so both engines do exact
  *    integer arithmetic, never libm);
  *  - a word segments into vocab pieces MINIMIZING the composite
  *    `sum(cost) * 2^20 + n_pieces` — i.e. lexicographically (total
  *    cost, then fewer tokens), the integer-exact stand-in for "maximum
  *    log-probability, ties to fewer pieces";
  *  - a single code point with no 1-cp vocab piece always matches as the
  *    `unk` symbol at `unkCost` — every word is segmentable, consecutive
  *    unknown code points each emit one `unk` (no fusing; divergence from
  *    SentencePiece's `fuse_unk` default is deliberate: per-cp unks keep
  *    the count replayable without list-state in SQL). A COVERED code
  *    point is conversely never unk, even when `unkCost` is cheaper than
  *    its piece (the SentencePiece rule: unk is for out-of-vocabulary
  *    content, not a pricing alternative) — so adding a 1-cp piece can
  *    legitimately RAISE a word's optimum (property-tested as such);
  *  - a word longer than `maxWordChars` code points encodes as ONE `unk`
  *    (the [[WordPieceRuntime]] cap convention — a DP-cost guard, not a
  *    model choice);
  *  - among equal-composite DP choices the LONGEST piece ending at a
  *    position wins (only the token ARRAY can see this; the composite —
  *    what the oracle asserts — is tie-free by definition).
  * Matching is per Unicode code point (never inside a surrogate pair),
  * which is what SQL `substr`/`len` count — the replay needs no encoding
  * caveats.
  *
  * Cost: O(L * maxPieceCp) per word — the same bound as WordPiece's
  * longest-match scan — row-local, no shuffle, inside whole-stage
  * codegen; the per-task word memo ([[BpeMemo]]'s rationale) makes the
  * Zipf head one hash lookup.
  */
object UnigramRuntime {

  /** Token-count radix of the composite cost: `comp = cost * TokenScale
    * + n_pieces`. A word holds at most `maxWordChars <= 2^20 - 1` pieces,
    * so the count never carries into the cost digits; piece costs are
    * validated `< TokenScale`, so `comp` for a capped word stays under
    * `2^51` — long addition over a document cannot overflow.
    */
  val TokenScale: Long = 1L << 20

  /** One encoded word: its piece array and the composite it achieves. */
  final case class Enc(pieces: Array[String], comp: Long)

  /** Viterbi-encode one whitespace-free word. */
  def encodeWord(word: String, table: UnigramTable): Enc = {
    val nCp = word.codePointCount(0, word.length)
    if (nCp > table.maxWordChars) return Enc(Array(table.unk), table.unkComp)
    // bounds(i) = UTF-16 offset of the i-th code point
    val bounds = new Array[Int](nCp + 1)
    var i = 0
    var cp = 0
    while (i < word.length) {
      bounds(cp) = i
      i += Character.charCount(word.codePointAt(i))
      cp += 1
    }
    bounds(nCp) = word.length
    // dp(i) = min composite over segmentations of the first i code points;
    // back(i) = piece length (in cp) of the winning last piece — longest
    // wins ties because longer l is tried later and accepted on equality
    val dp = new Array[Long](nCp + 1)
    val back = new Array[Int](nCp + 1)
    var pos = 1
    while (pos <= nCp) {
      var best = Long.MaxValue
      var bestL = 0
      var l = 1
      val maxL = math.min(pos, table.maxPieceCp)
      while (l <= maxL) {
        val sub = word.substring(bounds(pos - l), bounds(pos))
        val pc =
          if (l == 1) {
            val c = table.comp.get(sub)
            if (c == null) table.unkComp else c.longValue()
          } else {
            val c = table.comp.get(sub)
            if (c == null) -1L else c.longValue()
          }
        if (pc >= 0L) {
          val cand = dp(pos - l) + pc
          if (cand <= best) { best = cand; bestL = l }
        }
        l += 1
      }
      dp(pos) = best
      back(pos) = bestL
      pos += 1
    }
    // backtrace
    var n = 0
    var p = nCp
    while (p > 0) { n += 1; p -= back(p) }
    val pieces = new Array[String](n)
    p = nCp
    var k = n - 1
    while (p > 0) {
      val l = back(p)
      val sub = word.substring(bounds(p - l), bounds(p))
      pieces(k) = if (l == 1 && !table.comp.containsKey(sub)) table.unk else sub
      k -= 1
      p -= l
    }
    Enc(pieces, dp(nCp))
  }

  // RE2 \s (no vertical tab) — see [[BpeRuntime.isWs]]
  @inline private def isWs(c: Char): Boolean = BpeRuntime.isWs(c)

  /** Unigram token array of a document (all words' pieces in order). */
  def uniTokens(s: UTF8String, table: UnigramTable): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    var i = 0
    while (i < str.length) {
      if (isWs(str.charAt(i))) i += 1
      else {
        val start = i
        while (i < str.length && !isWs(str.charAt(i))) i += 1
        val toks = table.encode(str.substring(start, i)).pieces
        var k = 0
        while (k < toks.length) { out += UTF8String.fromString(toks(k)); k += 1 }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Exact (token count, total model cost) of a document — the composite
    * decomposed per word and summed; nothing materialized.
    */
  def uniStats(s: UTF8String, table: UnigramTable): InternalRow = {
    val str = s.toString
    var n = 0L
    var cost = 0L
    var i = 0
    while (i < str.length) {
      if (isWs(str.charAt(i))) i += 1
      else {
        val start = i
        while (i < str.length && !isWs(str.charAt(i))) i += 1
        val comp = table.encode(str.substring(start, i)).comp
        n += comp % TokenScale
        cost += comp / TokenScale
      }
    }
    new GenericInternalRow(Array[Any](n.toInt, cost))
  }
}

/** Frozen scored unigram vocabulary + the per-task word memo (the
  * [[BpeMemo]] pattern: deserialized per task, entries are pure functions
  * of the word, insertion capped at `maxMemoEntries`). `comp` maps each
  * piece to its composite `cost * TokenScale + 1`. Top-level class so
  * generated Java can name it.
  */
final class UnigramTable(
    val comp: java.util.HashMap[String, java.lang.Long],
    val unk: String,
    val unkComp: Long,
    val maxWordChars: Int,
    maxMemoEntries: Int) extends Serializable {
  /** Longest piece in code points — bounds the DP inner loop. */
  val maxPieceCp: Int = {
    var m = 1
    val it = comp.keySet.iterator()
    while (it.hasNext) {
      val p = it.next()
      m = math.max(m, p.codePointCount(0, p.length))
    }
    m
  }
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, UnigramRuntime.Enc]()
  def encode(word: String): UnigramRuntime.Enc = {
    val hit = cache.get(word)
    if (hit != null) hit
    else {
      val enc = UnigramRuntime.encodeWord(word, this)
      if (cache.size < maxMemoEntries) cache.put(word, enc)
      enc
    }
  }
}

object UnigramExpressions {

  private def buildTable(
      vocab: Seq[(String, Long)], unk: String, unkCost: Long,
      maxWordChars: Int, memoEntries: Int): UnigramTable = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(maxWordChars > 0 && maxWordChars < UnigramRuntime.TokenScale,
      "maxWordChars must be in [1, 2^20)")
    require(unkCost >= 0 && unkCost < UnigramRuntime.TokenScale,
      s"unkCost must be in [0, 2^20): $unkCost")
    require(unk.nonEmpty && !unk.exists(c => c == ' ' || (c >= '\t' && c <= '\r')),
      "unk symbol must be non-empty and whitespace-free")
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) =>
      require(p.nonEmpty, "vocab piece must be non-empty")
      require(!p.exists(ch => ch == ' ' || (ch >= '\t' && ch <= '\r')),
        s"vocab piece must not contain whitespace: '$p'")
      require(c >= 0 && c < UnigramRuntime.TokenScale,
        s"piece cost must be in [0, 2^20): '$p' -> $c")
      val prev = m.putIfAbsent(p,
        java.lang.Long.valueOf(c * UnigramRuntime.TokenScale + 1))
      require(prev == null, s"duplicate vocab piece '$p'")
    }
    new UnigramTable(m, unk, unkCost * UnigramRuntime.TokenScale + 1,
      maxWordChars, memoEntries)
  }

  /** Unigram token array (`array<string>`) under the scored `vocab`. */
  case class UnigramEncode(
      child: Expression, vocab: Seq[(String, Long)], unk: String = "<unk>",
      unkCost: Long = 1L << 19, maxWordChars: Int = 1000,
      memoEntries: Int = BpeExpressions.DefaultMemoEntries)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "unigram_encode"

    @transient private lazy val table =
      buildTable(vocab, unk, unkCost, maxWordChars, memoEntries)

    override def nullSafeEval(input: Any): Any =
      UnigramRuntime.uniTokens(input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("uniTable", table,
        "graft.expressions.UnigramTable")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.UnigramRuntime.uniTokens($c, $ref);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact `struct<n_tokens: int, cost: bigint>` of the input under the
    * scored `vocab` — count AND total model cost in one pass (the cost is
    * what the Viterbi optimized; surfacing it makes "how well does this
    * vocabulary fit this corpus" a queryable column, the unigram-LM
    * analogue of the q167 LM score's sufficient statistics).
    */
  case class UnigramStats(
      child: Expression, vocab: Seq[(String, Long)], unk: String = "<unk>",
      unkCost: Long = 1L << 19, maxWordChars: Int = 1000,
      memoEntries: Int = BpeExpressions.DefaultMemoEntries)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("cost", LongType, nullable = false)))
    override def prettyName: String = "unigram_stats"

    @transient private lazy val table =
      buildTable(vocab, unk, unkCost, maxWordChars, memoEntries)

    override def nullSafeEval(input: Any): Any =
      UnigramRuntime.uniStats(input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("uniTable", table,
        "graft.expressions.UnigramTable")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.UnigramRuntime.uniStats($c, $ref);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrappers (defaults: `<unk>` at half-scale cost, 1000-cp word
    * cap — the DP guard, far beyond natural words).
    */
  def unigramTokens(c: Column, vocab: Seq[(String, Long)],
      unk: String = "<unk>", unkCost: Long = 1L << 19): Column =
    ColumnBridge.column(
      UnigramEncode(ColumnBridge.expression(c), vocab, unk, unkCost))

  def unigramStats(c: Column, vocab: Seq[(String, Long)],
      unk: String = "<unk>", unkCost: Long = 1L << 19): Column =
    ColumnBridge.column(
      UnigramStats(ColumnBridge.expression(c), vocab, unk, unkCost))
}
