package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece encoding over a frozen vocabulary — the second tokenizer
  * family next to BPE ([[BpeExpressions]]): BERT-style vocabularies ship
  * as a PIECE LIST (`vocab.txt`), not a merge list, and encode by greedy
  * longest-match, not merge replay. Same design as the BPE pair: one
  * native kernel called from both the interpreted path and generated
  * code, the vocabulary riding into codegen as one reference object.
  *
  * Encode semantics (Wu et al. 2016, arXiv:1609.08144; the HuggingFace
  * `WordpieceTokenizer` contract, replayable as a DuckDB recursive CTE —
  * q163):
  *  - pre-tokens are maximal runs of non-ASCII-whitespace (the
  *    [[BpeRuntime]] split, case-sensitive);
  *  - a word longer than `maxWordChars` CODE POINTS encodes as `[unk]`;
  *  - else scan left to right: at each position take the LONGEST vocab
  *    piece matching the remaining prefix — pieces at position > 0 match
  *    through the `##` continuation prefix — and advance past it;
  *  - no piece matches at some position => the WHOLE word is `[unk]`.
  * Matching is per Unicode code point (never inside a surrogate pair),
  * which is also what SQL `substr`/`len` count — the replay needs no
  * encoding caveats.
  *
  * Cost: O(L * maxPieceLen) per word, row-local, no shuffle, inside
  * whole-stage codegen; the same per-task word memo as BPE
  * ([[BpeMemo]]'s rationale) makes the Zipf head one hash lookup.
  */
object WordPieceRuntime {

  /** Final WordPiece symbols of one whitespace-free word. */
  def encodeWord(word: String, table: WordPieceTable): Array[String] = {
    // code-point boundaries: bounds(i) = UTF-16 offset of the i-th code point
    val nCp = word.codePointCount(0, word.length)
    if (nCp > table.maxWordChars) return Array(table.unk)
    val bounds = new Array[Int](nCp + 1)
    var i = 0
    var cp = 0
    while (i < word.length) {
      bounds(cp) = i
      i += Character.charCount(word.codePointAt(i))
      cp += 1
    }
    bounds(nCp) = word.length
    val out = new java.util.ArrayList[String](4)
    var pos = 0
    while (pos < nCp) {
      var end = math.min(nCp, pos + table.maxPieceCp)
      var hit: String = null
      while (hit == null && end > pos) {
        val sub = word.substring(bounds(pos), bounds(end))
        val cand = if (pos == 0) sub else "##" + sub
        if (table.vocab.contains(cand)) hit = cand else end -= 1
      }
      if (hit == null) return Array(table.unk)
      out.add(hit)
      pos = end
    }
    val res = new Array[String](out.size)
    out.toArray(res)
    res
  }

  // RE2 \s (no vertical tab) — see [[BpeRuntime.isWs]]
  @inline private def isWs(c: Char): Boolean = BpeRuntime.isWs(c)

  /** WordPiece token array of a document (all words' pieces in order). */
  def wpTokens(s: UTF8String, table: WordPieceTable): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    var i = 0
    while (i < str.length) {
      if (isWs(str.charAt(i))) i += 1
      else {
        val start = i
        while (i < str.length && !isWs(str.charAt(i))) i += 1
        val toks = table.encode(str.substring(start, i))
        var k = 0
        while (k < toks.length) { out += UTF8String.fromString(toks(k)); k += 1 }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Exact WordPiece token count — same loop, nothing materialized. */
  def wpTokenCount(s: UTF8String, table: WordPieceTable): Int = {
    val str = s.toString
    var n = 0
    var i = 0
    while (i < str.length) {
      if (isWs(str.charAt(i))) i += 1
      else {
        val start = i
        while (i < str.length && !isWs(str.charAt(i))) i += 1
        n += table.encode(str.substring(start, i)).length
      }
    }
    n
  }
}

/** Frozen WordPiece vocabulary + the per-task word memo (the [[BpeMemo]]
  * pattern: deserialized per task, entries are pure functions of the word,
  * insertion capped at `maxMemoEntries`). Top-level class so generated
  * Java can name it.
  */
final class WordPieceTable(
    val vocab: java.util.HashSet[String],
    val unk: String,
    val maxWordChars: Int,
    maxMemoEntries: Int) extends Serializable {
  /** Longest piece in code points, FULL length (continuation prefix
    * included) — bounds the longest-match scan so a huge word costs
    * O(L * maxPieceCp), not O(L^2). Full length, not body length: at
    * position 0 the candidate is the raw prefix, so a literal
    * `##`-prefixed word start must be able to match a `##`-prefixed
    * piece at its full length (body length would cap the scan two code
    * points short and misencode such words as [UNK]).
    */
  val maxPieceCp: Int = {
    var m = 1
    val it = vocab.iterator()
    while (it.hasNext) {
      val p = it.next()
      m = math.max(m, p.codePointCount(0, p.length))
    }
    m
  }
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  def encode(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) hit
    else {
      val enc = WordPieceRuntime.encodeWord(word, this)
      if (cache.size < maxMemoEntries) cache.put(word, enc)
      enc
    }
  }
}

object WordPieceExpressions {

  private def buildTable(
      vocab: Seq[String], unk: String, maxWordChars: Int,
      memoEntries: Int): WordPieceTable = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(maxWordChars > 0, "maxWordChars must be positive")
    val set = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach { p =>
      require(p.nonEmpty && p != "##",
        s"vocab piece must have a non-empty body: '$p'")
      require(!p.exists(c => c == ' ' || (c >= '\t' && c <= '\r')),
        s"vocab piece must not contain whitespace: '$p'")
      require(set.add(p), s"duplicate vocab piece '$p'")
    }
    new WordPieceTable(set, unk, maxWordChars, memoEntries)
  }

  /** WordPiece token array (`array<string>`) under `vocab`. */
  case class WordPieceEncode(
      child: Expression, vocab: Seq[String], unk: String = "[UNK]",
      maxWordChars: Int = 100,
      memoEntries: Int = BpeExpressions.DefaultMemoEntries)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "wordpiece_encode"

    @transient private lazy val table =
      buildTable(vocab, unk, maxWordChars, memoEntries)

    override def nullSafeEval(input: Any): Any =
      WordPieceRuntime.wpTokens(input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wpTable", table,
        "graft.expressions.WordPieceTable")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.WordPieceRuntime.wpTokens($c, $ref);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact WordPiece token count (`int`) — the counting twin. */
  case class WordPieceCount(
      child: Expression, vocab: Seq[String], unk: String = "[UNK]",
      maxWordChars: Int = 100,
      memoEntries: Int = BpeExpressions.DefaultMemoEntries)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "wordpiece_count"

    @transient private lazy val table =
      buildTable(vocab, unk, maxWordChars, memoEntries)

    override def nullSafeEval(input: Any): Any =
      WordPieceRuntime.wpTokenCount(input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wpTable", table,
        "graft.expressions.WordPieceTable")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.WordPieceRuntime.wpTokenCount($c, $ref);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrappers (defaults match the published BERT convention:
    * `[UNK]`, `##` continuations, 100-char word cap).
    */
  def wordpieceTokens(c: Column, vocab: Seq[String], unk: String = "[UNK]",
      maxWordChars: Int = 100): Column =
    ColumnBridge.column(
      WordPieceEncode(ColumnBridge.expression(c), vocab, unk, maxWordChars))

  def wordpieceTokenCount(c: Column, vocab: Seq[String], unk: String = "[UNK]",
      maxWordChars: Int = 100): Column =
    ColumnBridge.column(
      WordPieceCount(ColumnBridge.expression(c), vocab, unk, maxWordChars))
}
