package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native producers of the PORTABLE (md5-prefix) shingle/gram sets — the
  * oracle-replayable set representation of the containment/resemblance/
  * script-aware screens ([[graft.ext.Dedup]]).
  *
  * Hash contract (must never drift — every portable oracle replays it):
  * element = `conv(substring(md5(gram), 1, 15), 16, 10)` as a long, i.e.
  * the first 60 bits of the md5 of the gram's UTF-8 bytes (big-endian
  * first 8 digest bytes >>> 4). The composable formulation computed this
  * through explode(sequence) + concat_ws + md5 + conv + a per-doc
  * collect_set AGGREGATION — one shuffled row per gram (measured 23 s
  * executor run / 14 s CPU to shingle the 5k-doc CJK corpus, plus a
  * 5 MB exchange). These expressions build each document's sorted
  * distinct set in one pass, row-local, no exchange.
  *
  * Tokenization is deliberately NOT replicated here: the word face takes
  * the `array<string>` produced by the same codegen `text.tokens` column
  * the composable form used, so the token boundaries cannot drift. The
  * char face lowercases via `UTF8String.toLowerCase` (the `lower()`
  * kernel) and strips Java-`\s` whitespace (the `regexp_replace(_,
  * "\\s+", "")` class: space, \t, \n, , \f, \r — ASCII-only, like
  * the Java regex default), windowing by CODE POINT exactly like
  * `substr` on UTF8String. Differential parity with the composable
  * formulation is locked by `PortableGramSpec`.
  */
object PortableGram {

  /** Sorted distinct 60-bit-md5 hashes of the `k`-token word shingles of
    * a token array; fewer than `k` tokens (including zero) yield ONE
    * shingle over all tokens (the empty string for an empty array) — the
    * `portableShingleSets` short-doc rule.
    */
  case class PortableWordShingleSet(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, "k must be at least 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "portable_word_shingle_set"

    // ADVICE r18: applied to anything but array<string> the kernel would
    // read raw Unsafe storage and hash garbage — fail analysis instead
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(org.apache.spark.sql.types.StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"portable_word_shingle_set: input must be array<string>, " +
              s"got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any =
      PortableGramRuntime.wordShingleSet(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.PortableGramRuntime.wordShingleSet($c, $k);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Sorted distinct 60-bit-md5 hashes of the code-point `n`-grams of the
    * lowercased, whitespace-stripped text; strings shorter than `n`
    * (including the empty string) yield one whole-string gram — the
    * `charGramHashRows` window rule (`sequence(1, greatest(len-n+1, 1))`).
    */
  case class PortableCharGramSet(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "n must be at least 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "portable_char_gram_set"

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"portable_char_gram_set: input must be string, " +
              s"got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any =
      PortableGramRuntime.charGramSet(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.PortableGramRuntime.charGramSet($c, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def portableWordShingleSet(tokens: Column, k: Int): Column =
    ColumnBridge.column(PortableWordShingleSet(ColumnBridge.expression(tokens), k))

  def portableCharGramSet(text: Column, n: Int): Column =
    ColumnBridge.column(PortableCharGramSet(ColumnBridge.expression(text), n))
}

/** Interpreted/codegen-shared kernels (the [[GramHashRuntime]] convention). */
object PortableGramRuntime {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes of the updates already applied):
    * `conv(substring(md5(s),1,15),16,10)` — first 15 hex digits = the
    * big-endian first 8 digest bytes shifted right one nibble.
    */
  private def digest60(md: java.security.MessageDigest): Long = {
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private def sortedDistinct(arr: Array[Long], n: Int): GenericArrayData = {
    java.util.Arrays.sort(arr, 0, n)
    var out = 0
    var i = 0
    while (i < n) {
      if (out == 0 || arr(out - 1) != arr(i)) { arr(out) = arr(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, out))
  }

  private val Space = Array[Byte](' ')

  def wordShingleSet(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val md = digests.get()
    // null elements are SKIPPED exactly like the concat_ws formulation
    // this kernel replaced (ADVICE r18: the first version NPE'd on them —
    // a drift on any containsNull=true caller); window COUNT still comes
    // from the raw positions, matching the composed slice windows
    def updateWindow(from: Int, until: Int): Unit = {
      var first = true
      var j = from
      while (j < until) {
        if (!tokens.isNullAt(j)) {
          if (!first) md.update(Space)
          md.update(tokens.getUTF8String(j).getBytes)
          first = false
        }
        j += 1
      }
    }
    if (n < k) {
      // one whole-document shingle: tokens joined by " " (empty string
      // for zero tokens) — md5 of the joined bytes
      md.reset()
      updateWindow(0, n)
      new GenericArrayData(Array(digest60(md)))
    } else {
      val hashes = new Array[Long](n - k + 1)
      var s = 0
      while (s <= n - k) {
        md.reset()
        updateWindow(s, s + k)
        hashes(s) = digest60(md)
        s += 1
      }
      sortedDistinct(hashes, hashes.length)
    }
  }

  // the Java regex \s class (ASCII-only by default): space \t \n  \f \r
  private def isJavaWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def charGramSet(s: UTF8String, n: Int): ArrayData = {
    // lower() then strip \s — both ASCII-safe on UTF-8 bytes (the stripped
    // chars are single bytes that never occur inside a multibyte sequence)
    val lowered = s.toLowerCase.getBytes
    val buf = new Array[Byte](lowered.length)
    var w = 0
    var i = 0
    while (i < lowered.length) {
      if (!isJavaWs(lowered(i))) { buf(w) = lowered(i); w += 1 }
      i += 1
    }
    val norm = UTF8String.fromBytes(buf, 0, w)
    val len = norm.numChars()
    val md = digests.get()
    if (len <= n) {
      md.reset()
      md.update(norm.getBytes)
      new GenericArrayData(Array(digest60(md)))
    } else {
      val count = len - n + 1
      val hashes = new Array[Long](count)
      var st = 0
      while (st < count) {
        md.reset()
        md.update(norm.substring(st, st + n).getBytes)
        hashes(st) = digest60(md)
        st += 1
      }
      sortedDistinct(hashes, count)
    }
  }
}
