package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass word tokenizer — the hot-path replacement for the
  * composable `array_remove(split(lower(c), "[^\\p{L}\\p{N}_]+"), "")`
  * that defines [[graft.functions.text.tokens]] (optimization round 19,
  * guide §4: the regex `split` was one 27 s-CPU stage of the BM25/hybrid
  * faces and the front-end of every portable word-shingle build).
  *
  * Byte-for-byte parity contract with the composed form (locked by the
  * differential `TokensSpec` and every tokens-consuming SQL oracle):
  *   - lowercasing is the SAME kernel (`UTF8String.toLowerCase`) the
  *     `lower()` expression applies;
  *   - a token is a maximal run of code points matching the Java-regex
  *     class `[\p{L}\p{N}_]` ON THE LOWERED STRING: Unicode letter
  *     categories Lu/Ll/Lt/Lm/Lo (exactly `Character.isLetter`), number
  *     categories Nd/Nl/No, or '_'. Combining marks (Mn) are delimiters,
  *     so a decomposed "e" + U+0301 splits here exactly as it does under
  *     the regex;
  *   - empties never appear (maximal runs are non-empty), matching the
  *     `array_remove(_, "")` tail.
  * Iteration is by CODE POINT over the JDK string — the same unit the
  * Java regex engine matches character classes in, supplementary planes
  * included.
  */
object Tokens {

  case class NativeTokens(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "native_tokens"

    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"native_tokens: input must be string, got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any =
      TokensRuntime.tokens(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.TokensRuntime.tokens($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nativeTokens(c: Column): Column =
    ColumnBridge.column(NativeTokens(ColumnBridge.expression(c)))
}

/** Interpreted/codegen-shared kernel (the [[GramHashRuntime]] convention). */
object TokensRuntime {

  /** `[\p{L}\p{N}_]` membership of one code point — Java regex `\p{L}` is
    * the five letter categories (== `Character.isLetter`), `\p{N}` the
    * three number categories.
    */
  private def isWord(cp: Int): Boolean =
    cp == '_' || Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  def tokens(s: UTF8String): GenericArrayData = {
    // the regex path also round-trips through the JDK string (Pattern
    // matches on String; lower() is UTF8String.toLowerCase) — sharing
    // both conversions keeps parity on every input, invalid UTF-8
    // included
    val str = s.toLowerCase.toString
    val n = str.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    var start = -1
    while (i < n) {
      val cp = str.codePointAt(i)
      val w = isWord(cp)
      if (w && start < 0) start = i
      val next = i + Character.charCount(cp)
      if (!w && start >= 0) {
        out.add(UTF8String.fromString(str.substring(start, i)))
        start = -1
      }
      i = next
    }
    if (start >= 0) out.add(UTF8String.fromString(str.substring(start, n)))
    new GenericArrayData(out.toArray)
  }
}
