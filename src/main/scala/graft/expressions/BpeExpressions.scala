package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for tokenizer-exact BPE encoding over a
  * FROZEN merge list (the broadcast-vocab pattern: the merge table rides
  * into generated code as one reference object, shared across rows — no
  * join, no UDF registration, no per-row vocab materialization).
  *
  * Why native: the greedy merge loop is a data-dependent while-loop per
  * word — inexpressible in composable `functions._` without an interpreted
  * higher-order-function ladder per iteration. As an expression it is one
  * tight JVM pass per document inside whole-stage codegen, the
  * [[GramHashExpressions]] design. Encode semantics and the oracle-replay
  * contract live on [[BpeRuntime]].
  *
  * Every token-denominated operator composes with these: pass
  * [[bpeTokens]] as the array for `Packing.materializeBlocks` /
  * `slidingChunks` and [[bpeTokenCount]] as the count for
  * `Packing.concatChunk`, `Mixtures` and budget selection — token
  * accounting becomes tokenizer-exact instead of whitespace-approximate
  * (the two diverge 2-3x on code/CJK).
  */
object BpeExpressions {

  private def buildRanks(
      merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      require(l.nonEmpty && r.nonEmpty, "merge sides must be non-empty")
      require(!(l + r).exists(c => c == ' ' || (c >= '\t' && c <= '\r')),
        s"merge symbols must not contain whitespace: ('$l','$r')")
      val prev = m.putIfAbsent(BpeRuntime.pairKey(l, r), Integer.valueOf(i))
      require(prev == null, s"duplicate merge pair ('$l','$r')")
    }
    m
  }

  /** Shared word-encode memo size: the Zipf head of any natural corpus
    * fits well inside 64k distinct words; `memoEntries = 0` disables
    * caching (every word re-encodes — the differential-test mode).
    */
  val DefaultMemoEntries: Int = 1 << 16

  /** BPE token array (`array<string>`) of the input under `merges`. */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)],
      memoEntries: Int = DefaultMemoEntries)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    @transient private lazy val memo =
      new BpeMemo(buildRanks(merges), memoEntries)

    override def nullSafeEval(input: Any): Any =
      BpeRuntime.bpeTokens(input.asInstanceOf[UTF8String], memo)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val memoRef = ctx.addReferenceObj("bpeMemo", memo,
        "graft.expressions.BpeMemo")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.BpeRuntime.bpeTokens($c, $memoRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact BPE token count (`int`) of the input under `merges` — the
    * counting twin of [[BpeEncode]], no token array materialized.
    */
  case class BpeCount(child: Expression, merges: Seq[(String, String)],
      memoEntries: Int = DefaultMemoEntries)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bpe_count"

    @transient private lazy val memo =
      new BpeMemo(buildRanks(merges), memoEntries)

    override def nullSafeEval(input: Any): Any =
      BpeRuntime.bpeTokenCount(input.asInstanceOf[UTF8String], memo)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val memoRef = ctx.addReferenceObj("bpeMemo", memo,
        "graft.expressions.BpeMemo")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.BpeRuntime.bpeTokenCount($c, $memoRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrappers. `memoEntries` sizes the shared word-encode memo
    * (0 = off; results are identical either way, spec-asserted).
    */
  def bpeTokens(c: Column, merges: Seq[(String, String)],
      memoEntries: Int = DefaultMemoEntries): Column =
    ColumnBridge.column(
      BpeEncode(ColumnBridge.expression(c), merges, memoEntries))

  def bpeTokenCount(c: Column, merges: Seq[(String, String)],
      memoEntries: Int = DefaultMemoEntries): Column =
    ColumnBridge.column(
      BpeCount(ColumnBridge.expression(c), merges, memoEntries))
}
