package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document shingling.
  *
  * Why custom expressions: the composable formulation
  * (`transform(sequence(...), i => substr(...))` + `array_distinct` +
  * `xxhash64`) runs through Spark's INTERPRETED higher-order-function path —
  * per-element closure dispatch, measured ~17s just to shingle 5k docs on 32
  * cores. These expressions do one tight JVM pass per document (byte-window
  * rolling hash, in-place sort, dedup) — the same work in well under a
  * second, and the dominant cost of MinHash/Jaccard dedup at scale.
  *
  * Codegen: `doGenCode` emits a direct static call into
  * [[GramHashRuntime]], so the expressions participate in whole-stage
  * codegen with no interpreted fallback and no row re-materialization; the
  * interpreted `eval` path calls the same kernel, so the two cannot drift.
  *
  * The set-producing expressions return a SORTED DISTINCT `array<long>` of
  * xxhash64 values — the set representation used for banding signatures and
  * for exact Jaccard verification. Hashing is byte-oriented (UTF-8), which
  * treats multi-byte codepoints as opaque byte runs: deterministic and
  * self-consistent, only the gram *boundaries* differ from codepoint-based
  * shingling on non-ASCII text.
  */
object GramHashExpressions {

  /** Sorted distinct xxhash64 of every `n`-byte window of the input string.
    * Strings shorter than `n` yield one whole-string hash.
    */
  case class CharNgramHashSet(child: Expression, n: Int, seed: Long = 42L)
      extends UnaryExpression {
    require(n > 0, "n must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "char_ngram_hash_set"

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.charNgramHashSet(input.asInstanceOf[UTF8String], n, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.charNgramHashSet($c, $n, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Sorted distinct rolling hash of `k`-token word shingles.
    *
    * Tokenization: maximal runs of ASCII alphanumerics (lower-cased) or
    * non-ASCII bytes — the byte-level analog of `graft.functions.text.tokens`.
    * Each token is xxhash64'd; a shingle hash chains the `k` token hashes
    * through `XXH64.hashLong`. Documents with fewer than `k` tokens yield one
    * shingle over all tokens.
    */
  case class WordShingleHashSet(child: Expression, k: Int, seed: Long = 42L)
      extends UnaryExpression {
    require(k > 0, "k must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "word_shingle_hash_set"

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.wordShingleHashSet(input.asInstanceOf[UTF8String], k, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.wordShingleHashSet($c, $k, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** MinHash signature (`numHashes` permutation minima) of a hashed gram
    * set, one pass per row. Hash family is exactly the composable
    * formulation's `xxhash64(lit(i), gram)` — per-permutation seed
    * `XXH64.hashInt(i, 42)` chained into `hashLong` — so signatures (and
    * therefore LSH candidate sets) are bit-identical to the explode +
    * 64-column-min aggregation this replaces, at zero shuffle cost.
    */
  case class MinHashSignature(child: Expression, numHashes: Int, seed: Long = 42L)
      extends UnaryExpression {
    require(numHashes > 0, "numHashes must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_signature"

    // one seed per permutation, shared by interpreted and generated paths
    private lazy val seeds: Array[Long] =
      Array.tabulate(numHashes)(i =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, seed))

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.minhashSignature(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], seeds)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val code = nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.expressions.GramHashRuntime.minhashSignature($c, $seedsRef);
           |${ev.isNull} = (${ev.value} == null);""".stripMargin)
      code
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash of the document's token multiset: per-bit majority vote
    * over token hashes (multiplicity-weighted), packed into a long. One tight
    * pass per document — the composable alternative (explode + 64 conditional
    * sums) shuffles every token and runs 64 aggregate columns.
    */
  case class SimHash64(child: Expression, seed: Long = 42L)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        GramHashRuntime.simhash64(input.asInstanceOf[UTF8String], seed))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.simhash64($c, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `(max_multiplicity, n_tokens)` struct from one tokenizer pass (see
    * [[GramHashRuntime.tokenMultiplicityStats]]); byte-level tokenizer
    * shared with [[WordShingleHashSet]]/[[SimHash64]].
    */
  case class TokenMultiplicityStats(child: Expression, seed: Long = 42L)
      extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("max_multiplicity",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    override def prettyName: String = "token_multiplicity_stats"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == org.apache.spark.sql.types.StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING column, got ${child.dataType.simpleString}")

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.tokenMultiplicityStats(input.asInstanceOf[UTF8String], seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.tokenMultiplicityStats($c, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode NFC normalization of a string column (see
    * [[GramHashRuntime.nfcNormalize]]); `isNormalized` short-circuits the
    * common ASCII case to a pass-through.
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def prettyName: String = "nfc_normalize"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == org.apache.spark.sql.types.StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING column, got ${child.dataType.simpleString}")

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.nfcNormalize(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.nfcNormalize($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass char-class statistics struct (see
    * [[GramHashRuntime.charClassStats]]) — the single-scan replacement for
    * the five regex passes the composable text-quality signals cost.
    */
  case class CharClassStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq("n_chars", "n_tokens", "n_nonws", "n_punct", "n_digit", "n_upper",
        "n_subwords", "n_unspaced", "n_seg_tokens")
        .map(f => org.apache.spark.sql.types.StructField(
        f, org.apache.spark.sql.types.IntegerType, nullable = false)))
    override def prettyName: String = "char_class_stats"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == org.apache.spark.sql.types.StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING column, got ${child.dataType.simpleString}")

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.charClassStats(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.charClassStats($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-unspaced-script code-point counts (see
    * [[GramHashRuntime.scriptCounts]]) — the script-aware language-ID
    * signal.
    */
  case class ScriptCounts(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(
      Seq("n_han", "n_kana", "n_thai", "n_lao", "n_khmer", "n_myanmar")
        .map(f => org.apache.spark.sql.types.StructField(
          f, org.apache.spark.sql.types.IntegerType, nullable = false)))
    override def prettyName: String = "script_counts"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == org.apache.spark.sql.types.StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING column, got ${child.dataType.simpleString}")

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.scriptCounts(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.scriptCounts($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unigram+bigram bucket ids (multiset, document order) for hashed-
    * feature models — see [[GramHashRuntime.ngramFeatureBuckets]].
    */
  case class NgramFeatureBuckets(child: Expression, buckets: Int, seed: Long = 42L)
      extends UnaryExpression {
    require(buckets > 0, "buckets must be positive")
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
    override def prettyName: String = "ngram_feature_buckets"

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.ngramFeatureBuckets(input.asInstanceOf[UTF8String], buckets, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.ngramFeatureBuckets($c, $buckets, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Sorted distinct winnowing fingerprints (window-min gram hashes, the
    * MOSS scheme) — see [[GramHashRuntime.winnowFingerprintSet]] for the
    * guarantee and the deque kernel.
    */
  case class WinnowFingerprintSet(child: Expression, n: Int, w: Int, seed: Long = 42L)
      extends UnaryExpression {
    require(n > 0, "n must be positive")
    require(w > 0, "w must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fingerprint_set"

    override def nullSafeEval(input: Any): Any =
      GramHashRuntime.winnowFingerprintSet(input.asInstanceOf[UTF8String], n, w, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.expressions.GramHashRuntime.winnowFingerprintSet($c, $n, $w, ${seed}L);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrappers. */
  def charNgramHashSet(c: Column, n: Int): Column =
    ColumnBridge.column(CharNgramHashSet(ColumnBridge.expression(c), n))

  def winnowFingerprintSet(c: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintSet(ColumnBridge.expression(c), n, w))

  def wordShingleHashSet(c: Column, k: Int): Column =
    ColumnBridge.column(WordShingleHashSet(ColumnBridge.expression(c), k))

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  def ngramFeatureBuckets(c: Column, buckets: Int): Column =
    ColumnBridge.column(NgramFeatureBuckets(ColumnBridge.expression(c), buckets))

  def minhashSignature(c: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), numHashes))

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  def tokenMultiplicityStats(c: Column): Column =
    ColumnBridge.column(TokenMultiplicityStats(ColumnBridge.expression(c)))

  def charClassStats(c: Column): Column =
    ColumnBridge.column(CharClassStats(ColumnBridge.expression(c)))

  def scriptCounts(c: Column): Column =
    ColumnBridge.column(ScriptCounts(ColumnBridge.expression(c)))
}
