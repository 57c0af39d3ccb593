package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{GramHashExpressions, VectorExpressions}

/** SQL-surface registration for the native expressions — the reference's
  * users live in SQL strings (`R/ffsql.R:171-176`), so the engine's custom
  * functions must be callable from `spark.sql(...)` too, not only through
  * the Scala column API.
  *
  * Activate with `spark.sql.extensions=graft.GraftExtensions` (wired into
  * [[GraftSession.configure]]) or `SparkSession.builder.withExtensions`.
  *
  * Registered: `cosine_similarity(a, b)`, `char_ngram_hash_set(s, n)`,
  * `word_shingle_hash_set(s, k)`, `simhash64(s)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: plans graft.plans.GroupTopK's logical node
    // as the two-phase heap operator (partial -> exchange -> final)
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopK.Strategy)
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two vectors"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes 2 arguments")
        VectorExpressions.CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("char_ngram_hash_set"),
      info("char_ngram_hash_set",
        "char_ngram_hash_set(s, n) - sorted distinct hashes of n-byte windows"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "char_ngram_hash_set(s, n) takes 2 arguments")
        GramHashExpressions.CharNgramHashSet(args(0), intArg(args(1), "n"))
      }))
    ext.injectFunction((FunctionIdentifier("word_shingle_hash_set"),
      info("word_shingle_hash_set",
        "word_shingle_hash_set(s, k) - sorted distinct k-token shingle hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingle_hash_set(s, k) takes 2 arguments")
        GramHashExpressions.WordShingleHashSet(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(s) - 64-bit SimHash of the token multiset"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(s) takes 1 argument")
        GramHashExpressions.SimHash64(args.head)
      }))
    // the one-pass stats struct underlies every composed text signal, so
    // the SQL macro bodies GraftSession generates from them reference it
    ext.injectFunction((FunctionIdentifier("char_class_stats"),
      info("char_class_stats",
        "char_class_stats(s) - one-pass char-class count struct"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "char_class_stats(s) takes 1 argument")
        GramHashExpressions.CharClassStats(args.head)
      }))
    // the native word tokenizer underlies text.tokens, so SQL macro
    // bodies generated from composed signals (quality_score, lang_id)
    // reference it — same registration rationale as char_class_stats
    ext.injectFunction((FunctionIdentifier("native_tokens"),
      info("native_tokens",
        "native_tokens(s) - lower-cased [\\p{L}\\p{N}_]+ word tokens"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "native_tokens(s) takes 1 argument")
        graft.expressions.Tokens.NativeTokens(args.head)
      }))
    // O(n) alpha=1/2 EWMA prefix scan over an array<double> series — the
    // recursion SQL higher-order functions cannot express without the
    // O(n^2) concat fold (see graft.ops.Profile.ewmaHalf)
    ext.injectFunction((FunctionIdentifier("ewma_half_scan"),
      info("ewma_half_scan",
        "ewma_half_scan(xs) - prefix EWMA s_t = (x_t + s_(t-1))/2 over a double array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "ewma_half_scan(xs) takes 1 argument")
        graft.expressions.ScanExpressions.EwmaHalfScan(args.head)
      }))
  }
}
