package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Corpus reporting artifacts — the "data card" tables a dataset release
  * ships alongside the data: per-slice volume, quality and duplication
  * summaries computed from the same native signal expressions the pipeline
  * filters with (one expression tree — the card cannot drift from the
  * gates it reports on).
  */
object Report {

  /** Per-`groupCols` corpus summary: document and token volume, how many
    * docs pass the Gopher quality rules, and how many share their exact
    * text with ANY other document corpus-wide (not just within the group —
    * cross-source duplication is precisely what a per-source card must
    * surface).
    *
    * Returns `(groupCols..., n_docs, sum_tokens, n_quality_pass,
    * n_dup_docs)`.
    *
    * Scale: two shuffles — the corpus-wide duplicate-size aggregation on
    * md5(text) (joined back on the same key, so the exchange is reused)
    * and the final group aggregation (map-side combinable; #groups rows).
    * Quality and token signals are the codegen'd one-pass expressions
    * ([[graft.functions.text.gopherReasons]]/[[graft.functions.text.tokenCount]]).
    *
    * `tokenCounter` swaps the token accounting: the default is the
    * whitespace [[graft.functions.text.tokenCount]]; pass
    * `Some(text.bpeTokenCount(col(textCol), merges))` (or any int
    * expression over the row) and `sum_tokens` becomes tokenizer-exact —
    * the card then reports the same token currency the training run
    * spends (q156 oracles this end-to-end).
    */
  def dataCard(
      df: DataFrame, groupCols: Seq[String], textCol: String,
      minStopwords: Int = 1,
      tokenCounter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    val tokens = tokenCounter.getOrElse(text.tokenCount(col(textCol)))
    val dupSizes = df.select(md5(col(textCol)).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__dn"))
    df.withColumn("__h", md5(col(textCol)))
      .join(dupSizes, "__h")
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokens.cast("long")).as("sum_tokens"),
        count(when(
            text.gopherReasons(col(textCol), minStopwords = minStopwords) === 0,
            1)).as("n_quality_pass"),
        count(when(col("__dn") > 1, 1)).as("n_dup_docs"))
  }
}
