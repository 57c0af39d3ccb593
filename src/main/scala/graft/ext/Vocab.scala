package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Corpus vocabulary statistics: global token frequencies and the top-k
  * vocabulary — the first diagnostic a training-data pipeline runs over a
  * new corpus (Zipf sanity check, tokenizer-vocab seeding, boilerplate-term
  * spotting).
  *
  * Scale: explode + count is ONE shuffle with map-side partial aggregation
  * (per-partition counts combine before the exchange, so shuffle volume is
  * bounded by |vocab| per partition, not corpus token count); top-k plans as
  * TakeOrderedAndProject — per-partition heaps of k, never a global sort of
  * the vocabulary.
  */
object Vocab {

  /** Global `(token, n)` frequencies using the shared corpus tokenizer
    * ([[text.tokens]]: lower-cased Unicode word runs).
    */
  def tokenFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(text.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))

  /** The `k` most frequent tokens, deterministically ordered (count
    * descending, token ascending on ties).
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    tokenFrequencies(df, textCol).orderBy(col("n").desc, col("token")).limit(k)
  }
}
