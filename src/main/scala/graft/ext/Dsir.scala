package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling", arXiv:2302.03169): score
  * every raw document by how much its hashed n-gram profile looks like a
  * TARGET distribution (e.g. curated text) versus the raw corpus, then
  * keep the top-scoring slice.
  *
  * Deliberate divergences from the paper, for determinism and oracle
  * parity (both documented here as the contract):
  *  - the per-bucket log-odds `ln((tc_b+1)/(sc_b+1))` are QUANTIZED to
  *    integers (`floor(scale * ln)`), so document scores are exact integer
  *    sums — no float accumulation order anywhere. The model normalizers
  *    (T + B, S + B) are dropped: they contribute a constant per feature
  *    instance, a document-length prior absorbed into the threshold.
  *  - selection is deterministic top-k by (score, id) rather than Gumbel
  *    resampling — reproducible across runs and engines.
  *
  * Scale: two bounded aggregations (`buckets` rows each), one broadcast
  * join of the quantized model onto the exploded feature stream, one
  * map-side-combinable per-doc sum, and a distributed TakeOrdered top-k.
  * The model is `buckets` rows — it never grows with the corpus.
  */
object Dsir {

  /** Hashed unigram+bigram feature buckets of a document (the paper's
    * feature map), as an int array — row-local, codegen'd. The bucket
    * hash is the corpus-wide md5-prefix idiom, reproducible in any SQL
    * engine.
    */
  def hashedFeatures(c: Column, buckets: Int): Column = {
    val toks = filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    // guard: Spark sequence(1, 0) DESCENDS (it would fabricate a bogus
    // bigram from a 1-token doc); empty array for size < 2
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
    val feats = concat(toks, bigrams)
    transform(feats, f =>
      (conv(substring(md5(f), 1, 8), 16, 10).cast("long") % buckets).cast("int"))
  }

  /** `(idCol, score)` for every `corpus` row with non-null text: the
    * integer importance score under the quantized hashed log-odds model
    * fit on `target` vs `corpus`. Featureless documents (empty or
    * non-ASCII-tokenizable text) score 0 — the model is indifferent.
    */
  def importanceScores(
      corpus: DataFrame, target: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096, scale: Int = 1000): DataFrame = {
    def feats(df: DataFrame) = df
      .select(col(idCol), explode(hashedFeatures(col(textCol), buckets)).as("bucket"))
    val raw = feats(corpus).groupBy("bucket").agg(count(lit(1)).as("n_raw"))
    val tgt = feats(target).groupBy("bucket").agg(count(lit(1)).as("n_tgt"))
    val model = raw.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_tgt"))
      .select(col("bucket"),
        floor(lit(scale.toDouble) * log(
          (col("n_tgt") + 1).cast("double") / (col("n_raw") + 1).cast("double")))
          .cast("long").as("qllr"))
    val scored = feats(corpus)
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol)).agg(sum(col("qllr")).as("score"))
    corpus.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Deterministic top-k selection: highest score wins, ties to the
    * smaller id. Distributed TakeOrdered — no global sort materialized.
    */
  def selectTopK(scores: DataFrame, idCol: String, k: Int): DataFrame =
    scores.orderBy(col("score").desc, col(idCol).asc).limit(k)
}
