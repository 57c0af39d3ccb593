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
  * Scale: two bounded count aggregations (`buckets` output rows each), a
  * bounded O(buckets) model collect, then scoring as ONE row-local fold
  * over the model as an array literal — no scoring join or shuffle at
  * all — and a distributed TakeOrdered top-k. The model is `buckets`
  * rows — it never grows with the corpus.
  */
object Dsir {

  /** Hashed unigram+bigram feature buckets of a document (the paper's
    * feature map), as an int array — row-local, codegen'd. The bucket
    * hash is the corpus-wide md5-prefix idiom, reproducible in any SQL
    * engine; [[nativeFeatures]] is the production twin.
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

  /** Production feature map: the same unigram+bigram multiset through ONE
    * native codegen'd pass ([[graft.expressions.GramHashRuntime.ngramFeatureBuckets]])
    * — no per-feature string materialization or md5, ~10x cheaper than
    * [[hashedFeatures]] on long documents. Different hash family, so it is
    * spec-tested (not SQL-oracled); the md5 twin keeps the differential
    * gate — the q51/q98 native/portable pattern.
    */
  def nativeFeatures(c: Column, buckets: Int): Column =
    graft.expressions.GramHashExpressions.ngramFeatureBuckets(c, buckets)

  /** `(idCol, score)` for every `corpus` row with non-null text: the
    * integer importance score under the quantized hashed log-odds model
    * fit on `target` vs `corpus`. Featureless documents (empty or
    * non-ASCII-tokenizable text) score 0 — the empty fold.
    *
    * Two corpus passes, no scoring shuffle: pass 1 aggregates bucket
    * counts (map-side combinable, `buckets` output rows), the quantized
    * model is collected to the driver — O(buckets) longs, a BOUNDED
    * collect independent of corpus size — and pass 2 scores every row
    * with a row-local `transform`+`aggregate` fold over the model as ONE
    * array literal (the [[graft.functions.text.hashedLinearScore]] shape).
    * Unseen buckets keep weight 0 = floor(scale*ln((0+1)/(0+1))).
    */
  def importanceScores(
      corpus: DataFrame, target: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096, scale: Int = 1000,
      native: Boolean = false): DataFrame = {
    val feats =
      if (native) nativeFeatures(col(textCol), buckets)
      else hashedFeatures(col(textCol), buckets)
    def counts(df: DataFrame, out: String) = df
      .select(explode(feats).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(out))
    val qarr = new Array[Long](buckets)
    counts(corpus, "n_raw")
      .join(counts(target, "n_tgt"), Seq("bucket"), "full")
      .na.fill(0L, Seq("n_raw", "n_tgt"))
      .collect()
      .foreach { r =>
        val (b, sc2, tc) = (r.getInt(0), r.getLong(1), r.getLong(2))
        qarr(b) = math.floor(
          scale.toDouble * math.log((tc + 1).toDouble / (sc2 + 1).toDouble)).toLong
      }
    val score = aggregate(
      transform(feats, f => element_at(lit(qarr), f + 1)),
      lit(0L), (acc, w) => acc + w)
    // doc contract: output restricted to non-null text (a null text row
    // would otherwise surface a NULL score — transform over null is null)
    corpus.where(col(textCol).isNotNull).select(col(idCol), score.as("score"))
  }

  /** Deterministic top-k selection: highest score wins, ties to the
    * smaller id. Distributed TakeOrdered — no global sort materialized.
    */
  def selectTopK(scores: DataFrame, idCol: String, k: Int): DataFrame =
    scores.orderBy(col("score").desc, col(idCol).asc).limit(k)
}
