package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed quality-classifier TRAINING — the fit side of the
  * fastText-shape linear filter whose scorer the engine already ships
  * ([[graft.functions.text.hashedLinearScore]]): hashed unigram features,
  * a few full-batch gradient rounds of logistic regression, and
  * integer-quantized weights out that drop straight into the scorer. The
  * CCNet/DSIR house pattern (fit = bounded model state on the driver,
  * corpus touched only by map-side-combinable passes; see
  * [[Dsir.importanceScores]], [[NgramLm]]).
  *
  * Feature map: EXACTLY the scorer's — lowercase `[^a-z0-9]+` token
  * split, bucket = first-8-hex-chars-of-md5 mod `buckets` — so a fitted
  * `(weights, bias)` pair scores through `hashedLinearScore` with no
  * re-featurization drift (the fit→filter loop is closed end to end).
  *
  * Determinism/oracle contract (the q167 convention): the per-bucket
  * SUFFICIENT STATISTICS ([[suffStats]]) are exact integer counts and sit
  * under the SQL oracle; the gradient rounds feed those counts through
  * the logistic sigmoid — per-DOC libm, not hash-stable across engines —
  * so the fit itself is spec-asserted (seeded separable fixture,
  * determinism across partitionings). Inside one engine the fit IS
  * deterministic: per-doc probabilities are rounded to 6 dp before the
  * gradient aggregation, gradient sums are exact decimal, and the weight
  * update quantizes through one HALF_UP rounding — no accumulation-order
  * dependence anywhere.
  *
  * Scale: the corpus is projected once to a narrow (features, label)
  * frame and localCheckpointed (the Lloyd-iteration pattern —
  * [[Clustering.assign]]); each gradient round is ONE row-local scoring
  * projection (weights inlined as an array literal — no join) plus one
  * map-side-combinable (bucket, residual-sum) aggregation, with exactly
  * O(buckets) decimals collected to the driver per round. Rounds are a
  * FIXED count — no data-dependent convergence loop.
  */
object Classifier {

  /** The scorer's bucket map: md5-prefix mod `buckets` over lowercase
    * alnum tokens — one int per token occurrence (multiplicity kept:
    * the feature value is the in-doc token count, applied via explode).
    */
  def tokenBuckets(c: Column, buckets: Int): Column = {
    require(buckets >= 2, "need at least 2 buckets")
    val toks = filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    transform(toks, t =>
      (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % buckets).cast("int"))
  }

  /** Per-bucket sufficient statistics of the labeled corpus: occurrence
    * counts overall and within the positive class, plus per-class doc
    * counts as two marker rows (bucket -1: negative docs, -2: positive
    * docs) so ONE frame carries everything the first gradient round (or
    * a Naive-Bayes fit) consumes. `(bucket, n_occ, n_pos_occ)` — exact
    * integers, fully SQL-replicable (the oracle surface of the fit).
    */
  def suffStats(
      df: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 4096): DataFrame =
    suffStatsOf(df.where(col(textCol).isNotNull)
      .select(tokenBuckets(col(textCol), buckets).as("__f"),
        labelInt(col(labelCol))))

  /** Label contract shared by every fit/score path: NULL labels count as
    * NEGATIVE — exactly what the oracles' `CASE WHEN lang = 'en' THEN 1
    * ELSE 0 END` computes when the predicate is null. Without the
    * coalesce, a null-label row would group into a NULL marker bucket
    * (NPE in [[nbModel]]) and silently vanish from [[fit]]'s gradient.
    */
  private def labelInt(label: Column): Column =
    coalesce(label.cast("int"), lit(0)).as("__y")

  /** [[suffStats]] over an already-featurized `(__f, __y)` frame. */
  private def suffStatsOf(base: DataFrame): DataFrame = {
    val occ = base
      .select(explode(col("__f")).as("bucket"), col("__y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_occ"),
        sum(col("__y")).cast("long").as("n_pos_occ"))
    val docs = base.groupBy((col("__y") * -1 - 1).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_occ"),
        sum(col("__y")).cast("long").as("n_pos_occ"))
    occ.unionByName(docs)
  }

  /** Sufficient statistics are ADDITIVE — the whole point of publishing
    * them as the fit's oracle surface: a new shard's stats merge into the
    * standing table by plain per-bucket summation, and the refreshed
    * model is EXACTLY the one-shot refit (no approximation, no decay
    * knob). The incremental-ingest face of the classifier; the q144/q120
    * incremental == one-shot house convention.
    */
  def mergeSuffStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket"))
      .agg(sum(col("n_occ")).cast("long").as("n_occ"),
        sum(col("n_pos_occ")).cast("long").as("n_pos_occ"))

  /** Quantized NB model `(weights, bias)` from a stats frame (the
    * [[suffStats]] shape, marker rows included) — an O(buckets) collect,
    * the [[Dsir.importanceScores]] model bound.
    */
  def nbModel(
      stats: DataFrame, buckets: Int = 4096,
      scale: Int = 1000): (Array[Long], Long) = {
    def qln(num: Long, den: Long): Long =
      math.floor(scale.toDouble * math.log(num.toDouble / den)).toLong
    var nPos = 0L
    var nNeg = 0L
    val w = new Array[Long](buckets)
    stats.collect().foreach { r =>
      val (b, n, p) = (r.getInt(0), r.getLong(1), r.getLong(2))
      if (b == -2) nPos = n
      else if (b == -1) nNeg = n
      else w(b) = qln(p + 1, n - p + 1)
    }
    (w, qln(nPos + 1, nNeg + 1))
  }

  /** Row-local NB scoring with a prepared model: the weight table rides
    * in the plan as an array literal — no scoring join, no shuffle.
    * Returns `(idCol, score, label)`; rows with null text are excluded
    * (they carry no features to score).
    */
  def naiveBayesScoreWith(
      corpus: DataFrame, idCol: String, textCol: String,
      weights: Array[Long], bias: Long, buckets: Int = 4096): DataFrame = {
    val score = nbScoreColumn(col(textCol), weights, bias, buckets)
    corpus.where(col(textCol).isNotNull)
      .select(col(idCol), score.as("score"),
        when(score >= 0, lit("keep")).otherwise(lit("drop")).as("label"))
  }

  /** The NB score as a bare Column — for callers that need to keep their
    * own projection (e.g. the streamed AUC monitor scoring and grouping
    * in one stateless pass).
    */
  def nbScoreColumn(
      text: Column, weights: Array[Long], bias: Long,
      buckets: Int = 4096): Column = {
    require(weights.length == buckets, "weight table must have `buckets` entries")
    aggregate(
      transform(tokenBuckets(text, buckets), f =>
        element_at(lit(weights), f + 1)),
      lit(bias), (acc, x) => acc + x)
  }

  /** Multinomial Naive Bayes, trained AND scored entirely under the hash
    * oracle: per-bucket quantized log-likelihood ratios
    * `floor(scale * ln((pos_b+1)/(neg_b+1)))` (the DSIR convention —
    * q134's floor argument: a 1-ulp ln disagreement cannot flip the
    * floor) plus the same-quantized class prior as the score's base.
    * Unlike [[fit]] (whose sigmoid rounds are spec-asserted), every NB
    * number is an integer a SQL engine reproduces exactly — the fully
    * differential-testable end of the classifier family; [[fit]] is the
    * higher-accuracy iterative end.
    *
    * Returns `(idCol, score, label)` with `label = keep/drop` at score 0
    * (the q128 output convention). Docs with no features score the bare
    * prior.
    *
    * Scale: one feature pass for the counts (map-side combinable,
    * O(buckets) rows collected), one row-local scoring pass with the
    * model inlined as an array literal — no scoring join; the corpus
    * feature frame is localCheckpointed once for the two passes.
    */
  def naiveBayesScores(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      buckets: Int = 4096, scale: Int = 1000): DataFrame = {
    val base = df.where(col(textCol).isNotNull)
      .select(col(idCol), tokenBuckets(col(textCol), buckets).as("__f"),
        labelInt(col(labelCol)))
      .localCheckpoint()
    val (w, bias) = nbModel(suffStatsOf(base.drop(idCol)), buckets, scale)
    val score = aggregate(
      transform(col("__f"), f => element_at(lit(w), f + 1)),
      lit(bias), (acc, x) => acc + x)
    base.select(col(idCol), score.as("score"),
      when(score >= 0, lit("keep")).otherwise(lit("drop")).as("label"))
  }

  /** Fixed-round full-batch logistic regression; returns the quantized
    * `(weights, bias)` ready for `hashedLinearScore(text, weights, bias)`
    * — scores are `scale`-scaled logits (threshold at 0 = p > 1/2).
    *
    * Per round, with current integer weights w (real weight = w/scale):
    * z = bias + sum w(b(t)); p = 1/(1+e^(-z/scale)) rounded to 6 dp;
    * per-bucket gradient g_b = sum_docs (p - y) * count_b(doc) as an
    * EXACT decimal(20,6) sum; update w_b -= HALF_UP(lr * scale * g_b /
    * n_docs). The bias follows the same rule with gradient sum(p - y).
    */
  def fit(
      df: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 4096, rounds: Int = 3, lr: Double = 2.0,
      scale: Int = 1000): (Array[Int], Long) = {
    require(rounds >= 1, "rounds must be >= 1")
    require(lr > 0, "lr must be positive")
    // narrow (features, label) frame materialized once; every round's two
    // passes (scoring projection + gradient agg) read the checkpoint
    val base = df.where(col(textCol).isNotNull)
      .select(tokenBuckets(col(textCol), buckets).as("__f"),
        labelInt(col(labelCol)))
      .localCheckpoint()
    val nDocs = base.count()
    require(nDocs > 0, "no labeled rows with non-null text")
    val w = new Array[Long](buckets)
    var bias = 0L
    def step(grad: java.math.BigDecimal): Long =
      // -lr * scale * grad / n, one HALF_UP rounding — deterministic
      java.math.BigDecimal.valueOf(lr * scale).multiply(grad)
        .divide(java.math.BigDecimal.valueOf(nDocs), 0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
    for (_ <- 1 to rounds) {
      val z = aggregate(
        transform(col("__f"), f => element_at(lit(w), f + 1)),
        lit(bias), (acc, x) => acc + x)
      val p = lit(1.0) / (lit(1.0) + exp(-z.cast("double") / scale))
      // 6-dp residual BEFORE aggregation: the only libm value is per-row;
      // every cross-row sum is exact decimal
      val resid = round(p - col("__y"), 6).cast("decimal(20,6)")
      // bias gradient as bucket -1 in the SAME aggregation — one shuffle
      // per round, not two
      val grads = base
        .select(col("__y"), resid.as("__r"),
          concat(col("__f"), array(lit(-1))).as("__fb"))
        .select(explode(col("__fb")).as("bucket"), col("__r"))
        .groupBy(col("bucket"))
        .agg(sum(col("__r")).as("g"))
        .collect()
      grads.foreach { r =>
        val b = r.getInt(0)
        val g = r.getDecimal(1)
        if (b < 0) bias -= step(g) else w(b) -= step(g)
      }
    }
    val wi = new Array[Int](buckets)
    var i = 0
    while (i < buckets) {
      wi(i) = math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, w(i))).toInt
      i += 1
    }
    (wi, bias)
  }

  /** Chi-square feature selection over RAW tokens (doc-level presence) —
    * which vocabulary is actually predictive of the label, the standard
    * screen run BEFORE committing to a hashed-feature fit (a bucket map
    * hides which words carry signal; this names them). Per token the 2×2
    * contingency `(in-doc × class)` yields
    * `chi² = N·(AD − BC)² / ((A+B)(C+D)(A+C)(B+D))` — all eight cells are
    * exact integer counts, the statistic is ONE fixed double tree over
    * them, so the ranking (unrounded chi² desc, token asc — the q24
    * rank-on-raw convention) is engine-exact and the whole top-k sits
    * under the hash oracle.
    *
    * Tokens outside `[minDf, N − minDf]` doc frequency are screened out:
    * below is noise, above has a vanishing `C+D` margin (a token in every
    * doc divides by zero). Fails loudly on a single-class corpus (no
    * contingency exists).
    *
    * Scale: one distinct-token explode + map-side-combinable count per
    * token, then `orderBy(...).limit(k)` — Spark plans TakeOrdered (a
    * per-partition heap + driver merge of k rows), never a global sort;
    * the rank window runs over the k collected survivors only.
    */
  def chiSquareTokens(
      df: DataFrame, textCol: String, labelCol: String,
      k: Int = 50, minDf: Int = 5): DataFrame = {
    require(k >= 1 && minDf >= 1, "k and minDf must be positive")
    val base = df.where(col(textCol).isNotNull)
      .select(array_distinct(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => t =!= "")).as("__tk"), labelInt(col(labelCol)))
    // class sizes: one O(1) collect (the model-scalar bound)
    val cls = base.agg(count(lit(1)).as("n"),
      sum(col("__y")).cast("long").as("np")).head()
    val (n, nPos) = (cls.getLong(0), cls.getLong(1))
    require(nPos > 0 && nPos < n,
      s"chiSquareTokens: single-class corpus (n=$n, positives=$nPos) — " +
        "no contingency to test")
    val counts = base.select(explode(col("__tk")).as("token"), col("__y"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df_t"), sum(col("__y")).cast("long").as("pos_t"))
      .where(col("df_t") >= minDf && col("df_t") <= n - minDf)
    val (a, b) = (col("pos_t").cast("double"),
      (col("df_t") - col("pos_t")).cast("double"))
    val (c, dd) = (lit(nPos).cast("double") - a,
      lit(n - nPos).cast("double") - b)
    val num = lit(n).cast("double") * (a * dd - b * c) * (a * dd - b * c)
    val den = (a + b) * (c + dd) * lit(nPos).cast("double") *
      lit(n - nPos).cast("double")
    val scored = counts.withColumn("__chi2", num / den)
      .orderBy(col("__chi2").desc, col("token")).limit(k)
    scored.select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__chi2").desc, col("token"))).as("rank"),
        col("token"), col("df_t"), col("pos_t"),
        round(col("__chi2"), 6).as("chi2"))
  }
}
