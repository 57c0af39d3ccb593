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

  /** Lexical-diversity report per group: type and token counts plus two
    * division-free diversity statistics —
    *   - `ttr_scaled = 1e6 * types div tokens` (the type-token ratio as an
    *     exact integer in parts-per-million; integer `div`, no float),
    *   - Gini–Simpson numerator/denominator: `rep_pairs = sum n_t*(n_t-1)`
    *     and `tot_pairs = N*(N-1)` (the probability two random token draws
    *     repeat a type is `rep_pairs / tot_pairs`; low = diverse,
    *     high = templated/repetitive), emitted UNDIVIDED so the whole row
    *     is exact integer arithmetic in any engine, plus the rounded
    *     `simpson` double computed per-row from the two exact integers.
    *
    * The corpus-health cut between per-doc repetition screens (Gopher
    * rules) and the global vocabulary: a source whose million tokens
    * reuse 3k types is template spam regardless of per-doc quality.
    *
    * Scale: tokenize once, ONE (group, token) count aggregation
    * (map-side combinable), then an O(groups x types)->O(groups) rollup
    * that reuses the same hash partitioning. No windows, no collects.
    */
  def lexicalDiversity(
      df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(text.tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col(groupCol))
      .agg(count(lit(1)).as("types"), sum(col("n")).as("tokens"),
        sum(col("n") * (col("n") - 1)).as("rep_pairs"))
      .select(col(groupCol), col("types"), col("tokens"),
        expr("1000000 * types div tokens").as("ttr_scaled"),
        col("rep_pairs"),
        (col("tokens") * (col("tokens") - 1)).as("tot_pairs"),
        when(col("tokens") <= 1, lit(null).cast("double"))
          .otherwise(round(col("rep_pairs").cast("double") /
            (col("tokens") * (col("tokens") - 1)), 6)).as("simpson"))
  }

  /** Token dispersion across a grouping column (source/domain/shard) —
    * the Fano factor `variance/mean` of each token's per-group counts,
    * zeros included: ~1 means the token spreads Poisson-like over
    * groups, large means BURSTY (concentrated in few groups — the
    * signature of source-specific boilerplate, which the per-doc
    * repetition rules cannot see). `fano = sum(c²)/T - T/S` (population
    * variance over all S groups divided by the mean), a per-row double
    * tree over three exact integers — absent groups contribute nothing
    * to `sum(c²)`, so zeros are never materialized. Returns tokens with
    * `total >= minTotal`: `(token, total, n_groups, fano)`.
    *
    * Scale: one (group, token) count aggregation, one token-level
    * reaggregation on the same hash partitioning, one broadcast scalar
    * (the group count). No windows, no joins over data-sized frames.
    */
  def tokenDispersion(
      df: DataFrame, groupCol: String, textCol: String,
      minTotal: Long = 50L): DataFrame = {
    require(minTotal >= 1, "minTotal must be positive")
    val counts = df
      .select(col(groupCol).as("__g"), explode(text.tokens(col(textCol))).as("token"))
      .groupBy(col("__g"), col("token"))
      .agg(count(lit(1)).as("__c"))
    val nGroups = df.where(col(groupCol).isNotNull)
      .agg(countDistinct(col(groupCol)).as("__S"))
    counts.groupBy(col("token"))
      .agg(sum(col("__c")).as("total"), count(lit(1)).as("n_groups"),
        sum(col("__c") * col("__c")).as("__c2"))
      .where(col("total") >= minTotal)
      .crossJoin(broadcast(nGroups))
      .select(col("token"), col("total"), col("n_groups"),
        // + 0.0 normalizes signed zero (a token whose dispersion sits
        // exactly at the Poisson line; the q260 convention)
        (round(col("__c2").cast("double") / col("total") -
          col("total").cast("double") / col("__S"), 6) + lit(0.0)).as("fano"))
  }

  /** Global word-`n`-gram frequencies (space-joined token windows) — the LM
    * diagnostic one level above [[tokenFrequencies]] (boilerplate phrase
    * detection, contamination spotting, n-gram LM counts).
    *
    * Window generation is ROW-LOCAL: sequence + posexplode + slice over each
    * document's token array, all codegen'd, no lambda and no shuffle — the
    * same shape as [[Packing.slidingChunks]]. (A lead().over(partitionBy(id))
    * formulation would shuffle+sort the whole exploded token stream just to
    * assemble windows that are a per-row computation.) The ONE shuffle is
    * the count aggregation, with map-side partial combine, so exchange
    * volume is bounded by distinct n-grams per partition.
    */
  def ngramFrequencies(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, "n must be >= 2 (use tokenFrequencies for unigrams)")
    import org.apache.spark.sql.functions.{size => arrayLen}
    df.select(text.tokens(col(textCol)).as("__toks"))
      .where(arrayLen(col("__toks")) >= n)
      .select(col("__toks"),
        posexplode(sequence(lit(0), arrayLen(col("__toks")) - n, lit(1)))
          .as(Seq("__i", "__start")))
      .select(concat_ws(" ",
        slice(col("__toks"), col("__start") + 1, lit(n))).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group distinct-n diversity ratios (Li et al. 2016's distinct-1/
    * distinct-2, the standard repetitiveness screen for synthetic and
    * model-generated corpora): for each `n` in `ns`,
    * `(groupCols..., n, n_total, n_distinct, distinct_ratio)` where
    * `distinct_ratio = n_distinct / n_total` (6-dp per-row double). A
    * template-stamped source shows a collapsing distinct-2 long before a
    * human reads it.
    *
    * Scale: one branch per requested `n` (each a row-local window build —
    * the [[ngramFrequencies]] argument), unioned into ONE two-level
    * aggregation: (group, n, gram) counts with map-side combine, then the
    * #groups x #ns summary. The gram-level exchange is vocabulary-bounded
    * per group — the exact metric's floor; when only an estimate is
    * needed at 100 TB, [[Sketches.kmvDistinctCount]]/[[Sketches.hllRegisters]]
    * bound the distinct side instead.
    */
  def distinctNgramRatios(
      df: DataFrame, groupCols: Seq[String], textCol: String,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be non-empty, all >= 1")
    require(ns.distinct == ns, "ns must be distinct")
    import org.apache.spark.sql.functions.{size => arrayLen}
    val toks = df.select(groupCols.map(col) :+
      text.tokens(col(textCol)).as("__toks"): _*)
    val grams = ns.map { n =>
      val base = toks.where(arrayLen(col("__toks")) >= n)
      val g =
        if (n == 1) base.select(groupCols.map(col) :+
          explode(col("__toks")).as("g"): _*)
        else base
          .select(groupCols.map(col) :+ col("__toks") :+
            posexplode(sequence(lit(0), arrayLen(col("__toks")) - n, lit(1)))
              .as(Seq("__i", "__start")): _*)
          .select(groupCols.map(col) :+ concat_ws(" ",
            slice(col("__toks"), col("__start") + 1, lit(n))).as("g"): _*)
      g.withColumn("n", lit(n))
    }.reduce(_ unionByName _)
    grams
      .groupBy(groupCols.map(col) ++ Seq(col("n"), col("g")): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(groupCols.map(col) :+ col("n"): _*)
      .agg(sum(col("__c")).as("n_total"), count(lit(1)).as("n_distinct"))
      .withColumn("distinct_ratio", round(col("n_distinct") / col("n_total"), 6))
  }

  /** The `k` most frequent word n-grams, deterministically ordered. */
  def topNgrams(df: DataFrame, idCol: String, textCol: String, n: Int, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    ngramFrequencies(df, idCol, textCol, n).orderBy(col("n").desc, col("ngram")).limit(k)
  }

  /** Per-document vocabulary coverage — the tokenizer-fit metric corpus
    * selection runs before committing to a vocab: `(idCol, n_tokens,
    * n_oov)` counting token OCCURRENCES outside `vocab` (a one-column
    * `token` frame, e.g. [[topTokens]] output). Zero-token documents
    * report (0, 0).
    *
    * Scale: one explode + equi-join against the vocab (broadcast when
    * small — the typical 30-250k-entry tokenizer vocab) + one map-side-
    * combinable per-document count; never an interpreted per-token
    * `array_contains` scan (O(tokens x vocab) per row).
    */
  def oovStats(
      df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    require(vocab.columns.contains("token"),
      "vocab must have a 'token' column (topTokens output shape)")
    val inVocab = vocab.select(col("token"), lit(true).as("__in")).distinct()
    df.select(col(idCol), explode_outer(text.tokens(col(textCol))).as("token"))
      .join(broadcast(inVocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(col("token")).as("n_tokens"),
        count(when(col("token").isNotNull && col("__in").isNull, 1)).as("n_oov"))
  }

  /** Inverted index: per token, its document frequency and a posting list of
    * the first `maxPostings` doc ids (ascending) as a comma-joined string —
    * the retrieval-side artifact a corpus pipeline materializes for
    * contamination lookups and term-level debugging.
    *
    * Scale: (doc, token) pairs are deduplicated in one shuffle with partial
    * aggregation; the per-token phase then aggregates with a BOUNDED
    * accumulator — [[graft.expressions.BottomKAgg]]'s k-minimum-values
    * buffer — so a stopword's posting list costs O(maxPostings) state and
    * shuffle, never its full document set (collect_set would OOM on the
    * head of the Zipf curve at corpus scale). Ids must be non-negative
    * (ascending-k = first-k needs the sign-free order).
    */
  def postingLists(
      df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L, maxPostings: Int = 100): DataFrame = {
    require(maxPostings > 0, "maxPostings must be positive")
    val pairs = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(text.tokens(col(textCol))).as("token"))
      .distinct()
    pairs.groupBy(col("token"))
      .agg(count(lit(1)).as("df_docs"),
        graft.expressions.BottomKAgg.bottomKHashes(col("doc_id"), maxPostings)
          .as("__bk"))
      .where(col("df_docs") >= minDf)
      .select(col("token"), col("df_docs"),
        array_join(col("__bk").cast("array<string>"), ",").as("postings"))
  }

  /** Per-document top-`k` characteristic terms by tf-idf. The idf factor is
    * the RATIONAL form `(nDocs + 1) / (df + 1)` rather than its logarithm:
    * log is monotone, so the per-document RANKING is identical, and the
    * score stays exactly reproducible in any SQL engine (`ln` is libm-
    * dependent in its last ulp; a×b/c over doubles is IEEE-bit-identical).
    * Score is rounded to 6 dp; ties break on token ascending.
    *
    * `nDocs` is caller-supplied (one bounded scalar — typically
    * `df.count()`) so the operator stays a pure plan. Scale: tf and df are
    * each one map-side-combinable shuffle on token; the per-document top-k
    * window partitions by document — no global sort anywhere.
    */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String, nDocs: Long, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(nDocs > 0, "nDocs must be positive")
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol), explode(text.tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // df as a COUNT WINDOW over the token partition of tf (the bm25Search
    // formulation): the corpus is tokenized once and tf is consumed once —
    // the previous tf-groupBy-join shape recomputed the tokenize+tf pass
    // for each join side (Catalyst shares no common subtrees), which was
    // q79's 2x. An unordered count window sorts nothing.
    val wdf = Window.partitionBy(col("token"))
    val scored = tf.withColumn("df", count(lit(1)).over(wdf))
      .withColumn("score",
        round(col("tf") * (lit(nDocs.toDouble) + 1.0) / (col("df") + lit(1.0)), 6))
    // per-doc ranking on the GroupTopK heap: <= k rows per (doc,
    // partition) reach the exchange, no per-doc window sort
    graft.plans.GroupTopK(
      scored.select(col(idCol), col("token"), col("score")),
      Seq(idCol), Seq(("score", false), ("token", true)), k)
      .select(col(idCol), col("rnk"), col("token"), col("score"))
  }

  /** BM25 ranked retrieval (Robertson & Walker 1994) of the top `k`
    * documents per query: `(queryId, rnk, docId, score)` with
    * `score = sum over matching terms of idf_t * tf*(k1+1) /
    * (tf + k1*(1 - b + b*dl/avgdl))`.
    *
    * Reproducibility contract (the [[tfidfTopTerms]] idf argument, extended
    * to a SUM): the idf factor is the RATIONAL `(nDocs + 1) / (df + 0.5)`
    * rather than its logarithm — `ln` is libm-dependent in its last ulp,
    * and unlike the single-term tf-idf rank, a SUM of logs is not
    * monotone-recoverable — so each per-term score is pure per-row IEEE
    * double arithmetic (bit-identical in any engine), rounded to 6 dp, and
    * the per-document total is a DECIMAL sum of those rounded terms (exact,
    * merge-order-independent — the house dsum convention). Sample membership,
    * every score and every rank therefore hash-match the SQL replay (q182).
    * Rational idf weights rare terms more steeply than the log form — a
    * documented scoring variant, not an approximation of it.
    *
    * Scale: `dl` is row-local (`size(tokens)` before any shuffle — never a
    * per-doc re-aggregation), and the token stream is restricted by the
    * broadcast query-term set BEFORE any aggregation — the corpus is
    * scanned ONCE and no full-vocabulary tf/df shuffle ever exists: every
    * exchange carries only rows matching some query term. df comes from a
    * count window over the restricted tf (partitioned by token — bounded
    * by the match set; a stopword-heavy query is the skew case and belongs
    * behind a stopword filter). Per-query ranking runs on the
    * [[graft.plans.GroupTopK]] heap (each query one hot group, <= k rows
    * per (query, partition) on the exchange), never a window sort.
    * `nDocs`/`dlSum` are caller-supplied bounded scalars (typically one
    * row-local count/sum aggregation) so the operator stays a pure plan.
    */
  def bm25Search(
      docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      nDocs: Long, dlSum: Long, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    require(nDocs > 0 && dlSum > 0, "nDocs and dlSum must be positive")
    require(k1 > 0 && b >= 0 && b <= 1, "need k1 > 0 and b in [0, 1]")
    val toks = text.tokens(col(textCol))
    // dl rides the explode as a row-local column — computed once per doc
    // BEFORE the shuffle, never re-aggregated from the token pairs
    val tok = docs.select(col(idCol).as("doc_id"),
      size(toks).cast("long").as("dl"), explode(toks).as("token"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(text.tokens(col(queryTextCol))).as("token")).distinct()
    val qtokens = qterms.select("token").distinct()
    // restrict BEFORE aggregating: one corpus scan, and every exchange
    // from here on carries only rows matching some query term — a full-
    // vocabulary tf or df shuffle never exists in the plan
    val tf = tok.join(broadcast(qtokens), "token")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // df = how many docs carry the term = a count window over the
    // restricted tf (one row per (doc, term) already) — no second branch
    // re-reading the corpus
    val wdf = org.apache.spark.sql.expressions.Window.partitionBy(col("token"))
    val cand = tf.withColumn("df", count(lit(1)).over(wdf))
      .join(broadcast(qterms), "token")
    // per-term score: all per-row IEEE double ops (bit-identical in any
    // engine), rounded to 6 dp; the sum routes through DECIMAL so the
    // total is exact and merge-order-independent
    val idf = (lit(nDocs.toDouble) + 1.0) / (col("df") + lit(0.5))
    val sat = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") * lit(nDocs.toDouble) / lit(dlSum.toDouble)))
    val scored = cand
      .withColumn("__term_score", round(idf * sat, 6).cast("decimal(18,6)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__term_score")).cast("double").as("score"))
    graft.plans.GroupTopK(scored, Seq("query_id"),
        Seq("score" -> false, "doc_id" -> true), k, "rnk")
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("score"))
  }

  /** Token co-occurrence association within a ±`window` token distance —
    * the skip-gram pair counts embedding training consumes, reported with
    * LIFT instead of PMI (no logarithm, so counts, totals and the ratio
    * are all engine-exact): `lift = (n_ab/W) / ((n_a/U)(n_b/U))` with `W`
    * total pairs and `U` total tokens. Returns the `topK` unordered pairs
    * by count: `(t_a, t_b, n_ab, lift)`, lift rounded to 6 dp.
    *
    * Pair generation is ROW-LOCAL (position explode + `element_at` at
    * fixed offsets — the [[ngramFrequencies]] codegen shape, no lambda,
    * no per-document window shuffle); both normalizers are sums over the
    * ALREADY-AGGREGATED tiny frames (pair counts / unigram counts), so
    * nothing rescans the corpus. The division tree is fixed and per-row,
    * never an integer product that could overflow at corpus scale.
    */
  def cooccurrenceLift(
      df: DataFrame, textCol: String, window: Int = 3,
      topK: Int = 20): DataFrame = {
    require(window >= 1, "window must be at least 1")
    require(topK >= 1, "topK must be at least 1")
    val base = df.where(col(textCol).isNotNull)
      .select(text.tokens(col(textCol)).as("__toks"))
    val pos = base.select(col("__toks"),
      posexplode(col("__toks")).as(Seq("__p", "a")))
    val partners = (1 to window).map(j =>
      try_element_at(col("__toks"), col("__p") + 1 + j)) // null past the end (ANSI-safe)
    val pairs = pos.select(col("a"), explode(array(partners: _*)).as("b"))
      .where(col("b").isNotNull)
      .select(least(col("a"), col("b")).as("t_a"),
        greatest(col("a"), col("b")).as("t_b"))
    val counts = pairs.groupBy(col("t_a"), col("t_b"))
      .agg(count(lit(1)).as("n_ab"))
    val uni = base.select(explode(col("__toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("__n"))
    val w = counts.agg(sum(col("n_ab")).as("__W"))
    val u = uni.agg(sum(col("__n")).as("__U"))
    counts
      .join(uni.select(col("t").as("t_a"), col("__n").as("__na")), Seq("t_a"))
      .join(uni.select(col("t").as("t_b"), col("__n").as("__nb")), Seq("t_b"))
      .crossJoin(broadcast(w)).crossJoin(broadcast(u))
      .select(col("t_a"), col("t_b"), col("n_ab"),
        round((col("n_ab").cast("double") / col("__W")) /
          ((col("__na").cast("double") / col("__U")) *
            (col("__nb").cast("double") / col("__U"))), 6).as("lift"))
      .orderBy(col("n_ab").desc, col("t_a"), col("t_b"))
      .limit(topK)
  }
}
