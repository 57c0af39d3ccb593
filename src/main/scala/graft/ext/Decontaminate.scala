package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that overlap an
  * evaluation/benchmark set — the standard guard against test-set leakage in
  * pretraining corpora (the n-gram-overlap rule popularized by the GPT-3 and
  * PaLM dataset reports: a document is contaminated if it shares any long
  * word n-gram with a benchmark example).
  *
  * Scale design: the benchmark side collapses to a DISTINCT shingle-hash set
  * (its size is bounded by the benchmark corpus, millions of grams, not the
  * 100 TB training corpus) and is broadcast when small; the training side
  * streams through one explode + equi-join + anti-join — no all-pairs stage
  * anywhere. Shingles are the same native single-pass hashed word n-grams
  * the dedup family uses ([[graft.expressions.GramHashExpressions]]), so the
  * scan stays one pass per document.
  */
object Decontaminate {

  private def shingles(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(col(idCol),
      graft.expressions.GramHashExpressions
        .wordShingleHashSet(col(textCol), n).as("sh"))

  /** Per-document contamination evidence: `(idCol, n_hits)` for every
    * training document sharing at least one word-`n`-shingle with the
    * benchmark (`n_hits` = number of DISTINCT shared shingles). Documents
    * with no overlap are absent.
    *
    * `broadcastBenchmark` should stay true while the benchmark's distinct
    * gram set fits comfortably in executor memory (typical eval suites);
    * flip it off for giant holdout corpora and the join degrades gracefully
    * to a shuffled equi-join on the gram hash.
    */
  def contaminationHits(
      docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13,
      broadcastBenchmark: Boolean = true): DataFrame = {
    require(n > 0, "shingle length must be positive")
    val benchGrams = benchmark
      .select(graft.expressions.GramHashExpressions
        .wordShingleHashSet(col(benchTextCol), n).as("sh"))
      .select(explode(col("sh")).as("g")).distinct()
    val bench = if (broadcastBenchmark) broadcast(benchGrams) else benchGrams
    // doc-side grams come from a distinct SET per document, so count(1)
    // after the join counts distinct shared shingles without re-deduping
    shingles(docs, idCol, textCol, n)
      .select(col(idCol), explode(col("sh")).as("g"))
      .join(bench, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** SPAN-level contamination report: which benchmark EXAMPLE leaks into
    * which training document, and where — `(idCol, benchIdCol, n_spans,
    * first_start)`, one row per contaminated (document, example) pair with
    * the count of matching `n`-token window occurrences in the document and
    * the 0-based token offset of the earliest one. [[contaminationHits]]
    * answers "drop this doc?"; this answers the eval owner's question
    * "which benchmark item escaped, and show me the span". Self-pairs
    * (a benchmark doc matching its own example) are excluded.
    *
    * Uses full `n`-token windows over [[graft.functions.text.tokens]] (the
    * row-local sequence+slice build shared with the exact-substring
    * family) — documents shorter than `n` tokens produce no spans; leakage
    * of whole short texts is exact dedup's job, not a span report's.
    *
    * Scale: benchmark windows collapse to a DISTINCT (example, window) set
    * (bounded by the benchmark, broadcast when small); the training side
    * streams through the one row-local window build + equi-join; the
    * per-pair aggregation is map-side combinable. No all-pairs stage.
    */
  def contaminationSpans(
      docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 13, broadcastBenchmark: Boolean = true): DataFrame = {
    require(n >= 2, "window length must be >= 2")
    require(benchIdCol != idCol,
      s"benchIdCol must differ from idCol ('$idCol') — alias the benchmark id")
    val docWins = Dedup.windowStarts(
      Dedup.tokenized(docs, idCol, textCol), idCol, n)
    val benchWins = Dedup.windowStarts(
      Dedup.tokenized(benchmark.select(col(benchIdCol).as("__bid"),
        col(benchTextCol)), "__bid", benchTextCol), "__bid", n)
      .select(col("__bid"), col("win")).distinct()
    val bench = if (broadcastBenchmark) broadcast(benchWins) else benchWins
    docWins.join(bench, Seq("win"))
      .where(col(idCol) =!= col("__bid"))
      .groupBy(col(idCol), col("__bid").as(benchIdCol))
      .agg(count(lit(1)).as("n_spans"),
        min(col("__start")).cast("long").as("first_start"))
  }

  /** Per-document NOVELTY against a reference corpus: `(idCol, n_grams,
    * n_seen, novelty)` where `n_grams` is the document's distinct
    * word-`n`-shingle count, `n_seen` how many of those appear anywhere in
    * the reference, and `novelty = (n_grams - n_seen) / n_grams` (6-dp
    * rounded per-row double — IEEE-identical in any engine). The standard
    * question for synthetic/augmented data ("is this actually new text or
    * a re-chunk of what we already have?") and the memorization screen for
    * model-generated corpora — [[contaminationHits]]'s machinery pointed
    * at measurement instead of removal.
    *
    * Documents with no shingles (empty after tokenization) are absent from
    * the output — there is nothing to score. The reference side collapses
    * to its DISTINCT gram-hash set exactly as in [[contaminationHits]]
    * (broadcast while it fits; `broadcastReference = false` degrades to a
    * shuffled equi-join); the document side is one explode + left
    * broadcast join + map-side-combinable count — one scan per corpus, no
    * all-pairs stage.
    */
  def noveltyScores(
      docs: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, n: Int = 13,
      broadcastReference: Boolean = true): DataFrame = {
    require(n > 0, "shingle length must be positive")
    val refGrams = reference
      .select(graft.expressions.GramHashExpressions
        .wordShingleHashSet(col(refTextCol), n).as("sh"))
      .select(explode(col("sh")).as("g")).distinct()
      .withColumn("__seen", lit(1))
    val ref = if (broadcastReference) broadcast(refGrams) else refGrams
    shingles(docs, idCol, textCol, n)
      .select(col(idCol), explode(col("sh")).as("g"))
      .join(ref, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("__seen")).as("n_seen"))
      .withColumn("novelty",
        round((col("n_grams") - col("n_seen")) / col("n_grams"), 6))
  }

  /** SEMANTIC contamination screen — the embedding-space complement of the
    * n-gram hits: for every corpus vector, its nearest eval-set vector by
    * cosine and a `contaminated` flag at the ROUNDED-cosine threshold
    * (rounding first makes the cut engine-exact; the q24 convention orders
    * candidates on the raw cosine, ties on eval id). Paraphrased leakage
    * shares no 13-gram but keeps its embedding neighborhood — this is the
    * screen that catches it. Returns `(idCol, eval_id, cosine,
    * contaminated)`, one row per corpus vector.
    *
    * Scale: the eval set broadcasts (benchmarks are small — the
    * [[contaminationHits]] assumption); the corpus never shuffles except
    * the [[graft.plans.GroupTopK]] heap exchange, <= 1 row per (vector,
    * partition). No all-pairs materialization: the nested-loop scoring is
    * row-local against the broadcast block.
    */
  def semanticHits(
      corpus: DataFrame, idCol: String, vecCol: String,
      evalSet: DataFrame, evalIdCol: String, evalVecCol: String,
      tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, "tau must be in (0, 1]")
    val ev = broadcast(evalSet.select(col(evalIdCol).as("eval_id"),
      col(evalVecCol).as("__ev")))
    val scored = corpus
      .select(col(idCol), col(vecCol).as("__cv"))
      .join(ev)
      .withColumn("__cos", graft.functions.vectors.cosine(col("__cv"), col("__ev")))
      .select(col(idCol), col("eval_id"), col("__cos"))
    graft.plans.GroupTopK(scored, Seq(idCol),
        Seq(("__cos", false), ("eval_id", true)), 1, "__r")
      .select(col(idCol), col("eval_id"),
        // + 0.0 normalizes signed zero on the emitted cosine (the best
        // match of an unrelated vector can sit at -0.0; q260 convention)
        (round(col("__cos"), 6) + lit(0.0)).as("cosine"),
        (round(col("__cos"), 6) >= tau).as("contaminated"))
  }

  /** [[semanticHits]] with the eval set as LITERALS: the argmin over eval
    * vectors is one row-local struct-min expression — no join, no
    * broadcast exchange, no shuffle AT ALL — so the screen runs unchanged
    * on a STREAMING frame (stateless append) or inside any per-batch
    * pipeline. Values are identical to [[semanticHits]]: min of
    * `struct(-cosine, eval_id)` is exactly "cosine desc, eval id asc".
    * The eval set must be driver-collectable (benchmarks are small — the
    * same bound [[semanticHits]]' broadcast already assumes).
    */
  def semanticHitsLiteral(
      corpus: DataFrame, idCol: String, vecCol: String,
      evalVecs: Seq[(Long, Seq[Double])], tau: Double): DataFrame = {
    require(tau > 0 && tau <= 1, "tau must be in (0, 1]")
    require(evalVecs.nonEmpty, "eval set must be non-empty")
    val best = array_min(array(evalVecs.map { case (id, v) =>
      struct(
        (-graft.functions.vectors.cosine(col(vecCol), typedLit(v))).as("nc"),
        lit(id).as("eval_id"))
    }: _*))
    corpus
      .withColumn("__best", best)
      .select(col(idCol), col("__best").getField("eval_id").as("eval_id"),
        (round(-col("__best").getField("nc"), 6) + lit(0.0)).as("cosine"))
      .withColumn("contaminated", col("cosine") >= tau)
  }

  /** Survivors: training documents sharing fewer than `minHits` distinct
    * word-`n`-shingles with the benchmark set (default: any single shared
    * shingle contaminates).
    */
  def apply(
      docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13,
      minHits: Long = 1L, broadcastBenchmark: Boolean = true): DataFrame = {
    val hits = contaminationHits(docs, idCol, textCol, benchmark, benchTextCol,
      n, broadcastBenchmark)
    docs.join(hits.where(col("n_hits") >= minHits).select(col(idCol)),
      Seq(idCol), "left_anti")
  }
}
