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
