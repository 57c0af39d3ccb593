package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.BpeExpressions

/** BPE merge-list learning + the encode facade — tokenizer-exact token
  * accounting for every token-denominated operator (packing, mixtures,
  * budgets, OOV, data cards). The reference has no text operators at all
  * (text work is delegated to `transFUN`, `R/ffsql.R:186`); this is the
  * LLM-pipeline extension's tokenizer.
  *
  * Training follows Sennrich et al. 2016 ("Neural Machine Translation of
  * Rare Words with Subword Units", arXiv:1508.07909): learn on the WORD
  * HISTOGRAM, not the token stream — identical words share one entry
  * weighted by count, so the local merge loop is O(distinct words), not
  * O(corpus). Determinism (the house contract): the histogram cut is
  * top-`maxWords` by (count desc, word asc), and each round merges the
  * pair with the highest weighted count, ties to the lexicographically
  * smallest pair — byte-identical merge lists across runs, partitionings
  * and engines.
  *
  * Scale: ONE distributed word-count aggregation (map-side combinable,
  * shuffle bounded by distinct words), a driver collect BOUNDED by
  * `maxWords` (documented cap — the DSIR model-fit pattern), then local
  * training over the histogram. Encoding is the [[BpeExpressions]] native
  * expression: the learned merges broadcast into codegen as one reference
  * object; the corpus is never re-scanned during training rounds.
  */
object Bpe {

  /** Learn `numMerges` merges from `df(textCol)`'s word histogram.
    * Pre-tokenization matches the encode contract: RE2-`\s+` split, empties
    * dropped, case-sensitive, one initial symbol per code point.
    */
  def learnMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 65536): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(maxWords > 0, "maxWords must be positive")
    // the explicit class, not \s+: Java's \s includes vertical tab \x0B,
    // the encode kernel and the RE2-replayed oracles exclude it (see
    // BpeRuntime.isWs) — the learner must split exactly like the encoder
    val hist: Array[(Array[String], Long)] = df
      .select(explode(array_remove(split(col(textCol), "[ \\t\\n\\f\\r]+"), "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords) // bounded driver collect, top slice deterministic
      .collect()
      .map { r =>
        val w = r.getString(0)
        val syms = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          val cw = Character.charCount(w.codePointAt(i))
          syms += w.substring(i, i + cw)
          i += cw
        }
        (syms.toArray, r.getLong(1))
      }
    var words = hist
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // weighted adjacent-pair counts over the histogram (every position,
      // overlapping runs included — the Sennrich convention)
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties to the lexicographically smallest pair
        val best = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += best
        words = words.map { case (syms, n) =>
          // apply the merge to all occurrences, left to right, non-overlapping
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** BPE token array column under `merges` — feed to
    * `Packing.materializeBlocks` / `slidingChunks` for tokenizer-exact
    * blocks.
    */
  def tokens(c: Column, merges: Seq[(String, String)]): Column =
    BpeExpressions.bpeTokens(c, merges)

  /** Exact BPE token count column under `merges` — feed to
    * `Packing.concatChunk`, `Mixtures` weights and budget selection.
    */
  def tokenCount(c: Column, merges: Seq[(String, String)]): Column =
    BpeExpressions.bpeTokenCount(c, merges)

  /** Parse a published `merges.txt` (the GPT-2 / HuggingFace BPE release
    * format: optional `#version` header, one `left right` pair per line,
    * rank = line order) so real tokenizer vocabularies drop straight into
    * [[tokens]]/[[tokenCount]]. Only the leading `#version` header and
    * blank lines are non-data: `#` is a legitimate merge symbol (GPT-2's
    * own vocab contains the line `# #`, which builds the `##` token), so
    * treating every `#`-prefixed line as a comment would silently drop
    * real merges and shift the tokenization of exactly the published
    * vocabularies this function exists for. A line without exactly two
    * space-separated fields fails loudly — silently mis-splitting a vocab
    * would shift every rank after it.
    */
  def parseMergesText(lines: IterableOnce[String]): Seq[(String, String)] =
    lines.iterator.zipWithIndex.flatMap { case (raw, ln) =>
      val line = raw.stripLineEnd
      if (line.isEmpty || (ln == 0 && line.startsWith("#version"))) None
      else line.split(" ", -1) match {
        case Array(l, r) if l.nonEmpty && r.nonEmpty => Some((l, r))
        case _ => throw new IllegalArgumentException(
          s"merges.txt line ${ln + 1} is not 'left right': '$line'")
      }
    }.toSeq

  /** [[parseMergesText]] over a file path. */
  def readMergesFile(path: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseMergesText(src.getLines()) finally src.close()
  }
}
