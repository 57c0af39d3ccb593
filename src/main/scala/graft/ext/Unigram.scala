package graft.ext

import org.apache.spark.sql.Column

import graft.expressions.{UnigramExpressions, UnigramRuntime}

/** Unigram-LM vocabulary ingestion + encode facade — the scored-piece
  * twin of [[Bpe]] (merge lists) and [[WordPiece]] (piece lists).
  * SentencePiece unigram models export as `.vocab` TSV: one
  * `piece<TAB>score` per line, line order = token id, score a float
  * log-probability (<= 0 for real pieces). Scores are scaled to exact
  * integers at ingestion so both engines (the native kernel and the SQL
  * oracle replay) do identical integer arithmetic — the [[Dsir]]
  * fixed-point pattern.
  */
object Unigram {

  /** Parse a SentencePiece-style `.vocab` TSV into scored pieces:
    * `cost = round(-score * scale)` (log-probs are <= 0, so costs are
    * >= 0; a larger cost = a less likely piece). Lines without a TAB,
    * blank lines, unparseable scores, or costs outside `[0, 2^20)` fail
    * LOUDLY — a silently skipped line would shift token ids and
    * mis-score every document after it (the merges.txt/vocab.txt
    * contract). Control-symbol rows (score 0 placeholders like `<s>`)
    * parse fine and simply never match inside whitespace-free words.
    */
  def parseVocabTsv(lines: IterableOnce[String], scale: Double = 100.0): Seq[(String, Long)] =
    lines.iterator.zipWithIndex.map { case (raw, ln) =>
      val line = raw.stripLineEnd
      val tab = line.indexOf('\t')
      if (tab <= 0) throw new IllegalArgumentException(
        s".vocab line ${ln + 1} is not piece<TAB>score: '$line'")
      val piece = line.substring(0, tab)
      val score =
        try line.substring(tab + 1).trim.toDouble
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s".vocab line ${ln + 1} has a non-numeric score: '$line'")
        }
      val cost = math.round(-score * scale)
      if (cost < 0 || cost >= UnigramRuntime.TokenScale)
        throw new IllegalArgumentException(
          s".vocab line ${ln + 1}: scaled cost $cost outside [0, 2^20) — " +
            "lower `scale` or fix the score")
      (piece, cost)
    }.toSeq

  /** [[parseVocabTsv]] over a file path. */
  def readVocabFile(path: String, scale: Double = 100.0): Seq[(String, Long)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseVocabTsv(src.getLines(), scale) finally src.close()
  }

  /** Viterbi-optimal unigram token array under the scored `vocab` — feed
    * to `Packing.materializeBlocks` / `slidingChunks` exactly like
    * [[Bpe.tokens]] / [[WordPiece.tokens]].
    */
  def tokens(c: Column, vocab: Seq[(String, Long)],
      unk: String = "<unk>", unkCost: Long = 1L << 19): Column =
    UnigramExpressions.unigramTokens(c, vocab, unk, unkCost)

  /** Exact `struct<n_tokens, cost>` under the scored `vocab`;
    * `stats(...)("n_tokens")` is the count column for `Packing.concatChunk`,
    * `Mixtures` weights and budget selection — the third token currency.
    */
  def stats(c: Column, vocab: Seq[(String, Long)],
      unk: String = "<unk>", unkCost: Long = 1L << 19): Column =
    UnigramExpressions.unigramStats(c, vocab, unk, unkCost)

  /** The count alone (`int`) — the pluggable-counter shape
    * [[Report.dataCard]] and the allocators take.
    */
  def tokenCount(c: Column, vocab: Seq[(String, Long)],
      unk: String = "<unk>", unkCost: Long = 1L << 19): Column =
    UnigramExpressions.unigramStats(c, vocab, unk, unkCost)
      .getField("n_tokens")
}
