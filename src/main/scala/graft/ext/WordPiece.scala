package graft.ext

import org.apache.spark.sql.Column

import graft.expressions.WordPieceExpressions

/** WordPiece vocabulary ingestion + encode facade — the piece-list twin
  * of [[Bpe]] (merge lists). Published BERT-style vocabularies ship as
  * `vocab.txt`: ONE piece per line, line order = token id, no comment or
  * header lines — every line including `#`-prefixed ones is data (the
  * same trap [[Bpe.parseMergesText]] documents for merges.txt).
  */
object WordPiece {

  /** Parse a published `vocab.txt`. Blank lines are rejected, not
    * skipped: a blank line in a real vocab would silently shift every
    * token id after it, so it fails loudly (the merges.txt contract).
    */
  def parseVocabText(lines: IterableOnce[String]): Seq[String] =
    lines.iterator.zipWithIndex.map { case (raw, ln) =>
      val line = raw.stripLineEnd
      if (line.isEmpty) throw new IllegalArgumentException(
        s"vocab.txt line ${ln + 1} is blank — ids after it would shift")
      line
    }.toSeq

  /** [[parseVocabText]] over a file path. */
  def readVocabFile(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseVocabText(src.getLines()) finally src.close()
  }

  /** WordPiece token array under `vocab` — feed to
    * `Packing.materializeBlocks` / `slidingChunks` exactly like
    * [[Bpe.tokens]].
    */
  def tokens(c: Column, vocab: Seq[String]): Column =
    WordPieceExpressions.wordpieceTokens(c, vocab)

  /** Exact WordPiece token count — feed to `Packing.concatChunk`,
    * `Mixtures` weights and budget selection exactly like
    * [[Bpe.tokenCount]].
    */
  def tokenCount(c: Column, vocab: Seq[String]): Column =
    WordPieceExpressions.wordpieceTokenCount(c, vocab)
}
