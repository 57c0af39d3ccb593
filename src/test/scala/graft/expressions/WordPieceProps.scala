package graft.expressions

import org.scalacheck.{Gen, Prop, Properties}

/** Pure ScalaCheck properties for the WordPiece kernel — the table and
  * [[WordPieceRuntime.encodeWord]] driven directly (no Spark session), so
  * hundreds of cases run in milliseconds.
  */
object WordPieceProps extends Properties("WordPieceRuntime") {

  private val unk = "[UNK]"

  private def table(vocab: Seq[String], maxWordChars: Int = 100): WordPieceTable = {
    val set = new java.util.HashSet[String]()
    vocab.foreach(set.add)
    new WordPieceTable(set, unk, maxWordChars, maxMemoEntries = 0)
  }

  // small alphabet so random words actually hit random vocab pieces
  private val piece: Gen[String] =
    Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val vocabGen: Gen[Seq[String]] = for {
    roots <- Gen.nonEmptyListOf(piece)
    conts <- Gen.listOf(piece.map("##" + _))
  } yield (roots ++ conts).distinct
  private val wordGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  property("encode is deterministic") =
    Prop.forAll(vocabGen, wordGen) { (v, w) =>
      val t = table(v)
      WordPieceRuntime.encodeWord(w, t).toSeq ==
        WordPieceRuntime.encodeWord(w, t).toSeq
    }

  property("non-UNK encodings reconstruct the word exactly") =
    Prop.forAll(vocabGen, wordGen) { (v, w) =>
      val out = WordPieceRuntime.encodeWord(w, table(v)).toSeq
      out == Seq(unk) || {
        val rebuilt = out.head +: out.tail.map(_.stripPrefix("##"))
        rebuilt.mkString == w
      }
    }

  property("every emitted piece is in the vocab (or the single [UNK])") =
    Prop.forAll(vocabGen, wordGen) { (v, w) =>
      val out = WordPieceRuntime.encodeWord(w, table(v)).toSeq
      out == Seq(unk) || out.forall(v.contains)
    }

  property("continuation rule: only the first piece lacks the ## prefix") =
    Prop.forAll(vocabGen, wordGen) { (v, w) =>
      val out = WordPieceRuntime.encodeWord(w, table(v)).toSeq
      out == Seq(unk) || out.tail.forall(_.startsWith("##")) ||
        // a tail piece without ## can only be a literal vocab word start —
        // impossible here because continuations always get the prefix
        false
    }

  property("greedy: the first piece is the LONGEST matching vocab prefix") =
    Prop.forAll(vocabGen, wordGen) { (v, w) =>
      val out = WordPieceRuntime.encodeWord(w, table(v)).toSeq
      out == Seq(unk) || {
        val first = out.head
        val longer = v.filter(p => !p.startsWith("##") &&
          p.length > first.length && w.startsWith(p))
        longer.isEmpty
      }
    }

  property("words over maxWordChars code points are [UNK]") =
    Prop.forAll(vocabGen) { v =>
      val w = "a" * 21
      WordPieceRuntime.encodeWord(w, table(v, maxWordChars = 20)).toSeq ==
        Seq(unk)
    }
}
