package graft.expressions

import org.scalacheck.{Gen, Prop, Properties}

/** Pure ScalaCheck properties for the unigram-LM Viterbi kernel — the
  * table and [[UnigramRuntime.encodeWord]] driven directly (no Spark
  * session). The anchor property checks the kernel against a brute-force
  * enumeration of EVERY segmentation: optimality is the whole contract,
  * so it is tested as such rather than through examples.
  */
object UnigramProps extends Properties("UnigramRuntime") {

  private val S = UnigramRuntime.TokenScale

  private def table(vocab: Seq[(String, Long)], unkCost: Long): UnigramTable = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, c) => m.putIfAbsent(p, c * S + 1) }
    new UnigramTable(m, "<unk>", unkCost * S + 1, 1000, maxMemoEntries = 0)
  }

  // small alphabet so random words actually hit random vocab pieces
  private val pieceGen: Gen[(String, Long)] = for {
    n <- Gen.choose(1, 3)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    cost <- Gen.choose(0L, 50L)
  } yield (cs.mkString, cost)
  private val vocabGen: Gen[Seq[(String, Long)]] =
    Gen.nonEmptyListOf(pieceGen).map(_.distinctBy(_._1))
  private val wordGen: Gen[String] =
    Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val unkGen: Gen[Long] = Gen.choose(0L, 100L)

  /** All segmentations of `w`, scored like the kernel: vocab pieces at
    * `cost * S + 1`, unknown SINGLE chars at `unkComp`, multi-char
    * non-pieces infeasible.
    */
  private def bruteMin(
      w: String, vocab: Map[String, Long], unkCost: Long): Long = {
    def rec(i: Int): Seq[Long] =
      if (i == w.length) Seq(0L)
      else (1 to (w.length - i)).flatMap { l =>
        val sub = w.substring(i, i + l)
        val pc = vocab.get(sub).map(_ * S + 1)
          .orElse(if (l == 1) Some(unkCost * S + 1) else None)
        pc.toSeq.flatMap(c => rec(i + l).map(c + _))
      }
    rec(0).min
  }

  property("Viterbi composite equals the brute-force minimum over ALL segmentations") =
    Prop.forAll(vocabGen, wordGen, unkGen) { (v, w, u) =>
      UnigramRuntime.encodeWord(w, table(v, u)).comp ==
        bruteMin(w, v.toMap, u)
    }

  property("emitted pieces reconstruct the word with <unk> holes of one cp") =
    Prop.forAll(vocabGen, wordGen, unkGen) { (v, w, u) =>
      val out = UnigramRuntime.encodeWord(w, table(v, u)).pieces.toSeq
      val vs = v.map(_._1).toSet
      // every piece is a vocab piece or the single-cp unk marker, and
      // substituting any single char for each <unk> restores a word of
      // the right length in the right places
      out.forall(p => p == "<unk>" || vs.contains(p)) && {
        var i = 0
        out.forall { p =>
          val len = if (p == "<unk>") 1 else p.length
          val ok = p == "<unk>" || w.regionMatches(i, p, 0, len)
          i += len
          ok
        } && i == w.length
      }
    }

  property("composite decomposes: comp = sum(cost)*S + n_pieces") =
    Prop.forAll(vocabGen, wordGen, unkGen) { (v, w, u) =>
      val t = table(v, u)
      val e = UnigramRuntime.encodeWord(w, t)
      val vm = v.toMap
      val cost = e.pieces.map(p =>
        if (p == "<unk>") u else vm(p)).sum
      e.comp == cost * S + e.pieces.length
    }

  property("encode is deterministic") =
    Prop.forAll(vocabGen, wordGen, unkGen) { (v, w, u) =>
      val t = table(v, u)
      UnigramRuntime.encodeWord(w, t).pieces.toSeq ==
        UnigramRuntime.encodeWord(w, t).pieces.toSeq
    }

  // NOTE deliberately scoped to multi-cp pieces: a 1-cp piece is NOT
  // monotone, because a covered code point is never unk (the documented
  // SentencePiece-matching rule) — adding ("a", 50) when unkCost=3
  // forcibly reprices every bare 'a' from 3 to 50
  property("adding a MULTI-CP piece never makes the optimum WORSE") =
    Prop.forAll(vocabGen, wordGen, unkGen,
      Gen.choose(2, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
        .flatMap(p => Gen.choose(0L, 50L).map((p, _)))) { (v, w, u, extra) =>
      val base = UnigramRuntime.encodeWord(w, table(v, u)).comp
      val vv = if (v.exists(_._1 == extra._1)) v else v :+ extra
      UnigramRuntime.encodeWord(w, table(vv, u)).comp <= base
    }

  property("a covered code point is never unk — even when unk would be cheaper") =
    Prop.forAll(Gen.choose(0L, 50L), Gen.choose(0L, 50L)) { (pieceCost, u) =>
      val t = table(Seq("a" -> pieceCost), u)
      val e = UnigramRuntime.encodeWord("a", t)
      e.pieces.toSeq == Seq("a") && e.comp == pieceCost * S + 1
    }

  property("words over maxWordChars are ONE unk at unkComp") =
    Prop.forAll(vocabGen, unkGen) { (v, u) =>
      val m = new java.util.HashMap[String, java.lang.Long]()
      v.foreach { case (p, c) => m.putIfAbsent(p, c * S + 1) }
      val t = new UnigramTable(m, "<unk>", u * S + 1, 20, maxMemoEntries = 0)
      val e = UnigramRuntime.encodeWord("a" * 21, t)
      e.pieces.toSeq == Seq("<unk>") && e.comp == u * S + 1
    }
}
