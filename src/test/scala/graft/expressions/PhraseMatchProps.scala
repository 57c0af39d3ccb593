package graft.expressions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Pure ScalaCheck properties for the Aho-Corasick kernel — the anchor is
  * equivalence with naive per-phrase `contains` over random texts and
  * blocklists (the small alphabet forces heavy overlap, dense fail
  * links, and shared prefixes).
  */
object PhraseMatchProps extends Properties("PhraseMatchRuntime") {

  private val phraseGen: Gen[String] =
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val blocklistGen: Gen[Seq[String]] =
    Gen.nonEmptyListOf(phraseGen).map(_.distinct)
  private val textGen: Gen[String] =
    Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))

  private def ac(text: String, phrases: Seq[String]): Int =
    PhraseMatchRuntime.phraseHits(
      UTF8String.fromString(text), new PhraseTrie(phrases))

  property("equals naive contains over every phrase") =
    Prop.forAll(blocklistGen, textGen) { (ps, t) =>
      ac(t, ps) == ps.count(t.contains(_))
    }

  property("monotone: appending text never loses a hit") =
    Prop.forAll(blocklistGen, textGen, textGen) { (ps, t1, t2) =>
      ac(t1 + t2, ps) >= math.max(ac(t1, ps), ac(t2, ps))
    }

  property("concatenating all phrases hits every phrase") =
    Prop.forAll(blocklistGen) { ps =>
      ac(ps.mkString(""), ps) == ps.length
    }
}
