package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.expressions.GramHashExpressions.{CharNgramHashSet, WordShingleHashSet}

/** Pure ScalaCheck properties for the native shingling expressions —
  * evaluated directly (no Spark session), so hundreds of cases run in
  * milliseconds.
  */
object GramHashProps extends Properties("GramHashExpressions") {

  private def evalChar(s: String, n: Int): Seq[Long] =
    CharNgramHashSet(Literal(UTF8String.fromString(s)), n)
      .nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[ArrayData].toLongArray().toSeq

  private def evalWord(s: String, k: Int): Seq[Long] =
    WordShingleHashSet(Literal(UTF8String.fromString(s)), k)
      .nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[ArrayData].toLongArray().toSeq

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.oneOf(".,!?;")))
      .map(_.mkString)

  property("char: output is sorted and distinct") = Prop.forAll(asciiText) { s =>
    val out = evalChar(s, 5)
    out == out.sorted && out.distinct == out
  }

  property("char: deterministic") = Prop.forAll(asciiText) { s =>
    evalChar(s, 4) == evalChar(s, 4)
  }

  property("char: set size bounded by window count") = Prop.forAll(asciiText) { s =>
    val b = s.getBytes("UTF-8").length
    evalChar(s, 3).size <= math.max(1, b - 2)
  }

  property("char: substring containment implies subset (long text)") =
    Prop.forAll(asciiText.suchThat(_.getBytes("UTF-8").length > 8)) { s =>
      val whole = evalChar(s + s, 4).toSet
      evalChar(s, 4).forall(whole.contains) // every gram of s appears in s+s
    }

  property("word: case-insensitive") = Prop.forAll(asciiText) { s =>
    evalWord(s.toLowerCase, 2) == evalWord(s.toUpperCase, 2)
  }

  property("word: whitespace amount is irrelevant") = Prop.forAll(
    Gen.listOfN(6, Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
    val once = evalWord(words.mkString(" "), 3)
    val padded = evalWord(words.mkString("   "), 3)
    once == padded
  }

  property("word: punctuation-only text yields empty set") = Prop.forAll(
    Gen.listOf(Gen.oneOf(".,;:!? ".toSeq)).map(_.mkString)) { s =>
    evalWord(s, 3).isEmpty
  }

  property("word: k=1 equals distinct token hashes (order-free)") = Prop.forAll(
    Gen.listOfN(8, Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
    evalWord(words.mkString(" "), 1).toSet ==
      evalWord(words.reverse.mkString(" "), 1).toSet
  }
}
