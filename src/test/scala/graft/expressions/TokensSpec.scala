package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Differential parity of the native word tokenizer against the composable
  * regex formulation it replaced (`array_remove(split(lower(c),
  * "[^\\p{L}\\p{N}_]+"), "")`): every tokens-consuming oracle replays the
  * regex form in SQL, so a boundary drift here is a silent correctness bug
  * across the BM25/shingle/drift families, not a performance one.
  */
class TokensSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",                               // split("") -> [""] -> removed -> []
    "   \t\n\f\r  ",                  // delimiters only
    "plain ascii words",
    "UPPER Mixed lower",
    "under_scores_are word_chars",
    "digits 123 mix3d 4you",
    "  leading and trailing  ",
    "punct!?;:,.(){}[]#@%&*+=|\\/\"'`~^<>-",
    "über Straße école çöğüş İstanbul ÐŽÆ", // unicode lower + letters
    "İIıi İSTANBUL",                  // Turkish dotted/dotless lowering
    "é combining ä marks", // Mn marks are delimiters
    "汉字漢字 文本 テスト ไทย",        // CJK/Thai letters (Lo)
    "emoji 😀 splits 🎉tokens",       // So symbols delimit
    "𝒜𝒷𝒸 supplementary 𝟙𝟚𝟛 plane",   // Lu/Lo + Nd beyond BMP
    "Ⅳ roman Ⅻ numerals",             // Nl letter-numbers are word chars
    "½ vulgar ¾ fractions",           // No other-numbers are word chars
    "a"," ","_","5","€","ß sharp s SS")

  test("native tokens equals the regex formulation on edge families") {
    val docs = adversarial.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "txt")
    val bad = docs.select(col("id"), col("txt"),
        graft.functions.text.tokens(col("txt")).as("got"),
        graft.functions.text.tokensComposed(col("txt")).as("expect"))
      .where(col("got") =!= col("expect"))
    assert(bad.isEmpty, s"drift:\n${bad.collect().mkString("\n")}")
  }

  test("native tokens equals the regex formulation on random unicode") {
    // deterministic pseudo-random strings drawn from a mixed alphabet that
    // covers every category class the tokenizer branches on
    val alphabet: Array[String] = Array(
      "a", "Z", "ü", "É", "ß", "İ", "0", "9", "_", " ", "\t", "\n", ".",
      ",", "!", "汉", "字", "ไ", "ท", "😀", "𝒜", "𝟙", "Ⅳ", "½", "́",
      "̈", "é", "€", "-", "'")
    val rnd = new scala.util.Random(20260818L)
    val docs = (0 until 400).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    }.toDF("id", "txt")
    val bad = docs.select(col("id"), col("txt"),
        graft.functions.text.tokens(col("txt")).as("got"),
        graft.functions.text.tokensComposed(col("txt")).as("expect"))
      .where(col("got") =!= col("expect"))
    assert(bad.isEmpty, s"drift:\n${bad.collect().mkString("\n")}")
  }

  test("null text stays null; SQL surface resolves native_tokens") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a b")).toDF("id", "txt")
    val got = df.select(graft.functions.text.tokens(col("txt")).as("t"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).isEmpty && got(1).nonEmpty)
    val viaSql = spark.sql("SELECT native_tokens('Hello 世界 _x1!')")
      .collect()(0).getSeq[String](0)
    assert(viaSql == Seq("hello", "世界", "_x1"))
  }
}
