package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Differential parity of the native portable-gram set kernels against the
  * composable SQL formulation they replaced (explode(sequence) + concat_ws/
  * substr + md5 + conv + collect_set): the md5-prefix values feed every
  * portable dedup oracle, so a drift here is a silent correctness bug, not
  * a performance one.
  */
class PortableGramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",                        // zero tokens -> md5("") single gram
    "   \t\n\f\r  ",     // java-\s only
    "one",                     // below k
    "two tokens",
    "exactly three word tokens here no wait five",
    "ÜBER Straße ÉCOLE çöğüş İstanbul", // unicode lower() paths
    "汉字漢字文本重复片段测试", // unspaced CJK
    "mixed 汉字 and words",
    "emoji 😀😀🎉 text",       // surrogate pairs: code-point windows
    "a b c d e f g h i j k l m n o p",
    "dup dup dup dup dup dup", // repeated shingles -> distinct collapses
    "tab\tsep\nnewlinevt\fff\rcr ws")

  private def docs = adversarial.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc", "txt")

  test("portableWordShingleSet equals the composable formulation") {
    for (k <- Seq(1, 3, 5)) {
      val toks = graft.functions.text.tokens(col("txt"))
      val base = docs.select(col("doc"), toks.as("__toks"))
      val shingled = base.where(size(col("__toks")) >= k)
        .select(col("doc"), col("__toks"),
          explode(sequence(lit(0), size(col("__toks")) - k)).as("__st"))
        .select(col("doc"), concat_ws(" ",
          slice(col("__toks"), col("__st") + 1, lit(k))).as("g"))
      val shorts = base.where(size(col("__toks")) < k)
        .select(col("doc"), array_join(col("__toks"), " ").as("g"))
      val ref = shingled.unionByName(shorts)
        .select(col("doc"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
        .groupBy(col("doc"))
        .agg(sort_array(collect_set(col("h"))).as("expect"))
      val got = docs.select(col("doc"),
        PortableGram.portableWordShingleSet(
          graft.functions.text.tokens(col("txt")), k).as("got"))
      val bad = got.join(ref, Seq("doc"))
        .where(col("got") =!= col("expect"))
      assert(bad.isEmpty, s"k=$k drift:\n${bad.collect().mkString("\n")}")
    }
  }

  test("portableCharGramSet equals the composable formulation") {
    for (n <- Seq(1, 2, 5)) {
      val ref = docs
        .select(col("doc"),
          regexp_replace(lower(col("txt")), "\\s+", "").as("__norm"))
        .select(col("doc"), col("__norm"),
          explode(sequence(lit(1),
            greatest(length(col("__norm")) - (n - 1), lit(1)))).as("__st"))
        .select(col("doc"),
          col("__norm").substr(col("__st"), lit(n)).as("g"))
        .select(col("doc"),
          conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
        .groupBy(col("doc"))
        .agg(sort_array(collect_set(col("h"))).as("expect"))
      val got = docs.select(col("doc"),
        PortableGram.portableCharGramSet(col("txt"), n).as("got"))
      val bad = got.join(ref, Seq("doc"))
        .where(col("got") =!= col("expect"))
      assert(bad.isEmpty, s"n=$n drift:\n${bad.collect().mkString("\n")}")
    }
  }

  test("null text yields null set (callers filter isNotNull first)") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("a b c")))
      .toDF("doc", "txt")
      .select(PortableGram.portableCharGramSet(col("txt"), 3).as("c"),
        PortableGram.portableWordShingleSet(
          graft.functions.text.tokens(col("txt")), 3).as("w"))
    // tokens(null) is null, so both kernels see null input on row 1
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(0) && !rows(1).isNullAt(1))
  }
}
