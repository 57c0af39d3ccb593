package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must be reachable from SQL text (the reference's
  * user surface is SQL strings) — GraftExtensions registers them in the
  * session function registry.
  */
class ExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("native functions resolve in SQL text") {
    val r = spark.sql("""
      SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
             simhash64('hello world') AS sh,
             size(char_ngram_hash_set('abcdefgh', 3)) AS ng,
             size(word_shingle_hash_set('a b c d', 2)) AS ws,
             ewma_half_scan(array(4.0D, 2.0D, 5.0D)) AS ew""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 6)
    assert(r.getInt(3) == 3)
    assert(r.getSeq[Double](4) == Seq(4.0, 3.0, 4.0))
  }

  test("column-composition macros resolve in SQL text") {
    val r = spark.sql("""
      SELECT scrub_pii('see https://x.example/a or a@b.example now') AS sc,
             token_count('one two  three') AS tc,
             quality_score('a plain sentence with several common words in it') AS q,
             lang_id('the cat and the dog are in the house') AS l""").head()
    assert(r.getString(0) == "see <URL> or <EMAIL> now")
    assert(r.getInt(1) == 3)
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    assert(r.getString(3) == "en")
  }

  test("DESCRIBE FUNCTION surfaces the registered usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_similarity")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("cosine_similarity(a, b)"), s"usage missing in:\n$desc")
  }

  test("ewma_half_scan rejects wrong element types and null elements loudly") {
    // array<int> must fail ANALYSIS (reading int slots as doubles would
    // return garbage silently), not produce garbage
    val te = intercept[Exception] {
      spark.sql("SELECT ewma_half_scan(array(1, 2, 3))").head()
    }
    assert(te.getMessage.contains("ARRAY<DOUBLE>"), te.getMessage)
    // a null ELEMENT has no recursion state — loud failure, no fabrication
    val ne = intercept[Exception] {
      spark.sql(
        "SELECT ewma_half_scan(array(1.0D, CAST(NULL AS DOUBLE)))").head()
    }
    assert(ne.getMessage.contains("null element") ||
      Option(ne.getCause).exists(_.getMessage.contains("null element")),
      s"unexpected error: ${ne.getMessage}")
  }

  test("non-literal n is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT char_ngram_hash_set('abc', length('xy'))").head()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
