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
             size(word_shingle_hash_set('a b c d', 2)) AS ws""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 6)
    assert(r.getInt(3) == 3)
  }

  test("DESCRIBE FUNCTION surfaces the registered usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_similarity")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("cosine_similarity(a, b)"), s"usage missing in:\n$desc")
  }

  test("non-literal n is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT char_ngram_hash_set('abc', length('xy'))").head()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
