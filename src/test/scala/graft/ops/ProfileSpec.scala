package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, None, Some(2.5)),
    (3L, Some("c"), None),
    (4L, Some("a"), Some(1.5))).toDF("id", "s", "x")

  test("one row per column with exact stats") {
    val p = Profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "c")))
    assert(p("x") == ((4L, 1L, 2L, "1.5", "2.5")))
  }

  test("column subset and validation") {
    assert(Profile(df, Seq("id")).count() == 1)
    intercept[IllegalArgumentException] { Profile(df, Seq("nope")) }
  }

  test("column names containing dots profile fine") {
    val dotted = df.withColumnRenamed("s", "a.b")
    val p = Profile(dotted, Seq("a.b")).collect().head
    assert(p.getString(0) == "a.b")
    assert(p.getLong(2) == 1L) // one null
  }
}
