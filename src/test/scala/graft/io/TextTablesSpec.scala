package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextTablesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // the gnarly cases a text dump must survive: separators, quotes, newlines,
  // unicode, empty string, null
  private def fixture = Seq(
    (1L, "plain"),
    (2L, "comma, inside"),
    (3L, "quote \" inside"),
    (4L, "both \", and\nnewline"),
    (5L, "unicode: café 日本語 😀"),
    (6L, ""),
    (7L, null)
  ).toDF("id", "text")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV round trip is lossless including quotes, newlines, unicode AND null vs empty") {
    val back = TextTables.csvRoundTrip(fixture, tmp("graft_csv_spec"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    val exp = fixture.orderBy("id").as[(Long, String)].collect().toSeq
    // the nullValue sentinel + emptyValue options keep NULL distinct from ""
    // (bare CSV collapses both into an empty field)
    assert(back == exp)
  }

  test("CSV sentinel exclusion: a literal \\N value reads back as NULL (documented); JSONL keeps it") {
    // Spark's CSV parser compares nullValue against the UNQUOTED token, so a
    // string whose value is exactly the \N sentinel cannot survive the CSV
    // round trip — the documented exclusion in csvRoundTrip's contract.
    val tricky = Seq((1L, "\\N"), (2L, null: String)).toDF("id", "text")
    val csv = TextTables.csvRoundTrip(tricky, tmp("graft_csv_sentinel"))
      .orderBy("id").collect()
    assert(csv(0).isNullAt(1) && csv(1).isNullAt(1))
    // the JSONL path has no in-band marker and round-trips it losslessly
    val jsonl = TextTables.jsonlRoundTrip(tricky, tmp("graft_jsonl_sentinel"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(jsonl == Seq((1L, "\\N"), (2L, null)))
  }

  test("JSONL round trip is lossless including null vs empty string") {
    val back = TextTables.jsonlRoundTrip(fixture, tmp("graft_jsonl_spec"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    val exp = fixture.orderBy("id").as[(Long, String)].collect().toSeq
    assert(back == exp)
  }

  test("ORC round trip is lossless: null vs empty, microsecond ts, doubles") {
    val back = TextTables.orcRoundTrip(fixture, tmp("graft_orc_spec"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    val exp = fixture.orderBy("id").as[(Long, String)].collect().toSeq
    assert(back == exp)
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:11:12.123456"), 0.1 + 0.2),
      (2L, java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999999"), math.Pi)
    ).toDF("id", "ts", "v")
    val back2 = TextTables.orcRoundTrip(df, tmp("graft_orc_ts"))
      .orderBy("id").as[(Long, java.sql.Timestamp, Double)].collect().toSeq
    val exp2 = df.orderBy("id").as[(Long, java.sql.Timestamp, Double)].collect().toSeq
    assert(back2 == exp2)
  }

  test("JSONL round trip preserves timestamps to the microsecond and doubles bit-exactly") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:11:12.123456"), 0.1 + 0.2),
      (2L, java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999999"), math.Pi)
    ).toDF("id", "ts", "v")
    val back = TextTables.jsonlRoundTrip(df, tmp("graft_jsonl_ts"))
      .orderBy("id").as[(Long, java.sql.Timestamp, Double)].collect().toSeq
    val exp = df.orderBy("id").as[(Long, java.sql.Timestamp, Double)].collect().toSeq
    assert(back == exp)
  }

  test("scratchDir is deterministic per source dir and distinct across dirs") {
    val a = TextTables.scratchDir("x", "/data/sf0.1")
    assert(a == TextTables.scratchDir("x", "/data/sf0.1"))
    assert(a != TextTables.scratchDir("x", "/data/sf0.01"))
  }
}
