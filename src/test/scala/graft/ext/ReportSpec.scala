package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ReportSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dataCard: volume, quality and CORPUS-WIDE duplicate membership per group") {
    // a 25-token stopword-bearing text passes the gopher rules at
    // minStopwords=1; the duplicated text spans BOTH sources, which is
    // exactly what a per-source card must surface
    val good = "the quick brown fox jumps over the lazy dog and then " +
      "walks back home with a very calm and entirely unhurried little stride today"
    val d = Seq(
      ("web", 1L, good),
      ("web", 2L, good),              // dup within web
      ("books", 3L, good),            // dup ACROSS sources
      ("books", 4L, "short junk 123") // fails quality, unique
    ).toDF("source", "doc_id", "text")
    val card = Report.dataCard(d, Seq("source"), "text")
      .orderBy("source").as[(String, Long, Long, Long, Long)].collect().toSeq
    val nTok = good.split("\\s+").length.toLong
    assert(card == Seq(
      ("books", 2L, nTok + 3L, 1L, 1L),
      ("web", 2L, 2 * nTok, 2L, 2L)), s"got $card")
  }

  test("dataCard requires group columns") {
    val d = Seq(("a", "x")).toDF("source", "text")
    intercept[IllegalArgumentException] {
      Report.dataCard(d, Nil, "text")
    }
  }
}
