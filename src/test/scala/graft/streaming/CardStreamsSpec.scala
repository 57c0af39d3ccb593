package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.Report

class CardStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // quality-mixed fixture: long clean english docs pass the gopher rules,
  // short/digit-heavy ones violate; two sources
  private def fixture = Seq(
    (1L, "the house and the cat are here with some other common words " * 4, "a"),
    (2L, "12345 67890 11111", "a"),
    (3L, "the dog was not in the house but it was near the door " * 4, "b"),
    (4L, "x", "b"),
    (5L, "the cat and the dog are friends in the house all day long " * 4, "b")
  ).toDF("doc_id", "text", "source")

  private def staged(cuts: Seq[Long]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_card_fix")
    dir.toFile.deleteOnExit()
    fixture.write.mode("overwrite").parquet(s"$dir/src")
    CorpusStreams.stageIdSlices(spark, s"$dir/src", "doc_id", cuts)
  }

  test("streamed card equals the batch card's additive columns at any cut") {
    val batch = Report.dataCard(fixture, Seq("source"), "text")
      .select("source", "n_docs", "sum_tokens", "n_quality_pass")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    for (cuts <- Seq(Seq(3L), Seq(2L, 4L))) {
      val streamed = CardStreams.streamingDataCard(spark, staged(cuts),
          shufflePartitions = Some(4))
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(streamed == batch, s"card diverged for cuts $cuts")
    }
    // the fixture actually exercises both counter branches
    assert(batch.map(_._4).sum > 0 && batch.map(_._4).sum < batch.map(_._2).sum)
  }
}
