package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Expectations
import graft.ops.Expectations.Rule

class QualityStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(10.0), "click"),
    (2L, Some(500.0), "click"),
    (3L, Some(5.0), "weird"),
    (4L, None: Option[Double], "weird"),
    (5L, Some(20.0), "view"),
    (6L, Some(999.0), "view")
  ).toDF("id", "value", "typ")

  private val rules = Seq(
    Rule("value_ok", col("value") <= 300),
    Rule("type_ok", col("typ").isin("click", "view")))

  private def staged(cuts: Seq[Long]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_fix")
    dir.toFile.deleteOnExit()
    fixture.write.mode("overwrite").parquet(s"$dir/src")
    CorpusStreams.stageIdSlices(spark, s"$dir/src", "id", cuts)
  }

  test("streaming gate equals the batch gate regardless of batch boundaries") {
    val (bPass, bQuar) = Expectations.split(fixture, rules)
    val expectedPass = bPass.select("id").as[Long].collect().sorted.toSeq
    val expectedQuar = bQuar
      .select(col("id"), concat_ws(",", col("violations")).as("v"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // the batch-side monitoring numbers (q112 shape): rows per violated rule
    val expectedCounts = rules.map(_.name).map { r =>
      r -> bQuar.where(array_contains(col("violations"), r)).count()
    }.toMap
    for (cuts <- Seq(Seq(4L), Seq(2L, 5L))) {
      val gate = QualityStreams.gateStreaming(spark, staged(cuts), rules,
        shufflePartitions = Some(4))
      assert(gate.pass.select("id").as[Long].collect().sorted.toSeq == expectedPass,
        s"pass side diverged for cuts $cuts")
      val got = gate.quarantine
        .select(col("id"), concat_ws(",", col("violations")).as("v"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == expectedQuar, s"quarantine side diverged for cuts $cuts")
      // streamed per-rule counts equal the batch gate's, at any batch cut
      assert(gate.ruleViolations == expectedCounts,
        s"streamed metrics diverged for cuts $cuts: ${gate.ruleViolations}")
    }
  }

  test("an all-clean stream yields a well-typed empty quarantine side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_clean")
    dir.toFile.deleteOnExit()
    fixture.where(col("id") === 1L || col("id") === 5L)
      .write.mode("overwrite").parquet(s"$dir/src")
    val stagedDir = CorpusStreams.stageIdSlices(spark, s"$dir/src", "id", Seq(3L))
    val gate = QualityStreams.gateStreaming(spark, stagedDir, rules)
    assert(gate.pass.count() == 2)
    assert(gate.quarantine.isEmpty)
    assert(gate.quarantine.columns.toSeq == Seq("id", "value", "typ", "violations"))
    // every declared rule reports, zeros included
    assert(gate.ruleViolations == Map("value_ok" -> 0L, "type_ok" -> 0L))
  }
}
