package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.ops.Expectations

/** Streaming face of [[graft.ops.Expectations]]: the quality gate run
  * continuously over an arriving file stream, routing each micro-batch's
  * rows to a pass sink or a quarantine sink (with their failed-rule
  * reasons) as they arrive — the reject-and-continue boundary a 100 TB
  * ingest pipeline keeps always-on rather than running as a nightly batch.
  *
  * Semantics equal the batch gate BY CONSTRUCTION: tagging is one
  * row-local projection ([[Expectations.check]]), so it commutes with
  * micro-batching — no state, no watermark, nothing that can drift with
  * batch boundaries. Scale: both sink writes are executor-side parquet
  * appends; no row or id ever touches the driver (the shape the streaming
  * corpus dedup sink established, `CorpusStreams.corpusDedupStreaming`).
  */
object QualityStreams {

  /** Drive the gate over `stagedDir` (a directory of parquet files, one
    * micro-batch each), appending clean rows to a pass sink and violating
    * rows (plus `violations: array<string>`) to a quarantine sink; returns
    * (pass, quarantine) read back with explicit schemas, so an all-clean or
    * all-bad stream still yields a well-typed empty side.
    */
  def gateStreaming(spark: SparkSession, stagedDir: String,
      rules: Seq[Expectations.Rule],
      shufflePartitions: Option[Int] = None,
      rocksdbState: Boolean = false): (DataFrame, DataFrame) = {
    val schema = spark.read.parquet(stagedDir).schema
    def sink(prefix: String): String = {
      val d = Files.createTempDirectory(prefix)
      d.toFile.deleteOnExit()
      d.toString
    }
    val passDir = sink("graft_gate_pass")
    val quarDir = sink("graft_gate_quarantine")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stagedDir)
    EventStreams.withStatePartitions(spark, shufflePartitions, rocksdbState) {
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          val b = batch.persist()
          try {
            val (pass, quarantine) = Expectations.split(b.toDF(), rules)
            pass.write.mode("append").parquet(passDir)
            quarantine.write.mode("append").parquet(quarDir)
          } finally b.unpersist()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val quarSchema = StructType(schema.fields :+
      StructField("violations", ArrayType(StringType, containsNull = true)))
    (spark.read.schema(schema).parquet(passDir),
      spark.read.schema(quarSchema).parquet(quarDir))
  }
}
