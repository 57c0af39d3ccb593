package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.text

/** Streaming per-source data card — the drift-monitoring face of
  * [[graft.ext.Report.dataCard]]: the document, token and quality-pass
  * counters are BATCH-ADDITIVE, so the card is maintained with one
  * delta-sized aggregation plus a groups-sized merge per micro-batch —
  * history is never rescanned. Additivity makes streaming == batch BY
  * CONSTRUCTION for these columns (asserted against the batch card in the
  * spec and by q142's oracle).
  *
  * The batch card's corpus-wide duplicate column is deliberately ABSENT
  * here: dup membership is not batch-additive (a doc flips to "duplicated"
  * when a LATER batch delivers its second copy), so a streamed version
  * would misreport early batches. The streaming card carries the additive
  * counters for live drift monitoring; the batch card stays the release
  * artifact.
  *
  * Scale: state is |sources| rows, localCheckpoint'ed per batch to keep
  * lineage flat over unbounded streams (the [[MaterializedAgg]] contract).
  */
object CardStreams {

  def streamingDataCard(
      spark: SparkSession, stagedDir: String,
      groupCol: String = "source", textCol: String = "text",
      minStopwords: Int = 1,
      shufflePartitions: Option[Int] = None,
      rocksdbState: Boolean = false,
      checkpointDir: Option[String] = None): DataFrame = {
    val schema = spark.read.parquet(stagedDir).schema
    def cardOf(df: DataFrame): DataFrame = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(text.tokenCount(col(textCol)).cast("long")), lit(0L))
          .as("sum_tokens"),
        count(when(
          text.gopherReasons(col(textCol), minStopwords = minStopwords) === 0,
          1)).as("n_quality_pass"))
    // written from the micro-batch thread, read by the caller after
    // awaitTermination (and legitimately readable mid-run by a monitor)
    val stateLock = new Object
    var state: Option[DataFrame] = None
    EventStreams.withStatePartitions(spark, shufflePartitions, rocksdbState) {
      val writer = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stagedDir)
        .writeStream
        .foreachBatch { (batch: Dataset[Row], _: Long) => stateLock.synchronized {
          val delta = cardOf(batch.toDF())
          val next = state match {
            case None => delta
            case Some(st) =>
              st.select(col(groupCol), col("n_docs").as("a_docs"),
                  col("sum_tokens").as("a_tok"), col("n_quality_pass").as("a_pass"))
                .join(delta, Seq(groupCol), "full")
                .select(col(groupCol),
                  (coalesce(col("a_docs"), lit(0L))
                    + coalesce(col("n_docs"), lit(0L))).as("n_docs"),
                  (coalesce(col("a_tok"), lit(0L))
                    + coalesce(col("sum_tokens"), lit(0L))).as("sum_tokens"),
                  (coalesce(col("a_pass"), lit(0L))
                    + coalesce(col("n_quality_pass"), lit(0L))).as("n_quality_pass"))
          }
          state = Some(next.localCheckpoint(true))
        }}
        .trigger(Trigger.AvailableNow())
      val q = checkpointDir
        .fold(writer)(d => writer.option("checkpointLocation", d))
        .start()
      q.awaitTermination()
    }
    stateLock.synchronized(state).getOrElse(
      throw new IllegalStateException(s"no micro-batches arrived from $stagedDir"))
  }
}
