package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.{CorpusStreams, EventStreams}

/** One-off micro-benchmark: HDFS-backed vs RocksDB state store across the
  * four streaming tail queries (q55/q60/q71/q94 shapes). Not part of the
  * query battery — run manually on a QUIET box:
  * `env SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StateStoreCompare"`.
  */
object StateStoreCompare {
  private var ctr = 0
  private def nm(p: String): String = { ctr += 1; s"ssb_${p}_$ctr" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.GraftSession.local(cpus.toInt, "graft-ssb")
    def timeIt(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ssb] $label%-22s $s%6.2f s"); s
    }
    def battery(rocks: Boolean): Map[String, Double] = Map(
      "q55_sessions" -> timeIt(s"q55 rocksdb=$rocks") {
        EventStreams.sessionizeStatefulStreaming(spark,
          s"$sfDir/events.parquet", nm("ss"),
          shufflePartitions = Some(8), rocksdbState = rocks)
          .write.format("noop").mode("overwrite").save()
      },
      "q60_dedup" -> timeIt(s"q60 rocksdb=$rocks") {
        EventStreams.streamingDedup(spark, s"$sfDir/events.parquet", nm("dd"),
          keys = Seq("event_id"),
          shufflePartitions = Some(8), rocksdbState = rocks)
          .write.format("noop").mode("overwrite").save()
      },
      "q94_correlate" -> timeIt(s"q94 rocksdb=$rocks") {
        EventStreams.correlateStreaming(spark, s"$sfDir/events.parquet",
          nm("corr"), "click", "purchase", withinMinutes = 60,
          userMod = 8L, shufflePartitions = Some(8), rocksdbState = rocks)
          .write.format("noop").mode("overwrite").save()
      },
      "q71_corpus" -> timeIt(s"q71 rocksdb=$rocks") {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
        val staged = CorpusStreams.stageIdSlices(spark,
          s"$sfDir/documents.parquet", "doc_id", cuts = Seq(mid))
        CorpusStreams.corpusDedupStreaming(spark, staged, "doc_id", "text",
          threshold = 0.6, shufflePartitions = Some(8), rocksdbState = rocks)
          .write.format("noop").mode("overwrite").save()
      })
    battery(rocks = false) // warmup (JVM/codegen init)
    val rounds = Seq(
      "hdfs" -> battery(rocks = false), "rocks" -> battery(rocks = true),
      "hdfs" -> battery(rocks = false), "rocks" -> battery(rocks = true))
    Seq("hdfs", "rocks").foreach { k =>
      val rs = rounds.collect { case (`k`, m) => m }
      val avg = rs.head.keys.map(q =>
        f"$q=${rs.map(_(q)).min}%.2f").mkString(" ")
      println(s"[ssb] BEST $k: $avg")
    }
    spark.stop()
  }
}
