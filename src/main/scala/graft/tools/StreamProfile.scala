package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool (optimization round 19): per-MICRO-BATCH wall attribution for
  * the streaming-class queries. The engine-reported
  * `StreamingQueryProgress.durationMs` decomposes each trigger into the
  * phases the round-18 verdict asked about — offset/WAL commits
  * (checkpoint fsync), query planning, source listing (`latestOffset` /
  * `getBatch`) and `addBatch` (the actual job run, which for foreachBatch
  * queries is the whole callback body) — so the "where does the per-batch
  * ~0.3 s go" question is answered by the engine's own clock instead of
  * guessed from job gaps.
  *
  * Usage: runMain graft.tools.StreamProfile <queryName> [sfDir] [cpus]
  * Runs the query once untimed (warm), then profiles the second run.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamProfile <queryName> [sfDir] [cpus]")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = graft.GraftSession.local(cpus, s"graft-sprofile-$name")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, d).write.format("noop").mode("overwrite").save() // warm

    case class Batch(query: String, batchId: Long, durations: Map[String, Long],
        stateCommitMs: Long, stateRows: Long, inputRows: Long)
    val batches = mutable.ArrayBuffer.empty[Batch]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          import scala.jdk.CollectionConverters._
          val p = e.progress
          batches += Batch(Option(p.name).getOrElse(p.id.toString), p.batchId,
            p.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap,
            p.stateOperators.map(_.commitTimeMs).sum,
            p.stateOperators.map(_.numRowsTotal).sum,
            p.numInputRows)
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.streams.removeListener(listener)
    val bs = batches.synchronized(batches.toSeq)
    println(f"\n==== $name: wall ${wall}%.3f s, ${bs.size} progress events ====")
    val keys = bs.flatMap(_.durations.keys).distinct.sorted
    println("  " + f"${"batch"}%28s" + keys.map(k => f"$k%16s").mkString +
      f"${"stateCommit"}%12s${"inRows"}%8s")
    bs.foreach { b =>
      println("  " + f"${b.query.take(22) + "#" + b.batchId}%28s" +
        keys.map(k => f"${b.durations.getOrElse(k, -1L)}%16d").mkString +
        f"${b.stateCommitMs}%12d${b.inputRows}%8d")
    }
    println("---- phase totals across batches (ms) ----")
    keys.foreach { k =>
      println(f"  ${bs.map(_.durations.getOrElse(k, 0L)).sum}%8d  $k")
    }
    println(f"  ${bs.map(_.stateCommitMs).sum}%8d  stateCommit (within addBatch)")
    val trig = bs.map(_.durations.getOrElse("triggerExecution", 0L)).sum
    println(f"  trigger sum ${trig / 1e3}%.3f s of ${wall}%.3f s wall — " +
      f"outside-stream ${wall - trig / 1e3}%.3f s (staging, state build, drain)")
    spark.stop()
  }
}
