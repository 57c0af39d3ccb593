package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev scan (optimization round): run every declared query once and report
  * stages whose task count is far above the session width — the
  * fanOut-vs-AQE width-poisoning signature (a user repartition joined with
  * an AQE-planned side bumps the join to initialPartitionNum and defeats
  * coalescing). Prints per query: total stages, oversized stages, and the
  * summed scheduled-task overhead they carry.
  *
  * Usage: runMain graft.tools.BatteryStageScan [sfDir] [widthFlag]
  */
object BatteryStageScan {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val flagAbove = if (args.length > 1) args(1).toInt else 128
    val spark = graft.GraftSession.local(32, "graft-stage-scan")
    spark.sparkContext.setLogLevel("ERROR")
    case class S(n: Int, runMs: Long, cpuMs: Long, shR: Long)
    val cur = mutable.ArrayBuffer.empty[S]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        cur.synchronized {
          val m = e.stageInfo.taskMetrics
          cur += S(e.stageInfo.numTasks, m.executorRunTime,
            m.executorCpuTime / 1000000, m.shuffleReadMetrics.totalBytesRead)
        }
    })
    graft.SparkEntry.benchPrepare(spark, d)
    println("query,total_stages,wide_stages,wide_tasks,wide_run_minus_cpu_ms")
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      cur.synchronized(cur.clear())
      try {
        fn(spark, d).write.format("noop").mode("overwrite").save()
        Thread.sleep(200)
        val st = cur.synchronized(cur.toSeq)
        val wide = st.filter(_.n >= flagAbove)
        if (wide.nonEmpty)
          println(s"$name,${st.size},${wide.size}," +
            s"${wide.map(_.n).sum},${wide.map(s => s.runMs - s.cpuMs).sum}")
      } catch {
        case e: Throwable => println(s"$name,ERR,${e.getMessage.take(60)},,")
      }
    }
    spark.stop()
  }
}
