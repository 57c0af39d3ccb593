package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev tool (optimization round): per-JOB wall attribution for any declared
  * query. A query's wall is the sum of its Spark jobs plus driver-side gaps;
  * each engine action (localCheckpoint, count, head, noop write) surfaces as
  * one job whose callsite names the engine line that issued it — so the
  * profile says WHERE a floor lives without instrumenting the engine.
  *
  * Usage: runMain graft.tools.ProfileJobs <queryName> [sfDir]
  * Runs the query once untimed (JIT/codegen warm), then profiles the second
  * run: per-job wall + callsite, sorted by cost, plus the un-attributed
  * driver gap (total wall - sum of job walls).
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileJobs <queryName> [sfDir] [cpus]")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = graft.GraftSession.local(cpus, s"graft-profile-$name")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // warmup run: codegen + session init are not properties of the plan
    fn(spark, d).write.format("noop").mode("overwrite").save()

    case class Job(id: Int, site: String, exec: String, start: Long,
        var end: Long = -1L)
    case class Stage(id: Int, name: String, site: String, nTasks: Int,
        wallMs: Long, runMs: Long, cpuMs: Long, shRead: Long, shWrite: Long,
        submitted: Long)
    val stages = mutable.ArrayBuffer.empty[Stage]
    val jobs = mutable.ArrayBuffer.empty[Job]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val si = e.stageInfo
          val graftSite = si.details.linesIterator
            .filter(l => l.contains("graft.") && !l.contains("ProfileJobs"))
            .take(2).map(_.trim.replaceAll("^at ", "")).mkString(" < ")
          val m = si.taskMetrics
          stages += Stage(si.stageId, si.name, graftSite, si.numTasks,
            (for {s <- si.submissionTime; c <- si.completionTime} yield c - s)
              .getOrElse(-1L),
            m.executorRunTime, m.executorCpuTime / 1000000,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            si.submissionTime.getOrElse(-1L))
        }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          // the submitting thread blocks inside DAGScheduler.runJob for the
          // job's duration; its deepest graft.* frame names the engine line
          // that issued the action
          import scala.jdk.CollectionConverters._
          val site = Thread.getAllStackTraces.asScala.collectFirst {
            case (_, st) if st.exists(_.getClassName.contains("DAGScheduler")) &&
              st.exists(f => f.getClassName.startsWith("graft")) =>
              st.filter(f => f.getClassName.startsWith("graft"))
                .take(3)
                .map(f => s"${f.getFileName}:${f.getLineNumber}")
                .mkString(" < ")
          }.getOrElse("?")
          val exec = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .getOrElse("-")
          jobs += Job(e.jobId, site, exec, System.nanoTime())
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener bus is async; give it a beat to drain
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    val done = jobs.synchronized(jobs.filter(_.end > 0).toSeq)
    println(f"\n==== $name: wall ${wall}%.3f s, ${done.size} jobs ====")
    val base = done.map(_.start).min
    done.sortBy(_.start).foreach { j =>
      println(f"  +${(j.start - base) / 1e9}%7.3f  ${(j.end - j.start) / 1e9}%8.3f s  job ${j.id}%3d exec=${j.exec}%-4s ${j.site}")
    }
    val jobSum = done.map(j => (j.end - j.start) / 1e9).sum
    println(f"  job-wall sum ${jobSum}%.3f s (overlap possible); driver gap ~ ${wall - jobSum}%.3f s")
    println("---- stages (wall desc) ----")
    val st = stages.synchronized(stages.toSeq)
    val sbase = st.filter(_.submitted > 0).map(_.submitted).min
    st.sortBy(_.submitted).foreach { s =>
      println(f"  +${(s.submitted - sbase) / 1e3}%7.3f ${s.wallMs / 1e3}%7.3f s run=${s.runMs / 1e3}%7.2f cpu=${s.cpuMs / 1e3}%7.2f n=${s.nTasks}%4d shR=${s.shRead / 1024}%8dK shW=${s.shWrite / 1024}%8dK  stage ${s.id}%4d ${s.name}%-60s ${s.site.take(110)}")
    }
    // aggregate by callsite — the per-engine-line cost ranking
    println("---- by callsite ----")
    done.groupBy(_.site).view
      .mapValues(js => (js.size, js.map(j => (j.end - j.start) / 1e9).sum))
      .toSeq.sortBy(-_._2._2).foreach { case (site, (n, s)) =>
        println(f"  $s%8.3f s  x$n%-3d  $site")
      }
    spark.stop()
  }
}
