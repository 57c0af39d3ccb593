package graft.tools

/** Dev experiment (round 19): A/B a declared query with AQE on vs off at
  * the session level. The streaming foreachBatch bodies run batch jobs over
  * micro-batch-sized frames where adaptive per-stage re-planning is pure
  * driver overhead — this measures exactly that delta before any code
  * changes. Usage: runMain graft.tools.AqeAb <queryName> [sfDir] [cpus] [reps]
  */
object AqeAb {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AqeAb <queryName> [sfDir] [cpus] [reps]")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = graft.GraftSession.local(cpus, s"graft-aqeab-$name")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val rows = for (r <- 1 to reps; aqe <- Seq(true, false)) yield {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val t = run()
      println(f"[aqeab] rep $r aqe=$aqe%-5s $t%.3f s")
      (aqe, t)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    Seq(true, false).foreach { a =>
      val ts = rows.filter(_._1 == a).map(_._2)
      println(f"[aqeab] aqe=$a%-5s min ${ts.min}%.3f s  avg ${ts.sum / ts.size}%.3f s")
    }
    spark.stop()
  }
}
