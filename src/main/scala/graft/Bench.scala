package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    // One-time physical layout (bucketed-table writes) must not be charged
    // to a timed query; q46 then plans straight against the existing tables.
    SparkEntry.benchPrepare(spark, sfDir)
    // Untimed warmup: the first query of a session pays JVM/codegen/session
    // init (~5 s) that is not a property of the query plan.
    try SparkEntry.queries("q12_scalar_funcs")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column — count()
      // would let Catalyst prune the projections we mean to measure.
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // failures record -1.0 so the JSON consumer cannot mistake a fast
      // failure for a fast query
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // Load canary: the same already-warm trivial query timed before the
    // battery, after it, AND every 20 queries in between. Its plan never
    // changes mid-run, so a large max/min ratio across the samples can only
    // mean external host load arrived while the battery ran — it marks THIS
    // artifact as contaminated (round-5's 2558s-vs-183s incident; a round-6
    // run showed 2.4x total inflation with CLEAN endpoints, which is why the
    // canary samples mid-battery too) rather than a code regression.
    val canaries = scala.collection.mutable.ArrayBuffer(timed("q12_scalar_funcs"))
    val results = SparkEntry.queries.zipWithIndex.map { case ((name, _), i) =>
      if (i > 0 && i % 20 == 0) canaries += timed("q12_scalar_funcs")
      name -> timed(name)
    }
    canaries += timed("q12_scalar_funcs")
    val (canaryFirst, canaryLast) = (canaries.head, canaries.last)
    val valid = canaries.filter(_ > 0)
    val loadVar =
      if (valid.nonEmpty && valid.size == canaries.size) valid.max / valid.min
      else -1.0
    // 2-decimal seconds: per-query timings are noise below 10ms anyway, and
    // the consumer captures only the LAST 2000 chars of output — full-
    // precision doubles push the 66-query line past that window and truncate
    // the JSON head (observed: BENCH_r03 "parsed": null). Same reason the
    // keys are the short qNN prefix: 84 full names are ~2100 chars of JSON,
    // which would clip the line head again.
    def f(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val qs = results.map { case (k, v) =>
      s"\"" + k.takeWhile(_ != '_') + "\":" + f(v)
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","canary_first":${f(canaryFirst)},"canary_last":${f(canaryLast)},"load_variance":${f(loadVar)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
