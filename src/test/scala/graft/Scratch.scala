package graft

/** Dev scratch harness (Test scope only, never shipped): run ONE named
  * query against a data dir and show the result — the dev loop for a
  * single operator without paying the full battery or Verify sweep.
  *
  * Usage: `sbt "Test/runMain graft.Scratch <queryName> [sfDir]"`, or set
  * `SPARK_GRAFT_SF_DIR`. No pinned paths or query names (ADVICE r10): both
  * come from args/env so the file cannot rot as the surface changes.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      s"usage: Scratch <queryName> [sfDir]; known: ${SparkEntry.queries.keys.toSeq.sorted.take(5).mkString(", ")}, ...")
    val name = args(0)
    val d = args.lift(1)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass sfDir as arg 2 or set SPARK_GRAFT_SF_DIR"))
    require(SparkEntry.queries.contains(name), s"unknown query $name")
    val spark = GraftSession.local(16, "graft-scratch")
    SparkEntry.queries(name)(spark, d).show(false)
    spark.stop()
  }
}
