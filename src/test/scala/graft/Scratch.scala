package graft

import org.apache.spark.sql.functions._

/** Dev scratch harness (Test scope only, never shipped): stage timings /
  * repros for whatever is being worked on right now. Run:
  * `sbt "Test/runMain graft.Scratch"`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16, "graft-scratch")
    val d = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("q214_ab_test")(spark, d)
    df.show(false)
    spark.stop()
  }
}
