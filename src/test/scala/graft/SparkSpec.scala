package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt runs Test in one forked JVM;
  * `Test / parallelExecution := false`). Built through [[GraftSession]] so
  * tests exercise the library's recommended configuration — including the
  * SQL function registration in [[GraftExtensions]].
  */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.spark
}
