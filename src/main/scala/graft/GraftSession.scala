package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration — the one
  * place the UTC/AQE/nanos/warehouse conventions live. Library users call
  * `GraftSession.local(n)` or apply [[configure]] to their own builder
  * (e.g. for a real cluster master).
  */
object GraftSession {

  /** Apply graft's conventions to any builder. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // native functions callable from SQL strings (see GraftExtensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // events-style parquet TIMESTAMP(NANOS) columns read as nanos-longs;
      // see graft.streaming.EventStreams.normalizeTs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft_warehouse"))
      .config("spark.ui.enabled", "false")

  /** Local session with `cpus` executor threads; shuffle partitions match
    * the thread count (the 200 default is wrong for local mode).
    */
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
