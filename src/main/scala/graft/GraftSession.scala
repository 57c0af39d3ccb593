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
      // VOLUME-ADAPTIVE shuffle width: plan every exchange at 8x the
      // session width and let AQE coalesce DOWN by measured size
      // (advisory 64 MB/partition). A fixed width is wrong in both
      // directions at once — 25x the corpus through the same 32 buckets
      // spills (the q281 iso curve measured 44x wall on 25x data before
      // this; the shingle-pipeline groupBys were the hot stages), while
      // tiny shuffles over-parallelize. Explicit repartition(n, col)
      // calls (the verify-sizing paths) are untouched: AQE only
      // coalesces its own initial widths.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (shufflePartitions * 8).toString)
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
    registerSqlMacros(s)
    s
  }

  /** SQL-string parity for the composed text functions: registered as SQL
    * scalar UDFs whose bodies are GENERATED from the Column implementations
    * (`expr.sql`), so the SQL surface cannot drift from the Scala one.
    * (Native expressions go through GraftExtensions' function injection
    * instead; composed Column trees cannot — a ColumnNode handed back from
    * a registry builder stays unresolved and dies at codegen.)
    */
  def registerSqlMacros(s: SparkSession): Unit = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def sqlOf(f: Column => Column): String =
      ColumnBridge.convertedExpression(f(col("s"))).sql
    Seq(
      ("scrub_pii", "STRING", sqlOf(graft.functions.text.scrubPII)),
      ("token_count", "INT", sqlOf(graft.functions.text.tokenCount)),
      ("quality_score", "DOUBLE", sqlOf(c => graft.functions.text.qualityScore(c))),
      ("lang_id", "STRING", sqlOf(graft.functions.text.langId))
    ).foreach { case (n, t, body) =>
      s.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $n(s STRING) RETURNS $t RETURN $body")
    }
  }
}
