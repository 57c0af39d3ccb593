package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketing: pre-shuffle a table ONCE at write time so every later join or
  * aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB the dominant cost of a fact-fact join is the exchange of both
  * sides. Writing the fact tables bucketed by their join key (same bucket
  * count both sides) lets Spark plan a SortMergeJoin with NO Exchange — the
  * scan itself delivers co-partitioned data. This is the Spark-native form
  * of the co-located layout the reference delegates to its backing database.
  */
object BucketedTables {

  /** Write `df` as a bucketed managed table (parquet). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None,
      overwrite: Boolean = true): Unit = {
    if (overwrite) {
      val spark = df.sparkSession
      require(!table.contains("."),
        "writeBucketed manages default-database tables; pass an unqualified name")
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      // The in-memory catalog resets per JVM but the managed location does
      // not; CTAS refuses a pre-existing location, so clear leftovers via the
      // Hadoop FileSystem API (works for file:, hdfs:, s3a: warehouses alike).
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(wh,
        table.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    var w = df.write.format("parquet")
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .bucketBy(numBuckets, bucketCol)
    sortCol.foreach(c => w = w.sortBy(c))
    w.saveAsTable(table)
  }

  /** Write the bucketed table only if it does not already exist in this
    * session's catalog — the "prepare once" path. Bucketing is a one-time
    * physical layout cost; callers that re-derive the same table per query
    * (or per benchmark iteration) would otherwise charge the full write to
    * every run. Table names must therefore be unique per source dataset
    * (e.g. carry a scale-factor tag).
    *
    * Staleness contract: existence is checked against the session CATALOG
    * only — if the SOURCE files behind `df` are rewritten within the same
    * JVM session, the bucketed table silently keeps serving the old data.
    * That is the right trade for immutable benchmark/ETL inputs; callers
    * with mutable sources must drop the table (or tag names with a data
    * fingerprint) before re-preparing.
    */
  def ensureBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCol: Option[String] = None): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      writeBucketed(df, table, bucketCol, numBuckets, sortCol)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan of `df` contains a shuffle exchange —
    * the assertion target for co-located-join tests and plan audits.
    */
  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
