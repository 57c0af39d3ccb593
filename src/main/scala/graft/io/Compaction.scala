package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet dataset compaction — the small-files maintenance pass every
  * long-lived 100 TB corpus needs. Streaming sinks, per-batch appends
  * ([[graft.streaming.CorpusStreams]]'s survivor log is a local example)
  * and fine-grained ingest all accumulate files far below the ideal scan
  * granularity; each file costs a task, a footer read and a catalog entry,
  * so a million 100 KB files can make a scan slower than the same bytes in
  * 1000 files. The reference has no analog only because a single-machine
  * ffdf never fragments — the capability becomes necessary exactly when the
  * data model goes distributed.
  *
  * Design:
  *  - file accounting goes through the Hadoop FileSystem API, so the same
  *    code runs on local disk, HDFS and object stores;
  *  - target file count = ceil(total data bytes / targetFileBytes), derived
  *    from the CURRENT physical size — compression ratios carry over from
  *    the existing files, so output sizes land near the target without a
  *    dry-run write;
  *  - plain `repartition(n)` (round-robin) balances bytes evenly; passing
  *    `clusterBy` switches to `repartitionByRange` + in-partition sort, so
  *    compaction doubles as layout clustering (min/max file skipping on the
  *    cluster keys — the same reason [[graft.ops.ZOrder]] exists);
  *  - output goes to a NEW directory (write-audit-swap): rewriting in place
  *    is not atomic on any real filesystem, so the caller swaps pointers
  *    (view/table/manifest) after validating — the returned DataFrame reads
  *    the compacted copy.
  */
object Compaction {

  /** Total bytes of data files (non-hidden) directly under `dir`. */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Number of data files (non-hidden) under `dir` — compaction's before /
    * after metric.
    */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Rewrite the parquet dataset at `inDir` into `outDir` as
    * ~`targetFileBytes`-sized files (content identical, file layout new).
    * With `clusterBy` non-empty the rewrite also range-clusters on those
    * columns. Returns the compacted dataset.
    */
  def compact(
      spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val total = dataBytes(spark, inDir)
    val n = math.max(1L, (total + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val arranged =
      if (clusterBy.isEmpty) df.repartition(n)
      else {
        val keys = clusterBy.map(org.apache.spark.sql.functions.col)
        df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
      }
    arranged.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
