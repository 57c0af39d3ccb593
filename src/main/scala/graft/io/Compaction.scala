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

  /** Physical bytes per Hive leaf-partition directory under `dir`: relative
    * partition path (`k1=v1/k2=v2`) -> data bytes. Metadata-only (one
    * recursive listing), no data read.
    */
  def partitionBytes(spark: SparkSession, dir: String): Map[String, Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.getFileStatus(p).getPath.toUri.getPath
    val it = fs.listFiles(p, true)
    val acc = scala.collection.mutable.Map.empty[String, Long]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        val rel = f.getPath.getParent.toUri.getPath.stripPrefix(base)
          .stripPrefix("/")
        acc(rel) = acc.getOrElse(rel, 0L) + f.getLen
      }
    }
    acc.toMap
  }

  /** Rewrite the parquet dataset at `inDir` into `outDir` as
    * ~`targetFileBytes`-sized files (content identical, file layout new).
    * With `clusterBy` non-empty the rewrite also range-clusters on those
    * columns. With `partitionBy` non-empty the OUTPUT keeps that Hive
    * directory layout — compacting a partitioned dataset without it would
    * silently flatten the layout and destroy partition pruning downstream.
    * Returns the compacted dataset.
    *
    * Partitioned mode targets file sizes PER PARTITION VALUE: each leaf
    * directory's physical bytes (one recursive listing, no data read) set
    * its own file count `ceil(bytes/target)`, and rows are routed by
    * (partition columns, deterministic row-hash salt bounded by that
    * count) so a hot partition gets many right-sized files while a cold
    * one compacts to a single file — a global round-robin would instead
    * make every task write a sliver into every partition directory
    * (files = tasks x partitions, the explosion compaction exists to fix).
    * With `clusterBy` too, rows sort by the cluster keys within each
    * output task, so per-file min/max skipping works inside each
    * partition directory. Partition VALUES are matched via their directory
    * names (cast-to-string equality after unescaping Hive's %-encoding).
    */
  def compact(
      spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.functions._
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    def nFiles(bytes: Long): Int =
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    require(partitionBy.forall(df.columns.contains),
      s"partitionBy columns ${partitionBy.mkString(",")} must exist in the data")
    if (partitionBy.isEmpty) {
      val n = nFiles(dataBytes(spark, inDir))
      val arranged =
        if (clusterBy.isEmpty) df.repartition(n)
        else {
          val keys = clusterBy.map(col)
          df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
        }
      arranged.write.mode("overwrite").parquet(outDir)
    } else {
      // per-leaf file counts from the directory listing; dirs whose
      // partition depth does not match partitionBy (layout mismatch) fail
      // loudly below rather than compacting into a wrong layout
      val perLeaf = partitionBytes(spark, inDir).map { case (rel, bytes) =>
        val segs = rel.split("/").filter(_.nonEmpty)
        require(segs.length == partitionBy.length && segs.forall(_.contains("=")),
          s"input layout '$rel' does not match partitionBy=${partitionBy.mkString("/")}")
        val values = segs.map { s =>
          val Array(k, v) = s.split("=", 2)
          k -> unescapePathName(v)
        }.toMap
        partitionBy.map(values(_)) -> nFiles(bytes)
      }
      val totalTasks = perLeaf.values.sum
      import spark.implicits._
      // \u0001 separator: not produced by escapePathName, keys cannot collide
      val filesDf = perLeaf.toSeq.map { case (vs, n) => (vs.mkString("\u0001"), n) }
        .toDF("__pv", "__nf")
      val pvExpr = concat_ws("\u0001",
        partitionBy.map(c => col(c).cast("string")): _*)
      // salt = row hash mod the leaf's own file count: deterministic, and
      // each (partition value, salt) combo lands in one shuffle target, so
      // a leaf produces ~__nf files regardless of what else shares a task.
      // LEFT join + coalesce(1): a value the directory match missed (null
      // partitions, exotic type formatting) still compacts — to one file —
      // instead of silently dropping rows through an inner join.
      val dataCols = df.columns.filterNot(partitionBy.contains).map(col)
      val arranged = df.withColumn("__pv", pvExpr)
        .join(broadcast(filesDf), Seq("__pv"), "left")
        .withColumn("__salt",
          pmod(xxhash64(dataCols: _*), coalesce(col("__nf"), lit(1)).cast("long")))
        .repartition(totalTasks,
          partitionBy.map(col) :+ col("__salt"): _*)
        .drop("__pv", "__nf", "__salt")
      val sorted =
        if (clusterBy.isEmpty) arranged
        else arranged.sortWithinPartitions(clusterBy.map(col): _*)
      sorted.write.partitionBy(partitionBy: _*).mode("overwrite").parquet(outDir)
    }
    spark.read.parquet(outDir)
  }

  /** Hive %-encodes special characters in partition directory names
    * (`ExternalCatalogUtils.escapePathName`); reverse it so directory-derived
    * partition VALUES compare equal to the column values.
    */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
