package graft.streaming

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** State-store-at-volume measurement (dev tooling, like [[graft.Bench]]):
  * times the SAME high-cardinality streaming aggregation under the
  * default HDFS-backed provider and under RocksDB, at a state volume the
  * battery's streaming queries never reach (their state is tens of
  * groups; this drives >= 1e5 keys PER STATE PARTITION through every
  * micro-batch). This is the measurement behind the `rocksdbState`
  * knob's scaladoc claim that provider choice starts to matter at
  * volume — run it once per box, record the numbers, leave the knob's
  * default alone.
  *
  * Prints one JSON line:
  * `{"metric":"state_bench","keys":N,"partitions":P,"batches":B,
  *   "hdfs_sec":x,"rocksdb_sec":y}`.
  *
  * Env: `SPARK_GRAFT_STATE_KEYS` total distinct keys (default 800k ->
  * 1e5/partition at 8 partitions), `SPARK_GRAFT_STATE_PARTS` state
  * partitions (default 8), `SPARK_GRAFT_STATE_BATCHES` micro-batches
  * (default 3; every batch touches EVERY key — worst-case store churn).
  */
object StateBench {

  def main(args: Array[String]): Unit = {
    val keys = sys.env.getOrElse("SPARK_GRAFT_STATE_KEYS", "800000").toLong
    val parts = sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", "8").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_STATE_BATCHES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.GraftSession.local(cpus.toInt, "graft-state-bench")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft_state_bench")
    // every batch file carries every key once -> after batch 1 the store
    // holds `keys` rows and every later batch rewrites all of them.
    // Single FILE per micro-batch (the stageIdSlices convention): write a
    // 1-part dir, hoist the part file, drop the dir.
    def makeInput(name: String, nKeys: Long, nBatches: Int): String = {
      val inDir = java.nio.file.Files.createDirectory(
        java.nio.file.Paths.get(s"$base/$name"))
      (0 until nBatches).foreach { b =>
        val tmp = s"$base/tmp_${name}_$b"
        spark.range(nKeys).select(col("id").as("k"), lit(1L).as("v"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file in $tmp"))
        java.nio.file.Files.move(part.toPath,
          inDir.resolve(f"batch_$b%04d.parquet"))
      }
      inDir.toString
    }
    val inDir = makeInput("in", keys, batches)
    val warmDir = makeInput("warm", 1000L, 1)
    val schema = spark.read.parquet(inDir).schema

    def run(rocksdb: Boolean, dir: String): Double = {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_state_ckpt")
      val t0 = System.nanoTime()
      EventStreams.withStatePartitions(spark, Some(parts), rocksdb) {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(dir)
          .groupBy(col("k")).agg(sum(col("v")).as("s"))
          .writeStream
          .outputMode(OutputMode.Update())
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.format("noop").mode("overwrite").save()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm BOTH providers once at tiny scale so session init, codegen,
    // classloading and each provider's first store open are paid outside
    // the timed runs (the Bench warmup rule) — without this the first
    // timed leg eats those one-time costs and the comparison is biased.
    run(rocksdb = false, warmDir)
    run(rocksdb = true, warmDir)
    val hdfs = run(rocksdb = false, inDir)
    val rocks = run(rocksdb = true, inDir)
    def f(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"state_bench","keys":$keys,"partitions":$parts,"batches":$batches,"hdfs_sec":${f(hdfs)},"rocksdb_sec":${f(rocks)}}""")
    spark.stop()
  }
}
