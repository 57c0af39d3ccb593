package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: does Dataset.localCheckpoint materialize at AQE's coalesced
  * width or at the un-coalesced initialPartitionNum? Decides whether the
  * connectedComponents-family 256-task stages are an AQE bypass.
  */
object CheckpointWidthProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "graft-ckpt-width")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 10000).toDF("id").withColumn("k", col("id") % 100)
    val agg = df.groupBy("k").agg(count(lit(1)).as("n"))
    println(s"plain action partitions: ${agg.rdd.getNumPartitions}")
    val ck = agg.localCheckpoint()
    println(s"localCheckpoint partitions: ${ck.rdd.getNumPartitions}")
    val ck2 = agg.coalesce(32).localCheckpoint()
    println(s"coalesce(32)+ckpt partitions: ${ck2.rdd.getNumPartitions}")
    val j = ck.join(ck2.withColumnRenamed("n", "m"), Seq("k"))
    println(s"join-of-checkpoints partitions: ${j.rdd.getNumPartitions}")
    // the real engine path: near-dup pairs -> connectedComponents
    val pairs = (1 to 2000).toDF("id_l")
      .withColumn("id_r", col("id_l") + 1000)
      .repartition(32, col("id_l")).localCheckpoint()
    println(s"pairs partitions: ${pairs.rdd.getNumPartitions}")
    val cc = graft.ext.Dedup.connectedComponents(pairs)
    println(s"connectedComponents partitions: ${cc.rdd.getNumPartitions}")
    val labeled = (1 to 5000).toDF("id")
      .join(cc.select(col("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      .localCheckpoint()
    println(s"labeled partitions: ${labeled.rdd.getNumPartitions}")
    // q70's exact final shape: an explicitly fanned-out left side joined
    // with an AQE-planned right side — watch the join stage width
    val docs = (1 to 5000).toDF("doc_id").repartition(32, col("doc_id"))
    val joined = docs
      .join(cc.select(col("id").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
    println(s"fanout-join partitions: ${joined.rdd.getNumPartitions}")
    // fix candidate A: pin the cc side to the same user width -> co-partitioned
    val joinedA = docs
      .join(cc.select(col("id").as("doc_id"), col("component"))
        .repartition(32, col("doc_id")), Seq("doc_id"), "left")
    println(s"copinned-join partitions: ${joinedA.rdd.getNumPartitions}")
    // fix candidate B: drop the user repartition from the label side entirely
    val joinedB = (1 to 5000).toDF("doc_id")
      .join(cc.select(col("id").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
    println(s"unfanned-join partitions: ${joinedB.rdd.getNumPartitions}")
    spark.stop()
  }
}
