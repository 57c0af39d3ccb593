package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BucketedTablesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans without a shuffle exchange") {
    val left = (1 to 1000).map(i => (i.toLong % 100, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong % 100, i * 1.5)).toDF("k", "rv")

    BucketedTables.writeBucketed(left, "graft_bl", "k", 8, sortCol = Some("k"))
    BucketedTables.writeBucketed(right, "graft_br", "k", 8, sortCol = Some("k"))

    val bl = BucketedTables.read(spark, "graft_bl")
    val br = BucketedTables.read(spark, "graft_br")
    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bl.join(br, Seq("k"))
      assert(!BucketedTables.hasShuffleExchange(joined),
        "bucketed join must not shuffle:\n" + joined.queryExecution.executedPlan)
      // and an un-bucketed equivalent DOES shuffle
      val plain = left.join(right, Seq("k"))
      assert(BucketedTables.hasShuffleExchange(plain))
      // correctness: same result either way
      assert(joined.count() == plain.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed group-by on the bucket key avoids the aggregation shuffle") {
    val agg = BucketedTables.read(spark, "graft_bl").groupBy("k").count()
    assert(!BucketedTables.hasShuffleExchange(agg))
  }
}
