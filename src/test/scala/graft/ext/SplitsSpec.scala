package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SplitsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = (1 to 1000).map(i => (i.toLong, s"document number $i"))
    .toDF("id", "text")

  test("split is a pure function of the key value (repartition-invariant)") {
    val a = Splits.byContentHash(docs, "text", Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test")).select("id", "split")
      .as[(Long, String)].collect().toMap
    val b = Splits.byContentHash(docs.repartition(7), "text", Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test")).select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.values.toSet == Set("train", "val", "test"))
  }

  test("proportions approximate the weights") {
    val counts = Splits.byContentHash(docs, "text", Seq(0.8, 0.1, 0.1),
      Seq("train", "val", "test"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 160)
    assert(counts("test") > 50 && counts("test") < 160)
  }

  test("duplicate content always lands in one split (no leakage)") {
    val dup = docs.union(docs) // every text twice
    val bad = Splits.byContentHash(dup, "text", Seq(0.5, 0.5), Seq("a", "b"))
      .groupBy("text").agg(countDistinct("split").as("n"))
      .where(col("n") > 1).count()
    assert(bad == 0L)
  }

  test("byClusterHash co-assigns every member of a cluster (near-dup leakage)") {
    // rows 1..1000 in 100 clusters of 10: content differs per row, so a
    // content-hash split WOULD scatter cluster members; the cluster key
    // must not
    val clustered = docs.withColumn("cluster", (col("id") % 100).cast("long"))
    val out = Splits.byClusterHash(clustered, "cluster",
      Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
    val straddling = out.groupBy("cluster")
      .agg(countDistinct("split").as("n")).where(col("n") > 1).count()
    assert(straddling == 0L)
    // and the assignment equals byContentHash on the stringified key —
    // one hash convention, engine-replayable either way
    val viaContent = Splits.byContentHash(
      clustered.withColumn("ck", col("cluster").cast("string")), "ck",
      Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
      .select("id", "split").as[(Long, String)].collect().toMap
    val viaCluster = out.select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(viaCluster == viaContent)
    // null cluster ids propagate as null splits, not a silent bucket
    val withNull = clustered.withColumn("cluster",
      when(col("id") === 1L, lit(null: java.lang.Long)).otherwise(col("cluster")))
    val n = Splits.byClusterHash(withNull, "cluster",
      Seq(0.5, 0.5), Seq("a", "b")).where(col("id") === 1L)
      .select("split").collect().head
    assert(n.isNullAt(0))
  }

  test("weights validate") {
    intercept[IllegalArgumentException] {
      Splits.byContentHash(docs, "text", Seq(0.8), Seq("a", "b"))
    }
    intercept[IllegalArgumentException] {
      Splits.byContentHash(docs, "text", Seq(1.0, -0.1), Seq("a", "b"))
    }
  }

  test("sampleExact returns exactly n content-stable rows as TakeOrdered") {
    val a = Splits.sampleExact(docs, "text", "id", n = 50)
    assert(a.count() == 50)
    val b = Splits.sampleExact(docs.repartition(13), "text", "id", n = 50)
    assert(a.select("id").as[Long].collect().sorted.toSeq ==
      b.select("id").as[Long].collect().sorted.toSeq,
      "sample must be partition-invariant")
    assert(a.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "orderBy+limit must plan as per-partition top-n, not a global sort")
  }

  test("sampleExactWeighted: priority = hash * cost, exact, repartition-" +
    "invariant, and clusters land ~one doc-equivalent") {
    // 40 singletons (cost 1) + one 40-doc cluster (cost 40): under
    // priority sampling a cluster member needs a hash ~40x smaller, so
    // the cluster as a whole should contribute on the order of ONE pick
    // where equal-weight sampling would hand it half the sample
    val rows = (1L to 40L).map(i => (i, 1L)) ++
      (101L to 140L).map(i => (i, 40L))
    val df = rows.toDF("doc_id", "cluster_size")
    val got = Splits.sampleExactWeighted(df, "doc_id", "doc_id",
        n = 20, costCol = "cluster_size")
      .select($"doc_id").as[Long].collect().toSet
    assert(got.size == 20)
    // deterministic + partitioning-invariant (pure function of content)
    val again = Splits.sampleExactWeighted(df.repartition(7), "doc_id",
        "doc_id", n = 20, costCol = "cluster_size")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == again)
    // the replay: priority = md5-32bit(doc_id) * cost, 20 smallest
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = rows.sortBy { case (id, c) => (h(id) * c, id) }
      .take(20).map(_._1).toSet
    assert(got == expect)
    // the heavy cluster is strongly suppressed: where unweighted
    // sampling expects ~10 of its 40 members in a 20-sample, the
    // weighted draw admits at most a couple
    val heavy = got.count(_ >= 101L)
    assert(heavy <= 4, s"cluster over-represented: $heavy of 20")
  }

  test("leakageAudit: off-diagonal rows are exactly the cross-split pairs") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_l", "id_r")
    val assign = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "train"), (5L, "val"), (6L, "train")).toDF("doc_id", "split")
    val out = Splits.leakageAudit(pairs, "id_l", "id_r", assign, "doc_id", "split")
      .orderBy("split_l", "split_r")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(
      ("test", "train", 1L), ("train", "train", 1L), ("train", "val", 1L)))
    // a constant assignment of the same pairs leaks nothing
    val safe = assign.withColumn("split",
      org.apache.spark.sql.functions.lit("train"))
    val clean = Splits.leakageAudit(pairs, "id_l", "id_r", safe, "doc_id", "split")
      .as[(String, String, Long)].collect().toSeq
    assert(clean == Seq(("train", "train", 3L)))
  }
}
