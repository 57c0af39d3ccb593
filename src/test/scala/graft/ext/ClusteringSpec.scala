package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ClusteringSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // two tight, well-separated blobs: any reasonable k=2 clustering must
  // recover them regardless of which vectors seed the rounds
  private def blobs = {
    val a = (0 until 20).map(i =>
      (i.toLong, Array(10.0 + (i % 5) * 0.01, 10.0 - (i % 3) * 0.01), 7))
    val b = (20 until 50).map(i =>
      (i.toLong, Array(-10.0 - (i % 4) * 0.01, -10.0 + (i % 2) * 0.01), 9))
    (a ++ b).toDF("id", "v", "label")
  }

  test("assign recovers two separated blobs; dist is to the final centroid") {
    val out = Clustering.assign(blobs, "id", "v", k = 2, iters = 2)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    assert(out.size == 50)
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.size == 2)
    assert(byCluster.values.toSet ==
      Set((0L until 20L).toSet, (20L until 50L).toSet))
    // after the mean updates every member sits within its tight blob
    assert(out.forall(_._3 < 1.0), s"distances must be intra-blob: $out")
  }

  test("report: sizes, modal labels, inertia = decimal sum of member distances") {
    val rep = Clustering.report(blobs, "id", "v", "label", k = 2, iters = 2)
      .orderBy("n_members")
      .as[(Int, Long, Double, Int, Double)].collect().toSeq
    assert(rep.map(r => (r._2, r._4, r._5)) == Seq((20L, 7, 1.0), (30L, 9, 1.0)))
    // inertia equals the independent assignment's summed rounded distances
    val dists = Clustering.assign(blobs, "id", "v", 2, 2)
      .groupBy(col("cluster"))
      .agg(sum(col("dist").cast("decimal(18,6)")).cast("double").as("s"))
      .as[(Int, Double)].collect().toMap
    rep.foreach { r =>
      val cluster = r._1
      assert(math.abs(r._3 - dists(cluster)) < 1e-9)
    }
  }

  test("deterministic across partitionings; k=1 degenerates to one cluster") {
    val one = Clustering.assign(blobs.repartition(1), "id", "v", 2, 2)
      .orderBy("id").collect().toSeq
    val many = Clustering.assign(blobs.repartition(7), "id", "v", 2, 2)
      .orderBy("id").collect().toSeq
    assert(one.map(_.toSeq) == many.map(_.toSeq))
    val k1 = Clustering.report(blobs, "id", "v", "label", k = 1, iters = 1)
      .as[(Int, Long, Double, Int, Double)].collect().toSeq
    assert(k1.size == 1 && k1.head._2 == 50L && k1.head._4 == 9)
  }
}
