package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.expressions.MisraGriesAgg

class HeavyHittersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Zipf-ish fixture: item-i appears 1000/i times, i in 1..60, so shares
    * range ~15% down to ~0.25% over n = 1000 * H(60) ~ 4680 rows.
    */
  private def zipf: Seq[String] =
    (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"item-$i"))

  test("frequentItems equals the full groupBy answer, any partitioning") {
    val rows = scala.util.Random.shuffle(zipf)
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("v")
      val got = HeavyHitters.frequentItems(df, col("v"), minShare = 0.01, k = 256)
        .as[(String, Long)].collect().toMap
      val n = rows.size
      val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c > n * 0.01 }.toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("counts are exact, not MG lower bounds") {
    val df = zipf.toDF("v")
    val got = HeavyHitters.frequentItems(df, col("v"), minShare = 0.05, k = 64)
      .as[(String, Long)].collect().toMap
    assert(got("item-1") == 1000L)
    assert(got("item-2") == 500L)
  }

  test("MG summary superset guarantee holds at the minimal legal k") {
    // k+1 = 1/minShare exactly: the bound is tight but still sufficient
    val df = zipf.toDF("v").repartition(13)
    val got = HeavyHitters.frequentItems(df, col("v"), minShare = 0.05, k = 19)
      .as[(String, Long)].collect().toMap
    val n = zipf.size
    val want = zipf.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c > n * 0.05 }.toMap
    assert(got == want)
  }

  test("raw MG summary is bounded at k entries and is a candidate superset") {
    val df = zipf.toDF("v").repartition(11)
    val mg = df.agg(MisraGriesAgg.misraGriesSummary(col("v"), 32).as("mg"))
      .select(map_keys(col("mg"))).as[Seq[String]].head()
    assert(mg.size <= 32)
    val n = zipf.size
    val frequent = zipf.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, c) => c > n / 33.0 }.keySet
    assert(frequent.subsetOf(mg.toSet),
      s"missing: ${frequent.diff(mg.toSet)}")
  }

  test("nulls are ignored on both passes") {
    val df = (zipf.map(Option(_)) ++ Seq.fill(500)(Option.empty[String]))
      .toDF("v")
    val got = HeavyHitters.frequentItems(df, col("v"), minShare = 0.1, k = 64)
      .as[(String, Long)].collect().toMap
    // n excludes nulls: item-1 share = 1000/4676, well above 0.1
    assert(got.contains("item-1"))
    assert(!got.keySet.exists(_ == null))
  }

  test("frequentItemsByGroup equals the per-group groupBy answer") {
    // two groups with DIFFERENT zipf tails: thresholds are per-group
    val rows = zipf.map(("g1", _)) ++
      (1 to 40).flatMap(i => Seq.fill(500 / i)(s"x-$i")).map(("g2", _))
    val df = scala.util.Random.shuffle(rows).toDF("g", "v").repartition(9)
    val got = HeavyHitters.frequentItemsByGroup(df, Seq("g"), col("v"),
      minShare = 0.02, k = 128, itemName = "v")
      .as[(String, String, Long)].collect()
      .map { case (g, v, c) => (g, v) -> c }.toMap
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case ((g, _), c) =>
        c > rows.count(_._1 == g) * 0.02
      }
    assert(got == want)
    // both groups must actually contribute rows for the test to mean much
    assert(got.keySet.map(_._1) == Set("g1", "g2"))
  }

  test("frequentItemsByGroup keeps a NULL group (null-safe recount join)") {
    val rows = zipf.map(v => (Option("g1"), v)) ++
      (1 to 10).flatMap(i => Seq.fill(200 / i)(s"n-$i"))
        .map(v => (Option.empty[String], v))
    val df = scala.util.Random.shuffle(rows).toDF("g", "v").repartition(7)
    val got = HeavyHitters.frequentItemsByGroup(df, Seq("g"), col("v"),
      minShare = 0.05, k = 64, itemName = "v")
      .as[(Option[String], String, Long)].collect()
      .map { case (g, v, c) => (g, v) -> c }.toMap
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case ((g, _), c) => c > rows.count(_._1 == g) * 0.05 }
    assert(got == want)
    assert(got.keySet.exists(_._1.isEmpty), "the NULL group must survive")
  }

  test("MG items longer than 64 KiB survive buffer serialization") {
    // writeUTF would throw on these; the length-prefixed form must not
    val big = "x" * 70000
    val df = (Seq.fill(50)(big) ++ (1 to 30).map(i => s"small-$i"))
      .toDF("v").repartition(5)
    val got = HeavyHitters.frequentItems(df, col("v"), minShare = 0.3, k = 16)
      .as[(String, Long)].collect().toMap
    assert(got == Map(big -> 50L))
  }

  test("k too small for the share is rejected loudly") {
    val df = zipf.toDF("v")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, col("v"), minShare = 0.01, k = 50)
    }
    assert(e.getMessage.contains("cannot guarantee"))
  }

  test("empty and all-null inputs return an empty (item, cnt) frame") {
    val empty = spark.emptyDataset[String].toDF("v")
    assert(HeavyHitters.frequentItems(empty, col("v"), 0.1, 64).count() == 0L)
    val nulls = Seq.fill(10)(Option.empty[String]).toDF("v")
    val out = HeavyHitters.frequentItems(nulls, col("v"), 0.1, 64)
    assert(out.columns.toSeq == Seq("item", "cnt") && out.count() == 0L)
  }
}
