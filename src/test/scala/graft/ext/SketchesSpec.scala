package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SketchesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("kmvDistinctCount: exact below k, estimate within KMV error above") {
    val small = (1 to 5).map(i => ("a", s"v$i")) ++ Seq(("a", "v1"), ("a", "v2"))
    val dfS = small.toDF("g", "v")
    val rS = Sketches.kmvDistinctCount(dfS, Seq("g"), "v", k = 16)
      .as[(String, Long, Long)].head()
    assert(rS == (("a", 5L, 5L))) // sketch not full -> estimate IS exact

    // 2000 distinct values, k=64: relative error ~ 1/sqrt(62) ~ 13%;
    // assert a loose 3-sigma band (deterministic fixture, not flaky)
    val big = (1 to 2000).map(i => ("b", s"value-$i"))
    val rB = Sketches.kmvDistinctCount(big.toDF("g", "v"), Seq("g"), "v", k = 64)
      .as[(String, Long, Long)].head()
    assert(rB._2 == 2000L)
    assert(rB._3 > 1200 && rB._3 < 2800, s"estimate ${rB._3} outside band")

    // withExact=false drops the audit column (the 100 TB shape)
    val cols = Sketches.kmvDistinctCount(dfS, Seq("g"), "v", k = 16,
      withExact = false).columns.toSeq
    assert(cols == Seq("g", "n_est"))
  }

  test("cmsSketch/cmsEstimate: overestimate-only, exact when w is roomy") {
    // 3 values with known counts; w=512 >> 3 distinct values means
    // collisions across all four rows are overwhelmingly unlikely, and
    // this fixture is deterministic — assert exact recovery
    val data = (Seq.fill(100)("alpha") ++ Seq.fill(37)("beta") ++
      Seq.fill(3)("gamma")).toDF("v")
    val sk = Sketches.cmsSketch(data, "v", w = 512)
    val probes = Seq("alpha", "beta", "gamma", "absent").toDF("v")
    val got = Sketches.cmsEstimate(sk, probes, "v", w = 512)
      .as[(String, Long)].collect().toMap
    assert(got("alpha") == 100L && got("beta") == 37L && got("gamma") == 3L)
    assert(got("absent") == 0L) // its cells may be empty -> coalesce(0)

    // CMS NEVER underestimates, whatever w: with w=2 everything collides
    // into two buckets per row, estimates still >= true counts
    val tiny = Sketches.cmsEstimate(Sketches.cmsSketch(data, "v", w = 2),
      probes, "v", w = 2).as[(String, Long)].collect().toMap
    assert(tiny("alpha") >= 100L && tiny("beta") >= 37L &&
      tiny("gamma") >= 3L && tiny("absent") >= 0L)
    assert(tiny.values.forall(_ <= 140L)) // bounded by total mass
  }

  test("native CMS twin: same guarantees, same exact recovery at roomy w") {
    val data = (Seq.fill(100)("alpha") ++ Seq.fill(37)("beta") ++
      Seq.fill(3)("gamma")).toDF("v")
    val probes = Seq("alpha", "beta", "gamma", "absent").toDF("v")
    val sk = Sketches.cmsSketch(data, "v", w = 512, native = true)
    val got = Sketches.cmsEstimate(sk, probes, "v", w = 512, native = true)
      .as[(String, Long)].collect().toMap
    assert(got("alpha") == 100L && got("beta") == 37L &&
      got("gamma") == 3L && got("absent") == 0L)
    // never underestimates even when everything collides
    val tiny = Sketches.cmsEstimate(
      Sketches.cmsSketch(data, "v", w = 2, native = true),
      probes, "v", w = 2, native = true).as[(String, Long)].collect().toMap
    assert(tiny("alpha") >= 100L && tiny("beta") >= 37L && tiny("gamma") >= 3L)
  }

  test("cmsSketch: partition-count invariant, 4*w-bounded output") {
    val data = (1 to 1000).map(i => s"k${i % 17}").toDF("v")
    val a = Sketches.cmsSketch(data.repartition(1), "v", w = 64)
      .orderBy("j", "bucket").collect().toSeq
    val b = Sketches.cmsSketch(data.repartition(13), "v", w = 64)
      .orderBy("j", "bucket").collect().toSeq
    assert(a == b)
    assert(a.size <= 4 * 64)
    // null values are excluded, not hashed
    val withNull = (data.as[String].collect().toSeq :+ (null: String))
      .toDF("v")
    assert(Sketches.cmsSketch(withNull, "v", w = 64)
      .agg(org.apache.spark.sql.functions.sum("cnt")).as[Long].head ==
      4L * 1000)
  }

  test("hllRegisters: bounded, partition-invariant, merge = union + re-max") {
    val data = (1 to 5000).map(i => ("g", s"value-$i")).toDF("g", "v")
    val full = Sketches.hllRegisters(data, Seq("g"), "v")
      .orderBy("register").collect().toSeq
    assert(full.size <= 64)
    // rho bounds for the 60-bit hash with p=6: [1, 55]
    assert(full.forall { r =>
      val rho = r.getInt(2); rho >= 1 && rho <= 55
    })
    // partition-count invariance (the partial agg IS the merge)
    val re = Sketches.hllRegisters(data.repartition(13), Seq("g"), "v")
      .orderBy("register").collect().toSeq
    assert(re == full)
    // sketch of A union B == merge (union + same groupBy/max) of the
    // half-corpus sketches — the cross-corpus merge contract
    val (a, b) = (1 to 5000).map(i => ("g", s"value-$i")).partition(_._2.hashCode % 2 == 0)
    val merged = Sketches.hllRegisters(a.toDF("g", "v"), Seq("g"), "v")
      .unionByName(Sketches.hllRegisters(b.toDF("g", "v"), Seq("g"), "v"))
      .groupBy("g", "register")
      .agg(org.apache.spark.sql.functions.max("max_rho").as("max_rho"))
      .orderBy("register").collect().toSeq
    assert(merged == full)
  }

  test("hllEstimate: two-regime accuracy vs exact distinct counts") {
    // m=64 -> standard error 1.04/sqrt(64) = 13%; assert a loose 3-sigma
    // band per cardinality (deterministic fixtures, not flaky). 40 hits
    // linear counting (zeros present), 20000 the raw estimator.
    for (n <- Seq(40, 500, 5000, 20000)) {
      val df = (1 to n).map(i => ("g", s"item-$i-$n")).toDF("g", "v")
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, Seq("g"), "v"), Seq("g"))
        .as[(String, Double)].head()._2
      assert(math.abs(est - n) < 0.4 * n,
        s"n=$n est=$est outside 40% band")
    }
    // a group with every register empty never reaches the frame (no rows
    // in -> no rows out); a single-value group estimates ~1
    val one = Sketches.hllEstimate(
      Sketches.hllRegisters(Seq(("g", "x")).toDF("g", "v"), Seq("g"), "v"),
      Seq("g")).as[(String, Double)].head()._2
    assert(one >= 1.0 && one < 2.5, s"single-value estimate $one")
  }

  test("kmvOverlap: exact below k; estimate within KMV error above") {
    // |A|=10, |B|=10, |A∩B|=5, |A∪B|=15 — all below k=64, so exact
    val a = (1 to 10).map(i => s"v$i").toDF("v")
    val b = (6 to 15).map(i => s"v$i").toDF("v")
    val (na, nb, u, j, i) = Sketches.kmvOverlap(a, b, "v", k = 64)
      .as[(Long, Long, Long, Double, Double)].head()
    assert((na, nb, u) == (10L, 10L, 15L))
    assert(j == BigDecimal(5.0 / 15).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(i == 5.0)
    // above k: 2000 vs 2000 with 1000 shared -> jaccard 1/3, union 3000
    val bigA = (1 to 2000).map(i0 => s"x$i0").toDF("v")
    val bigB = (1001 to 3000).map(i0 => s"x$i0").toDF("v")
    val (_, _, u2, j2, _) = Sketches.kmvOverlap(bigA, bigB, "v", k = 256)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(math.abs(u2 - 3000.0) / 3000.0 < 0.25, s"union_est $u2")
    assert(math.abs(j2 - 1.0 / 3) < 0.15, s"jaccard_est $j2")
  }

  test("kmvOverlap is partition-count invariant (deterministic sketches)") {
    val a = (1 to 500).map(i => s"a$i").toDF("v")
    val b = (250 to 750).map(i => s"a$i").toDF("v")
    val r1 = Sketches.kmvOverlap(a.repartition(1), b.repartition(1), "v").collect()
    val r13 = Sketches.kmvOverlap(a.repartition(13), b.repartition(7), "v").collect()
    assert(r1.toSeq == r13.toSeq)
  }
}
