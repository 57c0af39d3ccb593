package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class Sq8Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def q6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP)

  // driver-side reference of the exact quantizer contract
  private def refCode(x: Double, lo: BigDecimal, hi: BigDecimal): Int =
    if (hi == lo) 0
    else {
      val r = ((q6(x) - lo) * 255).toDouble / (hi - lo).toDouble + 0.5
      math.min(255, math.max(0, math.floor(r).toInt))
    }

  test("codes match the driver-side reference; degenerate dim codes 0") {
    val rnd = new scala.util.Random(7)
    val dim = 4
    // dim 3 constant -> degenerate range
    val rows = (1L to 30L).map(i =>
      (i, Seq(rnd.nextDouble() * 4 - 2, rnd.nextDouble() * 100,
        rnd.nextDouble() * 0.001, 0.75).map(_.toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val (lo, hi) = Sq8.collectRanges(df, "embedding", dim)
    val loB = lo.map(BigDecimal(_)); val hiB = hi.map(BigDecimal(_))
    // ranges are the exact 6-dp min/max
    for (d <- 0 until dim) {
      val xs = rows.map(r => q6(r._2(d).toDouble))
      assert(loB(d) == xs.min && hiB(d) == xs.max, s"dim $d range")
    }
    val out = df.select($"vec_id",
        Sq8.codes($"embedding", lo, hi).as("c"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    for (((id, cs), r) <- out.zip(rows)) {
      assert(id == r._1)
      val exp = (0 until dim).map(d => refCode(r._2(d).toDouble, loB(d), hiB(d)))
      assert(cs == exp, s"row $id: $cs vs $exp")
    }
    // the constant dim codes 0 everywhere
    assert(out.forall(_._2(3) == 0))
    // extremes hit the rails: min coord -> 0, max coord -> 255 on dim 0
    val c0 = out.map(_._2(0))
    assert(c0.min == 0 && c0.max == 255)
  }

  test("out-of-range probe coordinates clamp to [0, 255]") {
    val corpus = Seq((1L, Seq(0.0f, 1.0f)), (2L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val (lo, hi) = Sq8.collectRanges(corpus, "embedding", 2)
    val probe = Seq((9L, Seq(-5.0f, 10.0f))).toDF("vec_id", "embedding")
    val cs = probe.select(Sq8.codes($"embedding", lo, hi).as("c"))
      .as[Seq[Int]].head()
    assert(cs == Seq(0, 255), cs.toString)
  }

  test("quantizeReport recon_err matches an exact decimal reference") {
    val rnd = new scala.util.Random(11)
    val dim = 3
    val rows = (1L to 25L).map(i =>
      (i, Seq.fill(dim)((rnd.nextDouble() * 6 - 3).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val (lo, hi) = Sq8.collectRanges(df, "embedding", dim)
    val loB = lo.map(BigDecimal(_)); val hiB = hi.map(BigDecimal(_))
    val out = Sq8.quantizeReport(df, "vec_id", "embedding", dim)
      .orderBy("vec_id")
      .as[(Long, Long, Int, Int, Double)].collect()
    assert(out.length == rows.length)
    for (((id, sum, mn, mx, err), r) <- out.zip(rows)) {
      val codes = (0 until dim).map(d => refCode(r._2(d).toDouble, loB(d), hiB(d)))
      assert(sum == codes.map(_.toLong).sum && mn == codes.min && mx == codes.max)
      val expErr = (0 until dim).map { d =>
        val deq = if (hiB(d) == loB(d)) loB(d).toDouble
          else loB(d).toDouble + codes(d).toDouble / 255.0 * (hiB(d) - loB(d)).toDouble
        (q6(r._2(d).toDouble) - q6(deq)).abs
      }.sum.toDouble
      assert(err == expErr, s"row $id: $err vs $expErr")
    }
  }

  test("topK equals a driver-side dequantized-dot brute force, ties on id asc") {
    val rnd = new scala.util.Random(5)
    val dim = 6
    val rows = (1L to 60L).map(i =>
      (i, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = rows.toDF("vec_id", "embedding").repartition(7)
    val (lo, hi) = Sq8.collectRanges(df, "embedding", dim)
    val loB = lo.map(BigDecimal(_)); val hiB = hi.map(BigDecimal(_))
    // 255x-scaled exact dequant: D_d = 255*lo_d + code_d*(hi_d - lo_d)
    val deqOf: Map[Long, Seq[BigDecimal]] = rows.map { case (id, v) =>
      id -> (0 until dim).map { d =>
        val c = refCode(v(d).toDouble, loB(d), hiB(d))
        loB(d) * 255 + c * (hiB(d) - loB(d))
      }
    }.toMap
    val k = 4
    val queries = df.where($"vec_id" <= 5L)
    val out = Sq8.topK(df, queries, "vec_id", "embedding", "vec_id",
        dim = dim, k = k)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect()
    for (qid <- 1L to 5L) {
      val qd = deqOf(qid)
      val exp = rows.map(_._1).filter(_ != qid)
        .map(nid => (nid, deqOf(nid).zip(qd)
          .map { case (a, b) => a * b }.sum))
        .sortBy { case (nid, s) => (-s, nid) }.take(k)
      val got = out.filter(_._1 == qid).map(r => (r._2, r._3)).toSeq
      // displayed score = 6-dp HALF_UP round of the exact decimal (the
      // cross-engine-safe double conversion); ranking used full scale
      assert(got == exp.map { case (nid, s) =>
        (nid, s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) },
        s"query $qid: $got vs $exp")
    }
    // faithfulness (the reason for the round-16 rewrite): the quantized
    // ranking's top-k tracks the exact RAW-dot top-k on this smooth
    // fixture — the affine code dot it replaced measured 0.29-0.34 here
    val rawTop: Map[Long, Set[Long]] = (1L to 5L).map { qid =>
      val qv = rows.find(_._1 == qid).get._2.map(_.toDouble)
      qid -> rows.filter(_._1 != qid)
        .map(r => (r._1, r._2.map(_.toDouble).zip(qv).map(t => t._1 * t._2).sum))
        .sortBy { case (nid, s) => (-s, nid) }.take(k).map(_._1).toSet
    }.toMap
    val hits = (1L to 5L).map(qid =>
      out.filter(_._1 == qid).map(_._2).count(rawTop(qid))).sum
    assert(hits >= (5 * k * 0.9).toInt,
      s"dequantized ranking lost the raw-dot top-k: $hits / ${5 * k}")
  }

  test("scaledDotDecimal kernel is exact at 128-bit product magnitudes") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(97)
    def arr(a: Array[Long]) = new GenericArrayData(a.map(Long.box).toArray[Any])
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(32)
      // magnitudes up to 1e18: single products overflow a long by ~15
      // orders of magnitude, so only a correct 128-bit path can pass
      val a = Array.fill(n)(rnd.nextLong() % 1000000000000000000L)
      val b = Array.fill(n)(rnd.nextLong() % 1000000000000000000L)
      val ref = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val got = graft.expressions.VectorRuntime.scaledDotDecimal(arr(a), arr(b))
      assert(got.toJavaBigDecimal.unscaledValue() == ref.bigInteger &&
        got.toJavaBigDecimal.scale() == 12, s"trial $trial: $got vs $ref")
    }
    intercept[IllegalArgumentException] {
      graft.expressions.VectorRuntime.scaledDotDecimal(
        arr(Array(1L, 2L)), arr(Array(1L)))
    }
  }

  test("wrong-length vector fails loudly; empty corpus fails collectRanges") {
    val bad = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Sq8.dimRanges(bad, "embedding", 2).collect()
    }
    assert(e.getMessage.contains("length"))
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Sq8.collectRanges(empty, "embedding", 2)
    }
  }

  test("topK fails loudly on a wrong-length PROBE vector") {
    // corpus is clean; the probe side is the one collectRanges never sees.
    // The guard is a raise_error in the ROW PATH (a count-based pre-check
    // would re-execute the probe plan per call), so the failure surfaces
    // at action time as USER_RAISED_EXCEPTION — the message is the
    // contract (the projectOnto spec convention).
    val corpus = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val probes = Seq((10L, Seq(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Sq8.topK(corpus, probes, "vec_id", "embedding", "vec_id", dim = 2)
        .collect()
    }
    assert(e.getMessage.contains("probe vector with length"))
  }
}
