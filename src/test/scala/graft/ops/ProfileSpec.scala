package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, None, Some(2.5)),
    (3L, Some("c"), None),
    (4L, Some("a"), Some(1.5))).toDF("id", "s", "x")

  test("one row per column with exact stats") {
    val p = Profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "c")))
    assert(p("x") == ((4L, 1L, 2L, "1.5", "2.5")))
  }

  test("column subset and validation") {
    assert(Profile(df, Seq("id")).count() == 1)
    intercept[IllegalArgumentException] { Profile(df, Seq("nope")) }
  }

  test("column names containing dots profile fine") {
    val dotted = df.withColumnRenamed("s", "a.b")
    val p = Profile(dotted, Seq("a.b")).collect().head
    assert(p.getString(0) == "a.b")
    assert(p.getLong(2) == 1L) // one null
  }

  test("correlationMatrix: known values, zero-variance null, partition-stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // y = 2x exactly -> corr 1; z = -x -> corr -1 with x; c constant
    val rows = (1 to 40).map(i => (i.toDouble, 2.0 * i, -i.toDouble, 5.0))
    val d = rows.toDF("x", "y", "z", "c")
    def m(df: org.apache.spark.sql.DataFrame) =
      Profile.correlationMatrix(df, Nil, Seq("x", "y", "z", "c"))
        .collect().map(r =>
          (r.getString(0), r.getString(1)) -> Option(r.get(3))).toMap
    val got = m(d)
    assert(got(("x", "y")).get == 1.0)
    assert(got(("x", "z")).get == -1.0)
    assert(got(("y", "z")).get == -1.0)
    assert(got(("x", "c")).isEmpty) // zero variance -> null, never NaN
    // bit-stable across partitionings (the reason this exists: Spark's
    // corr() is merge-order-dependent)
    val a = Profile.correlationMatrix(d.repartition(1), Nil,
      Seq("x", "y", "z")).orderBy("col_x", "col_y")
      .collect().map(_.get(3)).toSeq
    val b = Profile.correlationMatrix(d.repartition(11), Nil,
      Seq("x", "y", "z")).orderBy("col_x", "col_y")
      .collect().map(_.get(3)).toSeq
    assert(a == b)
    // grouped: per-group n and a sane in-range corr
    val g = Profile.correlationMatrix(
      d.withColumn("grp", col("x") > 20.0), Seq("grp"), Seq("x", "y"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(g(true) == ((20L, 1.0)) && g(false) == ((20L, 1.0)))
  }

  test("correlationMatrix: pairwise-complete — nulls only shrink the pairs they touch") {
    import spark.implicits._
    // z is null on half the rows; (x,y) must use ALL 40 rows while
    // (x,z)/(y,z) use the 20 complete ones — the pre-fix code counted
    // every row in n but summed only non-null values, silently skewing
    // corr on any data with nulls
    val rows = (1 to 40).map(i => (i.toDouble, 2.0 * i,
      if (i % 2 == 0) Some(3.0 * i) else None))
    val d = rows.toDF("x", "y", "z")
    val got = Profile.correlationMatrix(d, Nil, Seq("x", "y", "z"))
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> ((r.getLong(2), Option(r.get(3)))))
      .toMap
    assert(got(("x", "y")) == ((40L, Some(1.0))))
    assert(got(("x", "z"))._1 == 20L && got(("x", "z"))._2.get == 1.0)
    assert(got(("y", "z"))._1 == 20L && got(("y", "z"))._2.get == 1.0)
  }

  test("correlationMatrix: int-moment path equals decimal path; guard fails loudly") {
    import spark.implicits._
    // negatives + nulls + mixed magnitudes: exercises the negative-product
    // digit decomposition and the pairwise-complete n under both paths
    val rng = new scala.util.Random(3)
    val rows = (1 to 500).map { i =>
      (rng.nextDouble() * 200000 - 100000, rng.nextDouble() * 100,
        if (i % 3 == 0) None else Some(rng.nextDouble() * 50 - 25))
    }
    val d = rows.toDF("x", "y", "z").repartition(7)
    def m(int: Boolean) =
      Profile.correlationMatrix(d, Nil, Seq("x", "y", "z"), intMoments = int)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    val fast = m(true)
    val slow = m(false)
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (k, (n, c)) =>
      assert(n == slow(k)._1, s"n mismatch at $k")
      // identical exact sums; only the final double reassembly differs
      // (scaled vs unscaled magnitudes) — agreement far inside the house
      // 6-dp round
      assert(math.abs(c - slow(k)._2) < 1e-9, s"corr mismatch at $k: $c vs ${slow(k)._2}")
    }
    // int-moment path is partition-stable like the decimal path
    val p1 = Profile.correlationMatrix(d.repartition(1), Nil, Seq("x", "y"))
      .collect().map(_.get(3)).toSeq
    val p2 = Profile.correlationMatrix(d.repartition(13), Nil, Seq("x", "y"))
      .collect().map(_.get(3)).toSeq
    assert(p1 == p2)
    // a magnitude past the scaled-2^31 bound fails LOUDLY with the remedy
    val big = Seq((3.0e5, 1.0), (1.0, 2.0)).toDF("x", "y")
    val e = intercept[Exception] {
      Profile.correlationMatrix(big, Nil, Seq("x", "y")).collect()
    }
    assert(e.getMessage.contains("intMoments"), s"got: ${e.getMessage}")
    // ...and the documented remedy works on the same data
    val ok = Profile.correlationMatrix(big, Nil, Seq("x", "y"),
      intMoments = false).collect()
    assert(ok.length == 1 && ok.head.getLong(2) == 2L)
  }

  test("trendOls: closed-form fit per group, nulls pairwise-excluded") {
    val d = Seq(
      // group a: perfect line y = 1 + 2x
      ("a", Some(0.0), Some(1.0)), ("a", Some(1.0), Some(3.0)),
      ("a", Some(2.0), Some(5.0)),
      // group b: (0,0),(1,1),(2,1) -> slope .5, intercept 1/6, r2 .75
      ("b", Some(0.0), Some(0.0)), ("b", Some(1.0), Some(1.0)),
      ("b", Some(2.0), Some(1.0)),
      // null on either side drops the row
      ("b", None, Some(9.0)), ("b", Some(9.0), None)
    ).toDF("g", "x", "y")
    val out = Profile.trendOls(d, Seq("g"), "x", "y").orderBy("g")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 3L, 2.0, 1.0, 1.0),
      ("b", 3L, 0.5, 0.166667, 0.75)))
    // partition-count invariance: exact decimal sums merge in any order
    val p13 = Profile.trendOls(d.repartition(13), Seq("g"), "x", "y")
      .orderBy("g").as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(p13 == out)
  }

  test("aucExact: perfect/inverted/tied separations, brute-force parity, null on one class") {
    // g=a: perfect separation (pos {3,2} > neg {1,0}) -> 1.0
    // g=b: inverted -> 0.0; g=c: everything tied -> 0.5
    // g=d: one class only -> null AUC
    val d = Seq(
      ("a", 3L, 1), ("a", 2L, 1), ("a", 1L, 0), ("a", 0L, 0),
      ("b", 0L, 1), ("b", 5L, 0),
      ("c", 7L, 1), ("c", 7L, 0), ("c", 7L, 1), ("c", 7L, 0),
      ("d", 1L, 1), ("d", 2L, 1)).toDF("g", "s", "y")
    val out = Profile.aucExact(d, Seq("g"), "s", $"y" === 1).orderBy("g")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("a", 2L, 2L, 8L, Some(1.0)),
      ("b", 1L, 1L, 0L, Some(0.0)),
      ("c", 2L, 2L, 4L, Some(0.5)),
      ("d", 2L, 0L, 0L, None)))
    // brute-force parity on a seeded tie-heavy random set:
    // AUC = (#(pos>neg) + 0.5*#(pos==neg)) / (nPos*nNeg)
    val rnd = new scala.util.Random(31)
    val rows = (1 to 120).map(_ => (rnd.nextInt(8).toLong, rnd.nextInt(2)))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = BigDecimal(wins) / (2L * pos.size * neg.size)
    val global = Profile.aucExact(rows.toDF("s", "y"), Nil, "s", $"y" === 1)
      .as[(Long, Long, Long, Option[Double])].head()
    assert(global._1 == pos.size && global._2 == neg.size)
    assert(global._4.contains(expected.setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("rankBuckets: ties share a bucket; all-tied input lands in one bucket") {
    val d = (Seq.fill(4)(1) ++ Seq.fill(3)(2) ++ Seq.fill(3)(3)).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("g", "id", "v")
    val out = Profile.rankBuckets(d, Seq("g"), "v", 3)
      .select("v", "bucket").distinct().as[(Int, Int)].collect().toMap
    // pct ranks 0, 4/9, 7/9 -> buckets 0, 1, 2; every tie co-assigned
    assert(out == Map(1 -> 0, 2 -> 1, 3 -> 2))
    // the ntile contrast: 6 identical values would be SPLIT 2/2/2 by
    // ntile (arbitrary order inside the tie) — rank thresholds keep them
    // together, which is what makes the assignment engine-replayable
    val tied = Seq.fill(6)(("g", 5)).toDF("g", "v")
    val b = Profile.rankBuckets(tied, Seq("g"), "v", 3)
      .select("bucket").distinct().as[Int].collect().toSeq
    assert(b == Seq(0))
    // top rank (pct 1.0) clamps into the last bucket, never bucket n
    val asc = (1 to 5).map(i => ("g", i)).toDF("g", "v")
    val top = Profile.rankBuckets(asc, Seq("g"), "v", 3)
      .where($"v" === 5).select("bucket").as[Int].head()
    assert(top == 2)
  }

  test("averagePrecision: perfect=1, prevalence baseline, brute-force parity") {
    // perfect separation -> AP 1.0; one class -> null
    val d = Seq(
      ("a", 3L, 1), ("a", 2L, 1), ("a", 1L, 0), ("a", 0L, 0),
      ("d", 1L, 1), ("d", 2L, 1)).toDF("g", "s", "y")
    val out = Profile.averagePrecision(d, Seq("g"), "s", $"y" === 1)
      .orderBy("g").as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(("a", 2L, 2L, Some(1.0)), ("d", 2L, 0L, None)))
    // all-tied scores: one threshold, AP = precision there = prevalence
    val tied = Seq(("c", 7L, 1), ("c", 7L, 0), ("c", 7L, 0), ("c", 7L, 1))
      .toDF("g", "s", "y")
    val t = Profile.averagePrecision(tied, Seq("g"), "s", $"y" === 1).head()
    assert(t.getDouble(3) == 0.5)
    // brute-force parity on a seeded tie-heavy set: replay the exact
    // definition (distinct thresholds desc, 12-dp terms, 6-dp finish)
    val rnd = new scala.util.Random(37)
    val rows = (1 to 150).map(_ => (rnd.nextInt(9).toLong, rnd.nextInt(2)))
    val byScore = rows.groupBy(_._1).toSeq.sortBy(-_._1)
      .map { case (v, rs) => (v, rs.size.toLong, rs.count(_._2 == 1).toLong) }
    var tp = 0L; var nn = 0L
    var terms = BigDecimal(0)
    byScore.foreach { case (_, c, y) =>
      tp += y; nn += c
      terms += BigDecimal(y.toDouble * tp / nn)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val nPos = rows.count(_._2 == 1)
    val expected = BigDecimal(terms.toDouble / nPos)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val global = Profile.averagePrecision(
        rows.toDF("s", "y"), Nil, "s", $"y" === 1)
      .as[(Long, Long, Option[Double])].head()
    assert(global._3.contains(expected))
  }

  test("ewmaHalf replays the exact halving recursion per group") {
    val d = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 5L, 4.0), ("b", 9L, 8.0)).toDF("g", "t", "x")
    val out = Profile.ewmaHalf(d, Seq("g"), "t", "x").orderBy("g", "t")
      .as[(String, Long, Double, Double)].collect().toSeq
    // a: 1; (2+1)/2=1.5; (3+1.5)/2=2.25. b: 4; (8+4)/2=6
    assert(out == Seq(
      ("a", 1L, 1.0, 1.0), ("a", 2L, 2.0, 1.5), ("a", 3L, 3.0, 2.25),
      ("b", 5L, 4.0, 4.0), ("b", 9L, 8.0, 6.0)))
    // null values are dropped before the fold; partition-invariant
    val withNull = Seq(
      ("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)), ("a", 3L, Some(3.0)),
      ("a", 4L, None),
      ("b", 5L, Some(4.0)), ("b", 9L, Some(8.0))).toDF("g", "t", "x")
    val p7 = Profile.ewmaHalf(withNull.repartition(7), Seq("g"), "t", "x")
      .orderBy("g", "t").as[(String, Long, Double, Double)].collect().toSeq
    assert(p7 == out)
  }

  test("percentileGate drops each group's own bottom tail; ties at the cut survive") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      ("a", 1L, 10), ("a", 2L, 20), ("a", 3L, 30), ("a", 4L, 40), ("a", 5L, 50),
      ("b", 6L, 5), ("b", 7L, 5), ("b", 8L, 9)).toDF("g", "id", "len")
    val out = Profile.percentileGate(d, Seq("g"), "len", minPct = 0.25)
      .orderBy("id").as[(String, Long, Int)].collect().toSeq
    // a: ranks 0, .25, .5, .75, 1 -> drops len 10 only;
    // b: the two len-5 rows SHARE rank 0 (both drop), len 9 keeps
    assert(out.map(_._2) == Seq(2L, 3L, 4L, 5L, 8L))
  }

  test("joinSkewReport: exact hot keys, per-key skew vs the uniform share") {
    import org.apache.spark.sql.functions.col
    val rows = (Seq.fill(6)("hot") ++ Seq("a", "b", "c")).zipWithIndex
      .map { case (k, i) => (k, i) }
    val d = rows.toDF("k", "payload")
    val out = Profile.joinSkewReport(d, "k", topK = 2)
      .orderBy("rnk")
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
    // 4 keys, 9 rows; hot = 6 rows -> skew 6*4/9 = 2.666667; "a" = 1 row
    assert(out == Seq(
      (1L, "hot", 6L, 4L, 9L, 2.666667),
      (2L, "a", 1L, 4L, 9L, 0.444444)))
  }

  test("ksDrift: exact integer KS distance with ties, per group") {
    val d = Seq(
      // g1: A = {1, 2}, B = {2, 3} -> D = |F_A - F_B| peaks at 0.5
      ("g1", "A", 1.0), ("g1", "A", 2.0), ("g1", "B", 2.0), ("g1", "B", 3.0),
      // g2: identical samples -> D = 0
      ("g2", "A", 5.0), ("g2", "B", 5.0),
      // a third side is ignored entirely
      ("g1", "C", 99.0)).toDF("g", "side", "x")
    val out = Profile.ksDrift(d, Seq("g"), "side", "x", "A", "B")
      .orderBy("g")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("g1", 2L, 2L, 2L, Some(0.5)),
      ("g2", 1L, 1L, 0L, Some(0.0))))
    // one-sided group: statistic undefined -> null ks
    val oneSided = Seq(("g", "A", 1.0), ("g", "A", 2.0)).toDF("g", "side", "x")
    val os = Profile.ksDrift(oneSided, Seq("g"), "side", "x", "A", "B")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(os == Seq(("g", 2L, 0L, 0L, None)))
    // partition invariance
    val p9 = Profile.ksDrift(d.repartition(9), Seq("g"), "side", "x", "A", "B")
      .orderBy("g")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(p9 == out)
  }

  test("giniFeatureScores: perfect split gains the base, uninformative gains zero") {
    import org.apache.spark.sql.functions.col
    // 4 rows, target = label; f_perfect matches the label exactly,
    // f_noise is constant
    val d = Seq(
      ("a", "c", true), ("a", "c", true), ("b", "c", false), ("b", "c", false))
      .toDF("f_perfect", "f_noise", "y")
    val out = Profile.giniFeatureScores(d, Seq("f_perfect", "f_noise"), col("y"))
      .orderBy("feature")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // base: p = 1/2 -> 1 - .25 - .25 = 0.5
    assert(out == Seq(
      ("f_noise", 4L, 0.5, 0.5, 0.0),
      ("f_perfect", 4L, 0.5, 0.0, 0.5)))
    // partition invariance (decimal term sums)
    val p9 = Profile.giniFeatureScores(d.repartition(9),
        Seq("f_perfect", "f_noise"), col("y"))
      .orderBy("feature")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(p9 == out)
  }

  test("calibrationReport: rank deciles, per-bin positive rates") {
    import org.apache.spark.sql.functions.col
    // scores 1..20, label = score > 15: bins of 10 over 20 rows -> 2
    // rows/bin; positives live in bins 8 (16) .. 10 (19,20)
    val d = (1 to 20).map(i => (i.toLong, i.toDouble, i > 15)).toDF("id", "s", "y")
    val out = Profile.calibrationReport(d, "s", col("y"), bins = 10, tieCol = "id")
      .orderBy("bin")
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out.size == 10 && out.forall(_._2 == 2L))
    assert(out.map(_._3) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L, 2L, 2L))
    assert(out(7) == ((8, 2L, 1L, 15.0, 16.0, 0.5)))
    assert(out.last == ((10, 2L, 2L, 19.0, 20.0, 1.0)))
  }

  test("ksDrift properties: ks in [0,1]; invariant under strictly monotone value maps") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      val side = if (rnd.nextBoolean()) "A" else "B"
      val v = if (side == "A") rnd.nextInt(40).toDouble
              else rnd.nextInt(40).toDouble + (i % 3)
      (s"g${i % 2}", side, v)
    }
    val d = rows.toDF("g", "side", "x")
    val base = Profile.ksDrift(d, Seq("g"), "side", "x", "A", "B")
      .orderBy("g")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    base.foreach { case (_, na, nb, ds, ks) =>
      assert(ks.exists(k => k >= 0.0 && k <= 1.0))
      assert(ds <= na * nb)
    }
    // KS is rank arithmetic: any strictly increasing map of the values
    // (here x -> 3x + 7) leaves the statistic untouched
    val mapped = Profile.ksDrift(
        d.withColumn("x", col("x") * 3 + 7), Seq("g"), "side", "x", "A", "B")
      .orderBy("g")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(mapped == base)
  }

  test("weekdayResiduals: count-scaled residual vs same-weekday baseline") {
    // two mondays (epoch days 4, 11 are mondays: (4+4)%7==1) and one
    // tuesday for group a
    val d = Seq(
      ("a", 4L, 10.0), ("a", 11L, 20.0), ("a", 5L, 7.0)).toDF("g", "day", "x")
    val out = Profile.weekdayResiduals(d, Seq("g"), "day", "x")
      .orderBy("day")
      .as[(String, Long, Double, Long, Long, Double)].collect().toSeq
    // mondays: n=2, sum=30 -> resid(10) = 2*10-30 = -10; resid(20) = +10
    // tuesday: n=1, sum=7 -> resid = 0
    assert(out == Seq(
      ("a", 4L, 10.0, 1L, 2L, -10.0),
      ("a", 5L, 7.0, 2L, 1L, 0.0),
      ("a", 11L, 20.0, 1L, 2L, 10.0)))
  }

  test("featureMomentsMatrix: agrees with correlationMatrix, listwise, order-free") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1 to 40).map(i => (i.toDouble, 2.0 * i, -i.toDouble))
    val d = rows.toDF("x", "y", "z")
    val got = Profile.featureMomentsMatrix(d, Nil, Seq("x", "y", "z"))
      .collect().map(r =>
        (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), Option(r.get(4))))).toMap
    // diagonal: cov = population variance, corr = 1
    assert(got(("x", "x"))._3.get == 1.0)
    assert(got(("x", "y")) == ((40L, got(("x", "x"))._2 * 2, Some(1.0))))
    assert(got(("x", "z"))._3.get == -1.0)
    // null-free data: corr agrees exactly with the pairwise path
    val pw = Profile.correlationMatrix(d, Nil, Seq("x", "y", "z"))
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    pw.foreach { case (k, v) => assert(got(k)._3.get == v, s"pair $k") }
    // LISTWISE: one null z row removes that row from EVERY pair (the
    // documented divergence from correlationMatrix's pairwise contract)
    val dn = (rows.map { case (x, y, z) => (x, y, Option(z)) } :+
      ((99.0, 1.0, None: Option[Double]))).toDF("x", "y", "z")
    val ln = Profile.featureMomentsMatrix(dn, Nil, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ln.values.toSet == Set(40L), s"any-null row must drop everywhere: $ln")
    // bit-stable across partitionings (the mergeable-buffer claim)
    def run(parts: Int) =
      Profile.featureMomentsMatrix(d.repartition(parts),
        Nil, Seq("x", "y", "z")).orderBy("col_x", "col_y")
        .collect().map(r => (r.get(3), Option(r.get(4)))).toSeq
    assert(run(1) == run(13))
    // grouped face: per-group n rides the same single buffer
    val g = Profile.featureMomentsMatrix(
      d.withColumn("grp", col("x") > 20.0), Seq("grp"), Seq("x", "y"))
      .where(col("col_x") === "x" && col("col_y") === "y")
      .collect().map(r => r.getBoolean(0) -> r.getLong(3)).toMap
    assert(g == Map(true -> 20L, false -> 20L))
    // input validation fails LOUDLY, not degenerately: a duplicated value
    // column would otherwise yield a silent corr-1.0 gram row, and a
    // missing group column an opaque analysis error deep in the plan
    intercept[IllegalArgumentException] {
      Profile.featureMomentsMatrix(d, Nil, Seq("x", "y", "x"))
    }
    intercept[IllegalArgumentException] {
      Profile.featureMomentsMatrix(d, Seq("no_such_grp"), Seq("x", "y"))
    }
  }
}
